"""Property tests for the session-4 block kernels (n-gram partials,
proximity gap, URL canonicalization) against brute-force python
references — kernel level, no Ray session."""

import collections
from functools import partial as bind

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_ray.ops.ngrams import _gram_partials
from bitfunnel_ray.ops.proximity import _prox_batch
from bitfunnel_ray.ops.urls import canonicalize_url_array

token_st = st.sampled_from(["a", "b", "c", "dd", "e"])
text_st = st.lists(token_st, min_size=0, max_size=12).map(" ".join)


@settings(max_examples=120, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=8), st.integers(1, 3))
def test_gram_partials_match_brute(texts, n):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = _gram_partials(t, n=n)
    got = dict(zip(out["gram"].to_pylist(), out["cnt_part"].to_pylist()))
    want = collections.Counter()
    for txt in texts:
        toks = txt.split()
        for i in range(len(toks) - n + 1):
            want[" ".join(toks[i : i + n])] += 1
    assert got == dict(want)


@settings(max_examples=120, deadline=None)
@given(st.lists(text_st, min_size=1, max_size=8), st.integers(0, 6))
def test_prox_batch_matches_brute(texts, w):
    t = pa.table(
        {
            "doc_id": pa.array(list(range(len(texts))), pa.int64()),
            "text": pa.array(texts),
        }
    )
    out = _prox_batch(t, term_a="a", term_b="b", window=w)
    got = dict(zip(out["doc_id"].to_pylist(), out["min_gap"].to_pylist()))
    want = {}
    for i, txt in enumerate(texts):
        toks = txt.split()
        pa_pos = [j for j, x in enumerate(toks) if x == "a"]
        pb_pos = [j for j, x in enumerate(toks) if x == "b"]
        if pa_pos and pb_pos:
            g = min(abs(p - q) for p in pa_pos for q in pb_pos)
            if g <= w:
                want[i] = g
    assert got == want


url_part = st.text(alphabet="abXY19", min_size=0, max_size=6)


@settings(max_examples=150, deadline=None)
@given(
    st.sampled_from(["http", "HTTP", "https", "HTTPS", "ftp"]),
    st.booleans(),  # www prefix
    url_part,  # host stem
    st.sampled_from(["", ":80", ":443", ":8080"]),
    url_part,  # path
    st.sampled_from(["", "/", "?q=1", "#f", "?q=1#f"]),
)
def test_canonicalize_properties(scheme, www, host, port, path, tail):
    url = f"{scheme}://{'www.' if www else ''}{host or 'h'}{port}/{path}{tail}"
    got = canonicalize_url_array(pa.array([url]))[0].as_py()
    # idempotent
    again = canonicalize_url_array(pa.array([got]))[0].as_py()
    assert got == again
    # no fragment or query survives; scheme+host lowercased; no www.
    assert "#" not in got and "?" not in got
    head = got.split("://")[0]
    assert head == head.lower()
    assert "://www." not in got
    # default ports gone, nonstandard kept
    if port in (":80", ":443"):
        assert f"{port}/" not in got and not got.split("://")[1].split("/")[0].endswith(port)
    if port == ":8080":
        assert ":8080" in got


# --- chunk format: serialize/parse round trip over random corpora ---------

doc_token = st.text(alphabet="abcéxyz01", min_size=1, max_size=6)
stream_text = st.lists(doc_token, min_size=0, max_size=8).map(" ".join)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(0, 2**62), stream_text, stream_text),
        min_size=0,
        max_size=6,
        unique_by=lambda x: x[0],
    )
)
def test_chunk_bytes_parse_roundtrip(rows):
    import numpy as np

    from bitfunnel_ray.sources.chunks import chunk_bytes, parse_chunk_buffer

    ids = np.array([r[0] for r in rows], dtype=np.int64)
    cols = {0: [r[1] for r in rows], 2: [r[2] for r in rows]}
    docs = parse_chunk_buffer(chunk_bytes(ids, cols))
    assert len(docs) == len(rows)
    for (did, streams), (rid, body, title) in zip(docs, rows):
        assert did == rid
        assert streams.get(0, []) == body.split()
        assert streams.get(2, []) == title.split()
        # empty streams are omitted entirely, never emitted as empty
        for sid, toks in streams.items():
            assert toks, sid
