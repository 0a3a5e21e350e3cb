"""Unit tests for the corpus-grep ops (substring/regex scan), the n-gram
frequency table, and the exact cosine-threshold self-join — each against
a brute-force in-process oracle."""

import collections
import itertools
import os
import re

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bitfunnel_ray.ops.ann import exact_dup_pairs
from bitfunnel_ray.ops.ngrams import ngram_counts, top_ngrams
from bitfunnel_ray.ops.scan import regex_scan, substring_scan

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick quick fox",
    "",
    "dog",
    "a b a b a b",
    "zz zz zz zz",
]


def _docs():
    return rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(TEXTS))), pa.int64()),
                "text": pa.array(TEXTS),
            }
        )
    )


def test_substring_scan_counts():
    got = dict(
        zip(*[substring_scan(_docs(), "quick").to_pandas()[c] for c in ("doc_id", "n_hits")])
    )
    want = {i: t.count("quick") for i, t in enumerate(TEXTS) if "quick" in t}
    assert got == want


def test_regex_scan_counts():
    got = dict(
        zip(*[regex_scan(_docs(), "[a-z]+o[a-z]+").to_pandas()[c] for c in ("doc_id", "n_hits")])
    )
    want = {
        i: len(re.findall("[a-z]+o[a-z]+", t))
        for i, t in enumerate(TEXTS)
        if re.findall("[a-z]+o[a-z]+", t)
    }
    assert got == want


@pytest.mark.parametrize("n", [1, 2, 3])
def test_ngram_counts_vs_brute(n):
    got = ngram_counts(_docs(), n).to_pandas()
    want = collections.Counter()
    for t in TEXTS:
        toks = t.split()
        for i in range(len(toks) - n + 1):
            want[" ".join(toks[i : i + n])] += 1
    assert dict(zip(got["gram"], got["count"])) == dict(want)


def test_top_ngrams_order_and_ties():
    top = top_ngrams(_docs(), n=2, k=3)
    grams = top["gram"].to_pylist()
    counts = top["count"].to_pylist()
    # 'a b' x3, 'zz zz' x3, then 'b a' x2 — count desc, gram asc on ties
    assert list(zip(grams, counts)) == [("a b", 3), ("zz zz", 3), ("b a", 2)]


def test_pmi_collocations_vs_brute():
    import math

    from bitfunnel_ray.ops.ngrams import pmi_collocations

    got = pmi_collocations(_docs(), min_count=2, k=10)
    uni, big = collections.Counter(), collections.Counter()
    for t in TEXTS:
        toks = t.split()
        uni.update(toks)
        big.update(
            " ".join(toks[i : i + 2]) for i in range(len(toks) - 1)
        )
    n1, n2 = sum(uni.values()), sum(big.values())
    want = []
    for g, c in big.items():
        if c < 2:
            continue
        a, b = g.split()
        want.append(
            (g, c, math.log((c / n2) / ((uni[a] / n1) * (uni[b] / n1))))
        )
    want.sort(key=lambda r: (-r[2], r[0]))
    want = want[:10]
    assert got["gram"].to_pylist() == [g for g, _, _ in want]
    assert got["pair_count"].to_pylist() == [c for _, c, _ in want]
    np.testing.assert_allclose(
        got["pmi"].to_numpy(), [p for _, _, p in want], rtol=1e-12
    )


def test_exact_dup_pairs_multi_rowgroup(tmp_path):
    rng = np.random.default_rng(7)
    n, dim = 300, 16
    vecs = rng.normal(size=(n, dim)).astype(np.float32)
    # plant near-duplicates across row-group boundaries
    vecs[250] = vecs[10] + rng.normal(scale=1e-3, size=dim).astype(np.float32)
    vecs[299] = vecs[0]
    path = os.path.join(tmp_path, "emb.parquet")
    pq.write_table(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            }
        ),
        path,
        row_group_size=64,  # 5 row groups -> 15 block-pair tasks
    )
    thr = 0.8
    got = exact_dup_pairs(path, threshold=thr, concurrency=2).to_pandas()
    got_set = {
        (a, b, c) for a, b, c in zip(got["id_a"], got["id_b"], got["cosine"])
    }
    unit = vecs.astype(np.float64)
    unit /= np.maximum(np.linalg.norm(unit, axis=1, keepdims=True), 1e-12)
    sims = np.round(unit @ unit.T, 5)
    want_set = {
        (i, j, sims[i, j])
        for i, j in itertools.combinations(range(n), 2)
        if sims[i, j] >= thr
    }
    assert (0, 299, 1.0) in want_set and (10, 250) in {(a, b) for a, b, _ in want_set}
    assert got_set == want_set


def test_proximity_search_vs_brute():
    from bitfunnel_ray.ops.proximity import proximity_search

    texts = [
        "a x x x b",          # gap 4
        "b a",                # gap 1
        "a x b x a",          # gaps 2 and 2 -> 2
        "a a a",              # no b
        "b only here",        # no a
        "x a b x a x x x b",  # min gap 1
        "",
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    for w in (0, 1, 2, 4):
        got = proximity_search(docs, "a", "b", w).to_pandas()
        got_map = (
            dict(zip(got["doc_id"], got["min_gap"])) if len(got) else {}
        )
        want = {}
        for i, t in enumerate(texts):
            toks = t.split()
            pa_pos = [j for j, x in enumerate(toks) if x == "a"]
            pb_pos = [j for j, x in enumerate(toks) if x == "b"]
            if pa_pos and pb_pos:
                g = min(abs(p - q) for p in pa_pos for q in pb_pos)
                if g <= w:
                    want[i] = g
        assert got_map == want, f"window={w}"


def test_proximity_same_term():
    from bitfunnel_ray.ops.proximity import proximity_search

    docs = rd.from_arrow(
        pa.table({"doc_id": pa.array([0], pa.int64()), "text": pa.array(["a x a"])})
    )
    got = proximity_search(docs, "a", "a", 10).to_pandas()
    # nearest 'a' to an 'a' occurrence is itself -> min_gap 0 by convention
    assert got["min_gap"].tolist() == [0]


def test_url_canonicalize_cases():
    from bitfunnel_ray.ops.urls import canonicalize_url_array

    cases = {
        "https://www.Example.org:443/A/B/?q=1#f": "https://example.org/A/B",
        "HTTP://HOST.COM:80/Path": "http://host.com/Path",
        "https://example.org/": "https://example.org",
        "https://example.org": "https://example.org",
        "ftp://Files.example.org/pub/": "ftp://files.example.org/pub",
        "relative/path#frag": "relative/path#frag"[:13],  # no head -> stripped only
        "": "",
    }
    got = canonicalize_url_array(pa.array(list(cases))).to_pylist()
    assert got == list(cases.values())


def test_url_dedup_min_id():
    from bitfunnel_ray.ops.urls import url_dedup

    ds = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([5, 3, 9, 7], pa.int64()),
                "url": pa.array(
                    [
                        "https://www.a.com/x?utm=1",
                        "https://a.com/x/",
                        "https://b.com/y",
                        "HTTPS://A.COM/x",
                    ]
                ),
            }
        )
    )
    got = url_dedup(ds).to_pandas().sort_values("canon_url").reset_index(drop=True)
    assert got["canon_url"].tolist() == ["https://a.com/x", "https://b.com/y"]
    assert got["doc_id"].tolist() == [3, 9]


def test_heavy_hitters_mg_guarantees():
    from bitfunnel_ray.ops.sketch import heavy_hitters

    # skewed corpus: token t{i} appears ~1000/(i+1) times, shuffled
    # deterministically across many small docs
    rng = np.random.default_rng(11)
    stream = []
    for i in range(200):
        stream += [f"t{i}"] * (1000 // (i + 1))
    stream = list(rng.permutation(stream))
    texts = [" ".join(stream[i : i + 23]) for i in range(0, len(stream), 23)]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
            }
        )
    ).repartition(8)
    true = collections.Counter(stream)
    k = 32
    tbl, err = heavy_hitters(docs, k=k)
    got = dict(zip(tbl["term"].to_pylist(), tbl["count_lower"].to_pylist()))
    assert len(got) <= k and err >= 0
    for term, c in got.items():
        assert c <= true[term] <= c + err, (term, c, true[term], err)
    # any token with true count > err must be present
    for term, c in true.items():
        if c > err:
            assert term in got, (term, c, err)


def test_corpus_diff_statuses():
    from bitfunnel_ray.ops.diffstats import corpus_diff

    old = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                "text": pa.array(["a", "b", "c", "d"]),
            }
        )
    )
    new = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([2, 3, 5], pa.int64()),
                "text": pa.array(["b", "c CHANGED", "e"]),
            }
        )
    )
    got = corpus_diff(old, new).to_pandas()
    m = dict(zip(got["doc_id"], got["status"]))
    assert m == {1: "removed", 3: "changed", 4: "removed", 5: "added"}


def test_exact_phrase_search_vs_brute():
    from bitfunnel_ray.ops.proximity import exact_phrase_search

    texts = [
        "x a b c y",      # match
        "c b a",          # reversed: co-occurrence would match, order must not
        "a b x c",        # scattered: no adjacency
        "a b c a b c",    # two matches
        "a b",            # prefix only
        "b c",            # suffix only
        "",
    ]
    # phrase spanning a doc boundary must NOT match: "... a b" | "c ..."
    texts += ["z z a b", "c z z"]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    got = sorted(exact_phrase_search(docs, ["a", "b", "c"]).to_pandas()["doc_id"])
    want = [
        i
        for i, t in enumerate(texts)
        if " a b c " in f" {t} "
    ]
    assert got == want == [0, 3]


def test_exact_phrase_overlapping_self():
    from bitfunnel_ray.ops.proximity import exact_phrase_search

    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1], pa.int64()),
                "text": pa.array(["a a a", "a x a"]),
            }
        )
    )
    got = sorted(exact_phrase_search(docs, ["a", "a"]).to_pandas()["doc_id"])
    assert got == [0]


def test_exact_phrase_property_random():
    """Random small-vocab docs vs a brute-force python oracle (ordered
    adjacency over whitespace tokens), including k=3 phrases with
    repeated terms."""
    import numpy as np

    from bitfunnel_ray.ops.proximity import exact_phrase_search

    rng = np.random.default_rng(7)
    vocab = ["a", "b", "c"]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(0, 12)))
        for _ in range(200)
    ]
    docs = rd.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(list(range(len(texts))), pa.int64()),
                "text": pa.array(texts),
            }
        )
    )
    for phrase in (["a", "b"], ["b", "b"], ["a", "b", "a"], ["c", "c", "c"]):
        got = sorted(exact_phrase_search(docs, phrase).to_pandas()["doc_id"])
        pat = " " + " ".join(phrase) + " "
        want = [i for i, t in enumerate(texts) if pat in f" {t} "]
        assert got == want, phrase


def test_term_vectors_positions():
    from bitfunnel_ray.ops.scan import term_vectors

    got = term_vectors(_docs(), lambda ids: ids >= 0).to_pandas()
    rows = {
        (r.doc_id, r.term): (r.tf, r.first_pos) for r in got.itertuples()
    }
    want = {}
    for i, t in enumerate(TEXTS):
        toks = t.split()
        for pos, w in enumerate(toks):
            if (i, w) not in want:
                want[(i, w)] = [0, pos]
            want[(i, w)][0] += 1
    assert rows == {k: tuple(v) for k, v in want.items()}
    # empty doc contributes nothing
    assert 2 not in set(got.doc_id)


def test_span_near_brute_force_and_indexed(ray_session, tmp_path):
    """Ordered span-near (ops/proximity.py span_near_search) vs an
    itertools brute force, incl. repeated terms; the indexed variant
    (boolean-AND candidate pre-filter) must return identical rows."""
    import itertools
    import random

    import pyarrow as pa
    import ray.data as rd

    from bitfunnel_ray.ops.proximity import span_near_search

    def brute(docs, terms, slop):
        out = {}
        for did, text in docs:
            toks = text.split()
            occ = [[i for i, w in enumerate(toks) if w == t] for t in terms]
            best = None
            for combo in itertools.product(*occ):
                if all(x < y for x, y in zip(combo, combo[1:])):
                    s = combo[-1] - combo[0] - (len(terms) - 1)
                    if s <= slop and (best is None or s < best):
                        best = s
            if best is not None:
                out[did] = best
        return out

    rng = random.Random(9)
    docs = [(i, " ".join(rng.choice("abcd") for _ in range(rng.randint(0, 25))))
            for i in range(80)]
    ds = rd.from_arrow(
        pa.table({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]})
    )
    for terms, slop in [(["a", "b"], 2), (["a", "b", "c"], 5), (["b", "b"], 3),
                        (["a", "c", "b", "d"], 10)]:
        want = brute(docs, terms, slop)
        got = {r["doc_id"]: r["min_slop"]
               for r in span_near_search(ds, terms, slop).to_pandas().to_dict("records")}
        assert got == want, (terms, slop)

    # indexed == scan on the real corpus
    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.query.engine import SearchEngine
    from bitfunnel_ray.sources.corpus import corpus_from_documents

    sf = "/root/testdata/sf0.001"
    out = str(tmp_path / "seg")
    build_index(corpus_from_documents(sf), out, EngineConfig(max_gram=1, num_buckets=2))
    eng = SearchEngine(out, load_urls=False)
    corpus = rd.read_parquet(f"{sf}/documents.parquet", columns=["doc_id", "text"])
    plain = span_near_search(corpus, ["table", "join", "row"], 12).to_pandas()
    accel = span_near_search(corpus, ["table", "join", "row"], 12, engine=eng).to_pandas()
    key = lambda df: df.sort_values("doc_id").reset_index(drop=True)
    assert key(plain).equals(key(accel))
    assert len(plain) > 0


def test_all_terms_window_brute_force(ray_session):
    """Unordered k-term window vs a sliding-window brute force."""
    import random

    import pyarrow as pa
    import ray.data as rd

    from bitfunnel_ray.ops.proximity import all_terms_window

    def brute(docs, terms, window):
        out = {}
        for did, text in docs:
            toks = text.split()
            best = None
            for i in range(len(toks)):
                for j in range(i, min(len(toks), i + window)):
                    span = set(toks[i : j + 1])
                    if all(t in span for t in terms):
                        w = j - i + 1
                        if best is None or w < best:
                            best = w
                        break
            if best is not None:
                out[did] = best
        return out

    rng = random.Random(4)
    docs = [(i, " ".join(rng.choice("abcde") for _ in range(rng.randint(0, 30))))
            for i in range(100)]
    ds = rd.from_arrow(
        pa.table({"doc_id": [d for d, _ in docs], "text": [t for _, t in docs]})
    )
    for terms, window in [(["a", "b"], 3), (["a", "b", "c"], 6),
                          (["a", "b", "c", "d"], 12), (["e", "a"], 2)]:
        want = brute(docs, terms, window)
        got = {r["doc_id"]: r["min_window"]
               for r in all_terms_window(ds, terms, window).to_pandas().to_dict("records")}
        assert got == want, (terms, window)
    import pytest

    with pytest.raises(ValueError, match="distinct"):
        all_terms_window(ds, ["a", "a"], 3)
