"""PFor codec (functions/pfor.py) + codec treatment bands."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_ray.functions import varint
from bitfunnel_ray.functions.pfor import decode_pfor, encode_pfor


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 63) - 1), max_size=400)
)
@settings(max_examples=60, deadline=None)
def test_pfor_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    assert np.array_equal(decode_pfor(encode_pfor(v), len(v)), v)


def test_pfor_outlier_patching():
    """One huge delta must not inflate the whole block (that's the point
    of the patched exception scheme)."""
    rng = np.random.default_rng(11)
    small = rng.integers(1, 8, 128).astype(np.uint64)
    spiked = small.copy()
    spiked[57] = np.uint64(1 << 40)
    assert len(encode_pfor(spiked)) < len(encode_pfor(small)) + 12
    assert np.array_equal(decode_pfor(encode_pfor(spiked), 128), spiked)


def test_pfor_beats_varint_on_dense_deltas():
    rng = np.random.default_rng(12)
    ids = np.sort(rng.choice(100_000, 20_000, replace=False)).astype(np.uint64)
    deltas = np.diff(ids, prepend=ids[:1])
    deltas[0] = ids[0]
    assert len(encode_pfor(deltas)) < 0.75 * len(varint.encode(deltas))


def test_codec_band_build_identical_results(tmp_path, ray_session):
    """pfor-coded head band must change bytes, never results/scores."""
    import ray.data as rd

    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.query.engine import SearchEngine
    from bitfunnel_ray.sources.corpus import corpus_from_documents

    sf = "/root/testdata/sf0.001"
    flat_dir, pfor_dir = str(tmp_path / "flat"), str(tmp_path / "pfor")
    build_index(
        corpus_from_documents(sf), flat_dir, EngineConfig(max_gram=2, num_buckets=4)
    )
    cfg = EngineConfig(
        max_gram=2,
        num_buckets=4,
        treatment_bands=((64, 128), (None, 128, "pfor")),
    )
    build_index(corpus_from_documents(sf), pfor_dir, cfg)
    a = SearchEngine(flat_dir, load_urls=False)
    b = SearchEngine(pfor_dir, load_urls=False)
    for q in ["table join", "merge | window", "table -join", '"batch batch"', "-table"]:
        ra, rb = a.search(q, k=10).to_pandas(), b.search(q, k=10).to_pandas()
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist(), q
        assert np.allclose(ra["score"], rb["score"]), q
    # the head band actually used pfor and saved bytes on docs payloads
    import glob

    import pyarrow.parquet as pq

    def stats(d):
        codecs, docs_bytes = [], 0
        for f in glob.glob(f"{d}/dict-*.parquet"):
            t = pq.read_table(f)
            if "codec" in t.column_names:
                codecs.extend(t["codec"].to_pylist())
            docs_bytes += sum(len(x) for x in t["docs_payload"].to_pylist())
        return codecs, docs_bytes

    codecs, pfor_bytes = stats(pfor_dir)
    _, flat_bytes = stats(flat_dir)
    assert 1 in codecs and 0 in codecs  # both bands present
    assert pfor_bytes < flat_bytes


def test_codec_band_merge_identity(tmp_path, ray_session):
    """Merging pfor-banded segments == fresh pfor-banded build."""
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.build.merge import merge_segments
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.sources.corpus import _lift_documents_batch, corpus_from_documents

    sf = "/root/testdata/sf0.001"
    docs = pq.read_table(f"{sf}/documents.parquet")
    cfg = EngineConfig(
        max_gram=2,
        num_buckets=4,
        treatment_bands=((64, 128), (None, 128, "pfor")),
    )
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))), s1, cfg)
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(250))), s2, cfg)
    full, merged = str(tmp_path / "full"), str(tmp_path / "merged")
    build_index(corpus_from_documents(sf), full, cfg)
    merge_segments([s1, s2], merged)
    for f in sorted(glob.glob(os.path.join(full, "dict-*.parquet"))):
        name = os.path.basename(f)
        assert pq.read_table(f).equals(
            pq.read_table(os.path.join(merged, name))
        ), name
