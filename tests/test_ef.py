"""Elias–Fano codec (functions/ef.py) + ef treatment band."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from bitfunnel_ray.functions import varint
from bitfunnel_ray.functions.ef import byte_length_ef, decode_ef, encode_ef


@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 40) - 1), max_size=400)
)
@settings(max_examples=60, deadline=None)
def test_ef_roundtrip_property(vals):
    v = np.array(vals, dtype=np.uint64)
    got = decode_ef(encode_ef(v), len(v))
    assert np.array_equal(got, v)
    assert byte_length_ef(v) >= len(encode_ef(v))


def test_ef_extreme_universe():
    # one value near 2^63: l selection must not overflow or float-drift
    for first in (0, 1, (1 << 62) + 12345):
        v = np.array([first, 3, 1, 0, 7], dtype=np.uint64)
        assert np.array_equal(decode_ef(encode_ef(v), len(v)), v)
    assert len(decode_ef(encode_ef(np.empty(0, np.uint64)), 0)) == 0


def test_ef_near_optimal_on_dense_lists():
    """Dense posting lists (the head band) approach 2 + log2(u/n) bits
    per posting — well under varint's 8-bit floor."""
    rng = np.random.default_rng(5)
    ids = np.sort(rng.choice(1_000_000, 400_000, replace=False)).astype(np.uint64)
    deltas = np.diff(ids, prepend=ids[:1])
    deltas[0] = ids[0]
    n, u = len(ids), int(ids[-1]) + 1
    bits_per = 8 * len(encode_ef(deltas)) / n
    assert bits_per < 2.3 + np.log2(u / n)  # EF bound + header slack
    assert len(encode_ef(deltas)) < 0.6 * len(varint.encode(deltas))


def test_ef_band_build_identical_results(tmp_path, ray_session):
    """ef-coded head band must change bytes, never results/scores."""
    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.query.engine import SearchEngine
    from bitfunnel_ray.sources.corpus import corpus_from_documents

    sf = "/root/testdata/sf0.001"
    flat_dir, ef_dir = str(tmp_path / "flat"), str(tmp_path / "ef")
    build_index(
        corpus_from_documents(sf), flat_dir, EngineConfig(max_gram=2, num_buckets=4)
    )
    cfg = EngineConfig(
        max_gram=2,
        num_buckets=4,
        treatment_bands=((64, 128), (None, 128, "ef")),
    )
    build_index(corpus_from_documents(sf), ef_dir, cfg)
    a = SearchEngine(flat_dir, load_urls=False)
    b = SearchEngine(ef_dir, load_urls=False)
    for q in ["table join", "merge | window", "table -join", '"batch batch"', "-table"]:
        ra, rb = a.search(q, k=10).to_pandas(), b.search(q, k=10).to_pandas()
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist(), q
        assert np.allclose(ra["score"], rb["score"]), q
    # the head band really used the ef codec
    import glob

    import pyarrow.parquet as pq

    codecs = set()
    for f in glob.glob(f"{ef_dir}/dict-*.parquet"):
        t = pq.read_table(f)
        if "codec" in t.column_names:
            codecs.update(np.unique(t["codec"].to_numpy(zero_copy_only=False)).tolist())
    assert 2 in codecs  # CODEC_EF
