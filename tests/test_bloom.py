"""Bloom filter (functions/bloom.py) + bloom-gated anti-join."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data as rd

from bitfunnel_ray.functions.bloom import BloomFilter, bloom_from_dataset
from bitfunnel_ray.ops.joins import anti_join, anti_join_bloom


def test_no_false_negatives_and_fpr():
    rng = np.random.default_rng(0)
    keys = rng.integers(0, 1 << 63, 50_000, dtype=np.int64).astype(np.uint64)
    b = BloomFilter(len(keys), fpr=0.01)
    b.add_many(keys)
    assert b.contains_many(keys).all()  # zero false negatives, always
    probe = rng.integers(0, 1 << 63, 100_000, dtype=np.int64).astype(np.uint64)
    probe = probe[~np.isin(probe, keys)]
    fpr = b.contains_many(probe).mean()
    assert fpr < 0.02, fpr  # within 2x of the 1% target
    # size: ~1.2 bytes/key at 1% — the broadcast-compression claim
    assert b.nbytes < 2.0 * len(keys)


def test_merge_is_union():
    rng = np.random.default_rng(1)
    a_keys = rng.integers(0, 1 << 62, 1000, dtype=np.int64).astype(np.uint64)
    b_keys = rng.integers(0, 1 << 62, 1000, dtype=np.int64).astype(np.uint64)
    a = BloomFilter(2000, 0.01)
    b = BloomFilter(2000, 0.01)
    a.add_many(a_keys)
    b.add_many(b_keys)
    a.merge(b)
    assert a.contains_many(np.concatenate([a_keys, b_keys])).all()
    with pytest.raises(ValueError):
        a.merge(BloomFilter(99, 0.5))


def test_distributed_build_and_bloom_anti_join(ray_session):
    rng = np.random.default_rng(2)
    big_keys = rng.integers(0, 1 << 40, 20_000, dtype=np.int64)
    blocked = np.unique(rng.choice(big_keys, 3_000, replace=False))
    big = rd.from_arrow(
        pa.table({"doc_id": big_keys, "payload": np.arange(len(big_keys))})
    )
    bl = rd.from_arrow(pa.table({"doc_id": blocked}))

    bloom = bloom_from_dataset(bl, "doc_id", n_keys=len(blocked), fpr=0.01)
    assert bloom.contains_many(blocked.astype(np.uint64)).all()

    got = (
        anti_join_bloom(big, bl, key="doc_id", n_keys=len(blocked), fpr=0.01)
        .to_pandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    want = (
        anti_join(big, bl, key="doc_id", broadcast=False)
        .to_pandas()
        .sort_values("payload")
        .reset_index(drop=True)
    )
    assert got.equals(want)
    assert not np.isin(got["doc_id"].to_numpy(), blocked).any()
    assert len(got) == (~np.isin(big_keys, blocked)).sum()
