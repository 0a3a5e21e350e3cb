"""SemDeDup (ops/semdedup.py): cluster-scoped greedy cosine pruning."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bitfunnel_ray.ops.semdedup import semdedup, semdedup_table


def _ds(vecs, ids=None):
    vecs = np.asarray(vecs, np.float64)
    ids = np.arange(len(vecs)) if ids is None else np.asarray(ids)
    return rd.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "embedding": pa.array([list(map(float, v)) for v in vecs]),
            }
        )
    )


def _two_blobs(n_per=20, dim=8, seed=7):
    """Two well-separated blobs; ANY 2-means run separates them.  Noise
    is large enough that distinct members stay below cos 0.999 (ensured
    by the assertion) while exact copies hit 1.0."""
    rng = np.random.default_rng(seed)
    a = rng.normal(0, 0.05, (n_per, dim)) + np.eye(dim)[0]
    b = rng.normal(0, 0.05, (n_per, dim)) + np.eye(dim)[1]
    for blob in (a, b):
        u = blob / np.linalg.norm(blob, axis=1, keepdims=True)
        g = u @ u.T
        np.fill_diagonal(g, 0.0)
        assert g.max() < 0.999
    return np.vstack([a, b])


def test_exact_duplicates_dropped_keep_min_id():
    base = _two_blobs()
    vecs = np.vstack([base, base[3], base[25]])  # ids 40, 41 are exact dups
    t = semdedup_table(_ds(vecs), n_clusters=2, threshold=0.999)
    drops = {r["vec_id"]: r["dup_of"] for r in t.to_pylist() if r["vec_id"] >= 0}
    assert drops[40] == 3 and drops[41] == 25
    for r in t.to_pylist():
        if r["vec_id"] >= 0:
            assert r["cos"] >= 0.999


def test_greedy_keeps_one_per_duplicate_set():
    """Five copies of one vector: the min id survives, four drop, and
    every drop points at the surviving representative."""
    v = np.eye(4)[0]
    vecs = np.vstack([np.tile(v, (5, 1)), np.eye(4)[1], np.eye(4)[2]])
    t = semdedup_table(_ds(vecs), n_clusters=2, threshold=0.99)
    rows = [r for r in t.to_pylist() if r["vec_id"] >= 0]
    assert sorted(r["vec_id"] for r in rows) == [1, 2, 3, 4]
    assert all(r["dup_of"] == 0 for r in rows)


def test_threshold_respected():
    """cos(a,b)=0.9 pair: dropped at thr 0.85, kept at thr 0.95."""
    a = np.array([1.0, 0.0])
    th = np.arccos(0.9)
    b = np.array([np.cos(th), np.sin(th)])
    vecs = np.vstack([a, b, -a])  # -a keeps the cluster from collapsing
    loose = semdedup_table(_ds(vecs), n_clusters=1, threshold=0.85)
    tight = semdedup_table(_ds(vecs), n_clusters=1, threshold=0.95)
    assert [r["vec_id"] for r in loose.to_pylist() if r["vec_id"] >= 0] == [1]
    assert [r["vec_id"] for r in tight.to_pylist() if r["vec_id"] >= 0] == []


def test_max_cluster_truncation_reported():
    v = np.eye(3)[0]
    vecs = np.tile(v, (10, 1))
    t = semdedup_table(_ds(vecs), n_clusters=1, threshold=0.99, max_cluster=4)
    reports = [r for r in t.to_pylist() if r["vec_id"] == -1]
    assert len(reports) == 1 and reports[0]["dup_of"] == 6  # 10 - 4 skipped
    drops = [r for r in t.to_pylist() if r["vec_id"] >= 0]
    assert len(drops) == 3  # within the first 4 members, 3 dup the min id


def test_fixture_embeddings_runs(ray_session):
    ds = rd.read_parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = semdedup_table(ds, n_clusters=8, threshold=0.99).to_pandas()
    # drops (if any) are never self-referential and each id drops once
    real = out[out.vec_id >= 0]
    assert (real.vec_id != real.dup_of).all()
    assert real.vec_id.is_unique
    # looser threshold can only drop MORE
    loose = semdedup_table(ds, n_clusters=8, threshold=0.8).to_pandas()
    assert len(loose[loose.vec_id >= 0]) >= len(real)
