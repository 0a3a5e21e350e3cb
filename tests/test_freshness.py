"""Recency-decay blended ranking (ops/freshness.py)."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from bitfunnel_ray.ops.freshness import candidate_timestamps, recency_blend


def _pages(ts_s, ids=None):
    if ids is None:
        ids = np.arange(len(ts_s))
    tbl = pa.table(
        {
            "doc_id": pa.array(np.asarray(ids, np.int64), pa.int64()),
            "warc_ts": pa.array(np.asarray(ts_s, np.int64), pa.timestamp("s")),
            "body": pa.array(["x"] * len(ts_s)),
        }
    )
    return ray.data.from_arrow(tbl)


def test_candidate_timestamps_only_requested_ids():
    pages = _pages([100, 200, 300, 400])
    got = candidate_timestamps(pages, np.array([1, 3]))
    assert got == {1: 200, 3: 400}


def test_recency_blend_half_life_exact():
    """A doc exactly one half-life old scores exactly half its BM25."""
    half_days = 30.0
    now = 10_000_000
    ages = np.array([0.0, half_days * 86400, 2 * half_days * 86400])
    pages = _pages((now - ages).astype(np.int64))
    results = pa.table(
        {
            "rank": pa.array([1, 2, 3], pa.int64()),
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "score": pa.array([1.0, 1.0, 1.0]),
        }
    )
    out = recency_blend(results, pages, now, half_life_days=half_days, k=3)
    assert out["blended"].to_pylist() == [1.0, 0.5, 0.25]
    assert out["doc_id"].to_pylist() == [0, 1, 2]
    assert out["age_days"].to_pylist() == [0.0, 30.0, 60.0]


def test_recency_blend_reorders_stale_winner():
    """Higher-BM25 but much older doc loses to a fresh lower-BM25 doc."""
    now = 10_000_000
    pages = _pages([now, now - 90 * 86400])  # doc0 fresh, doc1 90d old
    results = pa.table(
        {
            "rank": pa.array([1, 2], pa.int64()),
            "doc_id": pa.array([1, 0], pa.int64()),  # doc1 wins on BM25
            "score": pa.array([2.0, 1.5]),
        }
    )
    out = recency_blend(results, pages, now, half_life_days=30.0, k=2)
    assert out["doc_id"].to_pylist() == [0, 1]  # fresh doc promoted
    assert out["blended"].to_pylist()[0] == 1.5
    assert out["blended"].to_pylist()[1] == pytest.approx(2.0 * 2 ** -3.0, abs=1e-6)


def test_recency_blend_tiebreak_doc_id():
    now = 1000
    pages = _pages([now, now], ids=[5, 3])
    results = pa.table(
        {
            "rank": pa.array([1, 2], pa.int64()),
            "doc_id": pa.array([5, 3], pa.int64()),
            "score": pa.array([1.0, 1.0]),
        }
    )
    out = recency_blend(results, pages, now, k=2)
    assert out["doc_id"].to_pylist() == [3, 5]
