"""Serve-time facet aggregations over doc-values fast fields.

The Elasticsearch ``date_histogram`` / ``stats`` aggregation shapes: a
query's match set, bucketed or summarized by a numeric docmeta column
(``engine.docvalues_for`` — one cached columnar read locally, a
scatter-gather over per-shard docmeta stripes when sharded).  Everything
here is O(matches) numpy on top of the boolean engine; the corpus is
never rescanned.  Works on any ``QueryAlgebra`` engine (local or
sharded) — the reference has no aggregation layer (its surface stops at
match/score, src/Plan/src/QueryRunner.cpp), so this is part of the
beyond-reference serving API.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bitfunnel_ray.query.parser import parse_query


def date_histogram(
    engine,
    query: str,
    interval_s: int = 86400,
    col: str = "warc_ts_s",
    origin_s: int = 0,
) -> pa.Table:
    """Match-count per fixed time bucket (the ES date_histogram
    contract): bucket_start = origin + floor((v - origin)/interval) *
    interval, ascending; empty buckets are omitted; docs with a null
    value are excluded, as in ES."""
    node = parse_query(query, engine.stream_map)
    matches = engine.eval(node)
    v = engine.docvalues_for(matches, col)
    v = v[~np.isnan(v)]
    if not len(v):
        return pa.table(
            {"bucket_start_s": pa.array([], pa.int64()), "n_docs": pa.array([], pa.int64())}
        )
    b = origin_s + np.floor((v - origin_s) / interval_s).astype(np.int64) * interval_s
    starts, counts = np.unique(b, return_counts=True)
    return pa.table(
        {
            "bucket_start_s": pa.array(starts, pa.int64()),
            "n_docs": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def field_percentiles(
    engine,
    query: str,
    col: str = "warc_ts_s",
    qs: "tuple[float, ...]" = (0.25, 0.5, 0.75),
) -> pa.Table:
    """Exact linear-interpolation percentiles of a doc-values column over
    the match set (the ES ``percentiles`` aggregation, exact because the
    match set is already serve-local; numpy 'linear' == SQL
    ``quantile_cont``); nulls excluded."""
    node = parse_query(query, engine.stream_map)
    matches = engine.eval(node)
    v = engine.docvalues_for(matches, col)
    v = v[~np.isnan(v)]
    out = (
        np.quantile(v, qs, method="linear")
        if len(v)
        else np.full(len(qs), np.nan)
    )
    return pa.table(
        {
            "q": pa.array(np.asarray(qs, np.float64), pa.float64()),
            "value": pa.array(out, pa.float64()),
        }
    )


def field_stats(engine, query: str, col: str = "warc_ts_s") -> pa.Table:
    """min/max/avg/count of a doc-values column over the match set (the
    ES ``stats`` aggregation); nulls excluded from all four."""
    node = parse_query(query, engine.stream_map)
    matches = engine.eval(node)
    v = engine.docvalues_for(matches, col)
    v = v[~np.isnan(v)]
    n = int(len(v))
    return pa.table(
        {
            "n_docs": pa.array([n], pa.int64()),
            "min_v": pa.array([float(v.min()) if n else None], pa.float64()),
            "max_v": pa.array([float(v.max()) if n else None], pa.float64()),
            "avg_v": pa.array([float(v.mean()) if n else None], pa.float64()),
        }
    )
