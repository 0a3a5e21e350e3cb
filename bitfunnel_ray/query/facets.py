"""Facet counts — per-metadata-value match counts for a boolean query
(the "search + analytics" serving feature: result counts by language,
source, date bucket, ... next to the result list).

Reference analog: none in-tree (BitFunnel emits match counts only,
QueryRunner.cpp); facets are the standard aggregation bolted onto any
production search front end.

Scale shape: the matched doc_id set is broadcast once via ``ray.put``
and each metadata batch self-filters with a vectorized ``np.isin``, then
reduces to AT MOST one row per facet value per block (map-side partial
counts — the same combine-before-exchange shape as the df-table stage);
the driver merges partials over facet-cardinality rows, never documents.
For match sets too large for the object store the scale path is a hash
semi-join on doc_id (the exchange ``ngram_jaccard_pairs`` uses); the
broadcast form is right whenever matches fit one worker heap, which
covers interactive queries.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from bitfunnel_ray.query.parser import parse_query


def facet_counts(
    engine,
    meta: "ray.data.Dataset",
    query: str,
    facet_cols: tuple[str, ...] = ("lang", "source"),
) -> pa.Table:
    """Counts of matching documents per facet-value combination.
    ``meta`` is any dataset with ``doc_id`` plus the facet columns
    (read it with ``columns=["doc_id", *facet_cols]`` — never the text).
    Returns (*facet_cols, n_docs) sorted by the facet columns."""
    node = parse_query(query, engine.stream_map)
    match = np.sort(engine.eval(node).astype(np.int64))
    return facet_counts_for_matches(match, meta, facet_cols)


def facet_counts_for_matches(
    match: np.ndarray,
    meta: "ray.data.Dataset",
    facet_cols: tuple[str, ...] = ("lang", "source"),
) -> pa.Table:
    """``facet_counts`` over a precomputed SORTED match-id array — the
    shared reduce both serving fronts use (the doc-sharded front gathers
    per-shard match ids first; the local engine evals in-process)."""
    match_ref = ray.put(np.asarray(match, dtype=np.int64))
    cols = list(facet_cols)

    def partial(t: pa.Table) -> pa.Table:
        ids = ray.get(match_ref) if isinstance(match_ref, ray.ObjectRef) else match_ref
        d = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(d, ids)
        sub = t.select(cols).filter(pa.array(keep))
        return sub.group_by(cols).aggregate([([], "count_all")])

    parts = meta.select_columns(["doc_id", *cols]).map_batches(
        partial, batch_format="pyarrow"
    )
    tables = [x for x in ray.get(parts.to_arrow_refs()) if len(x)]
    if not tables:
        return pa.table(
            {**{c: pa.array([], pa.string()) for c in cols},
             "n_docs": pa.array([], pa.int64())}
        )
    merged = pa.concat_tables(tables)  # ≤ cardinality × n_blocks rows
    out = merged.group_by(cols).aggregate([("count_all", "sum")])
    out = out.rename_columns([*cols, "n_docs"])
    return out.set_column(
        len(cols), "n_docs", out["n_docs"].cast(pa.int64())
    ).sort_by([(c, "ascending") for c in cols])
