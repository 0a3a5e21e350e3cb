"""Actor-pool query serving — the QueryRunner analog (reference:
src/Plan/src/QueryRunner.cpp:282-401: N threads round-robin a query log,
each with its own engine over shared read-only index state).

Ray Data shape: queries are a Dataset; ``map_batches(QueryActor,
concurrency=N)`` gives N actors that each load the segment dictionaries
ONCE in ``__init__`` (the ConfigureForServing analog,
src/Index/src/SimpleIndex.cpp:219-270) and then stream query batches.
Per-query failures become error rows, not job failures (the reference
swallows per-query exceptions too, QueryRunner.cpp:263-267).
"""

from __future__ import annotations

import time

import numpy as np
import pyarrow as pa
import ray.data

from bitfunnel_ray.query.engine import SearchEngine


def eval_queries(engine, qids, nodes, parse_errs, k: int, parse_s=None) -> pa.Table:
    """Evaluate parsed query nodes against an engine (local or sharded) and
    emit the serving result table.  ``nodes[i] is None`` means parse failure
    with message ``parse_errs[i]``.  Per-query failures become error rows,
    never job failures (the reference swallows per-query exceptions too,
    QueryRunner.cpp:263-267).

    Per-phase latency split — the QuerySummaryStatistics analog (reference:
    src/Plan/src/QueryRunner.cpp:67-92,353-378 separates parsing, planning
    and matching time per query):
      parse_s — text → AST (measured by the caller, passed in);
      plan_s  — resolving every (hash, gram) the query touches against
                storage (dict lookup + decode / shard-cache assembly);
      match_s — boolean set algebra over the resolved postings;
      score_s — BM25 accumulation + top-k selection.
    ``latency_s`` stays the independently-measured per-query wall time
    (parse excluded, as before); a pytest asserts plan+match+score ≈ it.
    """
    out_qid, out_rank, out_doc, out_score = [], [], [], []
    out_matches, out_lat, out_rows, out_err = [], [], [], []
    out_phase = {p: [] for p in ("parse_s", "plan_s", "match_s", "score_s")}
    if parse_s is None:
        parse_s = [0.0] * len(nodes)

    def rows_delta(base):
        return getattr(engine, "stat_postings_rows", 0) - base

    def emit(qid, t0, base, *, n, matches=None, scores=None, order=None,
             err="", phases=(0.0, 0.0, 0.0), pparse=0.0):
        m = max(n, 1)
        out_qid.append(np.full(m, qid, dtype=np.uint32))
        if n == 0:
            # marker/error row (rank 0) so the query still appears
            out_rank.append(np.array([0], dtype=np.uint32))
            out_doc.append(np.array([0], dtype=np.uint64))
            out_score.append(np.array([0.0]))
            out_matches.append(
                np.array([-1 if err else 0], dtype=np.int64)
            )
        else:
            out_rank.append(np.arange(1, n + 1, dtype=np.uint32))
            out_doc.append(matches[order])
            out_score.append(scores[order])
            out_matches.append(np.full(n, len(matches), dtype=np.int64))
        out_lat.append(np.full(m, time.perf_counter() - t0, dtype=np.float64))
        out_rows.append(np.full(m, rows_delta(base), dtype=np.int64))
        out_err.append([err] * m)
        out_phase["parse_s"].append(np.full(m, pparse, dtype=np.float64))
        for name, v in zip(("plan_s", "match_s", "score_s"), phases):
            out_phase[name].append(np.full(m, v, dtype=np.float64))

    for qid, node, perr, pparse in zip(qids, nodes, parse_errs, parse_s):
        t0 = time.perf_counter()
        base = getattr(engine, "stat_postings_rows", 0)
        if node is None:
            emit(qid, t0, base, n=0, err=perr or "ParseError", pparse=pparse)
            continue
        try:
            # PLAN: resolve every term the evaluation will touch (decode /
            # cache-fill); the postings-rows counter snapshots AFTER this
            # so postings_rows keeps its historical "rows touched by
            # eval+score" meaning
            for h, g in engine.query_pairs(node):
                engine.postings(h, g)
            t1 = time.perf_counter()
            base = getattr(engine, "stat_postings_rows", 0)
            matches = engine.eval(node)
            t2 = time.perf_counter()
            scores = engine.score(node, matches)
            order = np.lexsort((matches, -scores))[:k]
            t3 = time.perf_counter()
            emit(
                qid, t0, base,
                n=len(order), matches=matches, scores=scores, order=order,
                phases=(t1 - t0, t2 - t1, t3 - t2), pparse=pparse,
            )
        except Exception as e:  # per-query error row
            emit(qid, t0, base, n=0, err=f"{type(e).__name__}: {e}", pparse=pparse)
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_qid), pa.uint32()),
            "rank": pa.array(np.concatenate(out_rank), pa.uint32()),
            "doc_id": pa.array(np.concatenate(out_doc), pa.uint64()),
            "score": pa.array(np.concatenate(out_score), pa.float64()),
            "n_matches": pa.array(np.concatenate(out_matches), pa.int64()),
            "latency_s": pa.array(np.concatenate(out_lat), pa.float64()),
            "postings_rows": pa.array(np.concatenate(out_rows), pa.int64()),
            "parse_s": pa.array(np.concatenate(out_phase["parse_s"]), pa.float64()),
            "plan_s": pa.array(np.concatenate(out_phase["plan_s"]), pa.float64()),
            "match_s": pa.array(np.concatenate(out_phase["match_s"]), pa.float64()),
            "score_s": pa.array(np.concatenate(out_phase["score_s"]), pa.float64()),
            "error": pa.array([e for part in out_err for e in part], pa.string()),
        }
    )


class QueryActor:
    def __init__(self, index_dirs, k: int = 10, load_urls: bool = False):
        self.engine = SearchEngine(index_dirs, load_urls=load_urls)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_numpy(zero_copy_only=False)
        nodes, parse_errs, parse_s = [], [], []
        for q in batch["query"].to_pylist():
            t0 = time.perf_counter()
            try:
                nodes.append(self.engine._parse_rewritten(q))
                parse_errs.append(None)
            except Exception as e:
                nodes.append(None)
                parse_errs.append(f"{type(e).__name__}: {e}")
            parse_s.append(time.perf_counter() - t0)
        return eval_queries(self.engine, qids, nodes, parse_errs, self.k, parse_s)


def table_to_blocks(table: pa.Table, batch_size: int, concurrency: int):
    """One Arrow table → a Dataset of ~batch_size blocks, sliced
    driver-side (zero-copy, no cluster tasks).  Ray Data dispatches actor
    tasks at BLOCK granularity, so a single-block log would serialize
    through one pool actor; a repartition() stage instead can deadlock
    against the actor pool's CPU reservation on small clusters."""
    n = len(table)
    step = max(1, min(batch_size, (n + 2 * concurrency - 1) // (2 * concurrency)))
    return ray.data.from_arrow(
        [table.slice(i, step) for i in range(0, n, step)] or [table]
    )


def run_query_log(
    queries: "ray.data.Dataset | pa.Table",
    index_dirs,
    k: int = 10,
    concurrency: int = 4,
    batch_size: int = 64,
) -> "ray.data.Dataset":
    """Serve a query log through an actor pool → result Dataset."""
    if isinstance(queries, pa.Table):
        queries = table_to_blocks(queries, batch_size, concurrency)
    return queries.map_batches(
        QueryActor,
        fn_constructor_kwargs={"k": k, "index_dirs": index_dirs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def summarize(results: "ray.data.Dataset") -> dict:
    """QPS/latency stats — the QueryRunner::Statistics analog
    (QueryRunner.cpp:67-92)."""
    df = results.to_pandas()
    agg = {
        "latency_s": ("latency_s", "first"),
        "n_matches": ("n_matches", "first"),
        "error": ("error", "first"),
    }
    if "postings_rows" in df.columns:
        agg["postings_rows"] = ("postings_rows", "first")
    per_q = df.groupby("query_id").agg(**agg)
    lat = per_q["latency_s"].to_numpy()
    n_q = max(len(per_q), 1)
    out = {
        "n_queries": int(len(per_q)),
        "n_errors": int((per_q["error"] != "").sum()),
        "total_matches": int(per_q["n_matches"].clip(lower=0).sum()),
        # MPQ — matches per query, the reference's headline serving ratio
        # (QueryRunner.cpp:315-401 prints matches/query alongside QPS)
        "mpq": float(per_q["n_matches"].clip(lower=0).sum() / n_q),
        "p50_ms": float(np.percentile(lat, 50) * 1e3) if len(lat) else 0.0,
        "p99_ms": float(np.percentile(lat, 99) * 1e3) if len(lat) else 0.0,
        "mean_ms": float(lat.mean() * 1e3) if len(lat) else 0.0,
    }
    if "postings_rows" in per_q.columns:
        out["mean_postings_rows"] = float(per_q["postings_rows"].mean())
    # per-phase means (QuerySummaryStatistics analog: parse / plan / match /
    # score split, QueryRunner.cpp:67-92)
    for col in ("parse_s", "plan_s", "match_s", "score_s"):
        if col in df.columns:
            out[f"mean_{col[:-2]}_ms"] = float(
                df.groupby("query_id")[col].first().mean() * 1e3
            )
    return out
