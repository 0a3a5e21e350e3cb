"""Ranking-quality evaluation harness: NDCG@k / recall@k / MRR.

The measurement surface every search engine ships next to its serving
path (reference analog: BitFunnel's verify machinery checks MATCH
correctness, tools/BitFunnel/src/Commands.cpp; this measures RANKING
quality against graded relevance).  Metrics are the standard public
definitions (Järvelin & Kekäläinen 2002 for (N)DCG, linear gain):

    DCG@k  = Σ_{i=1..k} rel_i / log2(i + 1)
    NDCG@k = DCG@k / IDCG@k    (IDCG over rel desc, doc_id asc)
    recall@k = |{top-k docs with rel > 0}| / min(k, |{rel > 0}|)
    MRR    = 1 / rank of the first rel > 0 result (0 if none)

`rank_eval` grades an engine's candidate ranking for each query against
a per-document relevance function computed from the index itself (tf of
a grade term over the query's match set) — deterministic and
SQL-reproducible, so the driver oracle can verify the whole harness.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bitfunnel_ray.query.parser import parse_query


def dcg(rels: np.ndarray) -> float:
    """Linear-gain DCG of an already-ranked relevance vector."""
    if len(rels) == 0:
        return 0.0
    ranks = np.arange(1, len(rels) + 1, dtype=np.float64)
    return float(np.sum(rels / np.log2(ranks + 1.0)))


def ndcg_at_k(cand_rels: np.ndarray, all_rels: np.ndarray, k: int) -> float:
    """NDCG@k: candidate relevances (ranked order) vs the ideal ordering
    of ``all_rels`` (rel desc; ties broken upstream by doc_id asc)."""
    ideal = np.sort(all_rels)[::-1][:k].astype(np.float64)
    idcg = dcg(ideal)
    return dcg(cand_rels[:k].astype(np.float64)) / idcg if idcg > 0 else 0.0


def rank_eval(
    engine,
    queries: dict[int, tuple[str, str]],
    k: int = 10,
) -> pa.Table:
    """For each ``query_id -> (query, grade_term)``: run the engine's
    top-k, grade every matching document by its tf of ``grade_term``
    (0 if absent), and emit (query_id, n_matches, ndcg, recall, mrr).

    The relevance read is two posting-list lookups per query against
    the already-loaded engine — no corpus scan."""
    rows = []
    for qid in sorted(queries):
        qtext, grade_term = queries[qid]
        node = parse_query(qtext, engine.stream_map)
        matches = engine.eval(node)  # uint64, ascending
        p = engine.term_postings(grade_term)
        rel = np.zeros(len(matches), np.int64)
        if p.df:
            pos = np.searchsorted(p.doc_ids, matches)
            pos = np.minimum(pos, len(p.doc_ids) - 1)
            hit = p.doc_ids[pos] == matches
            rel[hit] = p.tf[pos[hit]]
        cand = engine.search(qtext, k=k)
        cand_ids = cand["doc_id"].to_numpy().astype(np.uint64)
        cpos = np.searchsorted(matches, cand_ids)
        cand_rel = rel[cpos]  # candidates are always a subset of matches
        n_rel = int((rel > 0).sum())
        hits = cand_rel > 0
        recall = float(hits.sum() / min(k, n_rel)) if n_rel else 0.0
        mrr = float(1.0 / (int(np.argmax(hits)) + 1)) if hits.any() else 0.0
        rows.append(
            {
                "query_id": qid,
                "n_matches": len(matches),
                "ndcg": round(ndcg_at_k(cand_rel, rel, k), 6),
                "recall": round(recall, 6),
                "mrr": round(mrr, 6),
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("query_id", pa.int64()),
                ("n_matches", pa.int64()),
                ("ndcg", pa.float64()),
                ("recall", pa.float64()),
                ("mrr", pa.float64()),
            ]
        ),
    )
