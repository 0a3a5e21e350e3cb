"""Pseudo-relevance feedback (RM3-lite) query expansion.

Classic IR loop (Lavrenko & Croft 2001 relevance models; Abdul-Jaleel
et al. 2004 RM3): run the query, treat the top ``k_docs`` results as
relevant, mine their most frequent terms, and re-run the query widened
by the top ``n_terms`` expansion terms.

Simplifications (documented, deterministic, SQL-reproducible):
- expansion terms are ranked by raw collection frequency WITHIN the
  feedback docs (count desc, term asc), excluding the original query
  terms — no language-model smoothing;
- the final ranking is an unweighted BM25 disjunction over
  original + expansion terms (the engine's WAND path), not an
  interpolated relevance model.

Distribution: the only corpus touch is ONE map pass filtered to the
feedback doc ids (broadcast, ≤ k_docs of them) that emits per-batch
term-count partials — the same filtered-scan shape as snippet
generation (query/snippets.py).  Everything else is posting-list work
inside the already-loaded engine.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from bitfunnel_ray.stages.tokenize import flat_tokens


def feedback_terms(
    corpus,
    doc_ids: np.ndarray,
    query_terms: set[str],
    n_terms: int = 5,
) -> list[str]:
    """Top ``n_terms`` terms by total count within ``doc_ids`` (count
    desc, term asc), excluding ``query_terms``."""
    ids = set(int(i) for i in doc_ids)

    def partials(t: pa.Table) -> pa.Table:
        mask = np.isin(
            t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64),
            np.fromiter(ids, np.int64, len(ids)),
        )
        sub = t.filter(pa.array(mask))
        schema = pa.schema([("term", pa.string()), ("cnt", pa.int64())])
        if len(sub) == 0:
            return schema.empty_table()
        flat, _, _ = flat_tokens(sub["text"])
        import pyarrow.compute as pc

        vc = pc.value_counts(flat)
        return pa.table(
            {"term": vc.field("values"), "cnt": vc.field("counts").cast(pa.int64())},
            schema=schema,
        )

    rows = corpus.map_batches(partials, batch_format="pyarrow").take_all()
    agg: dict[str, int] = {}
    for r in rows:
        agg[r["term"]] = agg.get(r["term"], 0) + int(r["cnt"])
    cand = [(c, t) for t, c in agg.items() if t not in query_terms]
    cand.sort(key=lambda x: (-x[0], x[1]))
    return [t for _, t in cand[:n_terms]]


def prf_search(
    engine,
    corpus,
    query_terms: list[str],
    k: int = 10,
    k_docs: int = 10,
    n_terms: int = 5,
) -> pa.Table:
    """RM3-lite: BM25-AND feedback retrieval → expansion term mining →
    BM25-OR re-ranking over original + expansion terms.  Returns the
    final (rank, doc_id, score) table plus an ``expansion`` column
    repeating the chosen terms (joined by space) for observability."""
    fb = engine.search(" ".join(query_terms), k=k_docs)
    exp = feedback_terms(
        corpus, fb["doc_id"].to_numpy(), set(query_terms), n_terms=n_terms
    )
    out = engine.topk_or(list(query_terms) + exp, k=k)
    return out.append_column(
        "expansion", pa.array([" ".join(exp)] * len(out), pa.string())
    )
