"""Percolation — the inverse of search: match a STREAM of documents
against a registry of stored queries (alerts, saved searches,
subscription routing).  Search asks "which docs match this query";
percolation asks "which stored queries match this doc".

Scale shape: the stored-query registry is the SMALL side (thousands of
alert queries vs a TB doc stream) — each query's required term hashes
broadcast once via ``ray.put``; the document side is MAP-ONLY: a batch
tokenizes once, builds its distinct (doc, term-hash) pairs, and each
query evaluates as a vectorized membership count (a doc matches an AND
query iff it contains all |q| required hashes — ``np.isin`` + segment
sum == |q|).  No shuffle, no index build: percolation serves docs as
they arrive, before (or instead of) indexing them.

Reference analog: none (BitFunnel serves the forward direction only);
semantics match the conjunctive subset of the query grammar, and the
driver oracle generates the equivalent per-query SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

from bitfunnel_ray.stages.tokenize import flat_tokens, hash_token_array


def compile_queries(queries: dict[int, list[str]]) -> tuple[np.ndarray, np.ndarray]:
    """Stored conjunctive queries → (flat sorted-unique hash array per
    query concatenated, offsets).  Returned as plain arrays so one
    ``ray.put`` ships the whole registry."""
    hash_lists = []
    for qid in sorted(queries):
        terms = pa.array(list(queries[qid]))
        hash_lists.append(np.unique(hash_token_array(terms)))
    offsets = np.cumsum([0] + [len(h) for h in hash_lists]).astype(np.int64)
    flat = (
        np.concatenate(hash_lists) if hash_lists else np.empty(0, np.uint64)
    )
    qids = np.array(sorted(queries), dtype=np.int64)
    return flat, offsets, qids


def _percolate_batch(t: pa.Table, *, reg_ref) -> pa.Table:
    flat, offsets, qids = (
        ray.get(reg_ref) if isinstance(reg_ref, ray.ObjectRef) else reg_ref
    )
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
    )
    if len(t) == 0 or len(qids) == 0:
        return empty
    toks, doc_of, _ = flat_tokens(t["text"])
    if len(toks) == 0:
        return empty
    h = hash_token_array(toks)
    # distinct (doc, hash) pairs
    order = np.lexsort((h, doc_of))
    hs, ds = h[order], doc_of[order]
    new = np.empty(len(hs), dtype=bool)
    new[0] = True
    new[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
    hs, ds = hs[new], ds[new]
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    n_docs = len(t)
    out_q, out_d = [], []
    for i, qid in enumerate(qids):
        req = flat[offsets[i] : offsets[i + 1]]
        hit = np.isin(hs, req)
        per_doc = np.bincount(ds[hit], minlength=n_docs)
        matched = np.flatnonzero(per_doc == len(req))
        out_q.append(np.full(len(matched), qid, np.int64))
        out_d.append(doc_ids[matched])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q), pa.int64()),
            "doc_id": pa.array(np.concatenate(out_d), pa.int64()),
        }
    )


def percolate(
    docs: "ray.data.Dataset", queries: dict[int, list[str]]
) -> "ray.data.Dataset":
    """Match every document against every stored conjunctive query.
    Returns a streaming dataset (query_id, doc_id) — one row per match."""
    from functools import partial

    reg_ref = ray.put(compile_queries(queries))
    return docs.select_columns(["doc_id", "text"]).map_batches(
        partial(_percolate_batch, reg_ref=reg_ref), batch_format="pyarrow"
    )
