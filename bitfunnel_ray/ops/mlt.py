"""More-like-this — related-document retrieval: rank the corpus by how
many of a source document's top TF-IDF keywords each document contains.

The classic serving-side "similar pages" feature, built from pieces this
engine already has: the df-table exchange supplies idf, the source doc's
keywords are computed on the driver (ONE row — the small-result
exception), and the ranking pass is MAP-ONLY with map-side top-k — each
corpus block counts keyword membership per doc vectorized (dedup runs +
``np.isin`` + ``bincount``), keeps its own top-k by (shared desc,
doc_id asc), and ships ≤ k rows; the driver merges block partials.

Reference analog: none (BitFunnel serves explicit queries only); the
semantics are the standard MLT of Lucene-lineage engines, exact rather
than heuristic so a SQL oracle can check it.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

import ray

from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.stages.tokenize import flat_tokens, hash_token_array


def _source_keywords(
    corpus: "ray.data.Dataset", doc_id: int, n_docs: int, m: int, hashes, dfs
) -> np.ndarray:
    """Top-m tfidf term hashes of one document (tf from its own text, idf
    from the broadcast df arrays; ties by term text asc — the same rule
    as ops.keywords)."""

    def pick(t: pa.Table) -> pa.Table:
        keep = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) == doc_id
        return t.filter(pa.array(keep))

    rows = pa.concat_tables(
        ray.get(
            corpus.select_columns(["doc_id", "text"])
            .map_batches(pick, batch_format="pyarrow")
            .to_arrow_refs()
        )
    )
    if rows.num_rows == 0:
        raise KeyError(f"doc_id {doc_id} not in corpus")
    flat, _, _ = flat_tokens(rows["text"])
    h = hash_token_array(flat)
    terms = np.asarray(flat.to_numpy(zero_copy_only=False), dtype=str)
    order = np.argsort(h)
    hs, ts = h[order], terms[order]
    new = np.empty(len(hs), dtype=bool)
    if len(hs) == 0:
        return np.empty(0, np.uint64)
    new[0] = True
    new[1:] = hs[1:] != hs[:-1]
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, len(hs))).astype(np.float64)
    run_h, run_t = hs[starts], ts[starts]
    idx = np.searchsorted(hashes, run_h)
    idx[idx == len(hashes)] = 0
    df = dfs[idx]
    tfidf = tf * np.log(np.float64(n_docs) / df)
    sel = np.lexsort((run_t, -tfidf))[:m]
    return np.sort(run_h[sel])


def _shared_block(
    t: pa.Table, *, kw_ref, src_doc: int, k: int
) -> pa.Table:
    kw = ray.get(kw_ref) if isinstance(kw_ref, ray.ObjectRef) else kw_ref
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "shared": pa.array([], pa.int64())}
    )
    if len(t) == 0 or len(kw) == 0:
        return empty
    flat, doc_of, _ = flat_tokens(t["text"])
    if len(flat) == 0:
        return empty
    h = hash_token_array(flat)
    order = np.lexsort((h, doc_of))
    hs, ds = h[order], doc_of[order]
    new = np.empty(len(hs), dtype=bool)
    new[0] = True
    new[1:] = (ds[1:] != ds[:-1]) | (hs[1:] != hs[:-1])
    hs, ds = hs[new], ds[new]  # distinct (doc, term) pairs
    hit = np.isin(hs, kw)
    n = len(t)
    shared = np.bincount(ds[hit], minlength=n)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    keep = (shared > 0) & (doc_ids != src_doc)
    ids, sh = doc_ids[keep], shared[keep].astype(np.int64)
    # map-side top-k: (shared desc, doc_id asc)
    sel = np.lexsort((ids, -sh))[:k]
    return pa.table(
        {
            "doc_id": pa.array(ids[sel], pa.int64()),
            "shared": pa.array(sh[sel], pa.int64()),
        }
    )


def more_like_this(
    corpus: "ray.data.Dataset",
    doc_id: int,
    n_docs: int,
    m: int = 3,
    k: int = 10,
    cfg: EngineConfig | None = None,
) -> pa.Table:
    """Top-k documents ranked by the count of the source doc's top-m
    TF-IDF keywords they contain (ties by doc_id asc).  Returns
    (rank, doc_id, shared)."""
    cfg = cfg or EngineConfig(max_gram=1)
    from bitfunnel_ray.build.stats import document_frequency_table

    dft = document_frequency_table(corpus, cfg, emit_text=False)
    parts = [x for x in ray.get(dft.to_arrow_refs()) if len(x)]
    dt = pa.concat_tables(parts)
    hashes = dt["term_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
    dfs = dt["df"].to_numpy(zero_copy_only=False).astype(np.float64)
    o = np.argsort(hashes)
    hashes, dfs = hashes[o], dfs[o]

    kw = _source_keywords(corpus, doc_id, n_docs, m, hashes, dfs)
    kw_ref = ray.put(kw)
    partials = corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_shared_block, kw_ref=kw_ref, src_doc=doc_id, k=k),
        batch_format="pyarrow",
    )
    tables = [x for x in ray.get(partials.to_arrow_refs()) if len(x)]
    if not tables:
        return pa.table(
            {
                "rank": pa.array([], pa.int64()),
                "doc_id": pa.array([], pa.int64()),
                "shared": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(tables)  # ≤ k rows per block
    ids = merged["doc_id"].to_numpy(zero_copy_only=False)
    sh = merged["shared"].to_numpy(zero_copy_only=False)
    sel = np.lexsort((ids, -sh))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(sel) + 1, dtype=np.int64), pa.int64()),
            "doc_id": pa.array(ids[sel], pa.int64()),
            "shared": pa.array(sh[sel], pa.int64()),
        }
    )
