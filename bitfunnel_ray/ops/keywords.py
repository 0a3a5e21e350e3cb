"""Per-document TF-IDF keyword extraction — the "what is this page
about" stage of a web pipeline (doc tags, related-search seeds, cluster
labels).

Scale shape: term document-frequencies come from the same exchange the
df-table stage already runs (`build/stats.document_frequency_table`);
the per-doc pass is then MAP-ONLY — each document's term frequencies are
computed inside its own batch (a doc never spans batches), idf is a
``searchsorted`` lookup into the broadcast (hash → df) arrays, and the
top-m selection is a vectorized run-length rank over the lexsorted
(doc, -tfidf, term) order.  Output streams (m rows per doc — never
gathered on the driver).  The broadcast is the full vocabulary: right
while vocab × 16 B fits worker heap (it does for any natural-language
vocabulary after the df floor); an unbounded-vocab corpus would swap the
broadcast for a hash join of the per-doc tf rows against the df table.

Reference analog: none directly — composes the df statistics
(DocumentFrequencyTableBuilder.cpp) with the IDF math the reference
keeps in `src/Common/Utilities` (IdfX10 lookup) into a per-doc ranker.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

import ray

from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.stages.tokenize import flat_tokens, hash_token_array


def _keywords_batch(
    t: pa.Table, *, m: int, n_docs: int, df_ref
) -> pa.Table:
    hashes, dfs = ray.get(df_ref) if isinstance(df_ref, ray.ObjectRef) else df_ref
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "tfidf": pa.array([], pa.float64()),
            "rank": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
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
    starts = np.flatnonzero(new)
    tf = np.diff(np.append(starts, len(hs))).astype(np.float64)
    run_h, run_d = hs[starts], ds[starts]
    # term text of each run: first occurrence in the sorted order
    run_terms = flat.take(pa.array(order[starts])).to_numpy(zero_copy_only=False)
    run_terms = np.asarray(run_terms, dtype=str)
    idx = np.searchsorted(hashes, run_h)
    idx[idx == len(hashes)] = 0
    found = len(hashes) > 0
    df = dfs[idx] if found else np.ones(len(run_h))
    tfidf = tf * np.log(np.float64(n_docs) / df)
    # top-m per doc: (doc asc, tfidf desc, term asc)
    sel = np.lexsort((run_terms, -tfidf, run_d))
    d2 = run_d[sel]
    doc_start = np.empty(len(d2), dtype=bool)
    doc_start[0] = True
    doc_start[1:] = d2[1:] != d2[:-1]
    pos = np.arange(len(d2)) - np.maximum.accumulate(
        np.where(doc_start, np.arange(len(d2)), 0)
    )
    keep = pos < m
    sel = sel[keep]
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(doc_ids[run_d[sel]], pa.int64()),
            "term": pa.array(run_terms[sel], pa.string()),
            "tfidf": pa.array(np.round(tfidf[sel], 6), pa.float64()),
            "rank": pa.array((pos[keep] + 1).astype(np.int64), pa.int64()),
        }
    )


def doc_keywords(
    corpus: "ray.data.Dataset",
    n_docs: int,
    m: int = 3,
    cfg: EngineConfig | None = None,
) -> "ray.data.Dataset":
    """Top-``m`` TF-IDF terms per document (tfidf = tf · ln(N/df), ties
    broken by term text asc — identical to the SQL window ranking).
    Returns a streaming dataset (doc_id, term, tfidf, rank)."""
    cfg = cfg or EngineConfig(max_gram=1)
    from bitfunnel_ray.build.stats import document_frequency_table

    dft = document_frequency_table(corpus, cfg, emit_text=False)
    parts = [x for x in ray.get(dft.to_arrow_refs()) if len(x)]
    if parts:
        dt = pa.concat_tables(parts)
        hashes = dt["term_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        dfs = dt["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        o = np.argsort(hashes)
        hashes, dfs = hashes[o], dfs[o]
    else:
        hashes, dfs = np.empty(0, np.uint64), np.empty(0, np.float64)
    df_ref = ray.put((hashes, dfs))
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_keywords_batch, m=m, n_docs=n_docs, df_ref=df_ref),
        batch_format="pyarrow",
    )
