"""Result snippet generation (keyword-in-context highlighting).

The SERP feature next to every hit: the fixed-width token window of the
document that covers the most DISTINCT query terms (tie → earliest
window).  The reference keeps whole documents around for verification
(src/Index/src/DocumentCache.cpp) but has no excerpting; this is the
standard public formulation (best-window passage selection, cf. Lucene's
highlighter).

Semantics (1-based, mirrors the SQL oracle exactly): for a document of
L tokens and window width W, candidate starts are s ∈ [1, max(1, L−W+1)];
the window is tokens [s, min(s+W−1, L)]; its score is the number of
distinct query terms present; the best window is (score desc, s asc);
documents with score 0 are omitted.

Fully vectorized per batch: one cumulative-sum per query term gives
window presence for EVERY start in O(tokens) (no per-start rescans), the
per-document argmax is one lexsort, and the snippet strings are built
with ``ListArray`` offsets + ``pc.binary_join`` — no per-row Python.
Map-only: the query terms broadcast in the closure (a handful of
strings), nothing shuffles.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from bitfunnel_ray.stages.tokenize import flat_tokens, hash_token_array


def _snippet_batch(t: pa.Table, *, terms: tuple, window: int) -> pa.Table:
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "start": pa.array([], pa.int64()),
            "n_hits": pa.array([], pa.int64()),
            "snippet": pa.array([], pa.string()),
        }
    )
    flat, doc_of, doclen = flat_tokens(t["text"])
    if len(flat) == 0:
        return empty
    n = len(t)
    h = hash_token_array(flat)
    term_hashes = hash_token_array(pa.array(list(terms)))
    # per-position local index and per-doc flat offset
    offsets = np.zeros(n + 1, np.int64)
    np.cumsum(doclen, out=offsets[1:])
    li = np.arange(len(flat), dtype=np.int64) - offsets[doc_of]  # 0-based
    L = doclen[doc_of]
    # candidate starts: li <= max(0, L - W)  (0-based form of the contract)
    is_start = li <= np.maximum(0, L - window)
    starts = np.flatnonzero(is_start)
    if len(starts) == 0:
        return empty
    w_len = np.minimum(window, L[starts] - li[starts])
    ends = starts + w_len  # exclusive
    # distinct-term presence per window: one cumsum per query term
    n_hits = np.zeros(len(starts), np.int64)
    for th in term_hashes:
        cs = np.zeros(len(flat) + 1, np.int64)
        np.cumsum(h == th, out=cs[1:])
        n_hits += cs[ends] - cs[starts] > 0
    # per-doc best: (n_hits desc, start asc) -> lexsort keys reversed
    d = doc_of[starts]
    order = np.lexsort((li[starts], -n_hits, d))
    d_s = d[order]
    first = np.ones(len(order), bool)
    first[1:] = d_s[1:] != d_s[:-1]
    pick = order[first]
    keep = n_hits[pick] >= 1
    pick = pick[keep]
    if len(pick) == 0:
        return empty
    # snippet strings: gather each window's tokens into a ListArray and
    # join — flat index ranges built with the repeat+cumsum trick
    ws, we = starts[pick], ends[pick]
    lens = we - ws
    list_off = np.zeros(len(pick) + 1, np.int32)
    np.cumsum(lens, out=list_off[1:])
    idx = np.repeat(ws, lens) + (np.arange(list_off[-1]) - np.repeat(list_off[:-1], lens))
    toks = flat.take(pa.array(idx))
    la = pa.ListArray.from_arrays(pa.array(list_off), toks)
    snip = pc.binary_join(la, " ")
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)[doc_of[ws]]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids.astype(np.int64)),
            "start": pa.array(li[ws] + 1),  # 1-based, matching the oracle
            "n_hits": pa.array(n_hits[pick]),
            "snippet": snip,
        }
    )


def best_snippets(
    corpus: "ray.data.Dataset", terms: list[str], window: int = 8
) -> "ray.data.Dataset":
    """Best highlight window per document for ``terms`` (docs with no
    term hit are dropped).  Columns: doc_id, start (1-based token
    position), n_hits (distinct query terms covered), snippet (the
    window's tokens space-joined)."""
    if not terms:
        raise ValueError("terms must be non-empty")
    if window < 1:
        raise ValueError("window must be >= 1")
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_snippet_batch, terms=tuple(terms), window=window),
        batch_format="pyarrow",
        batch_size=None,
    )
