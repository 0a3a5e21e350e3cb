"""Proximity search: documents where two terms occur within N tokens.

The reference's matching is presence-only (unique postings, no
positions — src/Chunks/src/Document.cpp:105-181 keeps an unordered set),
so "a NEAR/3 b" is inexpressible there.  This operator adds it as a
map-only corpus scan: positions come for free from the flattened token
stream (a token's global index within the block is its in-document
offset plus the doc start, and same-doc differences of global indices
ARE token distances), and the nearest-neighbor gap per occurrence is one
``searchsorted`` — no python loop, no shuffle, prune-at-read columns.

Typical use at scale: run the cheap indexed AND query first (both terms
present), then this scan over only the matching shard files — the scan
shape below is exactly the verify stage's.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from bitfunnel_ray.stages.tokenize import flat_tokens


def _prox_batch(t: pa.Table, *, term_a: str, term_b: str, window: int) -> pa.Table:
    flat, doc_of, _ = flat_tokens(t["text"])
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "min_gap": pa.array([], pa.int64())}
    )
    if len(flat) == 0:
        return empty
    a_idx = np.flatnonzero(pc.equal(flat, term_a).to_numpy(zero_copy_only=False))
    b_idx = np.flatnonzero(pc.equal(flat, term_b).to_numpy(zero_copy_only=False))
    if len(a_idx) == 0 or len(b_idx) == 0:
        return empty
    # nearest b occurrence for every a occurrence (both ascending):
    # check the insertion neighbors on each side, gated to the same doc
    p = np.searchsorted(b_idx, a_idx)
    right = np.minimum(p, len(b_idx) - 1)
    left = np.maximum(p - 1, 0)
    INF = np.iinfo(np.int64).max
    d_right = np.where(
        doc_of[b_idx[right]] == doc_of[a_idx],
        np.abs(b_idx[right] - a_idx),
        INF,
    )
    d_left = np.where(
        doc_of[b_idx[left]] == doc_of[a_idx],
        np.abs(a_idx - b_idx[left]),
        INF,
    )
    gap = np.minimum(d_right, d_left)
    # per-doc min over all a occurrences
    docs = doc_of[a_idx]
    uniq, inv = np.unique(docs, return_inverse=True)
    min_gap = np.full(len(uniq), INF, dtype=np.int64)
    np.minimum.at(min_gap, inv, gap)
    keep = min_gap <= window
    if not keep.any():
        return empty
    ids = t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"]
    return pa.table(
        {
            "doc_id": ids.take(pa.array(uniq[keep])).cast(pa.int64()),
            "min_gap": pa.array(min_gap[keep], pa.int64()),
        }
    )


def proximity_search(
    corpus: "ray.data.Dataset", term_a: str, term_b: str, window: int
) -> "ray.data.Dataset":
    """(doc_id, min_gap) for every document where some occurrence of
    ``term_a`` lies within ``window`` tokens of some ``term_b``
    occurrence (min_gap = the smallest such distance; 0 only if the two
    terms are equal)."""
    if window < 0:
        raise ValueError("window must be >= 0")
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_prox_batch, term_a=term_a, term_b=term_b, window=window),
        batch_format="pyarrow",
    )


def _phrase_batch(t: pa.Table, *, terms: "tuple[str, ...]") -> pa.Table:
    """Docs containing ``terms`` as CONSECUTIVE tokens in order.  All-numpy:
    k shifted equality masks ANDed together over the flattened token
    stream, gated to same-doc (start and end token in one document)."""
    flat, doc_of, _ = flat_tokens(t["text"])
    k = len(terms)
    n = len(flat)
    empty = pa.table({"doc_id": pa.array([], pa.int64())})
    if n < k:
        return empty
    m = pc.equal(flat, terms[0]).to_numpy(zero_copy_only=False)[: n - k + 1].copy()
    for i, term in enumerate(terms[1:], 1):
        m &= pc.equal(flat, term).to_numpy(zero_copy_only=False)[i : n - k + 1 + i]
    m &= doc_of[: n - k + 1] == doc_of[k - 1 :]
    if not m.any():
        return empty
    uniq = np.unique(doc_of[np.flatnonzero(m)])
    ids = (
        t["doc_id"].combine_chunks()
        if isinstance(t["doc_id"], pa.ChunkedArray)
        else t["doc_id"]
    )
    return pa.table({"doc_id": ids.take(pa.array(uniq)).cast(pa.int64())})


def exact_phrase_search(
    corpus: "ray.data.Dataset", terms: "list[str]", engine=None
) -> "ray.data.Dataset":
    """Exact ORDERED-adjacency phrase match — the semantics the
    reference's phrase operator approximates: BitFunnel indexes phrases
    as unordered co-occurrence of their 1..maxGram n-gram terms
    (src/Plan/src/TermMatchTreeConverter.cpp:156-179 — no positions, so
    "a b c" also matches "c b a" scattered across the page), and our
    index reproduces that for parity.  This operator answers the exact
    question with a positional map-only scan: k shifted equality masks
    over the flattened token stream, no python loop, no shuffle.

    With ``engine`` given, the scale path runs: the index's co-occurrence
    phrase query (a strict SUPERSET of exact matches by construction)
    selects candidate doc_ids first — broadcast once — and blocks
    pre-filter with a vectorized ``isin`` so the position scan touches
    only candidate documents."""
    if len(terms) < 2:
        raise ValueError("exact_phrase_search wants >= 2 terms")
    tt = tuple(terms)
    if engine is None:
        return corpus.select_columns(["doc_id", "text"]).map_batches(
            partial(_phrase_batch, terms=tt), batch_format="pyarrow"
        )
    import ray

    from bitfunnel_ray.query.parser import parse_query

    quoted = '"' + " ".join(terms) + '"'
    cand = engine.eval(parse_query(quoted, engine.stream_map))
    cand_ref = ray.put(np.sort(np.asarray(cand, dtype=np.int64)))

    def batch(t: pa.Table) -> pa.Table:
        allowed = ray.get(cand_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, allowed)
        if not keep.any():
            return pa.table({"doc_id": pa.array([], pa.int64())})
        return _phrase_batch(t.filter(pa.array(keep)), terms=tt)

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow"
    )


def indexed_proximity_search(
    engine,
    corpus: "ray.data.Dataset",
    term_a: str,
    term_b: str,
    window: int,
) -> "ray.data.Dataset":
    """The scale path: answer the cheap presence question with the INDEX
    (boolean AND over posting lists — microseconds against the
    dictionary) and run the position scan only over the matching docs.
    On a web corpus two-term conjunctions select a tiny fraction of
    documents, so the expensive text scan touches ~df(a AND b)/N of the
    data instead of all of it.

    The candidate doc-id set is broadcast once (``ray.put``) and each
    block pre-filters with a vectorized ``np.isin`` before tokenizing —
    blocks with no candidates do no text work at all.
    """
    import ray

    from bitfunnel_ray.query.parser import parse_query

    cand = engine.eval(parse_query(f"{term_a} {term_b}", engine.stream_map))
    cand_ref = ray.put(np.sort(np.asarray(cand, dtype=np.int64)))

    def batch(t: pa.Table) -> pa.Table:
        allowed = ray.get(cand_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, allowed)
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "min_gap": pa.array([], pa.int64())}
            )
        return _prox_batch(
            t.filter(pa.array(keep)), term_a=term_a, term_b=term_b, window=window
        )

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow"
    )


def _span_batch(t: pa.Table, *, terms: "tuple[str, ...]", slop: int) -> pa.Table:
    """Ordered span-near (the Lucene SpanNearQuery in_order=true
    contract): docs containing terms[0] < terms[1] < ... < terms[k-1] by
    position with total slop (gap tokens between first and last, i.e.
    span_end - span_start - (k-1)) <= ``slop``; emits the per-doc MINIMUM
    slop.  Vectorized greedy chain: for every occurrence of the first
    term, k-1 searchsorted hops pick the earliest next occurrence of each
    following term — earliest-next minimizes the span end for that start,
    so the per-doc minimum over starts equals the true minimum over all
    increasing position tuples (the SQL oracle's join formulation)."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "min_slop": pa.array([], pa.int64())}
    )
    flat, doc_of, _ = flat_tokens(t["text"])
    if not len(flat):
        return empty
    occ = []
    for term in terms:
        p = np.flatnonzero(pc.equal(flat, term).to_numpy(zero_copy_only=False))
        if not len(p):
            return empty
        occ.append(p)
    start = occ[0]
    cur = start
    alive = np.ones(len(start), dtype=bool)
    for p in occ[1:]:
        idx = np.searchsorted(p, cur, side="right")
        ok = idx < len(p)
        alive &= ok
        cur = np.where(ok, p[np.minimum(idx, len(p) - 1)], cur)
    span = cur - start - (len(terms) - 1)
    hit = alive & (doc_of[start] == doc_of[np.minimum(cur, len(doc_of) - 1)]) & (span <= slop)
    if not hit.any():
        return empty
    d = doc_of[start[hit]]
    s = span[hit]
    order = np.argsort(d, kind="stable")
    d, s = d[order], s[order]
    starts = np.flatnonzero(np.diff(d, prepend=-1))
    min_s = np.minimum.reduceat(s, starts)
    ids = (
        t["doc_id"].combine_chunks()
        if isinstance(t["doc_id"], pa.ChunkedArray)
        else t["doc_id"]
    )
    return pa.table(
        {
            "doc_id": ids.take(pa.array(d[starts])).cast(pa.int64()),
            "min_slop": pa.array(min_s.astype(np.int64), pa.int64()),
        }
    )


def span_near_search(
    corpus: "ray.data.Dataset",
    terms: "list[str]",
    slop: int,
    engine=None,
) -> "ray.data.Dataset":
    """Ordered span-near over the corpus → (doc_id, min_slop); map-only
    scan, same shape as the other positional operators here.  With
    ``engine`` given, the index's boolean AND of the terms (a strict
    superset — presence without order) pre-selects candidate docs and
    the scan touches only those blocks' rows (broadcast once,
    vectorized isin)."""
    if len(terms) < 2:
        raise ValueError("span_near_search wants >= 2 terms")
    tt = tuple(terms)
    if engine is None:
        return corpus.select_columns(["doc_id", "text"]).map_batches(
            partial(_span_batch, terms=tt, slop=int(slop)), batch_format="pyarrow"
        )
    import ray

    from bitfunnel_ray.query.parser import parse_query

    cand = engine.eval(parse_query(" ".join(terms), engine.stream_map))
    cand_ref = ray.put(np.sort(np.asarray(cand, dtype=np.int64)))

    def batch(t: pa.Table) -> pa.Table:
        allowed = ray.get(cand_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, allowed)
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "min_slop": pa.array([], pa.int64())}
            )
        return _span_batch(t.filter(pa.array(keep)), terms=tt, slop=int(slop))

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow"
    )


def _window_batch(t: pa.Table, *, terms: "tuple[str, ...]", window: int) -> pa.Table:
    """UNORDERED k-term containment (the Lucene SpanNearQuery
    in_order=false contract): docs where some span of <= ``window``
    tokens contains ALL terms (any order); emits the per-doc MINIMUM
    covering window length.  Vectorized minimal-cover sweep: for every
    token position j, the best window ending at j starts at
    min over terms of (latest occurrence of that term at or before j).
    Per-doc reset WITHOUT arithmetic offset tricks (an earlier
    seg_id*2^40 shift silently wrapped int64 at >= 2^23 docs/batch): a
    plain forward-fill can only leak an occurrence index from an EARLIER
    position, so any filled value >= the current doc's first-token index
    is in-doc by construction -- one extra accumulate of doc starts."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "min_window": pa.array([], pa.int64())}
    )
    flat, doc_of, _ = flat_tokens(t["text"])
    n = len(flat)
    if not n:
        return empty
    NEG = np.int64(-1)
    # index of the current document's first token, forward-filled
    doc_start = np.concatenate(([True], doc_of[1:] != doc_of[:-1]))
    pos = np.arange(n, dtype=np.int64)
    doc_first = np.maximum.accumulate(np.where(doc_start, pos, NEG))
    latest_min = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
    for term in terms:
        occ = pc.equal(flat, term).to_numpy(zero_copy_only=False)
        filled = np.maximum.accumulate(np.where(occ, pos, NEG))
        # an occurrence before this doc's first token is a leak -> reset
        filled = np.where(filled >= doc_first, filled, NEG)
        np.minimum(latest_min, filled, out=latest_min)
    # width of the best window ending at each j (valid only where every
    # term has occurred in this doc at or before j)
    valid = latest_min > NEG
    width = np.where(valid, np.arange(n, dtype=np.int64) - latest_min + 1, np.iinfo(np.int64).max)
    hit = valid & (width <= window)
    if not hit.any():
        return empty
    d = doc_of[hit]
    w = width[hit]
    order = np.argsort(d, kind="stable")
    d, w = d[order], w[order]
    first = np.flatnonzero(np.diff(d, prepend=-1))
    min_w = np.minimum.reduceat(w, first)
    ids = (
        t["doc_id"].combine_chunks()
        if isinstance(t["doc_id"], pa.ChunkedArray)
        else t["doc_id"]
    )
    return pa.table(
        {
            "doc_id": ids.take(pa.array(d[first])).cast(pa.int64()),
            "min_window": pa.array(min_w.astype(np.int64), pa.int64()),
        }
    )


def all_terms_window(
    corpus: "ray.data.Dataset",
    terms: "list[str]",
    window: int,
    engine=None,
) -> "ray.data.Dataset":
    """Unordered multi-term window search → (doc_id, min_window);
    map-only scan, optionally pre-filtered by the index's boolean AND
    (broadcast candidate ids, vectorized isin)."""
    if len(terms) < 2:
        raise ValueError("all_terms_window wants >= 2 terms")
    if len(set(terms)) != len(terms):
        raise ValueError("all_terms_window terms must be distinct (use "
                         "span_near_search for repeated-term chains)")
    tt = tuple(terms)
    if engine is None:
        return corpus.select_columns(["doc_id", "text"]).map_batches(
            partial(_window_batch, terms=tt, window=int(window)),
            batch_format="pyarrow",
        )
    import ray

    from bitfunnel_ray.query.parser import parse_query

    cand = engine.eval(parse_query(" ".join(terms), engine.stream_map))
    cand_ref = ray.put(np.sort(np.asarray(cand, dtype=np.int64)))

    def batch(t: pa.Table) -> pa.Table:
        allowed = ray.get(cand_ref)
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        keep = np.isin(ids, allowed)
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "min_window": pa.array([], pa.int64())}
            )
        return _window_batch(t.filter(pa.array(keep)), terms=tt, window=int(window))

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        batch, batch_format="pyarrow"
    )
