"""Prefix autocomplete (search-as-you-type) over the term dictionary.

Reference analog: none in-tree — BitFunnel's surface stops at boolean
match (src/Plan/src/QueryRunner.cpp); completion is the standard serving
feature every production search front end bolts on, fed by exactly the
document-frequency table the statistics stage already produces
(src/Index/src/DocumentFrequencyTable.cpp keeps terms df-sorted for the
same "most useful first" reason).

Two forms:

``suggest_terms``
    distributed: one map-side pass over the df table — per-block prefix
    filter + per-block top-k, so the exchange moves ≤ k rows per block
    (never the vocabulary).  Right for offline/batch completion lists.

``SuggestIndex``
    serve-time: the sorted term array + df built ONCE (an actor would
    hold it in ``__init__``), answering each keystroke with two binary
    searches + an O(range) rank — no scan.  On the term-sharded serving
    front each shard holds its 1/S of the dictionary and the front
    merges per-shard top-ks, same shape as ``search``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _finish(terms: np.ndarray, dfs: np.ndarray, k: int) -> pa.Table:
    order = np.lexsort((terms, -dfs))[:k]
    return pa.table(
        {
            "term": pa.array(terms[order].tolist(), pa.string()),
            "df": pa.array(dfs[order], pa.int64()),
        }
    )


def suggest_terms(dft, prefix: str, k: int = 10) -> pa.Table:
    """Top-k completions of ``prefix`` by df desc (term asc tiebreak)
    from a df-table Dataset (term, df[, gram_size]).  Bigram dictionary
    entries (terms containing a space) are excluded — completion is a
    unigram surface."""

    def block(t: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.starts_with(t["term"], prefix),
            pc.equal(pc.count_substring(t["term"], " "), 0),
        )
        sub = t.filter(keep)
        if len(sub) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        return _finish(
            np.asarray(sub["term"].to_pylist()),
            sub["df"].to_numpy(zero_copy_only=False).astype(np.int64),
            k,
        )

    batches = list(
        dft.select_columns(["term", "df"]).map_batches(
            block, batch_format="pyarrow", batch_size=None
        ).iter_batches(batch_format="pyarrow", batch_size=None)
    )
    # iter_batches yields nothing when every block filtered to empty
    parts = pa.concat_tables(batches, promote_options="default") if batches else None
    if parts is None or len(parts) == 0:
        return pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    return _finish(
        np.asarray(parts["term"].to_pylist()),
        parts["df"].to_numpy(zero_copy_only=False).astype(np.int64),
        k,
    )


class SuggestIndex:
    """Binary-search completion over a sorted unigram (term, df) table.

    Build once (per serving actor); ``complete`` costs two searchsorted
    calls + a rank over the matching range.  ``\\U0010ffff`` is the
    maximum code point, so ``prefix + maxchar`` upper-bounds every
    extension of ``prefix`` in code-point order (numpy str compare)."""

    _HI = "\U0010ffff"

    def __init__(self, terms, dfs):
        t = np.asarray(terms)
        d = np.asarray(dfs, dtype=np.int64)
        uni = np.char.find(t.astype(str), " ") < 0  # unigrams only
        t, d = t[uni], d[uni]
        order = np.argsort(t, kind="stable")
        self.terms = t[order].astype(str)
        self.dfs = d[order]

    @classmethod
    def from_dft(cls, dft) -> "SuggestIndex":
        batches = list(
            dft.select_columns(["term", "df"]).iter_batches(
                batch_format="pyarrow", batch_size=None
            )
        )
        if not batches:
            return cls(np.array([], dtype=str), np.array([], dtype=np.int64))
        parts = pa.concat_tables(batches, promote_options="default")
        return cls(
            np.asarray(parts["term"].to_pylist()),
            parts["df"].to_numpy(zero_copy_only=False),
        )

    def complete(self, prefix: str, k: int = 10) -> pa.Table:
        lo = int(np.searchsorted(self.terms, prefix, side="left"))
        hi = int(np.searchsorted(self.terms, prefix + self._HI, side="right"))
        return _finish(self.terms[lo:hi], self.dfs[lo:hi], k)

    def prefix_range(self, prefix: str, cap: int | None = None):
        """The FULL (terms, dfs) slice matching ``prefix`` (df-desc order,
        capped at ``cap`` rows) — the per-shard candidate feed for a
        cross-shard merge where dfs must SUM per term before the global
        top-k cut (doc-sharded serving: each shard holds a partial df)."""
        lo = int(np.searchsorted(self.terms, prefix, side="left"))
        hi = int(np.searchsorted(self.terms, prefix + self._HI, side="right"))
        t, d = self.terms[lo:hi], self.dfs[lo:hi]
        if cap is not None and len(t) > cap:
            order = np.lexsort((t, -d))[:cap]
            t, d = t[order], d[order]
        return t, d


def merge_suggest_partials(parts, k: int = 10) -> pa.Table:
    """Merge per-shard (terms, dfs) candidate partials into the global
    top-k: dfs SUM per term across shards (a term's df may be split
    across doc shards, or across term shards when segments use different
    bucket counts), then the same (df desc, term asc) cut as
    ``SuggestIndex.complete``.  ``parts`` is an iterable of
    (terms ndarray, dfs ndarray) pairs; None entries (shards without a
    vocabulary) are skipped."""
    ts, ds = [], []
    for p in parts:
        if p is None:
            continue
        t, d = p
        if len(t):
            ts.append(np.asarray(t, dtype=str))
            ds.append(np.asarray(d, dtype=np.int64))
    if not ts:
        return pa.table(
            {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
        )
    terms = np.concatenate(ts)
    dfs = np.concatenate(ds)
    order = np.argsort(terms, kind="stable")
    terms, dfs = terms[order], dfs[order]
    starts = np.flatnonzero(np.concatenate([[True], terms[1:] != terms[:-1]]))
    return _finish(terms[starts], np.add.reduceat(dfs, starts), k)
