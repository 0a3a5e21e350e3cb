"""Fuzzy vocabulary match (edit distance ≤ 1) — the "did you mean"
stage of query serving: map a possibly-misspelled query term to every
vocabulary term within one insertion, deletion, or substitution.

The trick is SymSpell-style deletion neighborhoods, which turn edit
distance into EQUALITY tests the engine can vectorize and (at scale)
hash-partition — no per-pair Levenshtein anywhere:

- distance 0:  v == q
- deletion:    v == del_j(q)                       (any j)
- insertion:   del_i(v) == q                       (any i)
- substitution del_i(v) == del_i(q)  — SAME index i.  For equal-length
  strings, deleting index i from both yields equality iff they agree
  everywhere except possibly position i, i.e. distance ≤ 1.  (Matching
  *different* indices would admit distance-2 pairs like ab/ba — the
  classic SymSpell false positive this op excludes.)

Scale shape: the query side is a handful of terms (broadcast, trivially);
the vocabulary side streams through ``map_batches`` over the df table —
variants are built by a per-INDEX loop of vectorized utf8 slices (loop
length = max token length, never row count), hashed, and tested with
``np.isin`` per channel.  Only matched rows (a handful per query term)
leave the map stage.

Reference analog: none (BitFunnel matches exact terms only); the oracle
is DuckDB's ``levenshtein() <= 1``.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray

from bitfunnel_ray.stages.tokenize import hash_token_array

_BIG = 1 << 30


def _del1(terms: pa.Array, i: int) -> pa.Array:
    """Delete codepoint ``i`` from every term (terms shorter than i+1
    yield the unmodified prefix slice — callers mask by length)."""
    head = pc.utf8_slice_codeunits(terms, 0, i)
    tail = pc.utf8_slice_codeunits(terms, i + 1, _BIG)
    return pc.binary_join_element_wise(head, tail, "")


def _query_keys(q: str) -> tuple[np.ndarray, np.ndarray, list[np.ndarray]]:
    """(identity hash [1], deletion-variant hashes [len(q)],
    per-index deletion hash singletons) for one query term."""
    ident = hash_token_array(pa.array([q]))
    dels = [q[:i] + q[i + 1 :] for i in range(len(q))]
    del_h = (
        hash_token_array(pa.array(dels)) if dels else np.empty(0, np.uint64)
    )
    per_index = [del_h[i : i + 1] for i in range(len(dels))]
    return ident, del_h, per_index


def _match_block(t: pa.Table, *, queries: list[str]) -> pa.Table:
    empty = pa.table(
        {
            "query_term": pa.array([], pa.string()),
            "term": pa.array([], pa.string()),
            "df": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    terms = t["term"].combine_chunks() if isinstance(t["term"], pa.ChunkedArray) else t["term"]
    ident_v = hash_token_array(terms)
    lens = pc.utf8_length(terms).to_numpy(zero_copy_only=False).astype(np.int64)
    max_len = int(lens.max()) if len(lens) else 0
    # vocab deletion-variant hashes per index (built lazily up to max_len)
    del_v: list[np.ndarray] = []

    def vocab_del(i: int) -> np.ndarray:
        while len(del_v) <= i:
            del_v.append(hash_token_array(_del1(terms, len(del_v))))
        return del_v[i]

    out_q, out_t, out_df = [], [], []
    dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    tstr = terms.to_numpy(zero_copy_only=False)
    for q in queries:
        ident_q, del_q, per_index_q = _query_keys(q)
        m = ident_v == ident_q[0]                       # distance 0
        if len(del_q):
            m |= np.isin(ident_v, del_q)                # v == del(q)
        for i in range(min(max_len, len(q) + 1)):
            dv = vocab_del(i)
            valid = lens > i
            hit = valid & (dv == ident_q[0])            # del(v) == q
            if i < len(q):
                hit |= valid & (lens == len(q)) & (dv == per_index_q[i][0])
            m |= hit
        idx = np.flatnonzero(m)
        out_q.extend([q] * len(idx))
        out_t.extend(tstr[idx].tolist())
        out_df.extend(dfs[idx].tolist())
    return pa.table(
        {
            "query_term": pa.array(out_q, pa.string()),
            "term": pa.array(out_t, pa.string()),
            "df": pa.array(out_df, pa.int64()),
        }
    )


def fuzzy_term_match(
    dft: "ray.data.Dataset", query_terms: list[str]
) -> pa.Table:
    """Every vocabulary term within edit distance ≤ 1 of each query term,
    with its document frequency.  ``dft`` is the df-table dataset (one
    row per term: ``term``, ``df``).  Returns (query_term, term, df)
    sorted by (query_term, term) — matches DuckDB
    ``levenshtein(q, term) <= 1`` exactly."""
    rows = dft.select_columns(["term", "df"]).map_batches(
        partial(_match_block, queries=list(query_terms)),
        batch_format="pyarrow",
    )
    tables = [x for x in ray.get(rows.to_arrow_refs()) if len(x)]
    if not tables:
        return pa.table(
            {
                "query_term": pa.array([], pa.string()),
                "term": pa.array([], pa.string()),
                "df": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(tables).sort_by(
        [("query_term", "ascending"), ("term", "ascending")]
    )
