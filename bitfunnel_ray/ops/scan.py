"""Distributed corpus grep: substring and regex occurrence scans.

Corpus forensics ops a web-scale pipeline runs constantly — "which
documents contain this exact string / pattern, and how often" (leak
hunts, template discovery, PII audits, contamination spot-checks).  Both
are map-only ``map_batches`` stages over (doc_id, text): zero-copy Arrow
in, one C-kernel call per block (``pc.count_substring`` /
``pc.count_substring_regex`` — RE2, the same engine DuckDB binds, so
match counts are byte-identical to the oracle), a boolean filter, and a
two-column fixed-width result out.  No shuffle, no state; scales as pure
embarrassing parallelism with input pruning at the read
(``columns=["doc_id", "text"]``).

The regex variant counts non-overlapping matches left-to-right, the
shared RE2/`regexp_extract_all` semantics.
"""

from __future__ import annotations

from functools import partial

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def _scan_batch(t: pa.Table, *, pattern: str, regex: bool) -> pa.Table:
    text = t["text"]
    if isinstance(text, pa.ChunkedArray):
        text = text.combine_chunks()
    kernel = pc.count_substring_regex if regex else pc.count_substring
    n = kernel(pc.fill_null(text, ""), pattern)
    keep = pc.greater(n, 0)
    return pa.table(
        {
            "doc_id": pc.filter(t["doc_id"].combine_chunks() if isinstance(t["doc_id"], pa.ChunkedArray) else t["doc_id"], keep),
            "n_hits": pc.cast(pc.filter(n, keep), pa.int64()),
        }
    )


def substring_scan(corpus: "ray.data.Dataset", needle: str) -> "ray.data.Dataset":
    """(doc_id, n_hits) for every document containing ``needle`` at least
    once; n_hits = number of (possibly overlapping-start, non-overlapping
    as scanned left-to-right) occurrences."""
    if not needle:
        raise ValueError("needle must be non-empty")
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_scan_batch, pattern=needle, regex=False),
        batch_format="pyarrow",
    )


def regex_scan(corpus: "ray.data.Dataset", pattern: str) -> "ray.data.Dataset":
    """(doc_id, n_hits) for every document with >=1 RE2 match of
    ``pattern``; n_hits = non-overlapping match count (the
    ``regexp_extract_all`` semantics)."""
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_scan_batch, pattern=pattern, regex=True),
        batch_format="pyarrow",
    )


def term_vectors(
    corpus: "ray.data.Dataset", doc_pred
) -> "ray.data.Dataset":
    """Forward-index export (Elasticsearch ``_termvectors`` analog): one
    row per (doc_id, distinct term) with term frequency and the 0-based
    first occurrence position, for documents selected by ``doc_pred``
    (a vectorized numpy predicate over the doc_id array).

    Map-only: each block filters its docs, splits once, and recovers
    (tf, first_pos) from ONE np.unique over packed (doc, term-code) int
    pairs — no python per token, no exchange (a doc never spans blocks)."""
    import numpy as np

    from bitfunnel_ray.stages.tokenize import flat_tokens

    def _batch(t: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "term": pa.array([], pa.string()),
                "tf": pa.array([], pa.int64()),
                "first_pos": pa.array([], pa.int64()),
            }
        )
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(doc_pred(ids)))
        if len(t) == 0:
            return empty
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        flat, doc_of, doclen = flat_tokens(t["text"])
        if len(flat) == 0:
            return empty
        d = pc.dictionary_encode(flat)
        codes = d.indices.to_numpy().astype(np.int64)
        nv = len(d.dictionary)
        pair = doc_of * nv + codes
        # np.unique(return_index) on the stable original order: the first
        # index of each (doc, term) pair IS its first occurrence
        uniq, first, counts = np.unique(pair, return_index=True, return_counts=True)
        doc_u, code_u = uniq // nv, uniq % nv
        starts = np.concatenate([[0], np.cumsum(doclen)])[:-1]
        first_pos = first - starts[doc_u]
        terms = d.dictionary.take(pa.array(code_u)).cast(pa.string())
        out = pa.table(
            {
                "doc_id": pa.array(ids[doc_u], pa.int64()),
                "term": terms,
                "tf": pa.array(counts.astype(np.int64), pa.int64()),
                "first_pos": pa.array(first_pos.astype(np.int64), pa.int64()),
            }
        )
        # deterministic within-block order (doc asc, term asc); blocks are
        # doc-ranged so global order follows for sorted inputs
        idx = pa.compute.sort_indices(
            out, sort_keys=[("doc_id", "ascending"), ("term", "ascending")]
        )
        return out.take(idx)

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        _batch, batch_format="pyarrow", batch_size=None
    )
