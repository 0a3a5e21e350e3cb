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
