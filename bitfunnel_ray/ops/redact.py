"""Pattern redaction for training-data hygiene: scrub PII-shaped spans
(emails, IPv4 addresses, phone numbers) and deny-listed terms from the
text column before indexing / training.

No reference analog (BitFunnel ingests pre-tokenized text); this is the
scrub pass a 100 TB web pipeline runs first.  Map-only and zero-copy
Arrow: each pattern is one RE2 replace over the whole batch
(``pyarrow.compute.replace_substring_regex`` — the same RE2 engine DuckDB
uses, so SQL oracles are byte-identical).  Patterns apply in declared
order; each pattern's occurrence count is measured on the text as it
looked when that pattern ran (count before its own replace), so totals
are well-defined even when patterns overlap.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

# (name, RE2 pattern, replacement) — applied in order
DEFAULT_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("phone", r"\+?\d[\d() .-]{7,}\d", "<PHONE>"),
)


def redact_batch(t: pa.Table, *, patterns) -> pa.Table:
    txt = pc.fill_null(t["text"], "")
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    total = np.zeros(len(t), dtype=np.int64)
    for _name, rx, repl in patterns:
        total += pc.count_substring_regex(txt, rx).to_numpy(zero_copy_only=False)
        txt = pc.replace_substring_regex(txt, rx, repl)
    return pa.table(
        {
            "doc_id": t["doc_id"],
            "clean_text": txt,
            "n_redacted": pa.array(total, pa.int64()),
        }
    )


def redact_text(
    corpus: "ray.data.Dataset",
    patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PATTERNS,
) -> "ray.data.Dataset":
    """→ (doc_id, clean_text, n_redacted). Stateless vectorized map."""
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(redact_batch, patterns=patterns), batch_format="pyarrow"
    )


def redact_sql(patterns: tuple[tuple[str, str, str], ...] = DEFAULT_PATTERNS) -> str:
    """DuckDB oracle generated from the SAME pattern tuple (no drift):
    a chained WITH applies each replace in order, counting occurrences on
    the pre-replace text exactly like ``redact_batch``."""
    steps = ["s0 AS (SELECT doc_id, text AS t, 0 AS c FROM documents)"]
    for i, (_name, rx, repl) in enumerate(patterns):
        rx_sql = rx.replace("'", "''")
        steps.append(
            f"s{i+1} AS (SELECT doc_id, "
            f"regexp_replace(t, '{rx_sql}', '{repl}', 'g') AS t, "
            f"c + len(regexp_extract_all(t, '{rx_sql}')) AS c FROM s{i})"
        )
    last = len(patterns)
    return (
        "WITH "
        + ",\n".join(steps)
        + f"\nSELECT doc_id, t AS clean_text, CAST(c AS BIGINT) AS n_redacted FROM s{last}"
    )
