"""Gopher-rule quality gate — the composed keep/drop decision a
pretraining pipeline applies before tokenization (the public rule family
of Rae et al. 2021 §A1.1 / C4's heuristics: document length bounds,
duplicate-token and most-frequent-token/bigram fraction caps).

``ops/textstats.py`` computes the individual signals; this op makes the
DECISION in the same single map pass and reports WHY via a stable reason
bitmask, so a pipeline can both filter and audit its rejection mix
without a second scan.  All fractions are single IEEE divisions of exact
int64 counts (one division per signal), so the DuckDB oracle reproduces
keep/reasons bit-exactly.

Reason bits (set = rule violated):
    1  too short        (n_tokens < min_tokens)
    2  too long         (n_tokens > max_tokens)
    4  dup_token_frac   >  max_dup_frac
    8  top_token_frac   >  max_top_token_frac
    16 top_bigram_frac  >  max_top_bigram_frac
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

from bitfunnel_ray.ops.textstats import repetition_stats_batch

R_SHORT, R_LONG, R_DUP, R_TOP, R_BIGRAM = 1, 2, 4, 8, 16


def _gate_batch(
    t: pa.Table,
    *,
    min_tokens: int,
    max_tokens: int,
    max_dup_frac: float,
    max_top_token_frac: float,
    max_top_bigram_frac: float,
) -> pa.Table:
    s = repetition_stats_batch(t)
    n = s["n_tokens"].to_numpy(zero_copy_only=False)
    dup = s["dup_token_frac"].to_numpy(zero_copy_only=False)
    top = s["top_token_frac"].to_numpy(zero_copy_only=False)
    topb = s["top_bigram_frac"].to_numpy(zero_copy_only=False)
    reasons = np.zeros(len(s), dtype=np.int64)
    reasons |= np.where(n < min_tokens, R_SHORT, 0)
    reasons |= np.where(n > max_tokens, R_LONG, 0)
    reasons |= np.where(dup > max_dup_frac, R_DUP, 0)
    reasons |= np.where(top > max_top_token_frac, R_TOP, 0)
    reasons |= np.where(topb > max_top_bigram_frac, R_BIGRAM, 0)
    return s.append_column(
        "reasons", pa.array(reasons, pa.int64())
    ).append_column("keep", pa.array(reasons == 0, pa.bool_()))


def gopher_gate(
    corpus: "ray.data.Dataset",
    *,
    min_tokens: int = 50,
    max_tokens: int = 100_000,
    max_dup_frac: float = 0.30,
    max_top_token_frac: float = 0.20,
    max_top_bigram_frac: float = 0.18,
) -> "ray.data.Dataset":
    """Per-document gate decision → (doc_id, n_tokens, the three
    fractions, reasons bitmask, keep).  Map-only; defaults are in the
    published Gopher neighborhood — tune per corpus (the fixture entries
    pass explicit thresholds sized to its synthetic distribution)."""
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(
            _gate_batch,
            min_tokens=min_tokens,
            max_tokens=max_tokens,
            max_dup_frac=max_dup_frac,
            max_top_token_frac=max_top_token_frac,
            max_top_bigram_frac=max_top_bigram_frac,
        ),
        batch_format="pyarrow",
    )


def apply_gate(corpus: "ray.data.Dataset", gate: "ray.data.Dataset"):
    """Filtered corpus = corpus ANTI-JOIN the gate's dropped ids (one
    co-partitioned exchange of ids only; the dropped set never lands on
    the driver).  When the gate runs in the same pipeline, prefer
    filtering inline inside the gate pass instead (no second scan)."""
    import pyarrow.compute as pc

    from bitfunnel_ray.ops.joins import anti_join

    dropped = gate.map_batches(
        lambda t: t.filter(pc.invert(t["keep"])).select(["doc_id"]),
        batch_format="pyarrow",
    )
    return anti_join(corpus, dropped, key="doc_id", broadcast=False)
