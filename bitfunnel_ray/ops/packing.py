"""Sequence packing — group documents into fixed-token-budget training
sequences (the batch-construction op an LLM training pipeline runs after
tokenization; public technique, e.g. the "packing" described in T5 /
GPT-style data pipelines).

Shape: packing is embarrassingly parallel per block (a pack never spans
blocks — at 100 TB each input shard packs independently and the output
stays shard-partitioned for resume).  Within a block the kernel is
next-fit-decreasing: sort by (length desc, id), then cut the cumulative
length at each budget boundary with one ``searchsorted`` per PACK (loop
count = number of packs, never rows).  Deterministic for a fixed
partitioning; the invariants (every doc assigned exactly once, pack
totals ≤ budget unless a single doc alone exceeds it) hold under any
partitioning.

Output: one row per document — (doc_id, n_tokens, pack_id, pack_pos)
where pack_id is the first (longest) member's doc_id, so ids are stable
and globally unique without any cross-block coordination.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _pack_block(t: pa.Table, *, budget: int) -> pa.Table:
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "pack_id": pa.array([], pa.int64()),
            "pack_pos": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    lens = t["n_tokens"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((ids, -lens))  # length desc, id asc
    ids, lens = ids[order], lens[order]
    n = len(ids)
    cum = np.concatenate([[0], np.cumsum(lens)])
    pack_id = np.empty(n, dtype=np.int64)
    pack_pos = np.empty(n, dtype=np.int64)
    i = 0
    while i < n:
        j = int(np.searchsorted(cum, cum[i] + budget, side="right")) - 1
        j = max(j, i + 1)  # a doc longer than the budget packs alone
        pack_id[i:j] = ids[i]
        pack_pos[i:j] = np.arange(j - i)
        i = j
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(lens, pa.int64()),
            "pack_id": pa.array(pack_id, pa.int64()),
            "pack_pos": pa.array(pack_pos, pa.int64()),
        }
    )


def pack_sequences(
    token_counts: "ray.data.Dataset",
    budget: int = 2048,
) -> "ray.data.Dataset":
    """Pack (doc_id, n_tokens) rows into ≤ ``budget``-token sequences,
    one pack never spanning input blocks."""
    from functools import partial

    return token_counts.map_batches(
        partial(_pack_block, budget=budget), batch_format="pyarrow"
    )
