"""Exact distributed percentiles over an integer-valued column.

Shape: per-block value-count partials (``np.unique`` — each block emits
at most |distinct values in block| rows), one hash exchange on the value,
a per-block count reduce, then the driver receives the MERGED histogram
— whose size is bounded by the column's value DOMAIN (e.g. document
lengths, short-bounded), never by the row count — and reads the
percentiles off the cumulative counts.  This is the map-side-combine →
tiny-exchange → bounded-driver-read pattern the df table uses; no sort
of the data, no row-count-sized driver gather.

Semantics match SQL ``percentile_disc(q) WITHIN GROUP (ORDER BY v)``:
the smallest value whose cumulative row count reaches ``ceil(q * n)``
(an actual data value, so integer comparisons stay exact).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa


def _value_counts_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return pa.table({"value": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
    v, c = np.unique(t["value"].to_numpy(zero_copy_only=False), return_counts=True)
    return pa.table({"value": pa.array(v, pa.int64()), "cnt": pa.array(c.astype(np.int64))})


def exact_percentiles(
    ds: "ray.data.Dataset",
    col: str,
    quantiles: tuple[float, ...] = (0.25, 0.5, 0.75, 0.95, 0.99),
) -> pa.Table:
    """percentile_disc over an integer column; returns (q, value)."""
    from bitfunnel_ray.build.builder import tune_hash_shuffle

    vals = ds.select_columns([col]).map_batches(
        lambda t: pa.table({"value": t[col].cast(pa.int64())}), batch_format="pyarrow"
    )
    n_blocks = tune_hash_shuffle(vals.context)
    partials = vals.map_batches(_value_counts_block, batch_format="pyarrow")
    hist = (
        partials.repartition(num_blocks=n_blocks, keys=["value"])
        .map_batches(_value_counts_block_sum, batch_size=None, batch_format="pyarrow")
        .to_pandas()  # bounded by the value domain, not the row count
        .sort_values("value")
    )
    n = int(hist["cnt"].sum())
    cum = hist["cnt"].cumsum().to_numpy()
    values = hist["value"].to_numpy()
    out_q, out_v = [], []
    for q in quantiles:
        rank = max(1, math.ceil(q * n)) if n else 0
        idx = int(np.searchsorted(cum, rank))
        out_q.append(float(q))
        out_v.append(int(values[idx]) if n else 0)
    return pa.table({"q": pa.array(out_q, pa.float64()), "value": pa.array(out_v, pa.int64())})


def _value_counts_block_sum(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return pa.table({"value": pa.array([], pa.int64()), "cnt": pa.array([], pa.int64())})
    v = t["value"].to_numpy(zero_copy_only=False)
    c = t["cnt"].to_numpy(zero_copy_only=False)
    order = np.argsort(v, kind="stable")
    v, c = v[order], c[order]
    starts = np.flatnonzero(np.diff(v, prepend=v[0] - 1))
    return pa.table(
        {
            "value": pa.array(v[starts], pa.int64()),
            "cnt": pa.array(np.add.reduceat(c, starts).astype(np.int64)),
        }
    )
