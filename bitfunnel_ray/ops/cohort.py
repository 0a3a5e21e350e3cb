"""Cohort retention — the product-analytics retention matrix: users
grouped by the ISO week of their FIRST event (their cohort), counted in
every later week they were active, as (cohort_week, week_offset,
n_users).

Scale shape: the read prunes to (user_id, ts); ONE hash exchange on
user_id co-locates each user's events, so a user's (cohort, offset)
cells are deduped entirely map-side and each block emits partial counts
per cell — the driver merges a cohort-matrix-sized table (weeks²
rows), never users.  The week kernel is integer arithmetic on epoch
days (ISO weeks start Monday — matches DuckDB ``date_trunc('week')``).

Reference analog: none (web-analytics op); oracle is the standard
date_trunc + datediff SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

import ray

_DAY_US = 86_400_000_000


def _week_start_us(ts_us: np.ndarray) -> np.ndarray:
    """ISO week start (Monday 00:00) in epoch µs.  1970-01-01 was a
    Thursday, so weekday = (epoch_days + 3) % 7 with Monday = 0; floor
    division keeps pre-1970 timestamps correct too."""
    days = np.floor_divide(ts_us, _DAY_US)
    dow = (days + 3) % 7
    return (days - dow) * _DAY_US


def _cohort_block(t: pa.Table) -> pa.Table:
    empty = pa.table(
        {
            "cohort_week_us": pa.array([], pa.int64()),
            "week_offset": pa.array([], pa.int64()),
            "n_part": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    user = t["user_id"].to_numpy(zero_copy_only=False)
    wk = t["wk_us"].to_numpy(zero_copy_only=False)
    order = np.lexsort((wk, user))
    user, wk = user[order], wk[order]
    new_user = np.empty(len(user), dtype=bool)
    new_user[0] = True
    new_user[1:] = user[1:] != user[:-1]
    seg = np.cumsum(new_user) - 1
    cohort = wk[new_user][seg]  # first (= min) week per user, broadcast to rows
    # distinct (user, week) cells only
    new_cell = np.empty(len(user), dtype=bool)
    new_cell[0] = True
    new_cell[1:] = new_user[1:] | (wk[1:] != wk[:-1])
    cohort, wk = cohort[new_cell], wk[new_cell]
    offset = (wk - cohort) // (7 * _DAY_US)
    # partial counts per (cohort, offset): each user lives in ONE block
    # (hash exchange on user), so summing partials counts distinct users.
    # Pack with the small integer WEEK INDEX (µs × 2^20 would overflow):
    # week starts sit at (7k - 3) days, so (days + 3) // 7 is exact.
    widx = (cohort // _DAY_US + 3) // 7
    key = widx * np.int64(1 << 20) + offset  # offsets ≪ 2^20 weeks
    uk, counts = np.unique(key, return_counts=True)
    return pa.table(
        {
            "cohort_week_us": pa.array(
                ((uk // (1 << 20)) * 7 - 3) * _DAY_US, pa.int64()
            ),
            "week_offset": pa.array(uk % (1 << 20), pa.int64()),
            "n_part": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _dedup_user_weeks(t: pa.Table) -> pa.Table:
    """Map-side combine BEFORE the exchange: an event stream has many
    events per (user, week), but the matrix only needs the distinct
    pairs — deduping per block cuts exchange volume by the per-week
    event multiplicity (measured 8× at 20M rows / 200k users)."""
    if len(t) == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()), "wk_us": pa.array([], pa.int64())}
        )
    user = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
    wk = _week_start_us(ts)
    order = np.lexsort((wk, user))
    u, w = user[order], wk[order]
    keep = np.empty(len(u), dtype=bool)
    keep[0] = True
    keep[1:] = (u[1:] != u[:-1]) | (w[1:] != w[:-1])
    return pa.table(
        {"user_id": pa.array(u[keep], pa.int64()), "wk_us": pa.array(w[keep], pa.int64())}
    )


def cohort_retention(events: "ray.data.Dataset") -> pa.Table:
    """Retention matrix (cohort_week_us, week_offset, n_users) sorted by
    (cohort, offset).  ``events`` needs ``user_id`` and ``ts``."""
    from bitfunnel_ray.build.builder import tune_hash_shuffle

    slim = events.select_columns(["user_id", "ts"]).map_batches(
        _dedup_user_weeks, batch_format="pyarrow"
    )
    n_blocks = tune_hash_shuffle(slim.context)
    parts = slim.repartition(num_blocks=n_blocks, keys=["user_id"]).map_batches(
        _cohort_block, batch_size=None, batch_format="pyarrow"
    )
    tables = [x for x in ray.get(parts.to_arrow_refs()) if len(x)]
    if not tables:
        return pa.table(
            {
                "cohort_week_us": pa.array([], pa.int64()),
                "week_offset": pa.array([], pa.int64()),
                "n_users": pa.array([], pa.int64()),
            }
        )
    merged = pa.concat_tables(tables)
    out = merged.group_by(["cohort_week_us", "week_offset"]).aggregate(
        [("n_part", "sum")]
    )
    out = out.rename_columns(["cohort_week_us", "week_offset", "n_users"])
    return out.set_column(2, "n_users", out["n_users"].cast(pa.int64())).sort_by(
        [("cohort_week_us", "ascending"), ("week_offset", "ascending")]
    )


def _dedup_user_days(t: pa.Table) -> pa.Table:
    """Map-side combine: distinct (user, epoch-day) pairs per block."""
    if len(t) == 0:
        return pa.table(
            {"user_id": pa.array([], pa.int64()), "day": pa.array([], pa.int64())}
        )
    user = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").view(np.int64)
    day = np.floor_divide(ts, _DAY_US)
    order = np.lexsort((day, user))
    u, d = user[order], day[order]
    keep = np.empty(len(u), dtype=bool)
    keep[0] = True
    keep[1:] = (u[1:] != u[:-1]) | (d[1:] != d[:-1])
    return pa.table(
        {"user_id": pa.array(u[keep], pa.int64()), "day": pa.array(d[keep], pa.int64())}
    )


def _wau_block(t: pa.Table, *, window_days: int) -> pa.Table:
    """One user-partitioned block of distinct (user, day) pairs → partial
    (window_day, n_users) counts: each active day covers window days
    d..d+W-1, coverage dedupes per user INSIDE the block (the exchange
    guarantees a user lives in exactly one block, so summing partials
    counts distinct users), plus the block's max observed day for the
    trailing-edge cap."""
    empty = pa.table(
        {
            "day": pa.array([], pa.int64()),
            "n_part": pa.array([], pa.int64()),
            "max_day": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    u = t["user_id"].to_numpy(zero_copy_only=False)
    d = t["day"].to_numpy(zero_copy_only=False)
    w = np.arange(window_days, dtype=np.int64)
    cu = np.repeat(u, window_days)
    cd = (d[:, None] + w[None, :]).ravel()
    order = np.lexsort((cd, cu))
    cu, cd = cu[order], cd[order]
    keep = np.empty(len(cu), dtype=bool)
    keep[0] = True
    keep[1:] = (cu[1:] != cu[:-1]) | (cd[1:] != cd[:-1])
    cd = cd[keep]
    days, counts = np.unique(cd, return_counts=True)
    return pa.table(
        {
            "day": pa.array(days, pa.int64()),
            "n_part": pa.array(counts.astype(np.int64), pa.int64()),
            "max_day": pa.array(np.full(len(days), d.max(), np.int64), pa.int64()),
        }
    )


def rolling_active_users(
    events: "ray.data.Dataset", window_days: int = 7
) -> pa.Table:
    """Rolling W-day active-user counts (e.g. WAU per day): for each day,
    the number of distinct users with ≥ 1 event in [day-W+1, day],
    reported for every day up to the last observed event day.  Exact —
    same shape as the cohort matrix: map-side (user, day) dedup, one
    exchange on user, per-block coverage partials; the driver merges
    calendar-sized rows.  Returns (day_us, n_users) sorted by day."""
    from functools import partial as _bind

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    slim = events.select_columns(["user_id", "ts"]).map_batches(
        _dedup_user_days, batch_format="pyarrow"
    )
    n_blocks = tune_hash_shuffle(slim.context)
    parts = slim.repartition(num_blocks=n_blocks, keys=["user_id"]).map_batches(
        _bind(_wau_block, window_days=window_days),
        batch_size=None,
        batch_format="pyarrow",
    )
    tables = [x for x in ray.get(parts.to_arrow_refs()) if len(x)]
    if not tables:
        return pa.table(
            {"day_us": pa.array([], pa.int64()), "n_users": pa.array([], pa.int64())}
        )
    merged = pa.concat_tables(tables)
    d = merged["day"].to_numpy(zero_copy_only=False)
    c = merged["n_part"].to_numpy(zero_copy_only=False)
    max_day = int(merged["max_day"].to_numpy(zero_copy_only=False).max())
    keep = d <= max_day
    d, c = d[keep], c[keep]
    days, inv = np.unique(d, return_inverse=True)
    counts = np.bincount(inv, weights=c).astype(np.int64)
    return pa.table(
        {
            "day_us": pa.array(days * _DAY_US, pa.int64()),
            "n_users": pa.array(counts, pa.int64()),
        }
    )
