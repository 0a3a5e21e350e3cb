"""Join operators Ray Data lacks as primitives, composed the way the
task brief prescribes: an **as-of join** (latest right row at or before
each left row's timestamp, per key) and a **broadcast dimension join**
(small side shipped once via ``ray.put``, looked up map-side — never a
shuffle join).

As-of shape: both sides are tagged and UNIONED into one stream, ONE hash
exchange on the join key co-locates each key's full history, then one
vectorized kernel per block sorts (key, ts, side, id) and forward-fills
the latest right-row position with a single ``np.maximum.accumulate`` —
no per-key python, no driver funnel.  The partitioning assumption is the
same as sessionize (ops/sessions.py): one key's history fits one block,
true for per-user/device event keys at web scale.

Tie semantics (documented, oracle-exact): right rows at ts equal to the
left row's ts DO match (inclusive); among right candidates with the same
ts the largest id wins.  Left rows with no prior right row are dropped
(inner as-of).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_ASOF_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("left_id", pa.int64()),
        ("left_ts_us", pa.int64()),
        ("right_id", pa.int64()),
        ("right_ts_us", pa.int64()),
    ]
)


def _asof_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _ASOF_SCHEMA.empty_table()
    k = t["key"].to_numpy(zero_copy_only=False)
    ts = t["ts_us"].to_numpy(zero_copy_only=False)
    rid = t["rid"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)  # 0=right, 1=left
    # sort: right rows precede left at equal ts (inclusive match); right
    # rows with equal ts ascend by id so the forward-fill picks max id
    order = np.lexsort((rid, side, ts, k))
    k, ts, rid, side = k[order], ts[order], rid[order], side[order]
    n = len(k)
    last_right = np.where(side == 0, np.arange(n), -1)
    np.maximum.accumulate(last_right, out=last_right)
    idx = np.flatnonzero(side == 1)
    m = last_right[idx]
    ok = m >= 0
    ok[ok] = k[m[ok]] == k[idx[ok]]  # fill must come from the same key
    li, ri = idx[ok], m[ok]
    return pa.table(
        {
            "key": pa.array(k[li], pa.int64()),
            "left_id": pa.array(rid[li], pa.int64()),
            "left_ts_us": pa.array(ts[li], pa.int64()),
            "right_id": pa.array(rid[ri], pa.int64()),
            "right_ts_us": pa.array(ts[ri], pa.int64()),
        },
        schema=_ASOF_SCHEMA,
    )


def asof_join(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    key: str,
    ts: str,
    id_col: str,
) -> "ray.data.Dataset":
    """For each left row, the latest right row (same ``key``) with
    ``right.ts <= left.ts``; ties on ts broken by largest ``id_col``.
    Returns (key, left_id, left_ts_us, right_id, right_ts_us); left rows
    with no matching right row are dropped (inner as-of)."""
    from bitfunnel_ray.build.builder import tune_hash_shuffle

    def prep(tag: int):
        def f(t: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "key": t[key].cast(pa.int64()),
                    "ts_us": t[ts].cast(pa.int64()),
                    "rid": t[id_col].cast(pa.int64()),
                    "side": pa.array(np.full(len(t), tag, dtype=np.int8)),
                }
            )

        return f

    cols = [key, ts, id_col]
    both = (
        right.select_columns(cols)
        .map_batches(prep(0), batch_format="pyarrow")
        .union(left.select_columns(cols).map_batches(prep(1), batch_format="pyarrow"))
    )
    n_blocks = tune_hash_shuffle(both.context)
    return both.repartition(num_blocks=n_blocks, keys=["key"]).map_batches(
        _asof_block, batch_size=None, batch_format="pyarrow"
    )


class _BlocklistFilter:
    """Map-side anti-join: the blocklist key array rides the object store
    once per actor; each batch drops rows whose key is present
    (vectorized ``np.isin`` against the sorted blocklist)."""

    def __init__(self, keys_ref, key_col: str):
        import ray as _ray

        keys = _ray.get(keys_ref) if isinstance(keys_ref, _ray.ObjectRef) else keys_ref
        self.keys = np.sort(np.asarray(keys))
        self.key_col = key_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        bk = batch[self.key_col].to_numpy(zero_copy_only=False)
        keys = self.keys
        # dtype alignment: np.isin(uint64, int64) silently promotes BOTH
        # sides to float64, losing exactness for ids >= 2^53 — view the
        # blocklist as the big side's 64-bit integer dtype instead
        if (
            bk.dtype != keys.dtype
            and bk.dtype.kind in "iu"
            and keys.dtype.kind in "iu"
            and keys.dtype.itemsize == bk.dtype.itemsize
        ):
            keys = np.sort(keys.view(bk.dtype))
        return batch.filter(pa.array(~np.isin(bk, keys)))


def anti_join(
    big: "ray.data.Dataset",
    blocklist,
    *,
    key: str,
    broadcast: bool = True,
) -> "ray.data.Dataset":
    """Drop big-side rows whose ``key`` appears in ``blocklist``.

    ``broadcast=True`` (blocklist is a numpy array / pyarrow array that
    fits the object store — the usual case for curated blocklists): one
    ``ray.put``, map-side ``np.isin``, no exchange.

    ``broadcast=False`` (blocklist is a Dataset too big to broadcast):
    both sides are tagged, unioned, and co-partitioned by key in ONE hash
    exchange; each block then drops left rows whose key occurs among its
    right rows — the distributed anti-join shape (same partitioning
    contract as asof_join)."""
    import ray as _ray

    if broadcast:
        arr = blocklist.to_numpy(zero_copy_only=False) if isinstance(
            blocklist, (pa.Array, pa.ChunkedArray)
        ) else np.asarray(blocklist)
        ref = _ray.put(arr)
        return big.map_batches(
            _BlocklistFilter,
            fn_constructor_args=(ref, key),
            concurrency=(1, 8),
            batch_format="pyarrow",
        )

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    big_schema = big.schema().base_schema  # pyarrow schema

    def tag(side: int):
        def f(t: pa.Table) -> pa.Table:
            if side == 0:
                # blocklist rows widen to the big schema (nulls) so the
                # union is schema-stable through the exchange
                t = pa.table(
                    {
                        f.name: t[key] if f.name == key else pa.nulls(len(t), f.type)
                        for f in big_schema
                    }
                )
            return t.append_column(
                "_side", pa.array(np.full(len(t), side, dtype=np.int8))
            )

        return f

    def drop_blocked(t: pa.Table) -> pa.Table:
        side = t["_side"].to_numpy(zero_copy_only=False)
        k = t[key].to_numpy(zero_copy_only=False)
        blocked = np.unique(k[side == 0])
        keep = (side == 1) & ~np.isin(k, blocked)
        return t.filter(pa.array(keep)).drop_columns(["_side"])

    both = big.map_batches(tag(1), batch_format="pyarrow").union(
        blocklist.select_columns([key]).map_batches(tag(0), batch_format="pyarrow")
    )
    n_blocks = tune_hash_shuffle(both.context)
    return both.repartition(num_blocks=n_blocks, keys=[key]).map_batches(
        drop_blocked, batch_size=None, batch_format="pyarrow"
    )


class _DimLookup:
    """Map-side dimension lookup: the dim table rides the object store
    once per actor (``ray.put`` ref in ``__init__``), each batch joins by
    searchsorted on the (unique, sorted) dim key — the broadcast-join
    shape the brief requires for small sides (never re-shipped per batch,
    never a shuffle)."""

    def __init__(self, dim_ref, big_key: str, dim_key: str, dim_cols: list[str]):
        import ray as _ray

        dim = _ray.get(dim_ref) if isinstance(dim_ref, _ray.ObjectRef) else dim_ref
        order = np.argsort(dim[dim_key].to_numpy(zero_copy_only=False))
        self.keys = dim[dim_key].to_numpy(zero_copy_only=False)[order]
        # the searchsorted lookup resolves ONE dim row per big row, so a
        # duplicated dim key would silently drop match rows instead of
        # replicating (inner-join semantics) — refuse it loudly
        if len(self.keys) > 1 and (self.keys[1:] == self.keys[:-1]).any():
            dup = self.keys[1:][self.keys[1:] == self.keys[:-1]][0]
            raise ValueError(
                f"broadcast_dim_join: dim key '{dim_key}' has duplicate "
                f"value {dup!r}; dim keys must be unique"
            )
        self.cols = {c: dim[c].take(pa.array(order)) for c in dim_cols}
        self.big_key = big_key

    def __call__(self, batch: pa.Table) -> pa.Table:
        bk = batch[self.big_key].to_numpy(zero_copy_only=False)
        pos = np.searchsorted(self.keys, bk)
        pos[pos == len(self.keys)] = 0
        hit = self.keys[pos] == bk
        out = batch.filter(pa.array(hit))
        sel = pa.array(pos[hit])
        for name, arr in self.cols.items():
            out = out.append_column(name, arr.take(sel))
        return out


def broadcast_dim_join(
    big: "ray.data.Dataset",
    dim: pa.Table,
    *,
    big_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> "ray.data.Dataset":
    """Inner-join ``big`` against a small dimension table by equality on
    ``big_key`` = ``dim_key``, appending ``dim_cols``.  The dim table is
    broadcast via the object store (one copy cluster-wide); big-side rows
    with no dim match are dropped."""
    import ray as _ray

    ref = _ray.put(dim)
    return big.map_batches(
        _DimLookup,
        fn_constructor_args=(ref, big_key, dim_key, dim_cols),
        concurrency=(1, 8),
        batch_format="pyarrow",
    )


# --- range (point-in-interval) join ---------------------------------------

_RANGE_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("left_id", pa.int64()),
        ("ts_us", pa.int64()),
        ("iv_id", pa.int64()),
    ]
)


def _range_block(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return _RANGE_SCHEMA.empty_table()
    k = t["key"].to_numpy(zero_copy_only=False)
    ts = t["ts_us"].to_numpy(zero_copy_only=False)
    rid = t["rid"].to_numpy(zero_copy_only=False)
    end = t["end_us"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)  # 0=interval, 1=point
    order = np.lexsort((side, ts, k))  # interval before point at equal ts
    k, ts, rid, end, side = k[order], ts[order], rid[order], end[order], side[order]
    n = len(k)
    iv_pos = np.flatnonzero(side == 0)
    # non-overlap contract: within a key, each interval must end before
    # the next begins — violated input would silently lose matches, so
    # fail loudly (same honesty rule as the spill-ack row check)
    if len(iv_pos) > 1:
        a, bpos = iv_pos[:-1], iv_pos[1:]
        bad = (k[a] == k[bpos]) & (end[a] > ts[bpos])
        if bad.any():
            raise ValueError(
                "range_join: overlapping intervals within a key "
                f"(first at key={int(k[a[bad.argmax()]])}); the vectorized "
                "forward-fill sweep requires non-overlapping intervals "
                "(sessions/windows)"
            )
    last_iv = np.where(side == 0, np.arange(n), -1)
    np.maximum.accumulate(last_iv, out=last_iv)
    idx = np.flatnonzero(side == 1)
    m = last_iv[idx]
    ok = m >= 0
    ok[ok] &= (k[m[ok]] == k[idx[ok]]) & (ts[idx[ok]] < end[m[ok]])
    li, ri = idx[ok], m[ok]
    return pa.table(
        {
            "key": pa.array(k[li], pa.int64()),
            "left_id": pa.array(rid[li], pa.int64()),
            "ts_us": pa.array(ts[li], pa.int64()),
            "iv_id": pa.array(rid[ri], pa.int64()),
        },
        schema=_RANGE_SCHEMA,
    )


def range_join(
    points: "ray.data.Dataset",
    intervals: "ray.data.Dataset",
    *,
    key: str,
    ts: str,
    id_col: str,
    start: str = "start_us",
    end: str = "end_us",
    iv_id: str = "iv_id",
) -> "ray.data.Dataset":
    """Inner point-in-interval join: each ``points`` row pairs with the
    ``intervals`` row of the same ``key`` whose [start, end) contains its
    ``ts`` (start inclusive, end exclusive).  Intervals must be
    NON-OVERLAPPING per key (sessions, promo windows, maintenance slots —
    checked per block, loud error otherwise); overlapping-interval
    workloads need marker replication per time bucket instead.

    Same scale shape as asof_join: one tagged union + one hash exchange
    on ``key``, then a vectorized forward-fill sweep per block — no
    per-row python, no driver gather.  → (key, left_id, ts_us, iv_id).
    """
    from bitfunnel_ray.build.builder import tune_hash_shuffle

    def prep_points(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t[key].cast(pa.int64()),
                "ts_us": t[ts].cast(pa.int64()),
                "rid": t[id_col].cast(pa.int64()),
                "end_us": pa.array(np.zeros(len(t), dtype=np.int64)),
                "side": pa.array(np.ones(len(t), dtype=np.int8)),
            }
        )

    def prep_iv(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "key": t[key].cast(pa.int64()),
                "ts_us": t[start].cast(pa.int64()),
                "rid": t[iv_id].cast(pa.int64()),
                "end_us": t[end].cast(pa.int64()),
                "side": pa.array(np.zeros(len(t), dtype=np.int8)),
            }
        )

    both = (
        intervals.select_columns([key, start, end, iv_id])
        .map_batches(prep_iv, batch_format="pyarrow")
        .union(
            points.select_columns([key, ts, id_col]).map_batches(
                prep_points, batch_format="pyarrow"
            )
        )
    )
    n_blocks = tune_hash_shuffle(both.context)
    return both.repartition(num_blocks=n_blocks, keys=["key"]).map_batches(
        _range_block, batch_size=None, batch_format="pyarrow"
    )


def _cp_join_block(
    t: pa.Table, *, key: str, lnames: tuple, rnames: tuple, out_schema: pa.Schema
) -> pa.Table:
    """Inner equi-join within one key-partitioned block: side-1 (left)
    rows × side-0 (right) rows → full many-to-many match per key.
    Vectorized: sort the right side's keys, locate each left row's match
    range with two searchsorteds, expand with the arange-minus-offsets
    trick; payload columns ride along via Arrow ``take``.  Guards the
    zero-column empty blocks Ray 2.49 lets through skipped maps."""
    if len(t) == 0 or "_side" not in t.column_names:
        return out_schema.empty_table()
    side = t["_side"].to_numpy(zero_copy_only=False)
    kv = t[key].to_numpy(zero_copy_only=False)
    is_l = side == 1
    lk, rk = kv[is_l], kv[~is_l]
    if not len(lk) or not len(rk):
        return out_schema.empty_table()
    lt = t.filter(pa.array(is_l)).combine_chunks()
    rt = t.filter(pa.array(~is_l)).combine_chunks()
    order = np.argsort(rk, kind="stable")
    rk_sorted = rk[order]
    lo = np.searchsorted(rk_sorted, lk, side="left")
    hi = np.searchsorted(rk_sorted, lk, side="right")
    lens = hi - lo
    total = int(lens.sum())
    if total == 0:
        return out_schema.empty_table()
    flat = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
        + np.repeat(lo, lens)
    )
    lidx = pa.array(np.repeat(np.arange(len(lk), dtype=np.int64), lens))
    ridx = pa.array(order[flat].astype(np.int64))
    cols = {key: lt[key].take(lidx)}
    for n in lnames:
        cols[n] = lt[n].take(lidx)
    for n in rnames:
        cols[n] = rt[n].take(ridx)
    return pa.table(cols, schema=out_schema)


def inner_join_cp(
    left: "ray.data.Dataset",
    right: "ray.data.Dataset",
    *,
    key: str,
    num_partitions: int | None = None,
    left_schema: "pa.Schema | None" = None,
    right_schema: "pa.Schema | None" = None,
) -> "ray.data.Dataset":
    """Co-partitioned inner equi-join on ``key`` (an integer column both
    sides share) — the engine's replacement for ``Dataset.join``, which
    on this Ray (2.49) dies when an input contains the zero-column empty
    blocks that skipped upstream schema-changing maps ("No match for
    FieldRef...").  Both sides are tagged into ONE transport schema
    (other side's payload columns null), hash-exchanged on ``key``, and
    joined by a vectorized block kernel (full many-to-many semantics).
    Output columns: key + left payload + right payload (names must be
    disjoint apart from ``key``).  Exchange volume = both sides once —
    the same as a shuffle join, minus the string keys when callers
    pre-hash."""
    from functools import partial as _p

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    # schema inference EXECUTES a sample and returns None on an
    # all-empty side — callers that can feed an empty dataset (e.g. a
    # linkless corpus's link side) pass the schemas explicitly
    ls = left_schema or left.schema()
    rs = right_schema or right.schema()
    if ls is None or rs is None:
        raise ValueError(
            "inner_join_cp could not infer a side's schema (empty "
            "dataset?) — pass left_schema/right_schema explicitly"
        )
    lbase = ls if isinstance(ls, pa.Schema) else ls.base_schema
    rbase = rs if isinstance(rs, pa.Schema) else rs.base_schema
    lnames = tuple(f.name for f in lbase if f.name != key)
    rnames = tuple(f.name for f in rbase if f.name != key)
    clash = set(lnames) & set(rnames)
    if clash:
        raise ValueError(f"inner_join_cp payload column clash: {sorted(clash)}")
    key_type = lbase.field(key).type
    transport = pa.schema(
        [pa.field(key, key_type), pa.field("_side", pa.int8())]
        + [lbase.field(n) for n in lnames]
        + [rbase.field(n) for n in rnames]
    )
    out_schema = pa.schema(
        [pa.field(key, key_type)]
        + [lbase.field(n) for n in lnames]
        + [rbase.field(n) for n in rnames]
    )

    def tag(t: pa.Table, *, side: int) -> pa.Table:
        if len(t) == 0 or key not in t.column_names:
            return transport.empty_table()
        # SQL inner-join null semantics: null keys never match — drop them
        # here (they would otherwise surface as NaN after to_numpy, where
        # NaN==NaN ranges falsely match and int64 keys degrade to float64)
        kcol = t[key]
        if kcol.null_count:
            import pyarrow.compute as _pc

            t = t.filter(_pc.is_valid(kcol))
            if len(t) == 0:
                return transport.empty_table()
        mine = lnames if side == 1 else rnames
        cols = {key: t[key].cast(key_type), "_side": pa.array(np.full(len(t), side, np.int8))}
        for f in transport:
            if f.name in (key, "_side"):
                continue
            cols[f.name] = t[f.name] if f.name in mine else pa.nulls(len(t), f.type)
        return pa.table(cols, schema=transport)

    both = left.map_batches(_p(tag, side=1), batch_format="pyarrow").union(
        right.map_batches(_p(tag, side=0), batch_format="pyarrow")
    )
    # always configure the hash-shuffle strategy, even with a pinned count
    default_parts = tune_hash_shuffle(both.context)
    n_parts = num_partitions or default_parts
    return both.repartition(num_blocks=n_parts, keys=[key]).map_batches(
        _p(_cp_join_block, key=key, lnames=lnames, rnames=rnames, out_schema=out_schema),
        batch_size=None,
        batch_format="pyarrow",
    )


def anti_join_bloom(
    big: "ray.data.Dataset",
    blocklist: "ray.data.Dataset",
    *,
    key: str,
    n_keys: int,
    fpr: float = 0.01,
) -> "ray.data.Dataset":
    """Anti-join against a blocklist too big to broadcast raw, without
    exchanging the big side: a Bloom filter of the blocklist
    (functions/bloom.py — ~1.2 GB per 10^10 keys at 1% FPR, vs 80 GB of
    raw ids) broadcasts to every actor; bloom-NEGATIVE rows (the
    overwhelming majority) pass through with zero exchange, and only
    bloom-POSITIVE rows (true hits + ~fpr of the rest) run the exact
    co-partitioned anti-join.  Exactness is preserved — the filter has
    no false negatives, and every positive is verified.

    Cost shape: big is SCANNED twice (negative pass-through + positive
    split — cheap, column-pruned) but EXCHANGED ~(|blocked| + fpr·n)
    rows instead of n; at web scale the exchange is the cost that
    matters.  ``n_keys`` sizes the filter (pass the blocklist
    cardinality or an overestimate)."""
    import ray as _ray

    from bitfunnel_ray.build.builder import tune_hash_shuffle
    from bitfunnel_ray.functions.bloom import bloom_from_dataset

    # configure the hash-exchange strategy BEFORE deriving datasets — the
    # context snapshot taken here rides through the union into the final
    # co-partitioned verify
    tune_hash_shuffle(big.context)
    bloom = bloom_from_dataset(blocklist, key, n_keys=n_keys, fpr=fpr)
    bloom_ref = _ray.put(bloom)

    def split(keep_positive: bool):
        def f(t: pa.Table) -> pa.Table:
            b = _ray.get(bloom_ref)
            k = t[key].to_numpy(zero_copy_only=False).astype(np.uint64)
            hit = b.contains_many(k)
            return t.filter(pa.array(hit if keep_positive else ~hit))

        return f

    clean = big.map_batches(split(False), batch_format="pyarrow")
    suspects = big.map_batches(split(True), batch_format="pyarrow")
    resolved = anti_join(suspects, blocklist, key=key, broadcast=False)
    return clean.union(resolved)
