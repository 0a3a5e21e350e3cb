"""Deduplication operators for training-data pipelines: exact, MinHash+LSH,
SimHash, n-gram Jaccard verification, embedding-cosine near-dup.

No reference analog (BitFunnel assumes unique DocIds, SURVEY.md §2.7
"Exact dedup: none"); these are the standard web-corpus dedup family,
built Ray-Data-first:

- exact:   content-hash per batch (map-side) → ``groupby(hash)`` keep min
           doc_id — the only shuffle carries (hash, doc_id), never text;
- minhash: shingle → 64-perm minhash signature per doc (vectorized) →
           explode to (band_id, band_key, doc_id) rows → groupby bands →
           candidate pairs → exact-Jaccard verify (per-group, pairwise on
           the band's signatures, then exact shingles);
- simhash: 64-bit simhash per doc → 4×16-bit band groupby → candidates →
           hamming verify;
- embedding: cosine near-dup via normalized-vector LSH bucket groupby
           (hyperplane signs) with in-bucket exact cosine verify.

Determinism: all "random" permutations/planes derive from fixed seeds.
Skew note: a degenerate band key (e.g. the all-equal-signature band of
boilerplate docs) can concentrate a group; groups are capped at
``max_group`` and oversized groups are reported, not silently exploded.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

from bitfunnel_ray.functions.hashing import hash_terms
from bitfunnel_ray.stages.tokenize import flat_tokens, hash_token_array

# --- exact ----------------------------------------------------------------


def content_hash_batch(t: pa.Table) -> pa.Table:
    texts = t["text"].to_pylist()
    hashes = hash_terms(np.asarray([x or "" for x in texts], dtype=object))
    # int64 bit-view: uint64 keys degrade Ray's shuffle to pickled objects
    return pa.table(
        {"doc_id": t["doc_id"], "content_hash": pa.array(hashes.view(np.int64), pa.int64())}
    )


def exact_dedup_keep(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    """Kept representative per identical text: (content_hash, doc_id=min)."""
    hashed = corpus.select_columns(["doc_id", "text"]).map_batches(
        content_hash_batch, batch_format="pyarrow"
    )
    return hashed.groupby("content_hash").aggregate(Min("doc_id", alias_name="doc_id"))


# --- shingles + minhash ---------------------------------------------------

_NPERM = 64
_PERM_XOR = hash_terms(np.asarray([f"perm{i}" for i in range(_NPERM)], dtype=object))


def shingle_flat(texts: pa.Array, k: int = 3):
    """All docs' unique k-token-shingle hashes as flat arrays:
    (shingle_hash[uint64], doc_of[int64], n_docs).  Docs with < k tokens
    contribute nothing."""
    flat, doc_of, doclen = flat_tokens(texts)
    n_docs = len(doclen)
    h = hash_token_array(flat)
    n_tok = len(h)
    m = n_tok - k + 1
    if m <= 0:
        return np.empty(0, np.uint64), np.empty(0, np.int64), n_docs
    acc = h[:m].copy()
    for j in range(1, k):
        acc = ((acc << np.uint64(1)) | (acc >> np.uint64(63))) ^ h[j : m + j]
    valid = doc_of[:m] == doc_of[k - 1 :]
    acc, d = acc[valid], doc_of[:m][valid]
    # unique per doc
    order = np.lexsort((acc, d))
    acc, d = acc[order], d[order]
    keep = np.empty(len(acc), dtype=bool)
    if len(acc):
        keep[0] = True
        keep[1:] = (d[1:] != d[:-1]) | (acc[1:] != acc[:-1])
        acc, d = acc[keep], d[keep]
    return acc, d, n_docs


def shingle_hashes(texts: pa.Array, k: int = 3):
    """Per doc: sorted unique shingle hashes (list per doc) + doclen."""
    _, _, doclen = flat_tokens(texts)  # doclen for API compat
    acc, d, n_docs = shingle_flat(texts, k)
    out = [np.empty(0, np.uint64) for _ in range(n_docs)]
    if len(acc):
        starts = np.flatnonzero(np.diff(d, prepend=-1))
        bounds = np.append(starts, len(acc))
        for i in range(len(bounds) - 1):
            out[int(d[bounds[i]])] = acc[bounds[i] : bounds[i + 1]]
    return out, doclen


def minhash_signatures(texts: pa.Array, k: int = 3) -> np.ndarray:
    """(n_docs, 64) minhash matrix, fully vectorized: xor-permutation
    family + one segmented min (reduceat) per batch.  Docs with no
    shingles get all-max sentinel signatures."""
    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    acc, d, n_docs = shingle_flat(texts, k)
    sigs = np.full((n_docs, _NPERM), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if len(acc):
        starts = np.flatnonzero(np.diff(d, prepend=-1))
        rows = d[starts]
        # one perm at a time: the (n_shingles,) temporaries stay cache-hot,
        # ~30x faster than one (n_shingles, 64) matrix + axis-0 reduceat
        # (strided reduction thrashes memory bandwidth; measured 1.08s vs
        # 0.037s per 320k-shingle batch)
        for j in range(_NPERM):
            sigs[rows, j] = np.minimum.reduceat(acc ^ _PERM_XOR[j], starts)
    return sigs


def minhash_signature(sh: np.ndarray) -> np.ndarray:
    """64-perm minhash of one shingle-hash set (xor-permutation family)."""
    if not len(sh):
        return np.full(_NPERM, np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    return (sh[:, None] ^ _PERM_XOR[None, :]).min(axis=0)


class MinhashBands:
    """corpus batch → (band_id, band_key, doc_id) rows for LSH bucketing."""

    def __init__(self, k: int = 3, bands: int = 16):
        assert _NPERM % bands == 0
        self.k, self.bands, self.rows = k, bands, _NPERM // bands

    def __call__(self, t: pa.Table) -> pa.Table:
        doc_ids = t["doc_id"].to_numpy()
        sigs = minhash_signatures(t["text"], self.k)  # (n, 64)
        return _band_table(doc_ids, sigs, self.bands)


def _band_table(doc_ids: np.ndarray, sigs: np.ndarray, bands: int) -> pa.Table:
    """(n, 64) signature matrix → (band_id, band_key, doc_id) LSH rows —
    the shared kernel behind ``MinhashBands`` (signatures from text) and
    ``BandsFromShingles`` (signatures from a spilled shingle payload), so
    both paths are band-key bit-identical by construction."""
    n = len(doc_ids)
    rows = _NPERM // bands
    # band key = combined hash of the band's rows
    keys = np.zeros((n, bands), dtype=np.uint64)
    for b in range(bands):
        seg = sigs[:, b * rows : (b + 1) * rows]
        k = seg[:, 0].copy()
        for j in range(1, rows):
            k = ((k << np.uint64(1)) | (k >> np.uint64(63))) ^ seg[:, j]
        keys[:, b] = k
    band_id = np.repeat(np.arange(bands, dtype=np.int32)[None, :], n, axis=0)
    # int64 bit-views: uint64 key columns hit Ray's pickled-object
    # fallback inside shuffles
    return pa.table(
        {
            "band_id": pa.array(band_id.ravel(), pa.int32()),
            "band_key": pa.array(keys.ravel().view(np.int64), pa.int64()),
            "doc_id": pa.array(np.repeat(doc_ids.astype(np.int64), bands), pa.int64()),
        }
    )


def _pairs_from_block(t: pa.Table, *, max_group: int, cross: bool = False) -> pa.Table:
    """Vectorized all-pairs within equal (band_id, band_key) runs of one
    hash-partitioned block.  No per-group python: runs are found by sort +
    diff; pairs are emitted per run-LENGTH class with one broadcasted index
    template each (millions of tiny groups cost ~zero python calls).
    Oversized runs (> max_group, degenerate boilerplate keys) are skipped
    — a deliberate coverage cap, surfaced as one (-1, -1) marker row per
    skipped run (the pair-dedup pass collapses them into a single
    counter row callers can read or filter).

    ``cross=True`` (rows carry a ``side`` int8 column, 1=new / 0=ref):
    emit only side-1 × side-0 pairs with doc_a = the NEW id — the
    incremental-dedup shape."""
    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    if len(t) == 0:
        return empty
    bid = t["band_id"].to_numpy(zero_copy_only=False)
    key = t["band_key"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    side = (
        t["side"].to_numpy(zero_copy_only=False)
        if cross
        else np.zeros(len(t), np.int8)
    )
    order = np.lexsort((doc, side, key, bid))
    bid, key, doc, side = bid[order], key[order], doc[order], side[order]
    new = np.empty(len(bid), dtype=bool)
    new[0] = True
    new[1:] = (bid[1:] != bid[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(bid)))
    n_skipped = int((lens > max_group).sum())
    out_a, out_b = [], []
    for L in np.unique(lens):
        if L < 2 or L > max_group:
            continue
        s = starts[lens == L]  # all runs of this length
        ai, bj = np.triu_indices(int(L), k=1)
        abs_a = (s[:, None] + ai[None, :]).ravel()
        abs_b = (s[:, None] + bj[None, :]).ravel()
        a, b = doc[abs_a], doc[abs_b]
        if cross:
            sa, sb = side[abs_a], side[abs_b]
            keep = sa != sb
            if not keep.any():
                continue
            is_new_a = sa[keep] == 1
            a, b = a[keep], b[keep]
            out_a.append(np.where(is_new_a, a, b))
            out_b.append(np.where(is_new_a, b, a))
        else:
            out_a.append(np.minimum(a, b))
            out_b.append(np.maximum(a, b))
    if n_skipped:
        out_a.append(np.full(n_skipped, -1, np.int64))
        out_b.append(np.full(n_skipped, -1, np.int64))
    if not out_a:
        return empty
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
        }
    )


def _dedup_pairs_block(t: pa.Table) -> pa.Table:
    """Distinct (doc_a, doc_b) + collision count within one
    pair-partitioned block — one lexsort + run-length count (replaces a
    sort-based groupby that measured ~6x slower on the same exchange)."""
    if len(t) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "n_bands": pa.array([], pa.int64()),
            }
        )
    a = t["doc_a"].to_numpy(zero_copy_only=False)
    b = t["doc_b"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    counts = np.diff(np.append(starts, len(a)))
    return pa.table(
        {
            "doc_a": pa.array(a[starts], pa.int64()),
            "doc_b": pa.array(b[starts], pa.int64()),
            "n_bands": pa.array(counts.astype(np.int64), pa.int64()),
        }
    )


def _band_pairs(band_rows: "ray.data.Dataset", max_group: int) -> "ray.data.Dataset":
    """(band_id, band_key, doc_id) rows → distinct candidate pairs with
    band-collision counts.  Hash-partition on the band key co-locates whole
    groups; pair-gen is one vectorized pass per block; a second keyed
    exchange on the pair itself dedups pairs surfaced by multiple bands."""
    from functools import partial

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    n_blocks = tune_hash_shuffle(band_rows.context)
    pairs = band_rows.repartition(num_blocks=n_blocks, keys=["band_id", "band_key"]).map_batches(
        partial(_pairs_from_block, max_group=max_group),
        batch_size=None,
        batch_format="pyarrow",
    )
    return pairs.repartition(num_blocks=n_blocks, keys=["doc_a", "doc_b"]).map_batches(
        _dedup_pairs_block, batch_size=None, batch_format="pyarrow"
    )


def minhash_candidates(
    corpus: "ray.data.Dataset", k: int = 3, bands: int = 16, max_group: int = 256
) -> "ray.data.Dataset":
    """Distinct candidate near-dup pairs from LSH band collisions."""
    band_rows = corpus.select_columns(["doc_id", "text"]).map_batches(
        MinhashBands(k, bands), batch_format="pyarrow"
    )
    return _band_pairs(band_rows, max_group)


_EMPTY_PAIRS = pa.table(
    {
        "doc_a": pa.array([], pa.int64()),
        "doc_b": pa.array([], pa.int64()),
        "jaccard": pa.array([], pa.float64()),
    }
)


_SENTINEL = -1  # doc_a value marking a payload-carrier row in the join


def _attach_payload(block: pa.Table) -> pa.Table:
    """Pair-join stage 1 (per doc_id partition): attach each doc's payload
    list to its pair rows.  Payload-carrier rows have doc_a == sentinel;
    pair rows get their payload via one sorted searchsorted + arrow take."""
    if len(block) == 0:
        return block
    doc_a = block["doc_a"].to_numpy(zero_copy_only=False)
    is_pl = doc_a == _SENTINEL
    pl_rows = block.filter(pa.array(is_pl))
    pr_rows = block.filter(pa.array(~is_pl))
    if len(pr_rows) == 0 or len(pl_rows) == 0:
        return block.schema.empty_table()
    pl_ids = pl_rows["doc_id"].to_numpy(zero_copy_only=False)
    order = np.argsort(pl_ids, kind="stable")
    pl_sorted = pl_ids[order]
    want = pr_rows["doc_id"].to_numpy(zero_copy_only=False)
    pos = np.searchsorted(pl_sorted, want)
    pos[pos == len(pl_sorted)] = 0
    found = pl_sorted[pos] == want
    pr_keep = pr_rows.filter(pa.array(found))
    take_idx = pa.array(order[pos[found]].astype(np.int64))
    payload = pl_rows["payload"].combine_chunks().take(take_idx)
    return pa.table(
        {
            "doc_id": pr_keep["doc_id"],
            "doc_a": pr_keep["doc_a"],
            "doc_b": pr_keep["doc_b"],
            "payload": payload,
        }
    )


def _locate_pairs(block: pa.Table):
    """Pair-join stage 2 shared prologue: sort rows by (doc_a, doc_b,
    doc_id) and find COMPLETE pairs (both sides present, adjacent after
    the sort).  Returns (a, b, flat_payload, offsets, first_row_idx)."""
    a = block["doc_a"].to_numpy(zero_copy_only=False)
    b = block["doc_b"].to_numpy(zero_copy_only=False)
    d = block["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((d, b, a))
    a, b, d = a[order], b[order], d[order]
    pl_col = block["payload"].combine_chunks().take(pa.array(order.astype(np.int64)))
    # .values + .offsets are the consistent absolute-offset pairing
    flat = pl_col.values.to_numpy(zero_copy_only=False)
    offs = pl_col.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    same = (a[1:] == a[:-1]) & (b[1:] == b[:-1]) & (d[1:] != d[:-1])
    return a, b, flat, offs, np.flatnonzero(same)


def _reduce_jaccard(
    block: pa.Table, *, threshold: float, slice_vals: int = 2_000_000
) -> pa.Table:
    """Per-pair exact Jaccard over shingle-list payloads, fully
    vectorized: each side's shingles are unique within its doc, so
    |∩| = count of values appearing twice within the pair — one
    single-key in-place sort of (pair_ordinal << 32 | shingle32) packed
    int64 keys + one adjacent-equal bincount per SLICE of ~``slice_vals``
    values.  Slicing is load-bearing, not cosmetic: a whole-block kernel
    allocates ~100 MB temporaries per task, and 16 concurrent tasks
    page-fault-storm the allocator (measured 70s wall 16-way vs 1.1s for
    the sliced kernel on identical input)."""
    if len(block) == 0:
        return _EMPTY_PAIRS
    a, b, flat, offs, idx = _locate_pairs(block)
    if not len(idx):
        return _EMPTY_PAIRS
    npairs = len(idx)
    row_lens = offs[1:] - offs[:-1]
    lens2_all = row_lens[idx] + row_lens[idx + 1]
    # pair-slice boundaries at ~slice_vals values
    cum = np.cumsum(lens2_all)
    n_slices = max(1, int(cum[-1] // slice_vals) + 1)
    bounds = np.unique(
        np.searchsorted(cum, np.linspace(0, cum[-1], n_slices + 1)[1:], side="left") + 1
    )
    bounds = np.concatenate([[0], bounds])
    bounds[-1] = npairs
    out_a, out_b, out_j = [], [], []
    for s0, s1 in zip(bounds[:-1], bounds[1:]):
        if s1 <= s0:
            continue
        sub = idx[s0:s1]
        nsub = int(s1 - s0)
        st = offs[sub]
        l2 = offs[sub + 2] - st  # a pair's values are the contiguous run
        tot = int(l2.sum())
        if tot == 0:
            continue
        g = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(l2) - l2, l2)
            + np.repeat(st, l2)
        )
        pof = np.repeat(np.arange(nsub, dtype=np.int64), l2)
        comb = (pof << np.int64(32)) | (flat[g].astype(np.int64) & np.int64(0xFFFFFFFF))
        comb.sort()
        dup = comb[1:] == comb[:-1]
        inter = np.bincount(comb[1:][dup] >> np.int64(32), minlength=nsub)
        union = l2 - inter
        with np.errstate(invalid="ignore", divide="ignore"):
            j = np.where(union > 0, inter / np.maximum(union, 1), 0.0)
        keep = (j >= threshold) & (l2 > 0)
        out_a.append(a[sub[keep]])
        out_b.append(b[sub[keep]])
        out_j.append(j[keep])
    if not out_a:
        return _EMPTY_PAIRS
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a).astype(np.int64), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b).astype(np.int64), pa.int64()),
            "jaccard": pa.array(np.concatenate(out_j), pa.float64()),
        }
    )


def _reduce_sig_est(block: pa.Table, *, min_est: float) -> pa.Table:
    """Per-pair estimated Jaccard from fixed-width minhash signatures
    (fraction of matching components) — no sorting at all: both sides
    reshape to (npairs, 64) and compare element-wise."""
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    if len(block) == 0:
        return empty
    a, b, flat, offs, idx = _locate_pairs(block)
    if not len(idx):
        return empty
    cols = np.arange(_NPERM, dtype=np.int64)[None, :]
    va = flat[offs[idx][:, None] + cols]
    vb = flat[offs[idx + 1][:, None] + cols]
    est = (va == vb).mean(axis=1)
    keep = est >= min_est
    return pa.table(
        {
            "doc_a": pa.array(a[idx[keep]].astype(np.int64), pa.int64()),
            "doc_b": pa.array(b[idx[keep]].astype(np.int64), pa.int64()),
        }
    )


def _payload_join(
    pairs: "ray.data.Dataset", payload_rows: "ray.data.Dataset", reducer
) -> "ray.data.Dataset":
    """Distributed pair-keyed join: explode pairs to one row per side,
    hash-exchange together with payload rows on doc_id (attach), then on
    (doc_a, doc_b) (reduce) — no driver gather, no coverage cap.  The
    ``.materialize()`` barriers keep the compute kernels in task-pool
    operators instead of fusing into the low-CPU shuffle aggregators.

    ``payload_rows`` schema: (doc_id int64, payload list<int64>)."""
    from functools import partial as _p

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    def as_carrier(t: pa.Table) -> pa.Table:
        n = len(t)
        s = np.full(n, _SENTINEL, np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "doc_a": pa.array(s, pa.int64()),
                "doc_b": pa.array(s, pa.int64()),
                "payload": t["payload"],
            }
        )

    def explode(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["doc_b"].to_numpy(zero_copy_only=False).astype(np.int64)
        doc = np.concatenate([a, b])
        empty = pa.ListArray.from_arrays(
            pa.array(np.zeros(len(doc) + 1, np.int32)), pa.array([], pa.int32())
        )
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "doc_a": pa.array(np.concatenate([a, a]), pa.int64()),
                "doc_b": pa.array(np.concatenate([b, b]), pa.int64()),
                "payload": empty,
            }
        )

    carriers = payload_rows.map_batches(as_carrier, batch_format="pyarrow")
    pair_rows = pairs.select_columns(["doc_a", "doc_b"]).map_batches(
        explode, batch_format="pyarrow"
    )
    unioned = carriers.union(pair_rows)
    n_blocks = tune_hash_shuffle(unioned.context)
    attached = (
        unioned.repartition(num_blocks=n_blocks, keys=["doc_id"])
        .materialize()
        .map_batches(_attach_payload, batch_size=None, batch_format="pyarrow")
    )
    return (
        attached.repartition(num_blocks=n_blocks, keys=["doc_a", "doc_b"])
        .materialize()
        .map_batches(reducer, batch_size=None, batch_format="pyarrow")
    )


def shingle_rows(
    corpus: "ray.data.Dataset", k: int, needed_ref=None
) -> "ray.data.Dataset":
    """(doc_id, payload = sorted unique k-shingle hashes as int32 views —
    the low 32 bits of the 64-bit shingle hash).  The 32-bit transport
    halves exchange volume and enables the packed single-key sort in
    ``_reduce_jaccard``; shingle identity was ALREADY a hash, so this only
    moves the collision probability from ~1e-19 to ~|Sa||Sb|/2^32 (~1e-6
    for typical web pages) per pair — a documented engineering trade.

    ``needed_ref`` (broadcast sorted int64 id array) restricts the
    extraction to candidate docs — the classic broadcast semi-join of the
    SMALL side (ids only, 8 B/doc)."""
    import ray

    def extract(t: pa.Table) -> pa.Table:
        sub = t
        if needed_ref is not None:
            want = ray.get(needed_ref) if isinstance(needed_ref, ray.ObjectRef) else needed_ref
            ids = t["doc_id"].to_numpy().astype(np.int64)
            pos = np.searchsorted(want, ids)
            pos[pos == len(want)] = 0
            keep = want[pos] == ids
            if not keep.any():
                return pa.table(
                    {
                        "doc_id": pa.array([], pa.int64()),
                        "payload": pa.array([], pa.list_(pa.int32())),
                    }
                )
            sub = t.filter(pa.array(keep))
        shs, _ = shingle_hashes(sub["text"], k)
        lens = np.array([len(s) for s in shs], dtype=np.int64)
        if len(shs) and lens.sum():
            flat64 = np.concatenate([s for s in shs if len(s)])
            # the count kernel never relies on per-doc ordering, only on
            # within-doc uniqueness — a within-doc 32-bit collision
            # (~|S|²/2³³ per doc) miscounts one intersection hit, the same
            # order of error as the cross-doc collision documented above
            flat = (flat64 & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        else:
            flat = np.empty(0, np.int32)
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        return pa.table(
            {
                "doc_id": sub["doc_id"].cast(pa.int64()),
                "payload": pa.ListArray.from_arrays(offsets, pa.array(flat, pa.int32())),
            }
        )

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        extract, batch_format="pyarrow"
    )


def _candidate_ids_ds(pairs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-block-unique candidate doc ids as a (doc_id) Dataset — the
    distributed feed for the bloom build.  Never gathered to the driver."""
    def block_ids(t: pa.Table) -> pa.Table:
        # empty shuffle partitions surface as ZERO-COLUMN empty blocks on
        # this Ray (2.49) — pass them through as a typed empty table
        if len(t) == 0 or "doc_a" not in t.column_names:
            return pa.table({"doc_id": pa.array([], pa.int64())})
        u = np.unique(
            np.concatenate(
                [
                    t["doc_a"].to_numpy(zero_copy_only=False),
                    t["doc_b"].to_numpy(zero_copy_only=False),
                ]
            )
        )
        return pa.table({"doc_id": pa.array(u.astype(np.int64), pa.int64())})

    return pairs.map_batches(block_ids, batch_format="pyarrow")


def _candidate_bloom_ref(pairs: "ray.data.Dataset", fpr: float = 0.01):
    """Bloom filter over the DISTINCT candidate doc ids of a pairs
    Dataset, built fully distributed, returned as a ``ray.ObjectRef``
    (None when pairs is empty).  Replaces the old driver-side
    ``np.unique`` gather (VERDICT r4 "What's wrong #1"): candidate ids
    never materialize as a driver array — each block contributes a fixed
    (m/8)-byte bitmap partial that OR-folds, so driver peak is 2·m/8
    regardless of candidate count.

    Sizing is by HyperLogLog estimate of the distinct-id cardinality
    (one KB-scale pass; ids are splitmix-mixed first because test-corpus
    doc ids are sequential ints, not hashes).  At 1% FPR the filter is
    ~1.2 GB per 10^10 candidates — if a corpus is SO dup-heavy that even
    that broadcast hurts, raise ``fpr`` (false positives only shingle a
    few extra docs; verify output is unchanged) or fall back to the
    co-partitioned semi-join on doc_id (``ops/joins.anti_join`` shape)."""
    import ray

    from bitfunnel_ray.functions.bloom import _C1, _mix, bloom_from_dataset
    from bitfunnel_ray.ops.sketch import _HLL_M, _hll_registers, hll_estimate

    ids_ds = _candidate_ids_ds(pairs).materialize()  # ids only, 8 B each
    if ids_ds.count() == 0:
        return None

    def hll_part(t: pa.Table) -> pa.Table:
        h = _mix(t["doc_id"].to_numpy(zero_copy_only=False).view(np.uint64), _C1)
        return pa.table({"reg": pa.array([_hll_registers(h).tobytes()], pa.binary())})

    reg = np.zeros(_HLL_M, np.uint8)
    parts = ids_ds.map_batches(hll_part, batch_format="pyarrow")
    for ref in parts.to_arrow_refs():
        t = ray.get(ref)
        if "reg" not in t.column_names:  # zero-column empty block
            continue
        for blob in t["reg"].to_pylist():
            np.maximum(reg, np.frombuffer(blob, dtype=np.uint8), out=reg)
    n_keys = max(1024, int(hll_estimate(reg) * 1.3))
    return ray.put(bloom_from_dataset(ids_ds, "doc_id", n_keys=n_keys, fpr=fpr))


def _bloom_filter_ids(
    ds: "ray.data.Dataset", bloom_ref, col: str = "doc_id"
) -> "ray.data.Dataset":
    """Keep rows whose ``col`` is bloom-POSSIBLE (never drops a true
    candidate; passes ~fpr extra rows that downstream joins discard)."""
    import ray

    def f(t: pa.Table) -> pa.Table:
        b = ray.get(bloom_ref)
        ids = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        return t.filter(pa.array(b.contains_many(ids)))

    return ds.map_batches(f, batch_format="pyarrow")


def shingle64_rows(corpus: "ray.data.Dataset", k: int = 3) -> "ray.data.Dataset":
    """(doc_id, payload = sorted unique 64-bit k-shingle hashes as int64
    views) — ONE tokenize+shingle pass whose output feeds BOTH the LSH
    banding (``BandsFromShingles``) and the exact verify
    (``_payload32_rows``), so the corpus is tokenized once per dedup run
    instead of once per stage.  Materialized by the caller, this is the
    dedup analog of the build's TokenizeSpill: ~8 B/shingle in the object
    store (spilling to disk at scale), traded for skipping the second
    full tokenize pass."""

    def extract(t: pa.Table) -> pa.Table:
        acc, d, n_docs = shingle_flat(t["text"], k)
        lens = (
            np.bincount(d, minlength=n_docs).astype(np.int64)
            if len(d)
            else np.zeros(n_docs, np.int64)
        )
        offsets = pa.array(np.concatenate([[0], np.cumsum(lens)]).astype(np.int32))
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "payload": pa.ListArray.from_arrays(
                    offsets, pa.array(acc.view(np.int64), pa.int64())
                ),
            }
        )

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        extract, batch_format="pyarrow"
    )


def _flat_payload64(t: pa.Table):
    """Shared prologue: a shingle64 payload column → (flat uint64 values
    rebased to 0, int64 offsets rebased to 0)."""
    pl = t["payload"].combine_chunks()
    flat = pl.values.to_numpy(zero_copy_only=False).view(np.uint64)
    offs = pl.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    lo = offs[0] if len(offs) else 0
    return flat[lo : offs[-1] if len(offs) else 0], offs - lo


def _sigs_from_flat(flat: np.ndarray, offs: np.ndarray) -> np.ndarray:
    """(n_docs, 64) minhash matrix from flat shingles + offsets — the
    same xor-permutation + segmented-min math as ``minhash_signatures``
    (bit-identical by shared ``_PERM_XOR``); docs with empty payloads get
    the all-max sentinel, exactly like the from-text path."""
    n_docs = len(offs) - 1
    sigs = np.full((n_docs, _NPERM), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    lens = offs[1:] - offs[:-1]
    rows = np.flatnonzero(lens)
    if len(rows):
        starts = offs[rows]
        flat = flat[: offs[rows[-1] + 1]]
        for j in range(_NPERM):
            sigs[rows, j] = np.minimum.reduceat(flat ^ _PERM_XOR[j], starts)
    return sigs


class BandsFromShingles:
    """shingle64 batch → (band_id, band_key, doc_id) LSH rows, bit-identical
    to ``MinhashBands`` over the same corpus (pytest-asserted) but without
    re-tokenizing — signatures recompute from the spilled payload with one
    segmented min per permutation."""

    def __init__(self, bands: int = 16):
        assert _NPERM % bands == 0
        self.bands = bands

    def __call__(self, t: pa.Table) -> pa.Table:
        from bitfunnel_ray.functions.mem import tune_allocator

        tune_allocator()
        flat, offs = _flat_payload64(t)
        return _band_table(t["doc_id"].to_numpy(), _sigs_from_flat(flat, offs), self.bands)


def _payload32_rows(sh64: "ray.data.Dataset", bloom_ref) -> "ray.data.Dataset":
    """Bloom-gated narrowing of spilled shingle64 rows to the 32-bit
    verify transport: keep candidate docs, view each shingle's low 32
    bits (identical values to ``shingle_rows``'s from-text payload)."""

    def narrow(t: pa.Table) -> pa.Table:
        flat, offs = _flat_payload64(t)
        f32 = (flat & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "payload": pa.ListArray.from_arrays(
                    pa.array(offs.astype(np.int32)), pa.array(f32, pa.int32())
                ),
            }
        )

    return _bloom_filter_ids(sh64, bloom_ref).map_batches(
        narrow, batch_format="pyarrow"
    )


def jaccard_verify_shingles(
    sh64: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    threshold: float = 0.7,
    fpr: float = 0.01,
) -> "ray.data.Dataset":
    """Exact-Jaccard verify over PRE-SPILLED shingle64 rows: bloom-gate
    the payload rows to candidate docs, narrow to the 32-bit transport,
    pair-keyed join + reduce.  No driver gather anywhere."""
    import ray

    from functools import partial as _p

    pairs = pairs.materialize()  # consumed twice: bloom build + explode
    bloom_ref = _candidate_bloom_ref(pairs, fpr)
    if bloom_ref is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    sh = _payload32_rows(sh64, bloom_ref)
    return _payload_join(pairs, sh, _p(_reduce_jaccard, threshold=threshold))


def jaccard_verify(
    corpus: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    k: int = 3,
    threshold: float = 0.7,
    fpr: float = 0.01,
) -> "ray.data.Dataset":
    """Exact n-gram Jaccard over candidate pairs as a DISTRIBUTED
    pair-keyed join (see ``_payload_join``): shingle sets never touch the
    driver and every pair is verified (no cap).  Exchange volume is
    O(Σ pair-side shingle lists) — the inherent cost of exactness.
    Candidate docs are selected by a distributed-built bloom filter
    (``_candidate_bloom_ref``) — the corpus rows that shingle are
    ~(candidates + fpr·n); bloom false positives produce payload rows no
    pair references, which the attach stage drops, so the output is
    bit-identical to an exact semi-join.  Returns a Dataset
    (doc_a, doc_b, jaccard ≥ threshold)."""
    import ray

    from functools import partial as _p

    pairs = pairs.materialize()  # consumed twice: bloom build + explode
    bloom_ref = _candidate_bloom_ref(pairs, fpr)
    if bloom_ref is None:
        return ray.data.from_arrow(_EMPTY_PAIRS)
    cand = _bloom_filter_ids(corpus.select_columns(["doc_id", "text"]), bloom_ref)
    sh = shingle_rows(cand, k)
    return _payload_join(pairs, sh, _p(_reduce_jaccard, threshold=threshold))


def minhash_sig_rows(corpus: "ray.data.Dataset", k: int = 3) -> "ray.data.Dataset":
    """(doc_id, payload = 64-perm minhash signature as int64 views)."""

    def sig_batch(t: pa.Table) -> pa.Table:
        sigs = minhash_signatures(t["text"], k)  # (n, 64) uint64
        n = len(t)
        offsets = pa.array(np.arange(0, (n + 1) * _NPERM, _NPERM, dtype=np.int32))
        # 32-bit views: the estimate only compares components for equality
        flat = (sigs.ravel() & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "payload": pa.ListArray.from_arrays(offsets, pa.array(flat, pa.int32())),
            }
        )

    return corpus.select_columns(["doc_id", "text"]).map_batches(
        sig_batch, batch_format="pyarrow"
    )


def _sig32_rows_from_shingles(
    sh64: "ray.data.Dataset", bloom_ref
) -> "ray.data.Dataset":
    """Bloom-gated (doc_id, payload = 64-component minhash signature as
    int32 low-bit views) rows recomputed from spilled shingles — the
    prefilter transport, without re-tokenizing."""

    def sig_batch(t: pa.Table) -> pa.Table:
        flat, offs = _flat_payload64(t)
        sigs = _sigs_from_flat(flat, offs)
        n = len(t)
        offsets = pa.array(np.arange(0, (n + 1) * _NPERM, _NPERM, dtype=np.int32))
        f32 = (sigs.ravel() & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        return pa.table(
            {
                "doc_id": t["doc_id"].cast(pa.int64()),
                "payload": pa.ListArray.from_arrays(offsets, pa.array(f32, pa.int32())),
            }
        )

    return _bloom_filter_ids(sh64, bloom_ref).map_batches(
        sig_batch, batch_format="pyarrow"
    )


def sig_prefilter(
    corpus: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    k: int,
    min_est: float,
    fpr: float = 0.01,
) -> "ray.data.Dataset":
    """Drop candidate pairs whose SIGNATURE-estimated Jaccard (matching
    components / 64) is below ``min_est`` — a fixed-width, sort-free join
    that typically cuts the exact-verify volume ~10x.  A true pair at
    jaccard j survives with prob P(Binom(64, j)/64 ≥ min_est); with the
    default margin (min_est = threshold - 0.2) the false-negative rate at
    j ≥ threshold is < 1e-5.  Candidate docs are bloom-gated (see
    ``_candidate_bloom_ref``) — no driver-side id gather."""
    from functools import partial as _p

    bloom_ref = _candidate_bloom_ref(pairs, fpr)
    if bloom_ref is None:
        return pairs
    sigs = minhash_sig_rows(
        _bloom_filter_ids(corpus.select_columns(["doc_id", "text"]), bloom_ref), k
    )
    return _payload_join(pairs, sigs, _p(_reduce_sig_est, min_est=min_est))


def minhash_dedup_pairs(
    corpus: "ray.data.Dataset",
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
    max_group: int = 256,
    prefilter_margin: "float | None" = None,
) -> "ray.data.Dataset":
    """Full MinHash-LSH near-dup pipeline: bands → candidate pairs →
    (optional signature-estimate prefilter) → EXACT Jaccard verify →
    verified pairs (doc_a < doc_b, jaccard ≥ threshold).  Every stage is
    distributed END TO END: the result is the verified-pairs DATASET,
    materialized in the object store (so downstream consumers —
    ``dedup_canonical``'s connected components + anti-join, a parquet
    write — can read it more than once without re-running the verify)
    and NEVER gathered to the driver.  Verified-pair count grows
    superlinearly with corpus density (2M-doc run: 1.44M pairs; loose
    settings: 8M) — callers that want a small deterministic table use
    ``minhash_dedup_pairs_table`` (sf-scale only).

    ``prefilter_margin`` (off by default) drops pairs with estimated
    jaccard < threshold - margin before the exact join.  Worth enabling
    for LONG documents (shingle sets ≫ 64, so the fixed-width signature
    join is much cheaper than the exact one); for short web text the two
    joins cost the same and the prefilter only adds a pass.  True-pair
    loss at the threshold is small but nonzero (binomial tail + the
    xor-permutation family's small-set bias — measured ~2e-4 on the
    600k-doc bench corpus with margin 0.2).

    FUSED tokenize (r5): the corpus is tokenized+shingled exactly ONCE
    (``shingle64_rows``, materialized ~8 B/shingle in the object store);
    banding, the optional prefilter and the exact verify all recompute
    from that spill.  Candidate selection for the verify is a
    distributed-built bloom filter — ids never gather on the driver."""
    sh64 = shingle64_rows(corpus, k).materialize()
    # materialize: keeps the signature/banding kernel in a task-pool
    # operator instead of fusing into the low-CPU shuffle aggregator
    # (same rationale as _payload_join's barriers; band rows are 20 B
    # fixed-width, the barrier is cheap)
    band_rows = sh64.map_batches(
        BandsFromShingles(bands), batch_format="pyarrow"
    ).materialize()
    cands = _band_pairs(band_rows, max_group)
    if prefilter_margin is not None:
        cands = cands.materialize()
        bloom_ref = _candidate_bloom_ref(cands)
        if bloom_ref is not None:
            from functools import partial as _p

            cands = _payload_join(
                cands,
                _sig32_rows_from_shingles(sh64, bloom_ref),
                _p(
                    _reduce_sig_est,
                    min_est=max(0.0, threshold - prefilter_margin),
                ),
            )
    return jaccard_verify_shingles(sh64, cands, threshold).materialize()


def minhash_dedup_pairs_table(
    corpus: "ray.data.Dataset",
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
    max_group: int = 256,
    prefilter_margin: "float | None" = None,
) -> pa.Table:
    """sf-scale wrapper: the verified pairs as ONE deterministically
    sorted pyarrow Table on the driver.  Only for small corpora / tests —
    at real scale use ``minhash_dedup_pairs`` (Dataset) or write the
    pairs to parquet."""
    out = minhash_dedup_pairs(
        corpus, k, bands, threshold, max_group, prefilter_margin
    ).to_pandas()
    if out.empty:
        return _EMPTY_PAIRS
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)



# --- cross-corpus (incremental) dedup --------------------------------------


def _with_side(v: int):
    """Tag band rows with an int8 ``side`` column (1=new, 0=ref),
    tolerating the zero-column empty blocks Ray 2.49 emits for empty
    upstream partitions."""

    def f(t: pa.Table) -> pa.Table:
        if "band_id" not in t.column_names:  # zero-column empty block
            return pa.table(
                {
                    "band_id": pa.array([], pa.int32()),
                    "band_key": pa.array([], pa.int64()),
                    "doc_id": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                }
            )
        return t.append_column("side", pa.array(np.full(len(t), v, np.int8)))

    return f


def minhash_cross_candidates(
    new: "ray.data.Dataset",
    ref: "ray.data.Dataset",
    k: int = 3,
    bands: int = 16,
    max_group: int = 1024,
    new_band_rows: "ray.data.Dataset | None" = None,
) -> "ray.data.Dataset":
    """Distinct NEW×REF candidate pairs from LSH band collisions.
    Requires globally unique doc_ids across the two corpora (the usual
    url-hash id space); doc_a is always the new-side id.

    ``max_group`` defaults HIGHER than the single-corpus path: in
    incremental use a band group fills with kept-corpus HISTORY, so a
    cap sized for one crawl silently drops exactly the new×ref pairs
    this op exists to find.  Skipped oversized groups surface as one
    (doc_a=-1, doc_b=-1, n_bands=count) marker row — callers filter it
    (``minhash_cross_dedup`` warns with the count).

    ``new_band_rows``: prebuilt (band_id, band_key, doc_id) rows for the
    new side (e.g. ``BandsFromShingles`` over a shingle64 spill) — lets
    ``minhash_cross_dedup`` reuse its one-tokenize spill; ``new`` is
    ignored for banding when given."""
    from functools import partial

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    if new_band_rows is None:
        new_band_rows = new.select_columns(["doc_id", "text"]).map_batches(
            MinhashBands(k, bands), batch_format="pyarrow"
        )
    band_rows = new_band_rows.map_batches(
        _with_side(1), batch_format="pyarrow"
    ).union(
        ref.select_columns(["doc_id", "text"])
        .map_batches(MinhashBands(k, bands), batch_format="pyarrow")
        .map_batches(_with_side(0), batch_format="pyarrow")
    )
    n_blocks = tune_hash_shuffle(band_rows.context)
    pairs = band_rows.repartition(
        num_blocks=n_blocks, keys=["band_id", "band_key"]
    ).map_batches(
        partial(_pairs_from_block, max_group=max_group, cross=True),
        batch_size=None,
        batch_format="pyarrow",
    )
    return pairs.repartition(num_blocks=n_blocks, keys=["doc_a", "doc_b"]).map_batches(
        _dedup_pairs_block, batch_size=None, batch_format="pyarrow"
    )


def minhash_cross_dedup(
    new: "ray.data.Dataset",
    ref: "ray.data.Dataset",
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
    max_group: int = 1024,
    exact: bool = True,
) -> "ray.data.Dataset":
    """Incremental dedup: drop from ``new`` every document that is an
    exact (content hash) or near (MinHash→exact-Jaccard-verified)
    duplicate of some ``ref`` document; return the surviving new rows.
    The rolling-crawl shape: dedupe this week's crawl against everything
    already kept, without re-deduping history.  All stages distributed
    (hash co-partition joins, pair-keyed verify); requires globally
    unique doc_ids across the corpora.

    Tokenize-cost shape (r5): the NEW side (small: one crawl) is
    shingled ONCE into a spill that feeds both its banding and the
    verify; the REF side (large: all history) is deliberately NOT
    spilled — history is tokenized once for banding, and only its
    bloom-selected candidate docs are shingled again for the verify
    (~candidates/|ref| extra work beats materializing every historical
    shingle in the object store)."""
    from functools import partial as _p

    from bitfunnel_ray.ops.joins import anti_join

    survivors = new
    if exact:
        def with_hash(t: pa.Table) -> pa.Table:
            return t.append_column(
                "content_hash", content_hash_batch(t)["content_hash"]
            )

        ref_hashes = ref.map_batches(
            content_hash_batch, batch_format="pyarrow"
        ).select_columns(["content_hash"])
        survivors = anti_join(
            survivors.map_batches(with_hash, batch_format="pyarrow"),
            ref_hashes,
            key="content_hash",
            broadcast=False,
        ).map_batches(
            lambda t: t.drop_columns(["content_hash"]), batch_format="pyarrow"
        )
    # materialize: survivors feed the candidate bands, the verify payload
    # join AND the final anti-join — lazy, the exact-stage exchange would
    # re-execute three times
    survivors = survivors.materialize()
    sh_new = shingle64_rows(survivors, k).materialize()
    cands = minhash_cross_candidates(
        survivors,
        ref,
        k,
        bands,
        max_group,
        new_band_rows=sh_new.map_batches(
            BandsFromShingles(bands), batch_format="pyarrow"
        ),
    ).materialize()
    skipped = cands.filter(expr="doc_a < 0")
    n_skipped_groups = sum(
        r["n_bands"] for r in skipped.take_all()
    )  # one tiny counter row per pair partition at most
    if n_skipped_groups:
        import warnings

        warnings.warn(
            f"cross-dedup skipped {n_skipped_groups} oversized band groups "
            f"(> max_group={max_group}) — new docs colliding only inside "
            "those groups were NOT checked; raise max_group to cover them",
            stacklevel=2,
        )
    cands = cands.filter(expr="doc_a >= 0").materialize()
    bloom_ref = _candidate_bloom_ref(cands)
    if bloom_ref is None:
        return survivors
    # verify payload: new side narrows its existing spill; ref side
    # shingles only its bloom-selected candidate docs
    pay = _payload32_rows(sh_new, bloom_ref).union(
        shingle_rows(
            _bloom_filter_ids(ref.select_columns(["doc_id", "text"]), bloom_ref), k
        )
    )
    pairs = _payload_join(cands, pay, _p(_reduce_jaccard, threshold=threshold))
    drop = pairs.map_batches(
        lambda t: pa.table({"doc_id": t["doc_a"]}), batch_format="pyarrow"
    )
    return anti_join(survivors, drop, key="doc_id", broadcast=False)


# --- simhash --------------------------------------------------------------


def simhash_batch(t: pa.Table) -> pa.Table:
    """64-bit simhash of the token multiset (tf-weighted ±1 bit votes).
    vote_b = 2*set_count_b - doclen, one segmented bincount per bit."""
    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    flat, doc_of, doclen = flat_tokens(t["text"])
    h = hash_token_array(flat)
    n = len(t)
    out = np.zeros(n, dtype=np.uint64)
    if len(h):
        dl = doclen.astype(np.int64)
        for b in range(64):
            set_cnt = np.bincount(
                doc_of, weights=((h >> np.uint64(b)) & np.uint64(1)).astype(np.float64),
                minlength=n,
            ).astype(np.int64)
            out |= ((2 * set_cnt - dl) > 0).astype(np.uint64) << np.uint64(b)
    return pa.table({"doc_id": t["doc_id"], "simhash": pa.array(out, pa.uint64())})


def simhash(corpus: "ray.data.Dataset") -> "ray.data.Dataset":
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        simhash_batch, batch_format="pyarrow"
    )


def simhash_candidates(corpus: "ray.data.Dataset", max_group: int = 256) -> "ray.data.Dataset":
    """Near-dup candidates: docs sharing any 16-bit simhash band (catches
    all pairs with hamming distance ≤ 3 by pigeonhole)."""
    sh = simhash(corpus)

    def bands(t: pa.Table) -> pa.Table:
        s = t["simhash"].to_numpy()
        ids = t["doc_id"].to_numpy()
        parts = []
        for b in range(4):
            key = (s >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            parts.append(
                pa.table(
                    {
                        "band_id": pa.array(np.full(len(s), b, np.int32)),
                        "band_key": pa.array(key.astype(np.int64), pa.int64()),
                        "doc_id": pa.array(ids.astype(np.int64), pa.int64()),
                    }
                )
            )
        return pa.concat_tables(parts)

    rows = sh.map_batches(bands, batch_format="pyarrow")
    return _band_pairs(rows, max_group)


# --- embedding cosine near-dup -------------------------------------------


def _bucket_pairs_block(block: pa.Table, *, threshold: float, max_group: int) -> pa.Table:
    """Vectorized in-bucket all-pairs over one hash-partitioned block:
    runs of equal bucket are found by sort + diff, then processed per
    run-LENGTH class with one batched einsum each (runs of length L stack
    to an (nruns, L, dim) tensor → (nruns, L, L) cosines — no per-group
    python).  Runs longer than ``max_group`` (degenerate buckets, e.g.
    all-zero embeddings) are skipped with a loud report — same documented
    coverage cap as the minhash band path."""
    import sys

    if len(block) == 0:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    bkt = block["bucket"].to_numpy(zero_copy_only=False)
    vid = block["vid"].to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, bkt))
    bkt, vid = bkt[order], vid[order]
    unit_col = block["unit"].combine_chunks().take(pa.array(order.astype(np.int64)))
    dim = len(unit_col[0]) if len(unit_col) else 0
    unit = unit_col.values.to_numpy(zero_copy_only=False).reshape(len(bkt), dim)
    new = np.empty(len(bkt), dtype=bool)
    new[0] = True
    new[1:] = bkt[1:] != bkt[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(bkt)))
    dropped = int(lens[lens > max_group].sum())
    if dropped:
        print(
            f"[embedding_dup_pairs] skipping {int((lens > max_group).sum())} "
            f"oversized buckets ({dropped} vectors > max_group={max_group}); "
            "raise max_group for full coverage",
            file=sys.stderr,
        )
    out_a, out_b, out_c = [], [], []
    for L in np.unique(lens):
        if L < 2 or L > max_group:
            continue
        s = starts[lens == L]
        gather = (s[:, None] + np.arange(L)[None, :]).ravel()
        mats = unit[gather].reshape(len(s), int(L), dim)
        sims = np.einsum("nid,njd->nij", mats, mats)
        ai, bj = np.triu_indices(int(L), k=1)
        sim_flat = sims[:, ai, bj].ravel()
        keep = sim_flat >= threshold
        if not keep.any():
            continue
        abs_a = (s[:, None] + ai[None, :]).ravel()[keep]
        abs_b = (s[:, None] + bj[None, :]).ravel()[keep]
        ia, ib = vid[abs_a], vid[abs_b]
        out_a.append(np.minimum(ia, ib))
        out_b.append(np.maximum(ia, ib))
        out_c.append(sim_flat[keep])
    if not out_a:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "doc_a": pa.array(np.concatenate(out_a).astype(np.int64), pa.int64()),
            "doc_b": pa.array(np.concatenate(out_b).astype(np.int64), pa.int64()),
            "cosine": pa.array(np.concatenate(out_c), pa.float64()),
        }
    )


def embedding_dup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 1234,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_group: int = 1024,
) -> pa.Table:
    """Cosine near-dup via hyperplane-LSH bucketing + in-bucket exact
    cosine.  Scale path: ONE hash exchange on the bucket key; in-bucket
    all-pairs is run-length batched einsum (no per-group python, no
    uncapped O(n²) hot bucket, no driver-side pair materialization before
    the final reduced output)."""
    from functools import partial

    from ray.data.aggregate import Max

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    rng = np.random.default_rng(seed)
    first = embeddings.take(1)[0]
    dim = len(first[vec_col])
    planes = rng.standard_normal((dim, n_planes))

    def bucket(t: pa.Table) -> pa.Table:
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        norms = np.linalg.norm(vecs, axis=1, keepdims=True)
        unit = vecs / np.maximum(norms, 1e-12)
        signs = (unit @ planes) > 0
        key = np.zeros(len(t), dtype=np.uint64)
        for b in range(n_planes):
            key |= signs[:, b].astype(np.uint64) << np.uint64(b)
        flat = pa.array(unit.ravel(), pa.float64())
        offsets = pa.array(np.arange(0, (len(t) + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "bucket": pa.array(key.astype(np.int64), pa.int64()),
                "vid": t[id_col].cast(pa.int64()),
                "unit": pa.ListArray.from_arrays(offsets, flat),
            }
        )

    bucketed = embeddings.map_batches(bucket, batch_format="pyarrow")
    n_blocks = tune_hash_shuffle(bucketed.context)
    pairs = bucketed.repartition(num_blocks=n_blocks, keys=["bucket"]).map_batches(
        partial(_bucket_pairs_block, threshold=threshold, max_group=max_group),
        batch_size=None,
        batch_format="pyarrow",
    )
    # identical pair may surface from multiple... no: one bucket per vector
    # (single hash table), so pairs are already distinct; keep a cheap
    # groupby-max only to be robust to future multi-probe variants
    out = (
        pairs.groupby(["doc_a", "doc_b"])
        .aggregate(Max("cosine", alias_name="cosine"))
        .to_pandas()
    )
    if out.empty:
        return pa.table(
            {
                "doc_a": pa.array([], pa.int64()),
                "doc_b": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


# --- exact n-gram Jaccard dedup (no sketch) -------------------------------
#
# The sketch-free sibling of minhash_dedup_pairs: candidate pairs are docs
# sharing at least one NON-HOT k-token shingle (exact, every true pair with
# jaccard > 0 over the filtered shingle space is a candidate), and the
# jaccard itself falls out of the same exchange — the pair's multiplicity
# across shingle groups IS |A∩B|, and |A| + |B| come from a size join.
# Fully SQL-expressible, so this operator carries a DuckDB oracle (unlike
# the LSH paths).  Four hash exchanges, no driver funnel:
#   shingle → (pairs + size partials)   [hot filter is EXACT here: the
#                                        exchange co-locates a shingle's
#                                        rows, so run length = global df]
#   doc     → exact per-doc filtered sizes
#   pair    → distinct pairs + intersection counts
#   doc/pair→ attach sizes, reduce jaccard (same union-carrier pattern as
#             _payload_join)


def _shingle_doc_rows(t: pa.Table, *, k: int) -> pa.Table:
    acc, d, _ = shingle_flat(t["text"], k)
    if len(acc) == 0:
        return pa.table(
            {"shingle": pa.array([], pa.int64()), "doc_id": pa.array([], pa.int64())}
        )
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[d]
    return pa.table(
        {
            "shingle": pa.array(acc.view(np.int64), pa.int64()),
            "doc_id": pa.array(doc_ids, pa.int64()),
        }
    )


def _jaccard_pairs_and_sizes_block(t: pa.Table, *, max_df: int) -> pa.Table:
    """One shingle-partitioned block → pair rows (doc_id = sentinel) +
    per-doc size partials (doc_a/doc_b = sentinel).  Shingle runs longer
    than ``max_df`` are stop-shingles: dropped from BOTH pair-gen and the
    size partials, so jaccard stays exact over the filtered shingle
    space (the SQL oracle applies the identical HAVING df <= max_df
    filter)."""
    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "n_part": pa.array([], pa.int64()),
        }
    )
    if len(t) == 0:
        return empty
    sh = t["shingle"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    order = np.lexsort((doc, sh))
    sh, doc = sh[order], doc[order]
    new = np.empty(len(sh), dtype=bool)
    new[0] = True
    new[1:] = sh[1:] != sh[:-1]
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(sh)))
    keep_run = lens <= max_df
    # rows belonging to kept runs → size partials per doc
    row_keep = np.repeat(keep_run, lens)
    kept_docs = doc[row_keep]
    out_tables = []
    if len(kept_docs):
        ud, cnt = np.unique(kept_docs, return_counts=True)
        s = np.full(len(ud), _SENTINEL, np.int64)
        out_tables.append(
            pa.table(
                {
                    "doc_id": pa.array(ud, pa.int64()),
                    "doc_a": pa.array(s, pa.int64()),
                    "doc_b": pa.array(s, pa.int64()),
                    "n_part": pa.array(cnt.astype(np.int64), pa.int64()),
                }
            )
        )
    # pairs per kept run of length >= 2, by length class (no python loop
    # over groups — one broadcasted index template per distinct length)
    out_a, out_b = [], []
    for L in np.unique(lens):
        if L < 2 or L > max_df:
            continue
        s = starts[(lens == L) & keep_run]
        if not len(s):
            continue
        ai, bj = np.triu_indices(int(L), k=1)
        out_a.append(doc[(s[:, None] + ai[None, :]).ravel()])
        out_b.append(doc[(s[:, None] + bj[None, :]).ravel()])
    if out_a:
        a = np.concatenate(out_a)
        b = np.concatenate(out_b)
        lo, hi = np.minimum(a, b), np.maximum(a, b)
        s = np.full(len(a), _SENTINEL, np.int64)
        out_tables.append(
            pa.table(
                {
                    "doc_id": pa.array(s, pa.int64()),
                    "doc_a": pa.array(lo, pa.int64()),
                    "doc_b": pa.array(hi, pa.int64()),
                    "n_part": pa.array(np.zeros(len(a), np.int64), pa.int64()),
                }
            )
        )
    if not out_tables:
        return empty
    return pa.concat_tables(out_tables)


def _combine_doc_sizes(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return pa.table(
            {"doc_id": pa.array([], pa.int64()), "size": pa.array([], pa.int64())}
        )
    doc = t["doc_id"].to_numpy(zero_copy_only=False)
    n = t["n_part"].to_numpy(zero_copy_only=False)
    order = np.argsort(doc, kind="stable")
    doc, n = doc[order], n[order]
    new = np.empty(len(doc), dtype=bool)
    new[0] = True
    new[1:] = doc[1:] != doc[:-1]
    starts = np.flatnonzero(new)
    return pa.table(
        {
            "doc_id": pa.array(doc[starts], pa.int64()),
            "size": pa.array(np.add.reduceat(n, starts).astype(np.int64), pa.int64()),
        }
    )


def _attach_sizes_block(t: pa.Table) -> pa.Table:
    """doc-partitioned block of size carriers (doc_a == sentinel) + pair
    side-rows: fill each side-row's ``size`` from its doc's carrier, emit
    side-rows only."""
    if len(t) == 0:
        return t
    a = t["doc_a"].to_numpy(zero_copy_only=False)
    carriers = a == _SENTINEL
    cd = t["doc_id"].to_numpy(zero_copy_only=False)[carriers]
    cs = t["size"].to_numpy(zero_copy_only=False)[carriers]
    order = np.argsort(cd)
    cd, cs = cd[order], cs[order]
    side = t.filter(pa.array(~carriers))
    if len(side) == 0:
        return side
    sd = side["doc_id"].to_numpy(zero_copy_only=False)
    if len(cd) == 0:  # defensive: a side-row's doc always has a carrier
        size = np.zeros(len(sd), np.int64)
    else:
        pos = np.clip(np.searchsorted(cd, sd), 0, len(cd) - 1)
        size = cs[pos]
    return side.set_column(
        side.schema.get_field_index("size"), "size", pa.array(size, pa.int64())
    )


def _reduce_ngram_jaccard(t: pa.Table, *, threshold: float) -> pa.Table:
    empty = pa.table(
        {
            "doc_a": pa.array([], pa.int64()),
            "doc_b": pa.array([], pa.int64()),
            "jaccard": pa.array([], pa.float64()),
        }
    )
    if len(t) == 0:
        return empty
    a = t["doc_a"].to_numpy(zero_copy_only=False)
    b = t["doc_b"].to_numpy(zero_copy_only=False)
    inter = t["inter"].to_numpy(zero_copy_only=False)
    size = t["size"].to_numpy(zero_copy_only=False)
    order = np.lexsort((b, a))
    a, b, inter, size = a[order], b[order], inter[order], size[order]
    new = np.empty(len(a), dtype=bool)
    new[0] = True
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    starts = np.flatnonzero(new)
    union = np.add.reduceat(size, starts) - inter[starts]
    j = inter[starts] / np.maximum(union, 1)
    keep = j >= threshold
    return pa.table(
        {
            "doc_a": pa.array(a[starts][keep], pa.int64()),
            "doc_b": pa.array(b[starts][keep], pa.int64()),
            "jaccard": pa.array(j[keep], pa.float64()),
        }
    )


def ngram_jaccard_pairs(
    corpus: "ray.data.Dataset",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int = 1024,
) -> "ray.data.Dataset":
    """EXACT n-gram Jaccard near-dup pairs (doc_a < doc_b, jaccard ≥
    threshold) over the stop-shingle-filtered shingle space (shingles in
    more than ``max_df`` docs are excluded everywhere, consistently).

    Unlike the MinHash path there is no estimation anywhere: every pair
    sharing ≥ 1 kept shingle is scored, and the score is the true
    set-Jaccard of the kept shingles.  Cost is O(Σ df²) pair rows over
    non-hot shingles — the documented trade for exactness (max_df bounds
    the per-shingle blowup; a real corpus run pairs this with the MinHash
    path and uses this one on candidate subsets or audits).

    Returns the pairs DATASET — composable at scale exactly like
    ``minhash_dedup_pairs`` (everything up to and including the final
    reduce is co-partitioned); ``ngram_jaccard_pairs_table`` is the
    sf-scale deterministic-Table twin for tests/audits."""
    from functools import partial

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    rows = corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_shingle_doc_rows, k=k), batch_format="pyarrow"
    )
    n_blocks = tune_hash_shuffle(rows.context)
    mixed = (
        rows.repartition(num_blocks=n_blocks, keys=["shingle"])
        .map_batches(
            partial(_jaccard_pairs_and_sizes_block, max_df=max_df),
            batch_size=None,
            batch_format="pyarrow",
        )
        .materialize()
    )
    sizes = (
        mixed.filter(expr="doc_a < 0")
        .repartition(num_blocks=n_blocks, keys=["doc_id"])
        .map_batches(_combine_doc_sizes, batch_size=None, batch_format="pyarrow")
    )
    inter = (
        mixed.filter(expr="doc_a >= 0")
        .select_columns(["doc_a", "doc_b"])
        .repartition(num_blocks=n_blocks, keys=["doc_a", "doc_b"])
        .map_batches(_dedup_pairs_block, batch_size=None, batch_format="pyarrow")
    )

    def size_carrier(t: pa.Table) -> pa.Table:
        n = len(t)
        s = np.full(n, _SENTINEL, np.int64)
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "doc_a": pa.array(s, pa.int64()),
                "doc_b": pa.array(s, pa.int64()),
                "inter": pa.array(np.zeros(n, np.int64), pa.int64()),
                "size": t["size"],
            }
        )

    def explode_pairs(t: pa.Table) -> pa.Table:
        a = t["doc_a"].to_numpy(zero_copy_only=False)
        b = t["doc_b"].to_numpy(zero_copy_only=False)
        i = t["n_bands"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "doc_id": pa.array(np.concatenate([a, b]), pa.int64()),
                "doc_a": pa.array(np.concatenate([a, a]), pa.int64()),
                "doc_b": pa.array(np.concatenate([b, b]), pa.int64()),
                "inter": pa.array(np.concatenate([i, i]), pa.int64()),
                "size": pa.array(np.zeros(2 * len(a), np.int64), pa.int64()),
            }
        )

    unioned = sizes.map_batches(size_carrier, batch_format="pyarrow").union(
        inter.map_batches(explode_pairs, batch_format="pyarrow")
    )
    return (
        unioned.repartition(num_blocks=n_blocks, keys=["doc_id"])
        .materialize()
        .map_batches(_attach_sizes_block, batch_size=None, batch_format="pyarrow")
        .repartition(num_blocks=n_blocks, keys=["doc_a", "doc_b"])
        .materialize()
        .map_batches(
            partial(_reduce_ngram_jaccard, threshold=threshold),
            batch_size=None,
            batch_format="pyarrow",
        )
    )


def ngram_jaccard_pairs_table(
    corpus: "ray.data.Dataset",
    k: int = 3,
    threshold: float = 0.8,
    max_df: int = 1024,
) -> pa.Table:
    """sf-scale wrapper: the exact-Jaccard pairs as ONE deterministically
    sorted pyarrow Table on the driver.  Only for small corpora / tests /
    audits — at real scale use ``ngram_jaccard_pairs`` (Dataset) or write
    the pairs to parquet."""
    out = ngram_jaccard_pairs(corpus, k, threshold, max_df).to_pandas()
    if out.empty:
        return _EMPTY_PAIRS
    out = out.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)
