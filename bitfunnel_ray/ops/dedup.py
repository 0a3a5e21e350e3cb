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
    acc, d, n_docs = shingle_flat(texts, k)
    sigs = np.full((n_docs, _NPERM), np.uint64(0xFFFFFFFFFFFFFFFF), dtype=np.uint64)
    if len(acc):
        mat = acc[:, None] ^ _PERM_XOR[None, :]  # (n_shingles, 64)
        starts = np.flatnonzero(np.diff(d, prepend=-1))
        mins = np.minimum.reduceat(mat, starts, axis=0)
        sigs[d[starts]] = mins
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
        n = len(doc_ids)
        # band key = combined hash of the band's rows
        keys = np.zeros((n, self.bands), dtype=np.uint64)
        for b in range(self.bands):
            seg = sigs[:, b * self.rows : (b + 1) * self.rows]
            k = seg[:, 0].copy()
            for j in range(1, self.rows):
                k = ((k << np.uint64(1)) | (k >> np.uint64(63))) ^ seg[:, j]
            keys[:, b] = k
        band_id = np.repeat(np.arange(self.bands, dtype=np.int32)[None, :], n, axis=0)
        # int64 bit-views: uint64 key columns hit Ray's pickled-object
        # fallback inside shuffles
        return pa.table(
            {
                "band_id": pa.array(band_id.ravel(), pa.int32()),
                "band_key": pa.array(keys.ravel().view(np.int64), pa.int64()),
                "doc_id": pa.array(np.repeat(doc_ids.astype(np.int64), self.bands), pa.int64()),
            }
        )


def _pairs_from_block(t: pa.Table, *, max_group: int) -> pa.Table:
    """Vectorized all-pairs within equal (band_id, band_key) runs of one
    hash-partitioned block.  No per-group python: runs are found by sort +
    diff; pairs are emitted per run-LENGTH class with one broadcasted index
    template each (millions of tiny groups cost ~zero python calls).
    Oversized runs (> max_group, degenerate boilerplate keys) are skipped
    — a deliberate, documented coverage cap."""
    if len(t) == 0:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    bid = t["band_id"].to_numpy(zero_copy_only=False)
    key = t["band_key"].to_numpy(zero_copy_only=False)
    doc = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    order = np.lexsort((doc, key, bid))
    bid, key, doc = bid[order], key[order], doc[order]
    new = np.empty(len(bid), dtype=bool)
    new[0] = True
    new[1:] = (bid[1:] != bid[:-1]) | (key[1:] != key[:-1])
    starts = np.flatnonzero(new)
    lens = np.diff(np.append(starts, len(bid)))
    out_a, out_b = [], []
    for L in np.unique(lens):
        if L < 2 or L > max_group:
            continue
        s = starts[lens == L]  # all runs of this length
        ai, bj = np.triu_indices(int(L), k=1)
        abs_a = (s[:, None] + ai[None, :]).ravel()
        abs_b = (s[:, None] + bj[None, :]).ravel()
        out_a.append(doc[abs_a])
        out_b.append(doc[abs_b])
    if not out_a:
        return pa.table({"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())})
    a = np.concatenate(out_a)
    b = np.concatenate(out_b)
    lo, hi = np.minimum(a, b), np.maximum(a, b)
    return pa.table({"doc_a": pa.array(lo, pa.int64()), "doc_b": pa.array(hi, pa.int64())})


def _band_pairs(band_rows: "ray.data.Dataset", max_group: int) -> "ray.data.Dataset":
    """(band_id, band_key, doc_id) rows → distinct candidate pairs with
    band-collision counts.  Hash-partition on the band key co-locates whole
    groups; pair-gen is one vectorized pass per block."""
    from functools import partial

    import ray
    from ray.data.context import ShuffleStrategy

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    n_blocks = tune_hash_shuffle(band_rows.context)
    pairs = band_rows.repartition(num_blocks=n_blocks, keys=["band_id", "band_key"]).map_batches(
        partial(_pairs_from_block, max_group=max_group),
        batch_size=None,
        batch_format="pyarrow",
    )
    # dedup identical pairs produced by multiple bands
    return pairs.groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="n_bands"))


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


def jaccard_verify(
    corpus: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    k: int = 3,
    threshold: float = 0.7,
    max_pairs: int = 250_000,
):
    """Exact n-gram Jaccard over candidate pairs.  The candidate docs'
    shingle sets are gathered once (distributed extract), broadcast via the
    object store, and pairs are verified in parallel ``map_batches`` over
    the pairs dataset.  Returns (doc_a, doc_b, jaccard ≥ threshold).

    Coverage cap: at most ``max_pairs`` candidates are verified (strongest
    first by band-collision count); the drop is REPORTED, never silent."""
    import sys

    import ray
    import ray.data as rd

    pairs_tbl = pairs.to_pandas()
    if not len(pairs_tbl):
        return _EMPTY_PAIRS
    if len(pairs_tbl) > max_pairs:
        print(
            f"[jaccard_verify] capping candidate pairs {len(pairs_tbl)} -> "
            f"{max_pairs} (strongest by n_bands); raise max_pairs for full coverage",
            file=sys.stderr,
        )
        by = ["n_bands"] if "n_bands" in pairs_tbl.columns else []
        if by:
            pairs_tbl = pairs_tbl.sort_values("n_bands", ascending=False)
        pairs_tbl = pairs_tbl.head(max_pairs)
    needed = np.unique(
        np.concatenate([pairs_tbl["doc_a"].to_numpy(), pairs_tbl["doc_b"].to_numpy()])
    ).astype(np.int64)
    needed_ref = ray.put(np.sort(needed))

    def extract(t: pa.Table) -> pa.Table:
        want = ray.get(needed_ref)
        ids = t["doc_id"].to_numpy().astype(np.int64)
        pos = np.searchsorted(want, ids)
        pos[pos == len(want)] = 0
        keep = want[pos] == ids
        if not keep.any():
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "shingles": pa.array([], pa.list_(pa.uint64()))}
            )
        sub = t.filter(pa.array(keep))
        shs, _ = shingle_hashes(sub["text"], k)
        return pa.table(
            {
                "doc_id": sub["doc_id"].cast(pa.int64()),
                "shingles": pa.array([s.tolist() for s in shs], pa.list_(pa.uint64())),
            }
        )

    sh_tbl = (
        corpus.select_columns(["doc_id", "text"])
        .map_batches(extract, batch_format="pyarrow")
        .to_pandas()
    )
    sets_ref = ray.put(
        {int(d): np.asarray(s, dtype=np.uint64) for d, s in zip(sh_tbl["doc_id"], sh_tbl["shingles"])}
    )

    def verify(batch):
        import pandas as pd

        sets = ray.get(sets_ref)
        out_a, out_b, out_j = [], [], []
        for a, b in zip(batch["doc_a"], batch["doc_b"]):
            sa = sets.get(int(a))
            sb = sets.get(int(b))
            if sa is None or sb is None or (len(sa) == 0 and len(sb) == 0):
                continue
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j >= threshold:
                out_a.append(int(a)); out_b.append(int(b)); out_j.append(j)
        return pd.DataFrame({"doc_a": pd.Series(out_a, dtype=np.int64),
                             "doc_b": pd.Series(out_b, dtype=np.int64),
                             "jaccard": pd.Series(out_j, dtype=np.float64)})

    verified = (
        rd.from_pandas(pairs_tbl[["doc_a", "doc_b"]])
        .map_batches(verify, batch_format="pandas", batch_size=8192)
        .to_pandas()
    )
    if verified.empty:
        return _EMPTY_PAIRS
    verified = verified.sort_values(["doc_a", "doc_b"]).reset_index(drop=True)
    return pa.Table.from_pandas(verified, preserve_index=False)


def minhash_dedup_pairs(
    corpus: "ray.data.Dataset",
    k: int = 3,
    bands: int = 16,
    threshold: float = 0.7,
    max_pairs: int = 250_000,
) -> pa.Table:
    """Full MinHash-LSH near-dup pipeline: bands → candidates → verified
    pairs (doc_a < doc_b, jaccard ≥ threshold)."""
    cands = minhash_candidates(corpus, k, bands)
    return jaccard_verify(corpus, cands, k, threshold, max_pairs)


# --- simhash --------------------------------------------------------------


def simhash_batch(t: pa.Table) -> pa.Table:
    """64-bit simhash of the token multiset (tf-weighted ±1 bit votes).
    vote_b = 2*set_count_b - doclen, one segmented bincount per bit."""
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


def embedding_dup_pairs(
    embeddings: "ray.data.Dataset",
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 1234,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> pa.Table:
    """Cosine near-dup via hyperplane-LSH bucketing + in-bucket exact
    cosine.  Scale path: the groupby is the only shuffle; buckets are
    ~n/2^n_planes vectors."""
    from functools import partial

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
        return pa.table(
            {
                "bucket": pa.array(key.astype(np.int64), pa.int64()),
                "vid": t[id_col].cast(pa.int64()),
                "unit": pa.array([row.tolist() for row in unit], pa.list_(pa.float64())),
            }
        )

    def in_bucket_pairs(g: pa.Table, threshold: float) -> pa.Table:
        ids = g["vid"].to_numpy()
        if len(ids) < 2:
            return pa.table({"doc_a": pa.array([], pa.uint64()), "doc_b": pa.array([], pa.uint64()), "cosine": pa.array([], pa.float64())})
        unit = np.stack(g["unit"].to_numpy(zero_copy_only=False))
        sims = unit @ unit.T
        a, b = np.triu_indices(len(ids), k=1)
        keep = sims[a, b] >= threshold
        ia, ib = ids[a[keep]], ids[b[keep]]
        lo, hi = np.minimum(ia, ib), np.maximum(ia, ib)
        return pa.table(
            {
                "doc_a": pa.array(lo, pa.uint64()),
                "doc_b": pa.array(hi, pa.uint64()),
                "cosine": pa.array(sims[a[keep], b[keep]], pa.float64()),
            }
        )

    bucketed = embeddings.map_batches(bucket, batch_format="pyarrow")
    pairs = bucketed.groupby("bucket").map_groups(
        partial(in_bucket_pairs, threshold=threshold), batch_format="pyarrow"
    )
    out = pairs.to_pandas()
    if out.empty and "doc_a" not in out.columns:
        return pa.table(
            {
                "doc_a": pa.array([], pa.uint64()),
                "doc_b": pa.array([], pa.uint64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    out = out.drop_duplicates(["doc_a", "doc_b"]).sort_values(["doc_a", "doc_b"])
    return pa.Table.from_pandas(out.reset_index(drop=True))
