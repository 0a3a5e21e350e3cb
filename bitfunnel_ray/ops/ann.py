"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast once
(``ray.put``), every batch does one numpy matmul against it and emits its
local top-k, and a tiny final reduce merges the per-batch partials (the
map-side-combine pattern: the shuffle carries ≤ k rows per query per
batch, never the vectors).

Scale path: hyperplane-LSH bucketing (``lsh_topk``) — vectors are grouped
by sign-pattern bucket; queries probe only their own (and optionally
neighboring single-bit-flip) buckets.  Recall < 1 by construction; the
bucket fan-out is the knob.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _batch_topk(
    t: pa.Table, *, q_ref, k: int, id_col: str, vec_col: str
) -> pa.Table:
    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    queries = ray.get(q_ref) if isinstance(q_ref, ray.ObjectRef) else q_ref  # (nq, dim), unit rows
    if len(t) == 0:  # a metadata pre-filter can empty a whole batch
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    sims = unit @ queries.T  # (n, nq)
    ids = t[id_col].to_numpy()
    n, nq = sims.shape
    kk = min(k, n)
    # per-query selection respects the GLOBAL tie-break (cosine desc,
    # vec_id asc): argpartition finds the kk-th cosine, then every row tied
    # at or above it competes under lexsort — batch-local pruning can never
    # drop a globally-top-k id on an exact cosine tie (duplicate vectors).
    out_q_l, out_id_l, out_sim_l = [], [], []
    for qi in range(nq):
        s = sims[:, qi]
        part = np.argpartition(-s, kk - 1)[:kk]
        thresh = s[part].min()
        cand = np.flatnonzero(s >= thresh)
        sel = cand[np.lexsort((ids[cand], -s[cand]))[:kk]]
        out_q_l.append(np.full(len(sel), qi, dtype=np.int64))
        out_id_l.append(ids[sel])
        out_sim_l.append(s[sel])
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q_l)),
            "vec_id": pa.array(np.concatenate(out_id_l).astype(np.int64)),
            "cosine": pa.array(np.concatenate(out_sim_l), pa.float64()),
        }
    )


def _final_topk_reduce(partials: "ray.data.Dataset", k: int) -> "ray.data.Dataset":
    """Final per-query top-k over the map-side partials.  The partials are
    already pruned to ≤ k rows/query/block, so the whole set is tiny
    (nq · k · n_blocks) — coalesce to ONE block and reduce vectorized.  A
    ``groupby('query_id').map_groups`` here costs the hash-aggregator
    actor pool's fixed ~2-4 s startup, dominating the stage wall-time for
    any realistic nq."""

    def reduce_all(t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return pa.table(
                {
                    "query_id": pa.array([], pa.int64()),
                    "vec_id": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                    "rank": pa.array([], pa.int64()),
                }
            )
        qid = t["query_id"].to_numpy(zero_copy_only=False)
        vid = t["vec_id"].to_numpy(zero_copy_only=False)
        cos = t["cosine"].to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -cos, qid))  # (qid asc, cosine desc, vec_id asc)
        qid, vid, cos = qid[order], vid[order], cos[order]
        new = np.empty(len(qid), dtype=bool)
        new[0] = True
        new[1:] = qid[1:] != qid[:-1]
        rank = np.arange(len(qid), dtype=np.int64) - np.maximum.accumulate(
            np.where(new, np.arange(len(qid), dtype=np.int64), 0)
        ) + 1
        keep = rank <= k
        return pa.table(
            {
                "query_id": pa.array(qid[keep], pa.int64()),
                "vec_id": pa.array(vid[keep].astype(np.int64), pa.int64()),
                "cosine": pa.array(cos[keep], pa.float64()),
                "rank": pa.array(rank[keep], pa.int64()),
            }
        )

    return partials.repartition(num_blocks=1).map_batches(
        reduce_all, batch_size=None, batch_format="pyarrow"
    )


def brute_force_topk(
    embeddings: "ray.data.Dataset",
    query_vectors: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """Exact cosine top-k for each query row → (query_id, rank, vec_id,
    cosine)."""
    q = np.asarray(query_vectors, dtype=np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(q)
    partials = embeddings.select_columns([id_col, vec_col]).map_batches(
        partial(_batch_topk, q_ref=q_ref, k=k, id_col=id_col, vec_col=vec_col),
        batch_format="pyarrow",
    )
    return _final_topk_reduce(partials, k)


def filtered_topk(
    embeddings: "ray.data.Dataset",
    query_vectors: np.ndarray,
    k: int = 10,
    *,
    filter_col: str,
    filter_value,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> "ray.data.Dataset":
    """FILTERED vector search — exact cosine top-k restricted to rows
    where ``filter_col == filter_value`` (the "ANN with a metadata
    predicate" serving feature).  The predicate is applied per batch
    BEFORE any scoring (filter-then-score: the matmul never touches
    excluded vectors), so selective filters cut compute proportionally;
    everything downstream is the same ≤ k rows/query/block partial
    top-k as brute_force_topk."""
    import pyarrow.compute as pc

    q = np.asarray(query_vectors, dtype=np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put(q)

    def pre(t: pa.Table) -> pa.Table:
        return t.filter(pc.equal(t[filter_col], filter_value)).select(
            [id_col, vec_col]
        )

    partials = (
        embeddings.select_columns([id_col, vec_col, filter_col])
        .map_batches(pre, batch_format="pyarrow")
        .map_batches(
            partial(_batch_topk, q_ref=q_ref, k=k, id_col=id_col, vec_col=vec_col),
            batch_format="pyarrow",
        )
    )
    return _final_topk_reduce(partials, k)


def lsh_topk(
    embeddings: "ray.data.Dataset",
    query_vectors: np.ndarray,
    k: int = 10,
    n_planes: int = 8,
    seed: int = 4321,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    multiprobe: int = 1,
) -> "ray.data.Dataset":
    """Approximate top-k: only vectors whose hyperplane sign bucket matches
    the query's bucket (or is within ``multiprobe`` bit flips) are scored.
    Same output schema as ``brute_force_topk``; recall traded for a
    ~2^n_planes candidate reduction."""
    rng = np.random.default_rng(seed)
    q = np.asarray(query_vectors, dtype=np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    dim = q.shape[1]
    planes = rng.standard_normal((dim, n_planes))

    def bucket_of(mat: np.ndarray) -> np.ndarray:
        signs = (mat @ planes) > 0
        key = np.zeros(len(mat), dtype=np.uint64)
        for b in range(n_planes):
            key |= signs[:, b].astype(np.uint64) << np.uint64(b)
        return key

    q_buckets = bucket_of(q)
    allowed: set[int] = set()
    for qb in q_buckets.tolist():
        allowed.add(qb)
        if multiprobe >= 1:
            for b in range(n_planes):
                allowed.add(qb ^ (1 << b))
    allowed_ref = ray.put(np.array(sorted(allowed), dtype=np.uint64))
    q_ref = ray.put(q)

    def filtered_topk(t: pa.Table) -> pa.Table:
        ok = ray.get(allowed_ref)  # sorted uint64 array
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        keys = bucket_of(unit)
        keep = np.isin(keys, ok)
        if not keep.any():
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
            )
        return _batch_topk(t.filter(pa.array(keep)), q_ref=q_ref, k=k, id_col=id_col, vec_col=vec_col)

    partials = embeddings.select_columns([id_col, vec_col]).map_batches(
        filtered_topk, batch_format="pyarrow"
    )
    return _final_topk_reduce(partials, k)


# --- IVF (inverted-file) ANN ---------------------------------------------


_GOLD64 = np.uint64(0x9E3779B97F4A7C15)


def _seeded_init_centroids(
    embeddings: "ray.data.Dataset", n_clusters: int, vec_col: str, id_col: str
) -> "np.ndarray | None":
    """Deterministic hash-sample init for k-means: keep rows whose
    Knuth-hashed id falls in a 1/m band sized for ~8×n_clusters
    candidates, then stride-pick n_clusters of them in hash order.  The
    sample is spread across the WHOLE dataset — the former
    ``limit(n_clusters)`` init took the first parquet block, so every
    seed came from one shard of the data (first-block bias: clustered /
    time-ordered files seeded all centroids from one region).  No RNG —
    resume and repeat runs derive identical centroids."""
    try:
        n_total = embeddings.count()
    except Exception:
        return None
    if not n_total or n_total <= 8 * n_clusters:
        return None
    m = max(1, n_total // (8 * n_clusters))

    def pick(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.uint64)
        h = ids * _GOLD64
        keep = h % np.uint64(m) == 0
        out = t.filter(pa.array(keep))
        return out.append_column("_h", pa.array(h[keep], pa.uint64()))

    try:
        sample = (
            embeddings.select_columns([id_col, vec_col])
            .map_batches(pick, batch_format="pyarrow")
            .to_pandas()
        )
    except Exception:
        return None
    if len(sample) < n_clusters:
        return None
    sample = sample.sort_values("_h").reset_index(drop=True)
    sel = np.linspace(0, len(sample) - 1, n_clusters).round().astype(int)
    return np.stack(sample[vec_col].to_numpy()[sel]).astype(np.float64)


def kmeans_centroids(
    embeddings: "ray.data.Dataset",
    n_clusters: int = 16,
    n_iter: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Distributed spherical k-means (cosine metric): each Lloyd iteration
    is one streaming pass — centroids broadcast via ``ray.put``, every
    batch emits per-cluster (sum, count) partials, the driver folds the
    tiny (n_clusters × dim) partial table and renormalizes.  Deterministic
    and RNG-free: init is a seeded hash-sample spread over the whole
    dataset (see ``_seeded_init_centroids``), falling back to the first
    ``n_clusters`` vectors for tiny inputs or missing id columns."""
    cents = None
    if id_col:
        cents = _seeded_init_centroids(embeddings, n_clusters, vec_col, id_col)
    if cents is None:
        init_rows = embeddings.select_columns([vec_col]).limit(n_clusters).to_pandas()
        cents = np.stack(init_rows[vec_col].to_numpy()).astype(np.float64)
    cents = cents / np.maximum(np.linalg.norm(cents, axis=1, keepdims=True), 1e-12)
    nc, dim = cents.shape

    def partials(t: pa.Table, *, c_ref) -> pa.Table:
        c = ray.get(c_ref) if isinstance(c_ref, ray.ObjectRef) else c_ref
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(unit @ c.T, axis=1)
        order = np.argsort(assign, kind="stable")
        a_s = assign[order]
        starts = np.flatnonzero(np.diff(a_s, prepend=-1))
        sums = np.add.reduceat(unit[order], starts, axis=0)  # (n_present, dim)
        counts = np.diff(np.append(starts, len(a_s)))
        offsets = pa.array(np.arange(0, (len(starts) + 1) * dim, dim, dtype=np.int32))
        return pa.table(
            {
                "cluster": pa.array(a_s[starts].astype(np.int64)),
                "count": pa.array(counts.astype(np.int64)),
                "vsum": pa.ListArray.from_arrays(offsets, pa.array(sums.ravel(), pa.float64())),
            }
        )

    from functools import partial as _bind

    for _ in range(n_iter):
        c_ref = ray.put(cents)
        part = (
            embeddings.select_columns([vec_col])
            .map_batches(_bind(partials, c_ref=c_ref), batch_format="pyarrow")
            .to_pandas()
        )
        sums = np.zeros((nc, dim))
        counts = np.zeros(nc)
        np.add.at(counts, part["cluster"].to_numpy(), part["count"].to_numpy())
        np.add.at(sums, part["cluster"].to_numpy(), np.stack(part["vsum"].to_numpy()))
        live = counts > 0
        cents[live] = sums[live] / np.maximum(
            np.linalg.norm(sums[live], axis=1, keepdims=True), 1e-12
        )
        # empty clusters keep their previous centroid (deterministic)
    return cents


def ivf_topk(
    embeddings: "ray.data.Dataset",
    query_vectors: np.ndarray,
    k: int = 10,
    n_clusters: int = 16,
    nprobe: int = 4,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: np.ndarray | None = None,
) -> "ray.data.Dataset":
    """IVF approximate top-k: a spherical-k-means coarse quantizer assigns
    every vector to its nearest centroid; each query scores only vectors in
    its ``nprobe`` nearest clusters.  Same output schema as
    ``brute_force_topk``; recall grows with nprobe (nprobe = n_clusters is
    exhaustive).  Pass ``centroids`` to reuse a trained quantizer (the
    scale path: train once on a sample, search many times)."""
    cents = (
        np.asarray(centroids, dtype=np.float64)
        if centroids is not None
        else kmeans_centroids(embeddings, n_clusters, n_iter, vec_col, id_col)
    )
    q = np.asarray(query_vectors, dtype=np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    npb = min(nprobe, len(cents))
    qsims = q @ cents.T  # (nq, nc)
    probe = np.argpartition(-qsims, npb - 1, axis=1)[:, :npb]  # (nq, npb)
    probe_mask = np.zeros((len(q), len(cents)), dtype=bool)
    np.put_along_axis(probe_mask, probe, True, axis=1)
    q_ref = ray.put(q)
    c_ref = ray.put(cents)
    m_ref = ray.put(probe_mask)

    def probed_topk(t: pa.Table) -> pa.Table:
        from bitfunnel_ray.functions.mem import tune_allocator

        tune_allocator()
        c = ray.get(c_ref)
        qm = ray.get(q_ref)
        mask = ray.get(m_ref)  # (nq, nc)
        vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        assign = np.argmax(unit @ c.T, axis=1)  # (n,)
        ids = t[id_col].to_numpy()
        out_q, out_id, out_sim = [], [], []
        for qi in range(len(qm)):
            keep = mask[qi, assign]
            if not keep.any():
                continue
            s = unit[keep] @ qm[qi]
            cids = ids[keep]
            kk = min(k, len(s))
            part = np.argpartition(-s, kk - 1)[:kk]
            thresh = s[part].min()
            cand = np.flatnonzero(s >= thresh)
            sel = cand[np.lexsort((cids[cand], -s[cand]))[:kk]]
            out_q.append(np.full(len(sel), qi, dtype=np.int64))
            out_id.append(cids[sel])
            out_sim.append(s[sel])
        if not out_q:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()), "cosine": pa.array([], pa.float64())}
            )
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q)),
                "vec_id": pa.array(np.concatenate(out_id).astype(np.int64)),
                "cosine": pa.array(np.concatenate(out_sim), pa.float64()),
            }
        )

    parts = embeddings.select_columns([id_col, vec_col]).map_batches(
        probed_topk, batch_format="pyarrow"
    )
    return _final_topk_reduce(parts, k)


# --- hard-negative mining ---------------------------------------------------


def _batch_hardneg(
    t: pa.Table, *, q_ref, k: int, id_col: str, vec_col: str, label_col: str
) -> pa.Table:
    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    queries, q_labels = ray.get(q_ref)
    if len(t) == 0:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    vecs = np.stack(t[vec_col].to_numpy(zero_copy_only=False)).astype(np.float64)
    unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    sims = unit @ queries.T  # (n, nq)
    labels = t[label_col].to_numpy(zero_copy_only=False)
    sims[labels[:, None] == q_labels[None, :]] = -2.0  # mask same-label rows
    ids = t[id_col].to_numpy()
    out_q_l, out_id_l, out_sim_l = [], [], []
    for qi in range(sims.shape[1]):
        s = sims[:, qi]
        cand0 = np.flatnonzero(s > -1.5)
        if not len(cand0):
            continue
        kk = min(k, len(cand0))
        part = cand0[np.argpartition(-s[cand0], kk - 1)[:kk]]
        thresh = s[part].min()
        cand = cand0[s[cand0] >= thresh]  # keep exact ties (global tie-break)
        sel = cand[np.lexsort((ids[cand], -s[cand]))[:kk]]
        out_q_l.append(np.full(len(sel), qi, dtype=np.int64))
        out_id_l.append(ids[sel].astype(np.int64))
        out_sim_l.append(s[sel])
    if not out_q_l:
        return pa.table(
            {
                "query_id": pa.array([], pa.int64()),
                "vec_id": pa.array([], pa.int64()),
                "cosine": pa.array([], pa.float64()),
            }
        )
    return pa.table(
        {
            "query_id": pa.array(np.concatenate(out_q_l), pa.int64()),
            "vec_id": pa.array(np.concatenate(out_id_l), pa.int64()),
            "cosine": pa.array(np.concatenate(out_sim_l), pa.float64()),
        }
    )


def hard_negatives(
    embeddings: "ray.data.Dataset",
    anchor_vectors: np.ndarray,
    anchor_labels: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> "ray.data.Dataset":
    """Contrastive hard-negative mining: for each anchor, the top-k most
    cosine-similar vectors whose ``label`` DIFFERS from the anchor's — the
    negatives an embedding-training pipeline pairs with each anchor.
    Same broadcast + map-side-top-k shape as brute_force_topk (one matmul
    per batch, ≤ k rows/anchor/block shuffled); the label mask is one
    vectorized comparison against the broadcast anchor labels.
    → (query_id, rank, vec_id, cosine)."""
    q = np.asarray(anchor_vectors, dtype=np.float64)
    q = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    q_ref = ray.put((q, np.asarray(anchor_labels, dtype=np.int64)))
    partials = embeddings.select_columns([id_col, vec_col, label_col]).map_batches(
        partial(
            _batch_hardneg,
            q_ref=q_ref,
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            label_col=label_col,
        ),
        batch_format="pyarrow",
    )
    return _final_topk_reduce(partials, k)


# --- exact cosine-threshold self-join (near-duplicate pairs) --------------


class _BlockPairScorer:
    """Actor for the distributed block-nested-loop similarity self-join.

    Each input row names a (block_i, block_j) pair of parquet row-group
    ranges; the actor loads both blocks (LRU-cached, so a block read from
    shared storage is decoded/normalized once per actor, not once per
    pair), does ONE float64 matmul, and emits the (id_a < id_b) pairs
    whose 5-dp-rounded cosine clears the threshold.

    Scale shape: n vectors in B blocks → B(B+1)/2 tasks, each O((n/B)²)
    flops and O(n/B) I/O; total data movement is O(n·B) block reads from
    shared storage (no broadcast of the full matrix, no driver gather).
    This is the EXACT path — quadratic in n by definition of the exact
    similarity self-join; use ``lsh_dup_pairs`` / ``minhash`` for the
    candidate-generation scale path and this as the verifier or for
    moderate-n gold sets.
    """

    def __init__(self, path: str, id_col: str, vec_col: str, threshold: float):
        import pyarrow.parquet as pq

        from bitfunnel_ray.functions.mem import tune_allocator

        tune_allocator()
        self.pf = pq.ParquetFile(path)
        self.id_col, self.vec_col = id_col, vec_col
        self.threshold = threshold
        self.cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def _block(self, g: int) -> tuple[np.ndarray, np.ndarray]:
        hit = self.cache.get(g)
        if hit is not None:
            return hit
        t = self.pf.read_row_group(g, columns=[self.id_col, self.vec_col])
        ids = t[self.id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        vecs = np.stack(t[self.vec_col].to_numpy(zero_copy_only=False)).astype(
            np.float64
        )
        unit = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
        if len(self.cache) >= 8:  # bounded working set per actor
            self.cache.pop(next(iter(self.cache)))
        self.cache[g] = (ids, unit)
        return ids, unit

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_a, out_b, out_c = [], [], []
        for gi, gj in zip(
            batch["i"].to_numpy(zero_copy_only=False),
            batch["j"].to_numpy(zero_copy_only=False),
        ):
            ids_i, u_i = self._block(int(gi))
            ids_j, u_j = self._block(int(gj))
            sims = np.round(u_i @ u_j.T, 5)
            mask = sims >= self.threshold
            if gi == gj:
                # upper triangle only: each unordered pair once (a boolean
                # mask, not np.triu-zeroing — safe for threshold <= 0)
                mask &= np.triu(np.ones_like(mask), 1).astype(bool)
            ri, rj = np.nonzero(mask)
            if len(ri) == 0:
                continue
            a, b = ids_i[ri], ids_j[rj]
            lo, hi = np.minimum(a, b), np.maximum(a, b)
            out_a.append(lo)
            out_b.append(hi)
            out_c.append(sims[ri, rj])
        if not out_a:
            return pa.table(
                {
                    "id_a": pa.array([], pa.int64()),
                    "id_b": pa.array([], pa.int64()),
                    "cosine": pa.array([], pa.float64()),
                }
            )
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(out_a), pa.int64()),
                "id_b": pa.array(np.concatenate(out_b), pa.int64()),
                "cosine": pa.array(np.concatenate(out_c), pa.float64()),
            }
        )


def exact_dup_pairs(
    path: str,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    concurrency: int | None = None,
) -> "ray.data.Dataset":
    """All (id_a < id_b, cosine) pairs with round(cosine, 5) >= threshold —
    the exact cosine near-duplicate self-join, distributed as a block
    nested loop over the file's row groups (see ``_BlockPairScorer``).

    ``path`` is a parquet file/dir on shared storage; row-group size is the
    block knob (write embeddings with ~4-16k-row groups for this op).
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    n_groups = pq.ParquetFile(path).metadata.num_row_groups
    items = [
        {"i": i, "j": j} for i in range(n_groups) for j in range(i, n_groups)
    ]
    if concurrency is None:
        concurrency = max(1, min(8, len(items)))
    return rd.from_items(items).map_batches(
        _BlockPairScorer,
        fn_constructor_args=(path, id_col, vec_col, threshold),
        batch_format="pyarrow",
        batch_size=4,
        # (1, N) autoscaling pool: never reserve every CPU slot on a
        # small cluster (a fixed N-actor pool at num_cpus=N starves
        # upstream/downstream tasks and deadlocks the executor)
        concurrency=(1, concurrency),
    )
