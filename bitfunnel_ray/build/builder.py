"""The index build pipeline — the Ray-Data re-expression of
``Ingestor::Add`` + ``TermTableBuilder`` (reference:
src/Index/src/Ingestor.cpp:210-269, src/Index/src/TermTableBuilder.cpp:68-434).

Where the reference routes each document through shared mutable state
(shard slice locks, interlocked SetBit, a global-mutex docfreq hashmap —
SURVEY.md §4 contention points), this build is three streaming Dataset
passes with no shared mutable state:

1. doc-meta pass   — doc_id, url, doclen per doc → ``docmeta/`` parquet;
                     n_docs and avgdl for BM25 norms.
2. head-term pass  — optional df scan to find terms with df >
                     ``head_df_threshold``; their postings are salted by
                     ``doc_id >> salt_shift`` so no shuffle group explodes
                     (the skew analog of the reference giving hot terms
                     private rows, TermTableBuilder.cpp:268-287).  Skipped
                     when n_docs <= threshold (no term can qualify).
3. postings pass   — tokenize → posting rows (fixed-width numerics only;
                     term text never enters the big shuffle) →
                     ``groupby(bucket).map_groups(encode)`` → one dict
                     parquet per bucket, atomically renamed (resume unit).

Resume: existing bucket files are skipped *before* the shuffle (their
postings are filtered out map-side), so a rerun after a kill only pays
for the missing buckets.
"""

from __future__ import annotations

import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data

from bitfunnel_ray.build import segment
from bitfunnel_ray.build.encode import encode_bucket
from bitfunnel_ray.build.stats import DocMetaBatch, document_frequency_table
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.stages.tokenize import tokenize_batch

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)

POSTINGS_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("term_hash", pa.uint64()),
        ("gram_size", pa.uint8()),
        ("salt", pa.uint32()),
        ("doc_id", pa.uint64()),
        ("tf", pa.uint32()),
        ("doclen", pa.uint32()),
    ]
)


def tune_hash_shuffle(ctx) -> int:
    """Configure a dataset context for key-based hash exchanges and return
    the partition count.  Measured on this Ray (2.49): aggregator actors
    reserve whole CPUs by default and starve the map stages (or deadlock
    outright when partitions >> CPUs); partitions ≈ CPUs/2 with a tiny
    per-partition CPU reservation is ~5-10x faster (see BASELINE.md)."""
    import ray as _ray
    from ray.data.context import ShuffleStrategy

    cpus = int(_ray.cluster_resources().get("CPU", 8))
    n_blocks = max(2, min(32, cpus // 2))
    ctx.shuffle_strategy = ShuffleStrategy.HASH_SHUFFLE
    ctx.default_hash_shuffle_parallelism = n_blocks
    ctx.hash_shuffle_operator_actor_num_cpus_per_partition_override = 0.05
    ctx.hash_aggregate_operator_actor_num_cpus_per_partition_override = 0.05
    return n_blocks


def assign_buckets(term_hash: np.ndarray, salt: np.ndarray, num_buckets: int) -> np.ndarray:
    """bucket = (term_hash ^ (salt * golden)) % B — salt spreads a head
    term's chunks across buckets; salt=0 keeps plain term_hash % B."""
    mixed = term_hash ^ (salt.astype(np.uint64) * _GOLDEN)
    return (mixed % np.uint64(num_buckets)).astype(np.int32)


class TokenizePostings:
    """corpus batch → posting rows. Stateful actor stage: the head-term
    hash set is fetched from the object store once per actor (broadcast
    lookup, not re-shipped per batch)."""

    def __init__(
        self,
        cfg: EngineConfig,
        head_ref=None,
        skip_buckets: frozenset[int] = frozenset(),
    ):
        self.cfg = cfg
        self.skip = skip_buckets
        if head_ref is not None:
            heads = ray.get(head_ref) if isinstance(head_ref, ray.ObjectRef) else head_ref
            self.head_hashes = np.sort(np.asarray(heads, dtype=np.uint64))
        else:
            self.head_hashes = np.empty(0, dtype=np.uint64)

    def _stream_postings(self, batch: pa.Table, column: str, stream_id: int):
        cfg = self.cfg
        r = tokenize_batch(batch[column], cfg.max_gram, emit_text=False)
        # stream identity folds into the stored hash (ComputeGeneralHash
        # parity: hash + streamId, wrapping — Term.cpp:328-333)
        hashes = r.term_hash + np.uint64(stream_id)
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)[r.row]
        doclen = r.doclen[r.row].astype(np.uint32)
        return hashes, r.gram_size, doc_ids, r.tf, doclen

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        parts = [
            self._stream_postings(batch, col, sid)
            for (_name, col, sid) in cfg.streams
            if col in batch.column_names
        ]
        hashes = np.concatenate([p[0] for p in parts])
        grams = np.concatenate([p[1] for p in parts])
        doc_ids = np.concatenate([p[2] for p in parts])
        tf = np.concatenate([p[3] for p in parts])
        doclen = np.concatenate([p[4] for p in parts])
        salt = np.zeros(len(hashes), dtype=np.uint32)
        if self.head_hashes.size:
            pos = np.searchsorted(self.head_hashes, hashes)
            pos[pos == len(self.head_hashes)] = 0
            is_head = self.head_hashes[pos] == hashes
            salt[is_head] = (doc_ids[is_head] >> np.uint64(cfg.salt_shift)).astype(np.uint32)
        bucket = assign_buckets(hashes, salt, cfg.num_buckets)
        keep = ~np.isin(bucket, list(self.skip)) if self.skip else slice(None)
        return pa.table(
            {
                "bucket": pa.array(bucket[keep], pa.int32()),
                "term_hash": pa.array(hashes[keep], pa.uint64()),
                "gram_size": pa.array(grams[keep], pa.uint8()),
                "salt": pa.array(salt[keep], pa.uint32()),
                "doc_id": pa.array(doc_ids[keep], pa.uint64()),
                "tf": pa.array(tf[keep], pa.uint32()),
                "doclen": pa.array(doclen[keep], pa.uint32()),
            },
            schema=POSTINGS_SCHEMA,
        )


# --- external (disk-spill) shuffle path -----------------------------------


def spill_postings(batch: pa.Table, *, spill_dir: str) -> pa.Table:
    """Map-side external-shuffle writer: split a postings batch by bucket
    and append one parquet spill shard per bucket (the classic
    Spark/MapReduce shuffle-file layout).  Shard arrival ORDER never
    matters (the encoder re-sorts), but shard VISIBILITY does: on a
    multi-node cluster ``spill_dir`` must be on a shared filesystem; the
    encode side cross-checks row counts against the acks and aborts if any
    shard is unreachable."""
    import pyarrow.parquet as _pq

    if len(batch) == 0:
        return pa.table({"bucket": pa.array([], pa.int32()), "rows": pa.array([], pa.int64())})
    buckets = batch["bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(buckets, kind="stable")
    sorted_b = buckets[order]
    starts = np.flatnonzero(np.diff(sorted_b, prepend=-1))
    bounds = np.append(starts, len(sorted_b))
    idx = pa.array(order)
    out_b, out_n = [], []
    shard = uuid.uuid4().hex
    for i in range(len(starts)):
        b = int(sorted_b[starts[i]])
        sub = batch.take(idx.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])))
        d = os.path.join(spill_dir, f"bucket={b:05d}")
        os.makedirs(d, exist_ok=True)
        _pq.write_table(sub, os.path.join(d, f"part-{shard}.parquet"), compression="lz4")
        out_b.append(b)
        out_n.append(len(sub))
    return pa.table({"bucket": pa.array(out_b, pa.int32()), "rows": pa.array(out_n, pa.int64())})


def encode_spilled_bucket(
    batch: pa.Table, *, spill_dir: str, out_dir: str, avgdl: float, cfg: EngineConfig
) -> pa.Table:
    """Reduce-side: read one bucket's spill shards, encode, write the
    atomic dict file.

    Shard-loss guard: the map-side acks recorded how many posting rows
    each bucket spilled; if the rows visible here differ (e.g. spill_root
    is node-local on a multi-node cluster and this task landed on another
    node), the build FAILS LOUDLY instead of writing a silently-incomplete
    index.  On multi-node clusters spill_root must be a shared filesystem.
    """
    import glob as _glob

    import pyarrow.parquet as _pq

    expected = batch["expected_rows"].to_pylist()
    rows = []
    for b, exp in zip(batch["bucket"].to_pylist(), expected):
        files = sorted(_glob.glob(os.path.join(spill_dir, f"bucket={int(b):05d}", "*.parquet")))
        if not files:
            raise RuntimeError(
                f"spill shards for bucket {b} missing under {spill_dir} "
                f"(expected {exp} rows) — spill_root must be shared across nodes"
            )
        tbl = pa.concat_tables([_pq.read_table(f) for f in files])
        if len(tbl) != int(exp):
            raise RuntimeError(
                f"bucket {b}: read {len(tbl)} spilled rows but map acks recorded "
                f"{exp} — shards lost (node-local spill_root on multi-node?)"
            )
        rows.append(encode_block(tbl.combine_chunks(), out_dir=out_dir, avgdl=avgdl, cfg=cfg))
    if not rows:
        return pa.table(
            {
                "bucket": pa.array([], pa.int32()),
                "n_chunks": pa.array([], pa.int64()),
                "n_postings": pa.array([], pa.int64()),
                "payload_bytes": pa.array([], pa.int64()),
            }
        )
    return pa.concat_tables(rows)


def encode_block(block: pa.Table, *, out_dir: str, avgdl: float, cfg: EngineConfig) -> pa.Table:
    """Encode stage after the hash-partition exchange: one block holds all
    postings of one or more complete buckets (repartition(keys=['bucket'])
    guarantees co-location).  Each bucket becomes one atomic dict file —
    the resume/checkpoint unit."""
    buckets = block["bucket"].to_numpy(zero_copy_only=False)
    h = block["term_hash"].to_numpy(zero_copy_only=False)
    g = block["gram_size"].to_numpy(zero_copy_only=False)
    s = block["salt"].to_numpy(zero_copy_only=False)
    d = block["doc_id"].to_numpy(zero_copy_only=False)
    tf = block["tf"].to_numpy(zero_copy_only=False)
    dl = block["doclen"].to_numpy(zero_copy_only=False)
    out_rows = {"bucket": [], "n_chunks": [], "n_postings": [], "payload_bytes": []}
    for b in np.unique(buckets):
        m = buckets == b
        tbl = encode_bucket(
            h[m], g[m], s[m], d[m], tf[m], dl[m], avgdl, cfg.k1, cfg.b, cfg.block_size
        )
        segment.write_bucket_atomic(tbl, out_dir, int(b))
        out_rows["bucket"].append(int(b))
        out_rows["n_chunks"].append(len(tbl))
        out_rows["n_postings"].append(int(m.sum()))
        out_rows["payload_bytes"].append(tbl.nbytes)
    return pa.table(
        {
            "bucket": pa.array(out_rows["bucket"], pa.int32()),
            "n_chunks": pa.array(out_rows["n_chunks"], pa.int64()),
            "n_postings": pa.array(out_rows["n_postings"], pa.int64()),
            "payload_bytes": pa.array(out_rows["payload_bytes"], pa.int64()),
        }
    )


def build_index(
    corpus: "ray.data.Dataset",
    out_dir: str,
    cfg: EngineConfig | None = None,
) -> dict:
    """Build (or resume) one index segment from a corpus Dataset.

    Returns the manifest dict.  Idempotent: a completed segment returns
    immediately; a partial one rebuilds only missing buckets.
    """
    cfg = cfg or EngineConfig()
    t0 = time.time()
    os.makedirs(out_dir, exist_ok=True)
    existing = segment.load_manifest(out_dir)
    if existing is not None and existing.get("complete"):
        return existing

    # --- pass 1: doc meta (skipped on resume if already written) --------
    meta_dir = os.path.join(out_dir, "docmeta")
    meta_done = os.path.join(meta_dir, "_DONE")
    if not os.path.exists(meta_done):
        tmp_meta = meta_dir + ".tmp"
        if os.path.exists(tmp_meta):
            import shutil

            shutil.rmtree(tmp_meta)
        corpus.map_batches(
            DocMetaBatch(cfg.max_gram, light=True), batch_format="pyarrow"
        ).write_parquet(tmp_meta)
        if os.path.exists(meta_dir):
            import shutil

            shutil.rmtree(meta_dir)
        os.replace(tmp_meta, meta_dir)
        with open(meta_done, "w") as f:
            f.write("ok")
    # corpus-level totals via a DISTRIBUTED aggregate over the doclen
    # column only — the driver receives two scalars, never the table
    # (replaces a driver-side pq.read_table that was O(corpus) memory)
    import ray.data as _rd
    from ray.data.aggregate import Count as _Count, Sum as _Sum

    totals = _rd.read_parquet(
        meta_dir, columns=["doclen"], file_extensions=["parquet"]
    ).aggregate(_Count(alias_name="n"), _Sum("doclen", alias_name="s"))
    n_docs = int(totals["n"] or 0)
    sum_dl = int(totals["s"] or 0)
    avgdl = (sum_dl / n_docs) if n_docs else 1.0

    # --- pass 2: head terms for skew salting ----------------------------
    head_ref = None
    n_head_terms = 0
    if n_docs > cfg.head_df_threshold:
        heads = (
            document_frequency_table(corpus, cfg, emit_text=False)
            .filter(lambda row: row["df"] > cfg.head_df_threshold)
            .to_pandas()
        )
        if len(heads):
            head_arr = heads["term_hash"].to_numpy().astype(np.uint64)
            head_ref = ray.put(head_arr)
            n_head_terms = len(head_arr)
            # sidecar for query-time routing: a salted head term's chunks
            # live in MANY buckets, so a term-sharded server must scatter
            # lookups for these hashes to every shard (query/sharded.py)
            pq.write_table(
                pa.table({"term_hash": pa.array(np.sort(head_arr), pa.uint64())}),
                os.path.join(out_dir, "heads.parquet"),
            )

    # --- pass 3: postings shuffle + per-bucket encode -------------------
    done = frozenset(segment.completed_buckets(out_dir))
    bucket_stats: list[dict] = []
    if len(done) < cfg.num_buckets:
        stream_cols = [c for (_n, c, _s) in cfg.streams]
        postings = corpus.select_columns(["doc_id", *stream_cols]).map_batches(
            TokenizePostings(cfg, head_ref, done), batch_format="pyarrow"
        )
        from functools import partial

        # THE build shuffle: hash-partition on the explicit bucket key (a
        # key-based exchange, ~5x faster than the sort-based groupby on a
        # low-cardinality key), then encode whole buckets per block.  Bucket
        # identity comes from the bucket COLUMN, so fewer partitions than
        # buckets is fine — each block encodes several whole buckets.
        shuffle_mode = cfg.extra.get("shuffle", "external")
        if shuffle_mode == "ray":
            # in-memory hash exchange; partition count = CPUs (each
            # partition's consumer also encodes its buckets)
            tune_hash_shuffle(postings.context)
            cpus = int(ray.cluster_resources().get("CPU", 8))
            n_blocks = max(2, min(cfg.num_buckets, cpus))
            postings.context.default_hash_shuffle_parallelism = n_blocks
            enc = postings.repartition(num_blocks=n_blocks, keys=["bucket"]).map_batches(
                partial(encode_block, out_dir=out_dir, avgdl=avgdl, cfg=cfg),
                batch_size=None,
                batch_format="pyarrow",
            )
            bucket_stats = enc.to_pandas().to_dict("records")
        else:
            # external shuffle: map tasks append per-bucket spill shards,
            # then one encode task per bucket — no exchange operator, no
            # aggregator actors, encode parallelism = bucket count.
            # MULTI-NODE: spill_root must be a shared filesystem (encode
            # tasks may land on any node); the ack row-count cross-check in
            # encode_spilled_bucket aborts the build if shards are missing.
            import uuid as _uuid

            # spill to RAM-backed storage when available (the node-local
            # shuffle-SSD analog); fall back to the output filesystem
            spill_root = cfg.extra.get(
                "spill_root", "/dev/shm" if os.path.isdir("/dev/shm") else out_dir
            )
            spill_dir = os.path.join(spill_root, f".bfr-spill-{_uuid.uuid4().hex[:8]}")
            os.makedirs(spill_dir, exist_ok=True)
            try:
                acks = postings.map_batches(
                    partial(spill_postings, spill_dir=spill_dir),
                    batch_size=None,
                    batch_format="pyarrow",
                ).to_pandas()
                # per-bucket expected row counts: the encode side cross-checks
                # rows actually read vs these acks and fails loudly on loss
                per_bucket = (
                    acks.groupby("bucket")["rows"].sum().astype(int).to_dict()
                    if len(acks)
                    else {}
                )
                import ray.data as rd

                enc = rd.from_items(
                    [
                        {"bucket": int(b), "expected_rows": int(n)}
                        for b, n in sorted(per_bucket.items())
                    ]
                ).map_batches(
                    partial(
                        encode_spilled_bucket,
                        spill_dir=spill_dir,
                        out_dir=out_dir,
                        avgdl=avgdl,
                        cfg=cfg,
                    ),
                    batch_size=1,
                    batch_format="pyarrow",
                )
                bucket_stats = enc.to_pandas().to_dict("records")
            finally:
                import shutil as _shutil

                _shutil.rmtree(spill_dir, ignore_errors=True)

    manifest = {
        "format_version": 1,
        "complete": True,
        "n_docs": n_docs,
        "sum_doclen": sum_dl,
        "avgdl": avgdl,
        "config": {
            "max_gram": cfg.max_gram,
            "k1": cfg.k1,
            "b": cfg.b,
            "block_size": cfg.block_size,
            "num_buckets": cfg.num_buckets,
            "head_df_threshold": cfg.head_df_threshold,
            "salt_shift": cfg.salt_shift,
            "streams": [list(s) for s in cfg.streams],
        },
        "n_head_terms": n_head_terms,
        "buckets_completed": sorted(segment.completed_buckets(out_dir)),
        "bucket_stats": {int(r["bucket"]): {k: int(v) for k, v in r.items() if k != "bucket"} for r in bucket_stats},
        "build_seconds": round(time.time() - t0, 3),
    }
    segment.write_manifest(out_dir, manifest)
    return manifest
