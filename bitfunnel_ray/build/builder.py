"""The index build pipeline — the Ray-Data re-expression of
``Ingestor::Add`` + ``TermTableBuilder`` (reference:
src/Index/src/Ingestor.cpp:210-269, src/Index/src/TermTableBuilder.cpp:68-434).

Where the reference routes each document through shared mutable state
(shard slice locks, interlocked SetBit, a global-mutex docfreq hashmap —
SURVEY.md §4 contention points), this build is streaming Dataset passes
with no shared mutable state:

1. head-term pass  — optional df scan to find terms with df >
                     ``head_df_threshold``; their postings are salted by
                     ``doc_id >> salt_shift`` so no shuffle group explodes
                     (the skew analog of the reference giving hot terms
                     private rows, TermTableBuilder.cpp:268-287).  Skipped
                     when n_docs <= threshold (no term can qualify).
2. fused spill pass — ONE streaming corpus read: tokenize → posting rows
                     (fixed-width numerics only; term text never enters
                     the spill) → per-bucket Arrow-IPC spill shards, plus
                     the ``docmeta/`` sidecar shards and the
                     (n_docs, sum_doclen) totals partials in the ack rows.
3. encode pass     — one task per bucket reads its spill shards (row
                     counts cross-checked against the map acks), encodes
                     with the cache-blocked kernel, writes one dict
                     parquet per bucket, atomically renamed (resume unit).

Resume: existing bucket files are skipped *before* the spill (their
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
    # BFR_SHUFFLE_PARTS pins the exchange partition count independent of
    # the CPU count (scaling runs: identical exchange layout at every
    # cluster size — partitions are cheap at 0.05 cpu each)
    if os.environ.get("BFR_SHUFFLE_PARTS"):
        n_blocks = int(os.environ["BFR_SHUFFLE_PARTS"])
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
        stats_max_gram: int | None = None,
    ):
        self.cfg = cfg
        self.skip = skip_buckets
        # fused statistics (StatisticsBuilder precedent — stats and ingest
        # are ONE corpus walk): when set, build_postings also returns the
        # per-batch df/cf partial over the BODY stream's PRE-stream-fold
        # hashes (identical to a standalone document_frequency_table scan)
        self.stats_max_gram = stats_max_gram
        if head_ref is not None:
            heads = ray.get(head_ref) if isinstance(head_ref, ray.ObjectRef) else head_ref
            self.head_hashes = np.sort(np.asarray(heads, dtype=np.uint64))
        else:
            self.head_hashes = np.empty(0, dtype=np.uint64)

    def _stream_postings(self, batch: pa.Table, column: str, stream_id: int, keep_pos=False):
        cfg = self.cfg
        r = tokenize_batch(batch[column], cfg.max_gram, emit_text=False, keep_pos=keep_pos)
        # stream identity folds into the stored hash (ComputeGeneralHash
        # parity: hash + streamId, wrapping — Term.cpp:328-333)
        hashes = r.term_hash + np.uint64(stream_id)
        doc_ids = batch["doc_id"].to_numpy().astype(np.uint64)[r.row]
        doclen = r.doclen[r.row].astype(np.uint32)
        return hashes, r.gram_size, doc_ids, r.tf, doclen, r.doclen, r

    def __call__(self, batch: pa.Table) -> pa.Table:
        return self.build_postings(batch)[0]

    def build_postings(
        self, batch: pa.Table
    ) -> "tuple[pa.Table, np.ndarray, pa.Table | None]":
        """Returns (postings table, per-document doclen of the body stream
        — the whitespace token count docmeta records, fused df/cf partial
        table or None)."""
        from bitfunnel_ray.functions.mem import tune_allocator

        tune_allocator()
        cfg = self.cfg
        parts = []
        body_doclen = np.zeros(len(batch), dtype=np.int64)
        stats_tbl = None
        for (name, col, sid) in cfg.streams:
            if col not in batch.column_names:
                continue
            is_body = col == "text" or not parts
            want_stats = self.stats_max_gram is not None and is_body
            part = self._stream_postings(batch, col, sid, keep_pos=want_stats)
            parts.append(part)
            if is_body:
                body_doclen = np.asarray(part[5], dtype=np.int64)
            if want_stats:
                from bitfunnel_ray.build.stats import partial_term_stats

                stats_tbl = partial_term_stats(
                    part[6], emit_text=True, stats_max_gram=self.stats_max_gram
                )
        # facts (IFactSet analog): one synthetic posting per (fact, doc)
        # where the boolean column holds — vectorized mask, tf=1, doclen =
        # body doclen so the posting layout matches every other term
        for (fname, fcol) in cfg.facts:
            if fcol not in batch.column_names:
                continue
            import pyarrow.compute as _pc

            from bitfunnel_ray.functions.hashing import fact_term_hash

            mask = _pc.fill_null(batch[fcol].cast(pa.bool_()), False).to_numpy(
                zero_copy_only=False
            )
            sel = np.flatnonzero(mask)
            if not len(sel):
                continue
            fh = np.uint64(fact_term_hash(fname))
            parts.append(
                (
                    np.full(len(sel), fh, dtype=np.uint64),
                    np.ones(len(sel), dtype=np.uint8),
                    batch["doc_id"].to_numpy().astype(np.uint64)[sel],
                    np.ones(len(sel), dtype=np.uint32),
                    body_doclen[sel].astype(np.uint32),
                )
            )
        hashes = np.concatenate([p[0] for p in parts])
        grams = np.concatenate([p[1] for p in parts])
        doc_ids = np.concatenate([p[2] for p in parts])
        tf = np.concatenate([p[3] for p in parts])
        doclen = np.concatenate([p[4] for p in parts])
        del parts[:]  # release per-stream TokenizeResults before the sort
        salt = np.zeros(len(hashes), dtype=np.uint32)
        if self.head_hashes.size:
            pos = np.searchsorted(self.head_hashes, hashes)
            pos[pos == len(self.head_hashes)] = 0
            is_head = self.head_hashes[pos] == hashes
            salt[is_head] = (doc_ids[is_head] >> np.uint64(cfg.salt_shift)).astype(np.uint32)
        bucket = assign_buckets(hashes, salt, cfg.num_buckets)
        keep = ~np.isin(bucket, list(self.skip)) if self.skip else slice(None)
        tbl = pa.table(
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
        return tbl, body_doclen, stats_tbl


# --- external (disk-spill) shuffle path -----------------------------------

ACK_SCHEMA = pa.schema(
    [
        ("bucket", pa.int32()),
        ("rows", pa.int64()),
        ("n_docs", pa.int64()),
        ("sum_doclen", pa.int64()),
    ]
)


def _spill_bucket_shards(
    postings: pa.Table, spill_dir: str, compression: str | None = None,
    shard: str | None = None,
) -> tuple[list[int], list[int]]:
    """Split a postings table by bucket and append one Arrow-IPC spill
    shard per bucket (classic map-side shuffle-file layout).  The bucket
    id lives in the directory name, so the shard itself drops the bucket
    column — 4 fewer bytes per posting in the spill.  Uncompressed IPC:
    the spill target is RAM-backed or node-local SSD and the encode side
    reads it back exactly once (compression cost > I/O saved there).

    ``shard`` names the per-batch file; callers pass a value derived
    deterministically from the batch (first doc_id) so a Ray task RETRY
    overwrites its own earlier shard instead of appending a duplicate
    (exactly-once spill under task retries)."""
    import pyarrow.ipc as _ipc

    buckets = postings["bucket"].to_numpy(zero_copy_only=False)
    order = np.argsort(buckets, kind="stable")
    sorted_b = buckets[order]
    starts = np.flatnonzero(np.diff(sorted_b, prepend=-1))
    bounds = np.append(starts, len(sorted_b))
    idx = pa.array(order)
    payload = postings.drop_columns(["bucket"])
    out_b, out_n = [], []
    shard = shard or uuid.uuid4().hex
    opts = _ipc.IpcWriteOptions(compression=compression) if compression else None
    for i in range(len(starts)):
        b = int(sorted_b[starts[i]])
        sub = payload.take(idx.slice(int(bounds[i]), int(bounds[i + 1] - bounds[i])))
        d = os.path.join(spill_dir, f"bucket={b:05d}")
        os.makedirs(d, exist_ok=True)
        with _ipc.new_file(
            os.path.join(d, f"part-{shard}.arrow"), sub.schema, options=opts
        ) as w:
            w.write_table(sub)
        out_b.append(b)
        out_n.append(len(sub))
    return out_b, out_n


class TokenizeSpill:
    """THE build map task, fused: corpus batch → tokenize → postings →
    per-bucket spill shards, plus the docmeta sidecar shard and the
    (n_docs, sum_doclen) partials — ONE streaming pass over the corpus
    replaces the former separate doc-meta pass + distributed totals
    aggregate + tokenize pass (each a full corpus read).

    Returns one ack row per bucket touched (the encode side cross-checks
    spilled row counts against these and aborts on shard loss) plus one
    summary row (bucket = -1) carrying the doc-count/doclen partials."""

    def __init__(
        self,
        cfg,
        head_ref,
        skip_buckets,
        spill_dir: str,
        meta_dir: str,
        stats_dir: str | None = None,
        stats_max_gram: int = 1,
    ):
        # stats_dir: fused-statistics sidecar — each batch also writes its
        # df/cf partial shard there (deterministic name, retry-overwrites),
        # so the df table needs NO second corpus read (combine_fused_stats).
        # May be a LIST of dirs: the same partial table is written to each
        # (tiny parquet writes) — lets one spill pass feed both a shared
        # fused-stats dir and the per-segment vocab-sidecar partials.
        self.tp = TokenizePostings(
            cfg, head_ref, skip_buckets,
            stats_max_gram=stats_max_gram if stats_dir else None,
        )
        self.spill_dir = spill_dir
        self.meta_dir = meta_dir
        self.stats_dirs = (
            [stats_dir] if isinstance(stats_dir, str) else list(stats_dir or [])
        )
        # stored-fields sidecar (build/docstore.py) — staged beside the
        # docmeta tmp dir and published atomically with it
        self.store_dir = (meta_dir + "-docstore") if cfg.store_fields else None
        # lz4 IPC by default — 2M-doc interleaved A/B: at 32-way
        # concurrency the RAM-backed spill is memory-bandwidth-bound and
        # lz4 halves the spill stage (18.7 s -> 8.8 s) while costing ~4%
        # at 8-way (compression CPU scales with cores; the bus doesn't).
        # On a real cluster spill is node-local SSD/NVMe, where
        # compression is the standard default anyway.  "spill_compression":
        # None (or "none") restores raw IPC.
        comp = cfg.extra.get("spill_compression", "lz4")
        self.compression = None if comp in (None, "none") else comp

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        import pyarrow.parquet as _pq

        postings, body_doclen, stats_tbl = self.tp.build_postings(batch)
        # Batch identity for every file this task writes: the first doc_id
        # is unique per batch (doc_ids are unique and batch membership is
        # deterministic), so a retried task OVERWRITES its earlier partial
        # output instead of duplicating rows — docmeta stays exactly-once
        # under worker crashes (a uuid4 name here silently double-counted
        # docs on retry).
        batch_tag = f"{int(batch['doc_id'][0].as_py()):016x}" if len(batch) else uuid.uuid4().hex
        # docmeta shard (doc_id, url, doclen, n_bytes — DocTable analog)
        nbytes = pc.binary_length(batch["text"].cast(pa.binary())) if "text" in batch.column_names else pa.nulls(len(batch), pa.int64())
        meta_cols = {
            "doc_id": batch["doc_id"],
            "url": batch["url"] if "url" in batch.column_names else pa.nulls(len(batch), pa.string()),
            "doclen": pa.array(body_doclen),
            "n_bytes": nbytes.cast(pa.int64()),
        }
        # numeric doc-values fast-field (Lucene NumericDocValues / Tantivy
        # fast-field analog): epoch-seconds of warc_ts, stored columnar in
        # docmeta so serve-time range filters never rescan the corpus
        if "warc_ts" in batch.column_names:
            meta_cols["warc_ts_s"] = (
                batch["warc_ts"].cast(pa.timestamp("s")).cast(pa.int64())
            )
        meta = pa.table(meta_cols)
        os.makedirs(self.meta_dir, exist_ok=True)
        _pq.write_table(meta, os.path.join(self.meta_dir, f"part-{batch_tag}.parquet"))
        if stats_tbl is not None:
            for sd in self.stats_dirs:
                os.makedirs(sd, exist_ok=True)
                _pq.write_table(
                    stats_tbl, os.path.join(sd, f"part-{batch_tag}.parquet")
                )
        if self.store_dir and len(batch):
            # stored-fields sidecar (build/docstore.py): doc_id-sorted so
            # parquet row-group stats give tight ranges for point lookups;
            # same retry-overwrite naming as docmeta
            cols = {"doc_id": batch["doc_id"].cast(pa.int64())}
            for f in self.tp.cfg.store_fields:
                if f in batch.column_names:
                    cols[f] = batch[f]
            store = pa.table(cols).sort_by("doc_id")
            os.makedirs(self.store_dir, exist_ok=True)
            _pq.write_table(
                store,
                os.path.join(self.store_dir, f"part-{batch_tag}.parquet"),
                # small row groups = the point-lookup pruning unit; 2048
                # text rows ≈ a few MB — one seek's worth per fetch hit
                row_group_size=int(self.tp.cfg.extra.get("docstore_row_group", 2048)),
            )
        if len(postings):
            out_b, out_n = _spill_bucket_shards(
                postings, self.spill_dir, self.compression, shard=batch_tag
            )
        else:
            out_b, out_n = [], []
        out_b.append(-1)
        out_n.append(0)
        n_docs = [0] * (len(out_b) - 1) + [len(batch)]
        sum_dl = [0] * (len(out_b) - 1) + [int(np.sum(body_doclen, dtype=np.int64))]
        return pa.table(
            {
                "bucket": pa.array(out_b, pa.int32()),
                "rows": pa.array(out_n, pa.int64()),
                "n_docs": pa.array(n_docs, pa.int64()),
                "sum_doclen": pa.array(sum_dl, pa.int64()),
            },
            schema=ACK_SCHEMA,
        )


# Worker-process memo for the task-based spill map: map_batches with a
# FUNCTION runs in stateless tasks (no actor-pool startup per Dataset — a
# fresh 32-actor pool costs ~2s, paid per WAVE in build_index_waves), and
# the memo re-creates actor-style amortization: each worker process builds
# the (sorted head set, compiled state) once per spill_dir and reuses it
# across all its tasks.
_SPILL_MEMO: dict = {}


def _spill_map(batch: pa.Table, *, ctor: tuple) -> pa.Table:
    cfg, head_ref, skip, spill_dir, meta_dir, stats_dir, stats_max_gram = ctor
    ts = _SPILL_MEMO.get(spill_dir)
    if ts is None:
        ts = TokenizeSpill(
            cfg, head_ref, skip, spill_dir, meta_dir,
            stats_dir=stats_dir, stats_max_gram=stats_max_gram,
        )
        _SPILL_MEMO.clear()  # one live spill per worker; drop stale state
        _SPILL_MEMO[spill_dir] = ts
    return ts(batch)


def _encode_batch_size(per_bucket: "dict[int, int]", cfg: EngineConfig) -> int:
    """Buckets per encode task: amortize per-task fixed cost without
    starving the encode pool (≥ 2 waves of tasks per slot) or blowing the
    per-task row budget (~4M postings)."""
    if not per_bucket:
        return 1
    n = len(per_bucket)
    mean_rows = max(1, sum(per_bucket.values()) // n)
    cpus = int(ray.cluster_resources().get("CPU", 8))
    enc_cpus = float(cfg.extra.get("encode_num_cpus", 2 if cpus >= 16 else 1))
    slots = max(1, int(cpus // max(1.0, enc_cpus)))
    by_slots = max(1, n // (2 * slots))
    by_rows = max(1, int(4_000_000 // mean_rows))
    return max(1, min(by_slots, by_rows))


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

    import pyarrow.ipc as _ipc

    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    expected = batch["expected_rows"].to_pylist()
    rows = []
    for b, exp in zip(batch["bucket"].to_pylist(), expected):
        files = sorted(_glob.glob(os.path.join(spill_dir, f"bucket={int(b):05d}", "*.arrow")))
        if not files:
            raise RuntimeError(
                f"spill shards for bucket {b} missing under {spill_dir} "
                f"(expected {exp} rows) — spill_root must be shared across nodes"
            )
        parts = []
        for f in files:
            with pa.memory_map(f) as mm:  # zero-copy read off RAM-backed spill
                parts.append(_ipc.open_file(mm).read_all())
        tbl = pa.concat_tables(parts).combine_chunks()
        if len(tbl) != int(exp):
            raise RuntimeError(
                f"bucket {b}: read {len(tbl)} spilled rows but map acks recorded "
                f"{exp} — shards lost (node-local spill_root on multi-node?)"
            )
        enc = encode_bucket(
            tbl["term_hash"].to_numpy(zero_copy_only=False),
            tbl["gram_size"].to_numpy(zero_copy_only=False),
            tbl["salt"].to_numpy(zero_copy_only=False),
            tbl["doc_id"].to_numpy(zero_copy_only=False),
            tbl["tf"].to_numpy(zero_copy_only=False),
            tbl["doclen"].to_numpy(zero_copy_only=False),
            avgdl, cfg.k1, cfg.b, cfg.treatment_bands or cfg.block_size,
        )
        segment.write_bucket_atomic(enc, out_dir, int(b))
        rows.append(
            {
                "bucket": int(b),
                "n_chunks": len(enc),
                "n_postings": len(tbl),
                "payload_bytes": enc.nbytes,
            }
        )
    return pa.table(
        {
            "bucket": pa.array([r["bucket"] for r in rows], pa.int32()),
            "n_chunks": pa.array([r["n_chunks"] for r in rows], pa.int64()),
            "n_postings": pa.array([r["n_postings"] for r in rows], pa.int64()),
            "payload_bytes": pa.array([r["payload_bytes"] for r in rows], pa.int64()),
        }
    )


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
            h[m], g[m], s[m], d[m], tf[m], dl[m], avgdl, cfg.k1, cfg.b,
            cfg.treatment_bands or cfg.block_size,
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


def effective_num_buckets(cfg: EngineConfig, corpus: "ray.data.Dataset") -> int:
    """Scale the shuffle/segment bucket count with corpus size.

    Buckets are the unit of encode parallelism AND of per-task working-set
    size; measured on this box (BASELINE.md round-2 perf notes), encode
    wall-time goes superlinear once a bucket holds the postings of more
    than ~30k web documents (~4M posting rows — the radix parts stay
    cache-blocked, but the per-task concat/sort working set leaves the
    shared LLC and 32 concurrent tasks saturate the memory bus).  Target
    ~``docs_per_bucket`` docs per bucket (default 16Ki ≈ 2M posting rows),
    rounded up to a power of two, never below ``cfg.num_buckets``.

    Only applies when the corpus row count is free (parquet metadata —
    ``_meta_count``); a transformed Dataset keeps the configured count
    rather than paying an execution pass.  Disable with
    ``extra={"auto_buckets": False}``.  Deterministic in the corpus, so
    resume runs re-derive the same count.
    """
    if not cfg.extra.get("auto_buckets", True):
        return cfg.num_buckets
    try:
        n = corpus._meta_count()
    except Exception:
        n = None
    if not n:
        return cfg.num_buckets
    dpb = int(cfg.extra.get("docs_per_bucket", 1 << 14))
    need = 1 << max(0, int(np.ceil(np.log2(max(1.0, n / dpb)))))
    return max(cfg.num_buckets, need)


def scan_head_terms(
    corpus: "ray.data.Dataset | None",
    cfg: EngineConfig,
    skip_count: bool = False,
    files: "list[str] | None" = None,
) -> np.ndarray:
    """Terms with df > ``cfg.head_df_threshold`` (the skew-salting head
    set).  Head detection is a HEURISTIC (any head set yields identical
    results — pytest salted==unsalted), so the df scan runs on a
    deterministic sample when the sampled df at the threshold is
    statistically solid (≥ 50 expected postings): with ``files`` given and
    plentiful, a FILE-stride sample (only 1/rate of the corpus leaves
    storage — the pruned-read form); else a hash-sample of rows (still a
    full read, 5% of the tokenize)."""
    import pyarrow.compute as pc

    rate = float(cfg.extra.get("head_sample_rate", 0.05))
    stride = max(1, int(round(1.0 / rate))) if rate > 0 else 1
    if (
        files is not None
        and len(files) >= 2 * stride
        and cfg.head_df_threshold * rate >= 50
    ):
        sub = sorted(files)[::stride]
        eff_rate = len(sub) / len(files)
        scan = ray.data.read_parquet(sub)
        thr = int(cfg.head_df_threshold * eff_rate)
        heads = (
            document_frequency_table(scan, cfg, emit_text=False)
            .map_batches(
                lambda t, _thr=thr: t.filter(pc.greater(t["df"], _thr)),
                batch_format="pyarrow",
            )
            .to_pandas()
        )
        if not len(heads):
            return np.empty(0, dtype=np.uint64)
        return heads["term_hash"].to_numpy().astype(np.uint64)
    if corpus is None:
        corpus = ray.data.read_parquet(files)
    if not skip_count and corpus.count() <= cfg.head_df_threshold:
        return np.empty(0, dtype=np.uint64)
    scan, thr = corpus, cfg.head_df_threshold
    if 0.0 < rate < 1.0 and cfg.head_df_threshold * rate >= 50:
        from bitfunnel_ray.stages.filters import sample_filter

        scan = sample_filter(corpus, rate)
        thr = int(cfg.head_df_threshold * rate)
    heads = (
        document_frequency_table(scan, cfg, emit_text=False)
        .map_batches(
            lambda t, _thr=thr: t.filter(pc.greater(t["df"], _thr)),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    if not len(heads):
        return np.empty(0, dtype=np.uint64)
    return heads["term_hash"].to_numpy().astype(np.uint64)


def build_index(
    corpus: "ray.data.Dataset",
    out_dir: str,
    cfg: EngineConfig | None = None,
    _defer_encode: bool = False,
) -> dict:
    """Build (or resume) one index segment from a corpus Dataset.

    Returns the manifest dict.  Idempotent: a completed segment returns
    immediately; a partial one rebuilds only missing buckets.

    ``cfg.extra["fused_stats_dir"]``: also emit per-batch df/cf partial
    shards (gram sizes ≤ ``extra["stats_max_gram"]``, default 1) from the
    SAME tokenize pass — the StatisticsBuilder fusion; finish with
    ``stats.combine_fused_stats``.

    ``_defer_encode`` (internal, used by ``build_index_waves``): return
    right after the spill pass with ``{"deferred": True, "finish": fn}``;
    calling ``finish()`` runs the encode phase + manifest write.  Lets a
    caller overlap this segment's (memory-bandwidth-bound) encode with the
    NEXT segment's (compute-bound) tokenize/spill.
    """
    cfg = cfg or EngineConfig()
    eff_buckets = effective_num_buckets(cfg, corpus)
    if eff_buckets != cfg.num_buckets:
        import dataclasses as _dc

        cfg = _dc.replace(cfg, num_buckets=eff_buckets)
    t0 = time.time()
    stage_s: dict[str, float] = {}

    def _mark(name: str, since: float) -> float:
        now = time.time()
        stage_s[name] = round(now - since, 3)
        return now

    os.makedirs(out_dir, exist_ok=True)
    existing = segment.load_manifest(out_dir)
    if existing is not None and existing.get("complete"):
        return existing

    # input lineage (north-rule: per-partition lineage in the checkpoint):
    # which source files this segment was built from — free for parquet
    # reads, empty for synthetic/transformed inputs
    try:
        input_files = sorted(
            getattr(corpus, "_bfr_input_files", None) or corpus.input_files() or []
        )
    except Exception:
        input_files = []

    meta_dir = os.path.join(out_dir, "docmeta")
    meta_done = os.path.join(meta_dir, "_DONE")
    done = frozenset(segment.completed_buckets(out_dir))
    shuffle_mode = cfg.extra.get("shuffle", "external")
    # The external path fuses the doc-meta pass + corpus totals INTO the
    # tokenize/spill pass (one streaming read of the corpus instead of
    # three); the in-memory-exchange path and the resume-with-all-buckets
    # path still need docmeta + totals up front.
    fused = shuffle_mode != "ray" and len(done) < cfg.num_buckets
    if cfg.store_fields and shuffle_mode == "ray":
        raise ValueError(
            "store_fields needs the fused external-shuffle build (the "
            "docstore sidecar is written by the spill pass); drop "
            'extra={"shuffle": "ray"} or the store_fields'
        )
    if cfg.extra.get("vocab_sidecar") and shuffle_mode == "ray":
        raise ValueError(
            "vocab_sidecar needs the fused external-shuffle build (the "
            "df/cf partials are written by the spill pass); drop "
            'extra={"shuffle": "ray"} or the vocab_sidecar flag'
        )
    n_docs = sum_dl = None
    avgdl = 1.0
    t1 = t0
    if not fused:
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
        t1 = _mark("docmeta", t0)
        # corpus-level totals via a DISTRIBUTED aggregate over the doclen
        # column only — the driver receives two scalars, never the table
        import ray.data as _rd
        from ray.data.aggregate import Count as _Count, Sum as _Sum

        totals = _rd.read_parquet(
            meta_dir, columns=["doclen"], file_extensions=["parquet"]
        ).aggregate(_Count(alias_name="n"), _Sum("doclen", alias_name="s"))
        n_docs = int(totals["n"] or 0)
        sum_dl = int(totals["s"] or 0)
        avgdl = (sum_dl / n_docs) if n_docs else 1.0
        t1 = _mark("totals", t1)

    # --- head terms for skew salting (must precede the postings pass —
    # the salt participates in bucket routing) ---------------------------
    head_ref = None
    n_head_terms = 0
    pre_heads = cfg.extra.get("head_hashes")
    if pre_heads is not None:
        # caller already ran a statistics pass (the reference's own order:
        # statistics → termtable build → ingest) and hands the head-term
        # hashes over directly — no scan here
        head_arr = np.asarray(pre_heads, dtype=np.uint64)
    elif (n_docs if n_docs is not None else corpus.count()) > cfg.head_df_threshold:
        head_arr = scan_head_terms(corpus, cfg, skip_count=True)
    else:
        head_arr = np.empty(0, dtype=np.uint64)
    if cfg.facts:
        # facts are potentially corpus-sized posting lists by construction
        # (a popular predicate holds for most documents), so their chunks
        # are ALWAYS salted — the guaranteed-whale analog of the
        # reference's private rows for system facts (FactSetBase.cpp)
        from bitfunnel_ray.functions.hashing import fact_term_hash

        fact_arr = np.array(
            [fact_term_hash(n) for (n, _c) in cfg.facts], dtype=np.uint64
        )
        head_arr = np.union1d(head_arr, fact_arr)
    if len(head_arr):
        head_arr = np.sort(head_arr)
        head_ref = ray.put(head_arr)
        n_head_terms = len(head_arr)
        # sidecar for query-time routing: a salted head term's chunks
        # live in MANY buckets, so a term-sharded server must scatter
        # lookups for these hashes to every shard (query/sharded.py)
        pq.write_table(
            pa.table({"term_hash": pa.array(head_arr, pa.uint64())}),
            os.path.join(out_dir, "heads.parquet"),
        )

    t1 = _mark("head_scan", t1)

    # --- postings shuffle + per-bucket encode ---------------------------
    bucket_stats: list[dict] = []
    deferred_encode = None
    if len(done) < cfg.num_buckets:
        from functools import partial

        stream_cols = [c for (_n, c, _s) in cfg.streams]
        stream_cols += [c for (_n, c) in cfg.facts if c not in stream_cols]
        try:
            _names = set(corpus.schema().names)
            stream_cols = [c for c in stream_cols if c in _names]
        except Exception:
            pass
        if shuffle_mode == "ray":
            # in-memory hash exchange on the explicit bucket key (a
            # key-based exchange, ~5x faster than sort-based groupby on a
            # low-cardinality key); partition count = CPUs, each
            # partition's consumer encodes its (whole) buckets
            postings = corpus.select_columns(["doc_id", *stream_cols]).map_batches(
                TokenizePostings(cfg, head_ref, done), batch_format="pyarrow"
            )
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
            t1 = _mark("shuffle_encode", t1)
        else:
            # external shuffle, FUSED map: one streaming corpus read does
            # tokenize → per-bucket spill shards + docmeta shards + totals
            # partials; then one encode task per bucket — no exchange
            # operator, no aggregator actors.
            # MULTI-NODE: spill_root must be a shared filesystem (encode
            # tasks may land on any node); the ack row-count cross-check in
            # encode_spilled_bucket aborts the build if shards are missing.
            import shutil as _shutil
            import uuid as _uuid

            # spill to RAM-backed storage when available (the node-local
            # shuffle-SSD analog); fall back to the output filesystem
            spill_root = cfg.extra.get(
                "spill_root", "/dev/shm" if os.path.isdir("/dev/shm") else out_dir
            )
            spill_dir = os.path.join(spill_root, f".bfr-spill-{_uuid.uuid4().hex[:8]}")
            os.makedirs(spill_dir, exist_ok=True)
            meta_tmp = meta_dir + ".tmp"
            _shutil.rmtree(meta_tmp, ignore_errors=True)
            _shutil.rmtree(meta_tmp + "-docstore", ignore_errors=True)
            stats_dir = cfg.extra.get("fused_stats_dir")
            # vocab sidecar (cfg.extra["vocab_sidecar"]): the SAME spill
            # pass also writes per-segment df/cf partials, combined after
            # the spill into <out>/vocab — the (term, df, bucket) text
            # stripes the serving fronts load for autocomplete + fuzzy
            # (build/stats.write_vocab_sidecar).  No second corpus read.
            vocab_partials = (
                os.path.join(out_dir, "_vocab_partials")
                if cfg.extra.get("vocab_sidecar")
                else None
            )
            if vocab_partials:
                stats_dir = [d for d in (stats_dir, vocab_partials) if d]
            try:
                ok = False
                schema_names = corpus.schema().names
                sel = (
                    ["doc_id"]
                    + [c for c in ("url", "warc_ts") if c in schema_names]
                    + stream_cols
                )
                missing_store = [c for c in cfg.store_fields if c not in schema_names]
                if missing_store:
                    # fail LOUDLY at build time: silently storing nothing
                    # passes every row-count cross-check and only explodes
                    # weeks later at fetch time
                    raise ValueError(
                        f"store_fields {missing_store} not in the corpus "
                        f"schema {sorted(schema_names)}"
                    )
                sel += [c for c in cfg.store_fields if c not in sel]
                # docs per map task: pins the spill-shard count (and the
                # per-shard size) independent of input block layout and CPU
                # count — identical work shape at every parallelism.  The
                # default SCALES with the bucket count so the per-(task,
                # bucket) shard stays ~8k postings as auto-bucketing grows
                # the segment: at 4096 docs/task a 256-bucket build writes
                # tasks×buckets ≈ 250k tiny (~2k-posting) shards and both
                # spill and encode go file-metadata-bound (measured 4M-doc
                # A/B: 16384-doc batches beat 4096 in 4/4 interleaved runs,
                # best 134k vs 91k docs/s).  Deterministic in cfg, so resume
                # and both scaling-run CPU levels see identical work.
                spill_batch = int(
                    cfg.extra.get(
                        "spill_batch_docs",
                        min(65536, max(8192, 4096 * (cfg.num_buckets // 64))),
                    )
                )
                # task args must stay tiny: the head set travels as an
                # ObjectRef (head_ref), never inline in cfg.extra
                cfg_task = cfg
                if "head_hashes" in cfg.extra:
                    import dataclasses as _dc

                    cfg_task = _dc.replace(
                        cfg,
                        extra={k: v for k, v in cfg.extra.items() if k != "head_hashes"},
                    )
                # task-based map (plain function + worker memo), NOT an
                # actor pool: actor startup is ~2s per Dataset execution
                # and build_index_waves runs one spill Dataset per wave
                acks = corpus.select_columns(sel).map_batches(
                    partial(
                        _spill_map,
                        ctor=(
                            cfg_task, head_ref, done, spill_dir, meta_tmp,
                            stats_dir, int(cfg.extra.get("stats_max_gram", 1)),
                        ),
                    ),
                    batch_size=spill_batch,
                    batch_format="pyarrow",
                ).to_pandas()
                t1 = _mark("tokenize_spill", t1)
                summary = acks[acks.bucket < 0]
                n_docs = int(summary.n_docs.sum())
                sum_dl = int(summary.sum_doclen.sum())
                avgdl = (sum_dl / n_docs) if n_docs else 1.0
                # publish the docmeta sidecar before encode so a crash
                # mid-encode leaves docmeta complete for the resume run.
                # Cross-check first: parquet-metadata row count must equal
                # the ack-derived n_docs (same guard the spill shards get) —
                # catches any residual duplicate/lost docmeta shard.
                meta_rows = sum(
                    pq.ParquetFile(os.path.join(meta_tmp, f)).metadata.num_rows
                    for f in os.listdir(meta_tmp)
                    if f.endswith(".parquet")
                )
                if meta_rows != n_docs:
                    raise RuntimeError(
                        f"docmeta rows ({meta_rows}) != ack n_docs ({n_docs}) — "
                        "duplicate or lost docmeta shard; refusing to publish"
                    )
                _shutil.rmtree(meta_dir, ignore_errors=True)
                os.replace(meta_tmp, meta_dir)
                store_tmp = meta_tmp + "-docstore"
                if cfg.store_fields and os.path.isdir(store_tmp):
                    # same exactly-once cross-check as docmeta
                    store_rows = sum(
                        pq.ParquetFile(os.path.join(store_tmp, f)).metadata.num_rows
                        for f in os.listdir(store_tmp)
                        if f.endswith(".parquet")
                    )
                    if store_rows != n_docs:
                        raise RuntimeError(
                            f"docstore rows ({store_rows}) != ack n_docs ({n_docs}) — "
                            "duplicate or lost docstore shard; refusing to publish"
                        )
                    store_dir = os.path.join(out_dir, "docstore")
                    _shutil.rmtree(store_dir, ignore_errors=True)
                    os.replace(store_tmp, store_dir)
                with open(meta_done, "w") as f:
                    f.write("ok")
                if vocab_partials and os.path.isdir(vocab_partials):
                    from bitfunnel_ray.build.stats import (
                        combine_fused_stats,
                        write_vocab_sidecar,
                    )

                    write_vocab_sidecar(
                        out_dir,
                        combine_fused_stats(vocab_partials, emit_text=True),
                        eff_buckets,
                    )
                    _shutil.rmtree(vocab_partials, ignore_errors=True)
                    t1 = _mark("vocab_sidecar", t1)
                # per-bucket expected row counts: the encode side cross-checks
                # rows actually read vs these acks and fails loudly on loss
                bucket_acks = acks[acks.bucket >= 0]
                per_bucket = (
                    bucket_acks.groupby("bucket")["rows"].sum().astype(int).to_dict()
                    if len(bucket_acks)
                    else {}
                )
                def _encode_phase(
                    per_bucket=per_bucket, spill_dir=spill_dir, avgdl=avgdl
                ) -> "list[dict]":
                    import ray.data as rd

                    te = time.time()
                    try:
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
                                cfg=cfg_task,
                            ),
                            # several small buckets per task: the per-task
                            # fixed cost (launch, glob, parquet write)
                            # dominates once auto-bucketing or wave splits
                            # shrink buckets below ~1M postings; the sort
                            # working set stays per-bucket either way.
                            # Keep ≥ 2 tasks per encode slot so the stage
                            # still fills the pool, and ≤ ~4M rows per task.
                            batch_size=_encode_batch_size(per_bucket, cfg),
                            batch_format="pyarrow",
                            # In deferred (overlap) mode the encode runs
                            # CONCURRENTLY with the next wave's spill: cap
                            # concurrent encode tasks to half the cluster
                            # so the bandwidth-floored encode never starves
                            # the compute-bound spill of CPUs (uncapped, 16
                            # tasks x 2 cpus reserve the whole 32-cpu box
                            # and the "overlap" degenerates to alternation)
                            concurrency=(
                                max(
                                    1,
                                    int(
                                        ray.cluster_resources().get("CPU", 8)
                                        // (
                                            2
                                            * float(
                                                cfg.extra.get(
                                                    "encode_num_cpus",
                                                    2
                                                    if ray.cluster_resources().get("CPU", 0) >= 16
                                                    else 1,
                                                )
                                            )
                                        )
                                    ),
                                )
                                if _defer_encode
                                else None
                            ),
                            # encode is memory-bandwidth-bound, not compute-bound:
                            # at full task-per-core concurrency 32 concurrent
                            # varint/PFor packers thrash the shared bus and run
                            # ABSOLUTELY slower than 16 (measured 2M-doc A/B on
                            # this box: encode 16.2-23.6 s at 32-way vs 8.4-18.3 s
                            # at 16-way, min-of-2 each).  num_cpus=2 halves the
                            # concurrent encode tasks per node; on a real cluster
                            # this is per-node bandwidth management, the same knob.
                            # Small sessions (< 16 CPUs — unit tests, laptops)
                            # keep 1: the bus isn't contended there, and a 2-CPU
                            # reservation can deadlock against live actor pools.
                            num_cpus=float(
                                cfg.extra.get(
                                    "encode_num_cpus",
                                    2
                                    if ray.cluster_resources().get("CPU", 0) >= 16
                                    else 1,
                                )
                            ),
                        )
                        out = enc.to_pandas().to_dict("records")
                        _mark("encode", te)
                        return out
                    finally:
                        _shutil.rmtree(spill_dir, ignore_errors=True)

                ok = True
                if _defer_encode:
                    deferred_encode = _encode_phase
                else:
                    bucket_stats = _encode_phase()
            finally:
                if not ok:
                    _shutil.rmtree(spill_dir, ignore_errors=True)
                _shutil.rmtree(meta_tmp, ignore_errors=True)
                _shutil.rmtree(meta_tmp + "-docstore", ignore_errors=True)

    def _finalize(bucket_stats: "list[dict]") -> dict:
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
                "treatment_bands": [list(b) for b in cfg.treatment_bands] if cfg.treatment_bands else None,
                "num_buckets": cfg.num_buckets,
                "head_df_threshold": cfg.head_df_threshold,
                "salt_shift": cfg.salt_shift,
                "streams": [list(s) for s in cfg.streams],
                "facts": [list(f) for f in cfg.facts],
                "store_fields": list(cfg.store_fields),
                # recorded so fsck can flag a LOST vocab sidecar (a dir
                # check alone passes clean when the whole dir is gone)
                "vocab_sidecar": bool(cfg.extra.get("vocab_sidecar")),
            },
            "n_head_terms": n_head_terms,
            "input_files": input_files[:4096],
            "n_input_files": len(input_files),
            "buckets_completed": sorted(segment.completed_buckets(out_dir)),
            "bucket_stats": {int(r["bucket"]): {k: int(v) for k, v in r.items() if k != "bucket"} for r in bucket_stats},
            "build_seconds": round(time.time() - t0, 3),
            "stage_seconds": stage_s,
        }
        segment.write_manifest(out_dir, manifest)
        return manifest

    if deferred_encode is not None:
        return {
            "complete": False,
            "deferred": True,
            "finish": lambda: _finalize(deferred_encode()),
            "n_docs": n_docs,
            "sum_doclen": sum_dl,
            "avgdl": avgdl,
            "out_dir": out_dir,
        }
    return _finalize(bucket_stats)


def build_index_waves(
    parquet_files: "list[str]",
    out_root: str,
    cfg: EngineConfig | None = None,
    n_waves: int = 4,
    override_num_blocks_per_wave: int | None = None,
) -> dict:
    """Streaming ingestion: split the corpus files into ``n_waves``
    contiguous waves and build one ADDITIVE SEGMENT per wave, overlapping
    wave i's encode phase (memory-bandwidth-bound) with wave i+1's
    tokenize/spill pass (compute-bound) — the producer-consumer pipelining
    a continuously-ingesting build runs at any scale; without it the
    encode phase idles every CPU at a bandwidth floor while the next
    corpus slice waits.  Segments are the engine's incremental-ingest unit
    already (build/merge.py); BM25 scores are computed from decoded
    tf/doclen + the SERVING avgdl, so query results over the wave
    segments are identical to a single-segment build of the same corpus
    (pytest-proven in tests/test_build_query.py).

    One head-term set is scanned up front and shared by every wave
    (salting must agree across segments for sharded head routing).
    ``cfg.extra["fused_stats_dir"]`` composes: every wave's spill emits
    df/cf partials into the same durable sidecar dir.

    Resume: per-wave segment manifests are idempotent — completed waves
    are skipped, partially-built waves rebuild only missing buckets.

    Returns ``{"segment_dirs": [...], "waves": [manifests], "n_docs": n,
    "sum_doclen": s, "avgdl": a}``; query engines take ``segment_dirs``.
    """
    import dataclasses as _dc
    import json as _json
    from concurrent.futures import ThreadPoolExecutor

    import ray.data as rd

    cfg = cfg or EngineConfig()
    files = sorted(parquet_files)
    if not files:
        raise ValueError("build_index_waves: no input files")
    n_waves = max(1, min(int(n_waves), len(files)))
    step = (len(files) + n_waves - 1) // n_waves
    groups = [files[i : i + step] for i in range(0, len(files), step)]
    os.makedirs(out_root, exist_ok=True)

    if cfg.extra.get("head_hashes") is None:
        head_arr = scan_head_terms(None, cfg, files=files)
        cfg = _dc.replace(cfg, extra={**cfg.extra, "head_hashes": head_arr})

    seg_dirs = [os.path.join(out_root, f"seg-{i:04d}") for i in range(len(groups))]
    manifests: dict[int, dict] = {}
    pending: list[tuple[int, object]] = []
    with ThreadPoolExecutor(max_workers=1) as pool:
        # max_workers=1 serializes encodes (two concurrent encode phases
        # would contend for the same memory bandwidth); the main thread
        # keeps streaming the next wave's spill meanwhile
        for i, g in enumerate(groups):
            # override_num_blocks: input blocks bound map-task parallelism
            # within a wave (few big files would leave CPUs idle); a FIXED
            # count keeps the work shape identical across cluster sizes
            wave = (
                rd.read_parquet(g, override_num_blocks=override_num_blocks_per_wave)
                if override_num_blocks_per_wave
                else rd.read_parquet(g)
            )
            part = build_index(wave, seg_dirs[i], cfg, _defer_encode=True)
            if part.get("deferred"):
                pending.append((i, pool.submit(part["finish"])))
            else:
                manifests[i] = part
        for i, fut in pending:
            manifests[i] = fut.result()
    mans = [manifests[i] for i in range(len(groups))]
    n_docs = sum(int(m["n_docs"] or 0) for m in mans)
    sum_dl = sum(int(m["sum_doclen"] or 0) for m in mans)
    root = {
        "complete": True,
        "segment_dirs": seg_dirs,
        "n_waves": len(groups),
        "n_docs": n_docs,
        "sum_doclen": sum_dl,
        "avgdl": (sum_dl / n_docs) if n_docs else 1.0,
        "waves": mans,
    }
    with open(os.path.join(out_root, "waves.json"), "w") as f:
        _json.dump(root, f)
    return root
