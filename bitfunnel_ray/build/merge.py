"""Segment merge / compaction — completes the north-star's "shard-local
segments merged" story (reference: slices recycle into shards,
src/Index/src/Shard.cpp; here immutable additive segments are the unit).

Segments built with the same EngineConfig share term-hash bucketing, so
merging is embarrassingly parallel PER BUCKET — no shuffle: bucket b of
every input segment co-locates exactly the same term-hash range.  Each
merge task decodes its bucket's posting lists (whole-bucket vectorized
varint decode — no per-chunk python), concatenates across segments,
optionally drops tombstoned documents (compaction), and re-encodes with
the COMBINED avgdl so BM25 block-max metadata is exact for the merged
corpus.  Output is bit-for-bit what a from-scratch build over the union
corpus would produce (pytest asserts table equality).

Salted head-term chunks stay in their original buckets (salt participates
in routing); the merged ``heads.parquet`` is the union, so query-time
scatter still finds every chunk.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from bitfunnel_ray.build import segment as seglib
from bitfunnel_ray.build.encode import encode_bucket
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.functions import varint


def _column_stream(col: "pa.ChunkedArray | pa.Array") -> np.ndarray:
    """Concatenated bytes of a large_binary column as one uint8 array."""
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offs = np.frombuffer(arr.buffers()[1], dtype=np.int64, count=len(arr) + 1)
    data = np.frombuffer(arr.buffers()[2], dtype=np.uint8)
    return data[offs[0] : offs[-1]]


def decode_bucket_table(t: pa.Table):
    """dict table → flat posting arrays (term_hash, gram, salt, doc_id,
    tf, doclen), whole-bucket vectorized: one varint decode per stream and
    a segmented cumsum to undo the per-chunk delta encoding.  PFor-coded
    chunks (treatment bands — few, long lists) decode chunk-wise and are
    spliced back into the delta stream."""
    n_post = t["n_postings"].to_numpy()
    total = int(n_post.sum())
    if total == 0:
        e = np.empty(0, np.uint64)
        return e, np.empty(0, np.uint8), np.empty(0, np.uint32), e, e, e
    codec = (
        t["codec"].to_numpy(zero_copy_only=False)
        if "codec" in t.column_names
        else np.zeros(len(t), np.uint8)
    )
    if codec.any():
        from bitfunnel_ray.build.encode import CODEC_PFOR
        from bitfunnel_ray.functions.pfor import decode_pfor

        docs_col = t["docs_payload"].combine_chunks() if isinstance(
            t["docs_payload"], pa.ChunkedArray
        ) else t["docs_payload"]
        post_starts = np.concatenate([[0], np.cumsum(n_post)[:-1]]).astype(np.int64)
        deltas = np.empty(total, dtype=np.uint64)
        v_rows = np.flatnonzero(codec != CODEC_PFOR)
        if len(v_rows):
            vt = t.take(pa.array(v_rows))
            v_deltas = varint.decode(
                _column_stream(vt["docs_payload"]),
                count=int(vt["n_postings"].to_numpy().sum()),
            )
            # scatter the varint rows' deltas back to their chunk slots
            v_np = n_post[v_rows]
            idx = np.repeat(post_starts[v_rows], v_np) + (
                np.arange(int(v_np.sum()))
                - np.repeat(np.cumsum(v_np) - v_np, v_np)
            )
            deltas[idx] = v_deltas
        for r in np.flatnonzero(codec == CODEC_PFOR):
            deltas[post_starts[r] : post_starts[r] + n_post[r]] = decode_pfor(
                np.frombuffer(docs_col[int(r)].as_py(), dtype=np.uint8),
                int(n_post[r]),
            )
    else:
        deltas = varint.decode(_column_stream(t["docs_payload"]), count=total)
    tf = varint.decode(_column_stream(t["tf_payload"]), count=total)
    dl = varint.decode(_column_stream(t["dl_payload"]), count=total)
    starts = np.concatenate([[0], np.cumsum(n_post)[:-1]]).astype(np.int64)
    # segmented cumsum: the first delta of each chunk is absolute, so
    # doc_id = running_total - running_total[chunk_start - 1]
    run = np.cumsum(deltas, dtype=np.uint64)
    prev = np.empty(len(starts), dtype=np.uint64)
    prev[0] = 0
    prev[1:] = run[starts[1:] - 1]
    doc_ids = run - np.repeat(prev, n_post)
    h = np.repeat(t["term_hash"].to_numpy(), n_post)
    g = np.repeat(t["gram_size"].to_numpy(), n_post)
    s = np.repeat(t["salt"].to_numpy(), n_post)
    return h, g, s, doc_ids, tf, dl


def _merge_bucket_batch(
    batch: pa.Table,
    *,
    seg_dirs: "list[str]",
    out_dir: str,
    avgdl: float,
    cfg: EngineConfig,
    dead_ref=None,
) -> pa.Table:
    import ray

    from bitfunnel_ray.functions.mem import tune_allocator

    tune_allocator()
    dead = (
        ray.get(dead_ref) if dead_ref is not None else np.empty(0, np.uint64)
    )  # sorted uint64
    rows = []
    for b in batch["bucket"].to_pylist():
        parts = []
        for d in seg_dirs:
            p = seglib.bucket_path(d, int(b))
            if os.path.exists(p):
                parts.append(decode_bucket_table(pq.read_table(p)))
        if not parts:
            continue
        h = np.concatenate([p[0] for p in parts])
        g = np.concatenate([p[1] for p in parts])
        s = np.concatenate([p[2] for p in parts])
        doc = np.concatenate([p[3] for p in parts])
        tf = np.concatenate([p[4] for p in parts])
        dl = np.concatenate([p[5] for p in parts])
        if len(dead):
            pos = np.searchsorted(dead, doc)
            pos[pos == len(dead)] = 0
            keep = dead[pos] != doc
            h, g, s, doc, tf, dl = h[keep], g[keep], s[keep], doc[keep], tf[keep], dl[keep]
        enc = encode_bucket(
            h, g, s, doc, tf, dl, avgdl, cfg.k1, cfg.b,
            cfg.treatment_bands or cfg.block_size,
        )
        seglib.write_bucket_atomic(enc, out_dir, int(b))
        rows.append(
            {
                "bucket": int(b),
                "n_chunks": len(enc),
                "n_postings": int(len(doc)),
                "payload_bytes": enc.nbytes,
            }
        )
    return pa.Table.from_pylist(rows) if rows else pa.table(
        {
            "bucket": pa.array([], pa.int32()),
            "n_chunks": pa.array([], pa.int64()),
            "n_postings": pa.array([], pa.int64()),
            "payload_bytes": pa.array([], pa.int64()),
        }
    )


def merge_segments(
    seg_dirs: "list[str]",
    out_dir: str,
    tombstones: "np.ndarray | None" = None,
) -> dict:
    """Merge (and optionally compact) bucket-aligned segments into one.

    ``tombstones``: doc ids to drop — their postings and docmeta rows are
    gone from the merged segment (the soft-delete anti-join becomes a real
    delete).  Idempotent/resumable like ``build_index``: completed buckets
    are skipped on rerun.
    """
    import ray

    from functools import partial

    mans = []
    for d in seg_dirs:
        man = seglib.load_manifest(d)
        if man is None:
            raise FileNotFoundError(f"no manifest in {d}")
        mans.append(man)
    c0 = mans[0]["config"]
    for man in mans[1:]:
        c = man["config"]
        for key in ("num_buckets", "max_gram", "k1", "b", "streams"):
            if c.get(key) != c0.get(key):
                raise ValueError(
                    f"segments disagree on {key}: {c.get(key)} vs {c0.get(key)} "
                    "— bucket-aligned merge requires identical hashing/bucketing config"
                )
        # store_fields must match too: the docstore merge reads every
        # source part through one read_parquet, and DocStore assumes the
        # first part's field list for all parts — mixed schemas would
        # fail or silently drop fields for one source's docs.
        if tuple(c.get("store_fields") or ()) != tuple(c0.get("store_fields") or ()):
            raise ValueError(
                f"segments disagree on store_fields: {c.get('store_fields')} vs "
                f"{c0.get('store_fields')} — rebuild with identical store_fields"
            )
    bands = c0.get("treatment_bands")
    cfg = EngineConfig(
        max_gram=int(c0["max_gram"]),
        k1=float(c0["k1"]),
        b=float(c0["b"]),
        block_size=int(c0["block_size"]),
        num_buckets=int(c0["num_buckets"]),
        head_df_threshold=int(c0["head_df_threshold"]),
        salt_shift=int(c0["salt_shift"]),
        streams=tuple(tuple(s) for s in c0["streams"]),
        facts=tuple(tuple(f) for f in c0.get("facts", []) or []),
        treatment_bands=tuple(tuple(b) for b in bands) if bands else None,
        store_fields=tuple(c0.get("store_fields") or ()),
    )
    existing = seglib.load_manifest(out_dir)
    if existing is not None and existing.get("complete"):
        return existing
    os.makedirs(out_dir, exist_ok=True)

    dead = (
        np.sort(np.asarray(tombstones, dtype=np.uint64))
        if tombstones is not None and len(tombstones)
        else np.empty(0, np.uint64)
    )
    dead_ref = ray.put(dead) if len(dead) else None

    # --- docmeta: distributed rewrite (filtering tombstones) + totals ----
    meta_dir = os.path.join(out_dir, "docmeta")
    meta_done = os.path.join(meta_dir, "_DONE")
    import shutil

    meta_files = [
        f
        for d in seg_dirs
        for f in sorted(
            os.path.join(d, "docmeta", p)
            for p in os.listdir(os.path.join(d, "docmeta"))
            if p.endswith(".parquet")
        )
    ]

    def meta_rewrite(t: pa.Table, *, dest: str) -> pa.Table:
        # deterministic part name from the batch's first (pre-filter)
        # doc_id: a Ray task retry overwrites its own earlier file instead
        # of duplicating rows (docmeta must stay exactly-once — its totals
        # feed avgdl and the sharded server's doc striping)
        tag = f"{int(t['doc_id'][0].as_py()):016x}" if len(t) else "empty"
        if dead_ref is not None:
            dd = ray.get(dead_ref)
            ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
            pos = np.searchsorted(dd, ids)
            pos[pos == len(dd)] = 0
            t = t.filter(pa.array(dd[pos] != ids))
        os.makedirs(dest, exist_ok=True)
        pq.write_table(t, os.path.join(dest, f"part-{tag}.parquet"))
        dl = t["doclen"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "n_docs": pa.array([len(t)], pa.int64()),
                "sum_doclen": pa.array([int(np.sum(dl, dtype=np.int64))], pa.int64()),
            }
        )

    if not os.path.exists(meta_done):
        meta_tmp = meta_dir + ".tmp"
        shutil.rmtree(meta_tmp, ignore_errors=True)
        totals = (
            ray.data.read_parquet(meta_files)
            .map_batches(partial(meta_rewrite, dest=meta_tmp), batch_format="pyarrow")
            .to_pandas()
        )
        n_docs = int(totals["n_docs"].sum())
        sum_dl = int(totals["sum_doclen"].sum())
        shutil.rmtree(meta_dir, ignore_errors=True)
        os.replace(meta_tmp, meta_dir)
        with open(meta_done, "w") as f:
            f.write(f"{n_docs},{sum_dl}")
    else:
        with open(meta_done) as f:
            n_docs, sum_dl = (int(x) for x in f.read().split(","))
    avgdl = (sum_dl / n_docs) if n_docs else 1.0

    # --- docstore: same distributed rewrite when EVERY source carries the
    # stored-fields sidecar (build/docstore.py); a mixed set would leave
    # fetch() silently partial, so it merges all-or-nothing --------------
    store_srcs = [os.path.join(d, "docstore") for d in seg_dirs]
    store_files = [
        os.path.join(s, p)
        for s in store_srcs
        if os.path.isdir(s)
        for p in sorted(os.listdir(s))
        if p.endswith(".parquet")
    ]
    if all(os.path.isdir(s) for s in store_srcs) and store_files:
        store_dir = os.path.join(out_dir, "docstore")
        store_done = os.path.join(store_dir, "_DONE")
        if not os.path.exists(store_done):
            # keep the operator's point-lookup pruning unit: reuse the
            # source parts' row-group size instead of hardcoding one
            first_meta = pq.ParquetFile(store_files[0]).metadata
            src_rg = max(
                1, first_meta.row_group(0).num_rows
            ) if first_meta.num_row_groups else 2048

            def store_rewrite(t: pa.Table, *, dest: str) -> pa.Table:
                if dead_ref is not None:
                    dd = ray.get(dead_ref)
                    ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64)
                    pos = np.searchsorted(dd, ids)
                    pos[pos == len(dd)] = 0
                    t = t.filter(pa.array(dd[pos] != ids))
                # A 0-row parquet part has a row group with statistics=None,
                # which DocStore.__init__ can't range-index — skip the write
                # entirely when tombstones (or an empty input batch) leave
                # nothing.  Also avoids name collisions on "part-empty".
                if len(t) == 0:
                    return pa.table({"n_rows": pa.array([0], pa.int64())})
                tag = f"{int(t['doc_id'][0].as_py()):016x}"
                t = t.sort_by("doc_id")
                os.makedirs(dest, exist_ok=True)
                pq.write_table(t, os.path.join(dest, f"part-{tag}.parquet"),
                               row_group_size=src_rg)
                return pa.table({"n_rows": pa.array([len(t)], pa.int64())})

            store_tmp = store_dir + ".tmp"
            shutil.rmtree(store_tmp, ignore_errors=True)
            os.makedirs(store_tmp, exist_ok=True)  # all-empty batches write no parts
            rows = (
                ray.data.read_parquet(store_files)
                .map_batches(partial(store_rewrite, dest=store_tmp), batch_format="pyarrow")
                .to_pandas()
            )
            if int(rows["n_rows"].sum()) != n_docs:
                raise RuntimeError(
                    f"merged docstore rows ({int(rows['n_rows'].sum())}) != "
                    f"docmeta n_docs ({n_docs}); refusing to publish"
                )
            shutil.rmtree(store_dir, ignore_errors=True)
            os.replace(store_tmp, store_dir)
            with open(store_done, "w") as f:
                f.write("ok")

    # --- heads union ------------------------------------------------------
    heads = [
        pq.read_table(hp)["term_hash"].to_numpy().astype(np.uint64)
        for d in seg_dirs
        if os.path.exists(hp := os.path.join(d, "heads.parquet"))
    ]
    n_head_terms = 0
    if heads:
        head_arr = np.unique(np.concatenate(heads))
        n_head_terms = len(head_arr)
        pq.write_table(
            pa.table({"term_hash": pa.array(head_arr, pa.uint64())}),
            os.path.join(out_dir, "heads.parquet"),
        )

    # --- vocab sidecar merge (all-or-nothing, like docstore) -------------
    # Distributed group-sum of (term, df) across the sources, re-striped
    # to the MERGED config's bucket space — so a compacted index keeps
    # suggest/fuzzy/correct working (without this, a --vocab user's
    # compaction produced a sidecar-less segment and the serving fronts'
    # mixed-state guard made the whole index refuse vocabulary queries).
    # Tombstoned docs' df contributions are NOT subtracted (df is not
    # per-doc decomposable from the sidecar alone) — the same freshness
    # class as posting-level df before compaction; a fresh build resets.
    vocab_srcs = [os.path.join(d, "vocab") for d in seg_dirs]
    vocab_dir = os.path.join(out_dir, "vocab")
    if all(os.path.isdir(v) for v in vocab_srcs) and not os.path.isdir(vocab_dir):
        from bitfunnel_ray.build.builder import tune_hash_shuffle
        from bitfunnel_ray.functions.hashing import hash_terms

        def vocab_combine(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "term" not in t.column_names:
                return pa.table(
                    {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
                )
            out = t.select(["term", "df"]).group_by("term").aggregate([("df", "sum")])
            return pa.table(
                {"term": out["term"], "df": out["df_sum"].cast(pa.int64())}
            )

        def restripe(t: pa.Table) -> pa.Table:
            if len(t) == 0 or "term" not in t.column_names:
                return pa.table(
                    {
                        "term": pa.array([], pa.string()),
                        "df": pa.array([], pa.int64()),
                        "bucket": pa.array([], pa.int32()),
                    }
                )
            h = hash_terms(np.asarray(t["term"].to_pylist(), dtype=object))
            return pa.table(
                {
                    "term": t["term"],
                    "df": t["df"],
                    "bucket": pa.array(
                        (h % np.uint64(cfg.num_buckets)).astype(np.int32), pa.int32()
                    ),
                }
            )

        vds = ray.data.read_parquet(vocab_srcs, file_extensions=["parquet"])
        n_vb = tune_hash_shuffle(vds.context)
        merged_vocab = (
            vds.map_batches(vocab_combine, batch_format="pyarrow")
            .repartition(num_blocks=n_vb, keys=["term"])
            .map_batches(vocab_combine, batch_size=None, batch_format="pyarrow")
            .map_batches(restripe, batch_format="pyarrow")
        )
        vocab_tmp = vocab_dir + ".tmp"
        shutil.rmtree(vocab_tmp, ignore_errors=True)
        merged_vocab.write_parquet(vocab_tmp)
        os.replace(vocab_tmp, vocab_dir)

    # --- bucket-aligned merge (one task per missing bucket, no shuffle) --
    done = seglib.completed_buckets(out_dir)
    todo = [b for b in range(cfg.num_buckets) if b not in done]
    bucket_stats: list[dict] = []
    if todo:
        enc = ray.data.from_items([{"bucket": int(b)} for b in todo]).map_batches(
            partial(
                _merge_bucket_batch,
                seg_dirs=list(seg_dirs),
                out_dir=out_dir,
                avgdl=avgdl,
                cfg=cfg,
                dead_ref=dead_ref,
            ),
            batch_size=1,
            batch_format="pyarrow",
        )
        bucket_stats = enc.to_pandas().to_dict("records")

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
            "facts": [list(f) for f in cfg.facts],
            "treatment_bands": [list(b) for b in cfg.treatment_bands] if cfg.treatment_bands else None,
            "store_fields": list(cfg.store_fields),
            # merged segment carries a vocab sidecar iff every source did
            # (the all-or-nothing merge above) — recorded for fsck
            "vocab_sidecar": os.path.isdir(vocab_dir),
        },
        "n_head_terms": n_head_terms,
        "merged_from": [os.path.abspath(d) for d in seg_dirs],
        "n_tombstones_compacted": int(len(dead)),
        "buckets_completed": sorted(seglib.completed_buckets(out_dir)),
        "bucket_stats": {
            int(r["bucket"]): {k: int(v) for k, v in r.items() if k != "bucket"}
            for r in bucket_stats
        },
    }
    seglib.write_manifest(out_dir, manifest)
    return manifest


# --- size-tiered compaction (the LSM policy over additive segments) --------


def next_compaction(
    seg_dirs: "list[str]",
    max_segments: int = 4,
    tier_factor: float = 4.0,
) -> "list[str] | None":
    """Pick the next merge group under the size-tiered policy.

    Streaming ingestion (``build_index_waves`` / incremental adds) leaves a
    trail of additive segments; serving cost grows with segment count (one
    dictionary lookup per segment per term).  The classic size-tiered rule
    bounds write amplification: merge PEERS (segments within
    ``tier_factor`` of the running group size), never a tiny segment into
    a giant one — a doc ingested early is rewritten O(log_F total) times
    instead of O(merges).

    Returns the list of segment dirs to merge next (ascending size,
    smallest tier first), or None when ``len(seg_dirs) <= max_segments``.
    Deterministic in the manifests, so a killed compaction rerun picks the
    same group.
    """
    if len(seg_dirs) <= max_segments:
        return None
    sizes = []
    for d in seg_dirs:
        man = seglib.load_manifest(d)
        if man is None:
            raise FileNotFoundError(f"no manifest in {d}")
        sizes.append((int(man["n_docs"] or 0), d))
    sizes.sort()
    need = len(sizes) - max_segments + 1
    group = [sizes[0]]
    total = max(1, sizes[0][0])
    for n, d in sizes[1:]:
        if len(group) >= need:
            break
        if n > tier_factor * total and len(group) >= 2:
            # next candidate is outside the tier: stop here (a later
            # compaction round merges the output with its new peers)
            break
        group.append((n, d))
        total += n
    if len(group) < 2:
        group = sizes[:2]
    return [d for _n, d in group]


def compact_segments(
    out_root: str,
    seg_dirs: "list[str]",
    max_segments: int = 4,
    tier_factor: float = 4.0,
    tombstones: "np.ndarray | None" = None,
) -> dict:
    """Run size-tiered compactions until at most ``max_segments`` remain.

    Each round merges one tier group into ``out_root/seg-merged-NNNN``
    (atomic per-bucket, resumable — ``merge_segments`` semantics) and
    replaces the group members in the live list.  Tombstones are applied
    on the FIRST merge each doc participates in (compaction is when soft
    deletes become real deletes, Ingestor.cpp:302-327 analog).

    Returns ``{"segment_dirs": [...], "merges": [{"inputs": [...],
    "output": ...}, ...]}``; query engines take ``segment_dirs``.
    """
    live = list(seg_dirs)
    merges = []
    seq = 0
    existing = set(os.listdir(out_root)) if os.path.isdir(out_root) else set()
    while True:
        group = next_compaction(live, max_segments, tier_factor)
        if group is None:
            break
        while f"seg-merged-{seq:04d}" in existing:
            seq += 1
        out_dir = os.path.join(out_root, f"seg-merged-{seq:04d}")
        existing.add(f"seg-merged-{seq:04d}")
        # tombstones go to EVERY round (idempotent — already-removed docs
        # simply aren't present).  An earlier version nulled them after
        # round 1, which RESURRECTED deleted docs living in segments that
        # only joined a later round's merge group.
        merge_segments(group, out_dir, tombstones=tombstones)
        live = [d for d in live if d not in set(group)] + [out_dir]
        merges.append({"inputs": group, "output": out_dir})
    # refresh the waves manifest if this root has one (keeps
    # ShardedServer(out_root) / waves.json consumers consistent)
    waves_path = os.path.join(out_root, "waves.json")
    if os.path.exists(waves_path):
        import json as _json

        with open(waves_path) as f:
            root = _json.load(f)
        root["segment_dirs"] = live
        root["compactions"] = root.get("compactions", []) + merges
        with open(waves_path, "w") as f:
            _json.dump(root, f)
    return {"segment_dirs": live, "merges": merges}
