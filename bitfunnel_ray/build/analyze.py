"""Per-band index statistics — the RowTableAnalyzer analog.

The reference's ``analyze`` emits per-row/rank densities and per-term
data so a user can tune treatments (reference:
src/Index/src/RowTableAnalyzer.cpp:165-290, driven by
tools/BitFunnel/src/AnalyzeCommand.cpp).  The exact-index analog is a
document-frequency-banded breakdown of the posting-list storage: for
each IdfX10 band, how many terms land there, how many postings they
carry, how many payload bytes they occupy, and the resulting
bytes/posting — the numbers that drive codec/block-size treatment
choices (config.treatment_bands).

Runs as a Ray Data pipeline over the segment's dict files (per-batch
vectorized band partials → one tiny groupby), so it scales to segments
far larger than driver memory.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from bitfunnel_ray.build import segment as seglib


def _band_partials(batch: pa.Table, *, n_docs: int) -> pa.Table:
    """Vectorized per-batch combine: chunk rows → one partial row per
    (idf_x10 band, gram_size)."""
    import pyarrow.compute as pc

    df = batch["n_postings"].to_numpy().astype(np.float64)
    gram = batch["gram_size"].to_numpy(zero_copy_only=False).astype(np.int64)
    codec = (
        batch["codec"].to_numpy(zero_copy_only=False).astype(np.int64)
        if "codec" in batch.column_names
        else np.zeros(len(batch), np.int64)
    )
    # IdfX10 = round(10 * log10(n_docs / df)), clipped to [0, 60] like the
    # reference's IdfX10 ceiling (Term.h MaxIdfX10Value = 60)
    idf = np.clip(np.round(10.0 * np.log10(max(n_docs, 1) / np.maximum(df, 1.0))), 0, 60)
    payload = (
        pc.binary_length(batch["docs_payload"]).to_numpy().astype(np.int64)
        + pc.binary_length(batch["tf_payload"]).to_numpy().astype(np.int64)
        + pc.binary_length(batch["dl_payload"]).to_numpy().astype(np.int64)
    )
    key = (idf.astype(np.int64) * 16 + gram) * 4 + codec
    order = np.argsort(key, kind="stable")
    k = key[order]
    starts = np.flatnonzero(np.diff(k, prepend=-1))
    return pa.table(
        {
            "idf_x10": pa.array(k[starts] // 64, pa.int64()),
            "gram_size": pa.array((k[starts] // 4) % 16, pa.int64()),
            "codec": pa.array(k[starts] % 4, pa.int64()),
            "n_chunks": pa.array(
                np.diff(np.append(starts, len(k))).astype(np.int64)
            ),
            "n_postings": pa.array(
                np.add.reduceat(df[order].astype(np.int64), starts)
            ),
            "payload_bytes": pa.array(np.add.reduceat(payload[order], starts)),
        }
    )


def segment_band_stats(index_dir: str) -> pa.Table:
    """IdfX10-banded storage stats for one segment (sorted by band)."""
    man = seglib.load_manifest(index_dir)
    if man is None:
        raise FileNotFoundError(f"no manifest in {index_dir}")
    n_docs = int(man["n_docs"])
    files = sorted(glob.glob(os.path.join(index_dir, "dict-*.parquet")))
    if not files:
        return pa.table(
            {
                "idf_x10": pa.array([], pa.int64()),
                "gram_size": pa.array([], pa.int64()),
                "codec": pa.array([], pa.int64()),
                "n_chunks": pa.array([], pa.int64()),
                "n_postings": pa.array([], pa.int64()),
                "payload_bytes": pa.array([], pa.int64()),
            }
        )
    from functools import partial

    import pyarrow.parquet as pq

    cols = ["n_postings", "gram_size", "docs_payload", "tf_payload", "dl_payload"]
    if "codec" in pq.read_schema(files[0]).names:
        cols.insert(2, "codec")  # absent in pre-treatment segments
    out = (
        ray.data.read_parquet(files, columns=cols)
        .map_batches(partial(_band_partials, n_docs=n_docs), batch_format="pyarrow")
        .groupby(["idf_x10", "gram_size", "codec"])
        .aggregate(
            Sum("n_chunks", alias_name="n_chunks"),
            Sum("n_postings", alias_name="n_postings"),
            Sum("payload_bytes", alias_name="payload_bytes"),
        )
        .sort(["idf_x10", "gram_size", "codec"])
        .to_pandas()
    )
    out["bytes_per_posting"] = (out["payload_bytes"] / out["n_postings"]).round(3)
    return pa.Table.from_pandas(out, preserve_index=False)
