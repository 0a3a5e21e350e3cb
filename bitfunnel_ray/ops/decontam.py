"""Benchmark decontamination — flag training documents whose k-token
shingles overlap an evaluation/benchmark set.

A standard training-data hygiene stage: before training on a web corpus,
remove documents that contain material from the eval benchmarks (else the
benchmark scores measure memorization).  Contamination is measured on the
same shingle space as the dedup family (``shingle_flat``: unique k-token
shingle hashes per doc, whitespace tokenization — identical semantics to
the n-gram Jaccard oracle).

Scale shape: the benchmark side is SMALL by construction (eval sets are
megabytes against a terabyte corpus), so this is the canonical broadcast
pattern — the benchmark's distinct shingle hashes are reduced per batch,
gathered once on the driver, and shipped to every map task via a single
``ray.put``; the corpus side then streams MAP-ONLY (sorted-array
``searchsorted`` membership per batch, ``np.bincount`` segment reduce per
doc).  No shuffle anywhere.  If the benchmark ever outgrows worker heap
(it should not), the fallback is a hash semi-join on shingle — the same
exchange ``ngram_jaccard_pairs`` uses.

Reference analog: none (BitFunnel predates the training-data use case);
the shingle semantics mirror the corpus dedup ops in this package.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa

import ray

from bitfunnel_ray.ops.dedup import shingle_flat


def _batch_unique_shingles(t: pa.Table, *, k: int) -> pa.Table:
    acc, _, _ = shingle_flat(t["text"], k)
    u = np.unique(acc)
    return pa.table({"shingle": pa.array(u.view(np.int64), pa.int64())})


def benchmark_shingles(bench: "ray.data.Dataset", k: int = 3) -> np.ndarray:
    """Distinct k-shingle hashes of the benchmark set as a SORTED uint64
    array.  Per-batch unique → driver-side merge: the gather is the small
    side by design (distinct shingles of an eval set), never the corpus."""
    parts = bench.select_columns(["text"]).map_batches(
        partial(_batch_unique_shingles, k=k), batch_format="pyarrow"
    )
    tables = ray.get(parts.to_arrow_refs())
    arrays = [
        t["shingle"].to_numpy(zero_copy_only=False).view(np.uint64)
        for t in tables
        if len(t)
    ]
    if not arrays:
        return np.empty(0, np.uint64)
    return np.unique(np.concatenate(arrays))


def _contamination_batch(
    t: pa.Table, *, k: int, threshold: float, bench_ref
) -> pa.Table:
    bench = ray.get(bench_ref) if isinstance(bench_ref, ray.ObjectRef) else bench_ref
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "n_shingles": pa.array([], pa.int64()),
            "n_overlap": pa.array([], pa.int64()),
            "contamination": pa.array([], pa.float64()),
        }
    )
    if len(t) == 0:
        return empty
    acc, d, n_docs = shingle_flat(t["text"], k)  # unique per doc already
    if len(acc) == 0:
        return empty
    sizes = np.bincount(d, minlength=n_docs)
    if len(bench):
        idx = np.searchsorted(bench, acc)
        idx[idx == len(bench)] = 0  # any in-range slot; equality check below
        hit = bench[idx] == acc
        overlap = np.bincount(d[hit], minlength=n_docs)
    else:
        overlap = np.zeros(n_docs, np.int64)
    with np.errstate(invalid="ignore", divide="ignore"):
        contamination = overlap / sizes  # float64; 0-shingle docs → nan
    keep = (sizes > 0) & (contamination >= threshold)
    doc_ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[keep]
    return pa.table(
        {
            "doc_id": pa.array(doc_ids, pa.int64()),
            "n_shingles": pa.array(sizes[keep].astype(np.int64), pa.int64()),
            "n_overlap": pa.array(overlap[keep].astype(np.int64), pa.int64()),
            "contamination": pa.array(contamination[keep], pa.float64()),
        }
    )


def decontaminate(
    corpus: "ray.data.Dataset",
    bench: "ray.data.Dataset | None" = None,
    *,
    k: int = 3,
    threshold: float = 0.5,
    benchmark_mod: int = 97,
) -> pa.Table:
    """Contaminated-document report: every corpus doc (with ≥ k tokens)
    whose fraction of distinct k-shingles also present in the benchmark
    set is ≥ ``threshold``.  Columns: doc_id, n_shingles, n_overlap,
    contamination (= n_overlap / n_shingles, float64), sorted by doc_id.

    ``bench=None`` derives a deterministic held-out benchmark from the
    corpus itself (docs with ``doc_id % benchmark_mod == 0``), which is
    the test/benchmark harness mode; those docs are excluded from the
    candidate side.  Pass an explicit ``bench`` dataset (any table with a
    ``text`` column) for the real use case.
    """
    if bench is None:
        mod = benchmark_mod

        def _split(t: pa.Table, *, keep_bench: bool) -> pa.Table:
            m = t["doc_id"].to_numpy(zero_copy_only=False) % mod == 0
            return t.filter(pa.array(m if keep_bench else ~m))

        bench = corpus.map_batches(
            partial(_split, keep_bench=True), batch_format="pyarrow"
        )
        cand = corpus.map_batches(
            partial(_split, keep_bench=False), batch_format="pyarrow"
        )
    else:
        cand = corpus
    bench_arr = benchmark_shingles(bench, k)
    bench_ref = ray.put(bench_arr)
    rows = cand.select_columns(["doc_id", "text"]).map_batches(
        partial(_contamination_batch, k=k, threshold=threshold, bench_ref=bench_ref),
        batch_format="pyarrow",
    )
    tables = ray.get(rows.to_arrow_refs())  # small: flagged docs only
    nonempty = [t for t in tables if len(t)]
    if not nonempty:
        # zero candidate blocks (empty corpus) or nothing flagged: a
        # statically-defined empty result, never tables[0] (IndexError)
        return pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_shingles": pa.array([], pa.int64()),
                "n_overlap": pa.array([], pa.int64()),
                "contamination": pa.array([], pa.float64()),
            }
        )
    return pa.concat_tables(nonempty).sort_by("doc_id")
