"""Corpus statistics pipelines — the ``BitFunnel statistics`` analog.

The reference scans the corpus once and emits (a) a per-term document
frequency table and (b) a document-length histogram, accumulated in
global-mutex hashmaps (reference:
src/Index/src/DocumentFrequencyTableBuilder.cpp:33-58,
src/Index/src/DocumentHistogramBuilder.cpp:35-42; driven by
tools/BitFunnel/src/StatisticsBuilder.cpp:114-187 — single-threaded there).

Here both are lock-free Ray Data aggregations with a map-side combiner:
``map_batches`` emits one partial row per key per batch (the per-batch
tokenize already dedups postings per doc), then a small
``groupby().aggregate(Sum)`` finishes — the shuffle moves only partials,
never raw postings.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.stages.tokenize import tokenize_batch


def partial_term_stats(r, emit_text: bool = True, stats_max_gram: int | None = None) -> pa.Table:
    """Per-batch combiner over a TokenizeResult: one row per batch-unique
    (term_hash, gram) with partial df (unique-doc count — postings are
    already unique per (row, term)) and partial cf (tf sum).

    Term text is reconstructed lazily for the ≤ vocab-sized unique rows
    when the result carries positions (``keep_pos=True``), else taken from
    ``r.term``.  ``stats_max_gram`` restricts the partial to gram sizes ≤ n
    (the fused build pass tokenizes at the BUILD max_gram but the df-table
    sidecar usually wants unigrams only)."""
    h, g, tf, pos = r.term_hash, r.gram_size, r.tf, r.pos
    if stats_max_gram is not None and len(g) and int(g.max()) > stats_max_gram:
        m = g <= stats_max_gram
        h, g, tf = h[m], g[m], tf[m]
        pos = pos[m] if pos is not None else None
    if len(h) == 0:
        cols = {
            "term_hash": pa.array([], pa.int64()),
            "gram_size": pa.array([], pa.uint8()),
            "df_part": pa.array([], pa.int64()),
            "cf_part": pa.array([], pa.int64()),
        }
        if emit_text:
            cols["term"] = pa.array([], pa.string())
        return pa.table(cols)
    order = np.lexsort((g, h))
    hs, gs, tfs = h[order], g[order], tf[order]
    b = np.empty(len(hs), dtype=bool)
    b[0] = True
    b[1:] = (hs[1:] != hs[:-1]) | (gs[1:] != gs[:-1])
    starts = np.flatnonzero(b)
    counts = np.diff(np.append(starts, len(hs)))
    cf = np.add.reduceat(tfs.astype(np.int64), starts)
    cols = {
        # int64 bit-view of the uint64 hash: Ray's shuffle/aggregate ops
        # fall back to pickled python objects on uint64 columns
        "term_hash": pa.array(hs[starts].view(np.int64), pa.int64()),
        "gram_size": pa.array(gs[starts], pa.uint8()),
        "df_part": pa.array(counts.astype(np.int64)),
        "cf_part": pa.array(cf),
    }
    if emit_text:
        if r.term is not None:
            texts = r.term[order][starts]
        else:
            from bitfunnel_ray.stages.tokenize import reconstruct_terms

            texts = reconstruct_terms(r.tokens, pos[order][starts], gs[starts])
        cols["term"] = pa.array(texts.tolist(), pa.string())
    return pa.table(cols)


class PartialTermStats:
    """Per-batch combiner: (term, gram) → (partial df, partial cf).
    Text is built lazily for batch-unique terms only (cost ∝ vocabulary
    per batch, not postings)."""

    def __init__(self, max_gram: int = 1, emit_text: bool = True):
        self.max_gram = max_gram
        self.emit_text = emit_text

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = tokenize_batch(
            batch["text"], self.max_gram, emit_text=False, keep_pos=self.emit_text
        )
        return partial_term_stats(r, emit_text=self.emit_text)


def document_frequency_table(
    corpus: "ray.data.Dataset", cfg: EngineConfig | None = None, emit_text: bool = True
) -> "ray.data.Dataset":
    """term_hash, gram_size[, term], df, cf — the DocFreqTable analog
    (columns per src/Index/src/DocumentFrequencyTable.cpp:149-182; the
    required decreasing-frequency ordering is applied by callers that need
    it via ``.sort('df', descending=True)`` on this small table,
    DocumentFrequencyTable.cpp:110-115)."""
    cfg = cfg or EngineConfig()
    # whole-block batches maximize map-side dedup (partial rows ∝ vocab per
    # block, not per small batch); term_hash travels as int64 (uint64 would
    # hit Ray's pickled-object fallback in the shuffle).  The final combine
    # is a tuned hash exchange + one vectorized reduce per block — measured
    # ~5x faster than groupby().aggregate() at this shape.
    partial = corpus.select_columns(["text"]).map_batches(
        PartialTermStats(cfg.max_gram, emit_text),
        batch_format="pyarrow",
        batch_size=None,
    )
    from functools import partial as _bind

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    n_blocks = tune_hash_shuffle(partial.context)
    return partial.repartition(num_blocks=n_blocks, keys=["term_hash"]).map_batches(
        _bind(_combine_term_stats, emit_text=emit_text),
        batch_size=None,
        batch_format="pyarrow",
    )


def _combine_term_stats(t: pa.Table, *, emit_text: bool) -> pa.Table:
    """Sum df/cf partials per (term_hash, gram) within one block.

    Accepts either partial columns (df_part/cf_part) or already-combined
    ones (df/cf) — the op is associative, so it can run BOTH as a map-side
    pre-combine over raw partial shards (shrinking rows before the
    exchange) and as the post-exchange finish."""
    dfc = "df_part" if "df_part" in t.column_names else "df"
    cfc = "cf_part" if "cf_part" in t.column_names else "cf"
    if len(t) == 0:
        return t.select(
            ["term_hash", "gram_size"] + (["term"] if emit_text else [])
        ).append_column("df", pa.array([], pa.int64())).append_column("cf", pa.array([], pa.int64()))
    h = t["term_hash"].to_numpy(zero_copy_only=False)
    g = t["gram_size"].to_numpy(zero_copy_only=False)
    dfp = t[dfc].to_numpy(zero_copy_only=False)
    cfp = t[cfc].to_numpy(zero_copy_only=False)
    order = np.lexsort((g, h))
    h, g = h[order], g[order]
    new = np.empty(len(h), dtype=bool)
    new[0] = True
    new[1:] = (h[1:] != h[:-1]) | (g[1:] != g[:-1])
    starts = np.flatnonzero(new)
    df = np.add.reduceat(dfp[order], starts)
    cf = np.add.reduceat(cfp[order], starts)
    cols = {
        "term_hash": pa.array(h[starts], pa.int64()),
        "gram_size": pa.array(g[starts], pa.uint8()),
        "df": pa.array(df.astype(np.int64)),
        "cf": pa.array(cf.astype(np.int64)),
    }
    if emit_text:
        texts = t["term"].take(pa.array(order[starts]))
        cols = {
            "term_hash": cols["term_hash"],
            "gram_size": cols["gram_size"],
            "term": texts,
            "df": cols["df"],
            "cf": cols["cf"],
        }
    return pa.table(cols)


def combine_fused_stats(stats_dir: str, emit_text: bool = True) -> "ray.data.Dataset":
    """Finish the FUSED statistics pass: the index build's tokenize/spill
    stage already emitted one df/cf partial shard per map batch into
    ``stats_dir`` (build/builder.py TokenizeSpill with a fused stats dir —
    the reference's own shape: statistics and ingestion are ONE corpus
    walk, tools/BitFunnel/src/StatisticsBuilder.cpp:114-187 drives both
    builders from a single ChunkIngestor).  This combine is a small hash
    exchange over partial rows (∝ vocab × map batches), never a second
    corpus read.  Output schema == ``document_frequency_table``."""
    from functools import partial as _bind

    from bitfunnel_ray.build.builder import tune_hash_shuffle

    parts = ray.data.read_parquet(stats_dir, file_extensions=["parquet"])
    # hierarchical combine: each read block pre-combines its shards before
    # the exchange — with one partial shard per spill batch, common (zipf)
    # terms repeat in EVERY shard, so the pre-combine shrinks exchanged
    # rows by roughly the shards-per-block factor
    pre = parts.map_batches(
        _bind(_combine_term_stats, emit_text=emit_text),
        batch_size=None,
        batch_format="pyarrow",
    )
    n_blocks = tune_hash_shuffle(pre.context)
    return pre.repartition(num_blocks=n_blocks, keys=["term_hash"]).map_batches(
        _bind(_combine_term_stats, emit_text=emit_text),
        batch_size=None,
        batch_format="pyarrow",
    )


def top_k_by(
    ds: "ray.data.Dataset",
    k: int,
    col: str = "df",
    tiebreak: str | None = "term_hash",
) -> pa.Table:
    """Top-k rows by ``col`` descending (tiebreak ascending) WITHOUT the
    all-to-all sort ``.sort(col).limit(k)`` runs: each block keeps only its
    own top-k (exact, tie-aware), the ≤ k-rows-per-block partials are
    gathered, and one in-memory sort finishes.  The exchange moves
    O(k · n_blocks) rows instead of the whole table — at low parallelism
    the full sort of a multi-million-term vocabulary dominated the stats
    stage and spilled.  Returns the small result as a pyarrow Table."""
    import pyarrow.compute as pc

    keys = [(col, "descending")] + ([(tiebreak, "ascending")] if tiebreak else [])

    def block_top_k(t: pa.Table) -> pa.Table:
        if len(t) <= k:
            return t
        return t.take(pc.sort_indices(t, sort_keys=keys)[:k])

    parts = ds.map_batches(block_top_k, batch_format="pyarrow", batch_size=None)
    merged = pa.concat_tables(
        parts.iter_batches(batch_format="pyarrow", batch_size=None),
        promote_options="default",
    )
    if len(merged) == 0:
        return merged
    return merged.take(pc.sort_indices(merged, sort_keys=keys)[:k]).combine_chunks()


class PartialDoclenHist:
    def __init__(self, max_gram: int = 1):
        self.max_gram = max_gram

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = tokenize_batch(batch["text"], self.max_gram, emit_text=False)
        vals, counts = np.unique(r.n_postings, return_counts=True)
        return pa.table(
            {
                "n_postings": pa.array(vals.astype(np.int64)),
                "n_docs_part": pa.array(counts.astype(np.int64)),
            }
        )


def doclen_histogram(
    corpus: "ray.data.Dataset", cfg: EngineConfig | None = None
) -> "ray.data.Dataset":
    """(n_postings, n_docs) — the DocumentHistogram analog
    (DocumentHistogramBuilder.cpp:75-84), keyed by unique-posting count."""
    cfg = cfg or EngineConfig()
    partial = corpus.select_columns(["text"]).map_batches(
        PartialDoclenHist(cfg.max_gram), batch_format="pyarrow"
    )
    return partial.groupby("n_postings").aggregate(Sum("n_docs_part", alias_name="n_docs"))


class DocMetaBatch:
    """doc_id, url, doclen, n_postings, n_bytes per document (the DocTable /
    ingestion-totals analog, Ingestor.cpp:108-128). Tokenize-light: doclen
    needs only the whitespace split; n_postings needs the dedup pass."""

    def __init__(self, max_gram: int = 1, light: bool = False):
        self.max_gram = max_gram
        # light=True (the index build's mode): doclen needs only the
        # whitespace split; n_postings (histogram / posting-count filters)
        # needs the full tokenize+dedup and is emitted only when light=False
        self.light = light

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        nbytes = pc.binary_length(batch["text"].cast(pa.binary())).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        cols = {"doc_id": batch["doc_id"], "url": batch["url"]}
        if self.light:
            from bitfunnel_ray.stages.tokenize import flat_tokens

            _, _, doclen = flat_tokens(batch["text"])
            cols["doclen"] = pa.array(doclen)
        else:
            r = tokenize_batch(batch["text"], self.max_gram, emit_text=False)
            cols["doclen"] = pa.array(r.doclen)
            cols["n_postings"] = pa.array(r.n_postings)
        cols["n_bytes"] = pa.array(nbytes)
        if "warc_ts" in batch.column_names:
            # doc-values fast-field (see TokenizeSpill) — present only when
            # the caller kept warc_ts in the batch, so the standalone
            # doc_meta() op's schema is unchanged
            cols["warc_ts_s"] = (
                batch["warc_ts"].cast(pa.timestamp("s")).cast(pa.int64())
            )
        return pa.table(cols)


def doc_meta(
    corpus: "ray.data.Dataset", cfg: EngineConfig | None = None, light: bool = False
) -> "ray.data.Dataset":
    cfg = cfg or EngineConfig()
    return corpus.select_columns(["doc_id", "url", "text"]).map_batches(
        DocMetaBatch(cfg.max_gram, light=light), batch_format="pyarrow"
    )


class PartialFirstDoc:
    """Per-batch combine for the vocabulary growth curve: the minimum
    doc_id at which each term appears in this batch."""

    def __init__(self, max_gram: int = 1):
        self.max_gram = max_gram

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = tokenize_batch(batch["text"], self.max_gram, emit_text=False)
        if len(r.term_hash) == 0:
            return pa.table(
                {
                    "term_hash": pa.array([], pa.int64()),
                    "first_doc": pa.array([], pa.int64()),
                }
            )
        doc_ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)[r.row]
        order = np.lexsort((doc_ids, r.term_hash))
        h = r.term_hash[order]
        d = doc_ids[order]
        starts = np.flatnonzero(np.concatenate([[True], h[1:] != h[:-1]]))
        return pa.table(
            {
                "term_hash": pa.array(h[starts].view(np.int64), pa.int64()),
                "first_doc": pa.array(d[starts]),  # min doc per term (sorted)
            }
        )


def vocabulary_growth(
    corpus: "ray.data.Dataset", cfg: EngineConfig | None = None, bucket_docs: int = 1
) -> pa.Table:
    """Cumulative distinct-term counts as the corpus is ingested in doc_id
    order — the vocabulary growth curve the reference's statistics run
    records (DocumentFrequencyTableBuilder.cpp:33-37,76-82 accumulates
    cumulative term counts per ingested document).

    Two-level aggregation: per-batch first-doc partials → Min per term
    (hash exchange) → per-first-doc new-term counts (tiny) → cumulative
    sum over the ≤ n_docs/bucket_docs curve points on the driver.
    ``bucket_docs`` coarsens the curve for large corpora."""
    from ray.data.aggregate import Count, Min

    cfg = cfg or EngineConfig()
    firsts = (
        corpus.select_columns(["doc_id", "text"])
        .map_batches(PartialFirstDoc(cfg.max_gram), batch_format="pyarrow", batch_size=None)
        .groupby("term_hash")
        .aggregate(Min("first_doc", alias_name="first_doc"))
    )
    if bucket_docs > 1:
        import pyarrow.compute as pc

        def _bucket(t: pa.Table) -> pa.Table:
            fd = pc.multiply(
                pc.floor(pc.divide(t["first_doc"], bucket_docs)).cast(pa.int64()),
                bucket_docs,
            )
            return t.set_column(t.schema.get_field_index("first_doc"), "first_doc", fd)

        firsts = firsts.map_batches(_bucket, batch_format="pyarrow")
    curve = (
        firsts.groupby("first_doc")
        .aggregate(Count(alias_name="new_terms"))
        .sort("first_doc")
        .to_pandas()
    )
    curve["cum_terms"] = curve["new_terms"].cumsum()
    return pa.Table.from_pandas(
        curve.astype({"first_doc": "int64", "new_terms": "int64", "cum_terms": "int64"}),
        preserve_index=False,
    )


def write_term_to_text(
    corpus: "ray.data.Dataset", out_path: str, cfg: EngineConfig | None = None
) -> None:
    """The TermToText sidecar (reference: src/Index/src/TermToText.cpp —
    hash → text built during the statistics run): a parquet directory of
    (term_hash int64-view, gram_size, term) so posting lists can be
    debugged without re-hashing candidate strings."""
    cfg = cfg or EngineConfig()
    document_frequency_table(corpus, cfg, emit_text=True).select_columns(
        ["term_hash", "gram_size", "term"]
    ).write_parquet(out_path)


def write_vocab_sidecar(seg_dir: str, dft, num_buckets: int) -> None:
    """Per-segment serving vocabulary: ``<seg_dir>/vocab/`` parquet of
    unigram (term, df, bucket) rows, bucket = term_hash % num_buckets —
    the text stripe the TERM-SHARDED serving front needs for
    autocomplete and fuzzy expansion (dictionaries store hashes only;
    ``IndexShardActor`` loads rows with ``bucket % n_shards == shard_id``,
    its 1/S of the vocabulary, aligned with the dict buckets it serves).
    ``dft`` is a df-table Dataset (``combine_fused_stats`` /
    ``document_frequency_table`` schema).  Published atomically via a tmp
    dir so a crashed build never leaves a half vocabulary."""
    import os
    import shutil
    import uuid

    def stripe(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "term_hash" not in t.column_names:
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "df": pa.array([], pa.int64()),
                    "bucket": pa.array([], pa.int32()),
                }
            )
        keep = t["gram_size"].to_numpy(zero_copy_only=False) == 1
        sub = t.filter(pa.array(keep))
        h = sub["term_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        bucket = (h % np.uint64(num_buckets)).astype(np.int32)
        return pa.table(
            {
                "term": sub["term"],
                "df": sub["df"].cast(pa.int64()),
                "bucket": pa.array(bucket, pa.int32()),
            }
        )

    tmp = os.path.join(seg_dir, f"vocab.tmp-{uuid.uuid4().hex[:8]}")
    shutil.rmtree(tmp, ignore_errors=True)
    dft.map_batches(stripe, batch_format="pyarrow").write_parquet(tmp)
    final = os.path.join(seg_dir, "vocab")
    shutil.rmtree(final, ignore_errors=True)
    os.replace(tmp, final)


class TermToText:
    """Loader for the sidecar: vectorized hash → text lookup via sorted
    arrays (no python dict — vocabulary can be 10^8+ rows)."""

    def __init__(self, path: str):
        import pyarrow.parquet as pq

        t = pq.read_table(path, columns=["term_hash", "gram_size", "term"])
        h = t["term_hash"].to_numpy(zero_copy_only=False).view(np.uint64)
        order = np.argsort(h)
        self.hashes = h[order]
        self.terms = t["term"].take(pa.array(order))
        self.grams = t["gram_size"].to_numpy(zero_copy_only=False)[order]

    def lookup(self, term_hash: int) -> str | None:
        i = int(np.searchsorted(self.hashes, np.uint64(term_hash)))
        if i < len(self.hashes) and self.hashes[i] == np.uint64(term_hash):
            return self.terms[i].as_py()
        return None

    def lookup_many(self, hashes: np.ndarray) -> list[str | None]:
        hs = np.asarray(hashes, dtype=np.uint64)
        pos = np.searchsorted(self.hashes, hs)
        pos[pos == len(self.hashes)] = 0
        hit = self.hashes[pos] == hs
        return [
            self.terms[int(p)].as_py() if ok else None for p, ok in zip(pos, hit)
        ]
