"""Corpus-wide n-gram frequency table (Google-n-grams-style LM statistic).

A language-model data pipeline wants the head of the corpus's n-gram
distribution — for tokenizer training, boilerplate discovery, and
contamination fingerprints.  The reference's statistics pass counts
per-term document frequency only (df table,
src/Index/src/DocumentFrequencyTableBuilder.cpp:33-58); this operator is
the collection-frequency analog over contiguous token windows.

Shape (the same map-side-combine exchange as the df table):

1. ``map_batches`` per block: split text (vectorized), form adjacent
   n-gram strings with ``pc.binary_join_element_wise`` (C kernel, no
   python loop), drop windows that cross a document boundary, and count
   each distinct gram ONCE PER BLOCK (dictionary-encode + bincount) —
   the exchange carries one (gram, count) partial per distinct gram per
   block, never the token stream.
2. one hash exchange on ``gram`` + a vectorized per-block reduce.
3. map-side tie-aware top-k (``top_k_by``) — the final gather moves
   O(k · blocks) rows, not the n-gram vocabulary.

At 100 TB the n-gram vocabulary is Zipf: block-local pre-aggregation
compresses the head by ~the block's repetition factor, and the tail rows
are fixed-width-ish short strings.  The exchange is the one unavoidable
all-to-all; everything else is map-only.
"""

from __future__ import annotations

from functools import partial

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from bitfunnel_ray.stages.tokenize import flat_tokens


def _gram_partials(t: pa.Table, *, n: int) -> pa.Table:
    flat, doc_of, _ = flat_tokens(t["text"])
    empty = pa.table(
        {"gram": pa.array([], pa.string()), "cnt_part": pa.array([], pa.int64())}
    )
    m = len(flat) - (n - 1)
    if m <= 0:
        return empty
    # windows that stay inside one document: doc_of[i] == doc_of[i+n-1]
    keep = doc_of[: m] == doc_of[n - 1 :]
    if not keep.any():
        return empty
    idx = np.flatnonzero(keep)
    # last argument of binary_join_element_wise is the separator
    parts = [flat.take(pa.array(idx + off)) for off in range(n)]
    grams = pc.binary_join_element_wise(*parts, " ")
    d = pc.dictionary_encode(grams)
    counts = np.bincount(d.indices.to_numpy(), minlength=len(d.dictionary))
    return pa.table(
        {
            "gram": d.dictionary,
            "cnt_part": pa.array(counts.astype(np.int64)),
        }
    )


def _combine_grams(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return pa.table(
            {"gram": pa.array([], pa.string()), "count": pa.array([], pa.int64())}
        )
    d = pc.dictionary_encode(t["gram"].combine_chunks())
    idx = d.indices.to_numpy()
    counts = np.bincount(
        idx, weights=t["cnt_part"].to_numpy(zero_copy_only=False), minlength=len(d.dictionary)
    )
    return pa.table(
        {"gram": d.dictionary, "count": pa.array(counts.astype(np.int64))}
    )


def ngram_counts(
    corpus: "ray.data.Dataset", n: int = 2
) -> "ray.data.Dataset":
    """Full (gram, count) table, one row per distinct within-document
    n-gram of adjacent whitespace tokens."""
    if n < 1:
        raise ValueError("n must be >= 1")
    partials = corpus.select_columns(["text"]).map_batches(
        partial(_gram_partials, n=n), batch_format="pyarrow", batch_size=None
    )
    from bitfunnel_ray.build.builder import tune_hash_shuffle

    n_blocks = tune_hash_shuffle(partials.context)
    return partials.repartition(num_blocks=n_blocks, keys=["gram"]).map_batches(
        _combine_grams, batch_format="pyarrow", batch_size=None
    )


def top_ngrams(corpus: "ray.data.Dataset", n: int = 2, k: int = 100) -> pa.Table:
    """Top-k n-grams by count (count desc, gram asc) — tie-aware map-side
    top-k, no all-to-all sort."""
    from bitfunnel_ray.build.stats import top_k_by

    return top_k_by(ngram_counts(corpus, n), k=k, col="count", tiebreak="gram")
