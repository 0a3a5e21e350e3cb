"""Document chunking — split each document into overlapping fixed-size
token windows (the embedding / retrieval prep op: window=64, stride=32
style).  Map-only (embarrassingly parallel, no exchange; output stays
partitioned like the input) and fully vectorized: one whitespace split
per batch, window membership via arange arithmetic, chunk text
reassembled with a single ``pc.binary_join`` over a ListArray — no
per-document python.

Chunk count per doc = ceil(max(n_tokens - window, 0) / stride) + 1, so
every document yields at least one chunk and every token is covered;
the final chunk may be shorter than ``window``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from bitfunnel_ray.stages.tokenize import flat_tokens


def _chunk_block(t: pa.Table, *, window: int, stride: int) -> pa.Table:
    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "chunk_idx": pa.array([], pa.int64()),
            "n_tokens": pa.array([], pa.int64()),
            "chunk_text": pa.array([], pa.string()),
        }
    )
    if len(t) == 0:
        return empty
    flat, _doc_of, doclen = flat_tokens(t["text"])
    n_docs = len(t)
    extra = np.maximum(doclen - window, 0)
    n_chunks = (extra + stride - 1) // stride + 1
    total_chunks = int(n_chunks.sum())
    doc_rep = np.repeat(np.arange(n_docs, dtype=np.int64), n_chunks)
    chunk0 = np.concatenate([[0], np.cumsum(n_chunks)])[:-1]
    chunk_idx = np.arange(total_chunks, dtype=np.int64) - np.repeat(chunk0, n_chunks)
    cs = chunk_idx * stride
    take_len = np.minimum(window, doclen[doc_rep] - cs)
    doc_flat0 = np.concatenate([[0], np.cumsum(doclen)])[:-1]
    tstart = doc_flat0[doc_rep] + cs
    len0 = np.concatenate([[0], np.cumsum(take_len)])
    total_toks = int(len0[-1])
    within = np.arange(total_toks, dtype=np.int64) - np.repeat(len0[:-1], take_len)
    idx = np.repeat(tstart, take_len) + within
    toks = pa.ListArray.from_arrays(
        pa.array(len0, pa.int32()), flat.take(pa.array(idx))
    )
    return pa.table(
        {
            "doc_id": pa.array(t["doc_id"].to_numpy(zero_copy_only=False)[doc_rep], pa.int64()),
            "chunk_idx": pa.array(chunk_idx, pa.int64()),
            "n_tokens": pa.array(take_len.astype(np.int64), pa.int64()),
            "chunk_text": pc.binary_join(toks, " "),
        }
    )


def chunk_documents(
    corpus: "ray.data.Dataset", window: int = 64, stride: int = 32
) -> "ray.data.Dataset":
    """Overlapping token-window chunks of each document's text."""
    from functools import partial

    if stride <= 0 or window <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    return corpus.select_columns(["doc_id", "text"]).map_batches(
        partial(_chunk_block, window=window, stride=stride), batch_format="pyarrow"
    )
