"""Posting-list segment encoding — the exact-index replacement for the
reference's bit-sliced RowTables.

Where the reference sets bits in rank-r RowTables per posting
(reference: src/Index/src/Shard.cpp:396-417,
src/Index/src/RowTableDescriptor.cpp:118-177), we encode each term's
postings as three LEB128 varint streams (doc-id deltas, tf, doclen) plus
per-block skip metadata (last doc id and max BM25 tf-normalization per
block of ``block_size`` postings).  The block-max metadata plays the role
of the reference's coarse high-rank rows (RankDown skipping,
src/Plan/src/ByteCodeInterpreter.cpp:237-247): it lets the query engine
skip regions that cannot contribute to the top-k (block-max WAND).

``encode_bucket`` encodes EVERY chunk of a shuffle bucket with whole-bucket
vectorized numpy (no per-term varint calls): per-chunk payload boundaries
are computed from per-value byte lengths, and block metadata via
repeat/reduceat segmented ops.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa

from bitfunnel_ray.functions import varint
from bitfunnel_ray.functions.bm25 import tf_norm

DICT_SCHEMA = pa.schema(
    [
        ("term_hash", pa.uint64()),
        ("gram_size", pa.uint8()),
        ("salt", pa.uint32()),
        ("n_postings", pa.int64()),
        ("cf", pa.int64()),
        ("docs_payload", pa.large_binary()),
        ("tf_payload", pa.large_binary()),
        ("dl_payload", pa.large_binary()),
        ("last_docs", pa.list_(pa.uint64())),
        ("max_tfn", pa.list_(pa.float64())),
    ]
)


def _binary_from_stream(stream: np.ndarray, cell_ends: np.ndarray) -> pa.LargeBinaryArray:
    """Split one encoded uint8 stream into per-chunk binary cells without
    copying per cell (offsets + shared data buffer)."""
    offsets = np.empty(len(cell_ends) + 1, dtype=np.int64)
    offsets[0] = 0
    offsets[1:] = cell_ends
    return pa.LargeBinaryArray.from_buffers(
        pa.large_binary(),
        len(cell_ends),
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(stream.tobytes())],
    )


def encode_bucket(
    term_hash: np.ndarray,
    gram_size: np.ndarray,
    salt: np.ndarray,
    doc_id: np.ndarray,
    tf: np.ndarray,
    doclen: np.ndarray,
    avgdl: float,
    k1: float,
    b: float,
    block_size: int = 128,
) -> pa.Table:
    """Encode all postings of one shuffle bucket → dict table (one row per
    (term_hash, gram_size, salt) chunk).  Input need not be sorted."""
    n = len(doc_id)
    if n == 0:
        return DICT_SCHEMA.empty_table()
    order = np.lexsort((doc_id, salt, gram_size, term_hash))
    h = term_hash[order].astype(np.uint64)
    g = gram_size[order].astype(np.uint8)
    s = salt[order].astype(np.uint32)
    d = doc_id[order].astype(np.uint64)
    t = tf[order].astype(np.uint64)
    dl = doclen[order].astype(np.uint64)

    new_chunk = np.empty(n, dtype=bool)
    new_chunk[0] = True
    new_chunk[1:] = (h[1:] != h[:-1]) | (g[1:] != g[:-1]) | (s[1:] != s[:-1])
    starts = np.flatnonzero(new_chunk)
    lens = np.diff(np.append(starts, n))
    n_chunks = len(starts)

    # doc-id deltas with reset at chunk starts (first value absolute)
    deltas = np.empty(n, dtype=np.uint64)
    deltas[0] = d[0]
    deltas[1:] = d[1:] - d[:-1]
    deltas[starts] = d[starts]

    # whole-bucket varint encodes + per-chunk byte boundaries
    chunk_of = np.repeat(np.arange(n_chunks), lens)
    docs_stream = varint.encode(deltas)
    tf_stream = varint.encode(t)
    dl_stream = varint.encode(dl)
    docs_ends = np.bincount(chunk_of, weights=varint.byte_lengths(deltas)).cumsum().astype(np.int64)
    tf_ends = np.bincount(chunk_of, weights=varint.byte_lengths(t)).cumsum().astype(np.int64)
    dl_ends = np.bincount(chunk_of, weights=varint.byte_lengths(dl)).cumsum().astype(np.int64)

    # block metadata (segmented by chunk, blocks of block_size postings)
    nblocks = (lens + block_size - 1) // block_size
    total_blocks = int(nblocks.sum())
    rep_start = np.repeat(starts, nblocks)
    rep_len = np.repeat(lens, nblocks)
    block_cum = np.concatenate([[0], np.cumsum(nblocks)])
    k = np.arange(total_blocks) - np.repeat(block_cum[:-1], nblocks)  # block ordinal in chunk
    blk_starts = rep_start + k * block_size
    blk_ends = rep_start + np.minimum((k + 1) * block_size, rep_len) - 1
    last_docs_flat = d[blk_ends]
    tfn = tf_norm(t, dl, avgdl, k1, b)  # float64
    max_tfn_flat = np.maximum.reduceat(tfn, blk_starts) if total_blocks else np.empty(0)

    last_docs = pa.ListArray.from_arrays(
        pa.array(block_cum, pa.int32()), pa.array(last_docs_flat, pa.uint64())
    )
    max_tfn = pa.ListArray.from_arrays(
        pa.array(block_cum, pa.int32()), pa.array(max_tfn_flat, pa.float64())
    )
    cf = np.add.reduceat(t.astype(np.int64), starts)

    return pa.table(
        {
            "term_hash": pa.array(h[starts], pa.uint64()),
            "gram_size": pa.array(g[starts], pa.uint8()),
            "salt": pa.array(s[starts], pa.uint32()),
            "n_postings": pa.array(lens.astype(np.int64)),
            "cf": pa.array(cf),
            "docs_payload": _binary_from_stream(docs_stream, docs_ends),
            "tf_payload": _binary_from_stream(tf_stream, tf_ends),
            "dl_payload": _binary_from_stream(dl_stream, dl_ends),
            "last_docs": last_docs,
            "max_tfn": max_tfn,
        },
        schema=DICT_SCHEMA,
    )


@dataclass
class DecodedChunk:
    doc_ids: np.ndarray  # uint64, ascending
    tf: np.ndarray       # uint64
    doclen: np.ndarray   # uint64


def decode_chunk(docs_payload: bytes, tf_payload: bytes, dl_payload: bytes, n_postings: int) -> DecodedChunk:
    deltas = varint.decode(np.frombuffer(docs_payload, dtype=np.uint8), count=n_postings)
    doc_ids = np.cumsum(deltas, dtype=np.uint64)
    tf = varint.decode(np.frombuffer(tf_payload, dtype=np.uint8), count=n_postings)
    dl = varint.decode(np.frombuffer(dl_payload, dtype=np.uint8), count=n_postings)
    return DecodedChunk(doc_ids, tf, dl)
