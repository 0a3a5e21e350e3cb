"""Vectorized LEB128 varint codec (numpy, no per-value Python loops).

This is the posting-list compression layer: doc-id deltas, term
frequencies and doc lengths are stored as varint streams (SURVEY.md §7.1
— the exact-index replacement for the reference's bit-sliced RowTables,
src/Index/src/RowTableDescriptor.cpp:118-177).

Encoding is standard LEB128: 7 value bits per byte, high bit = continuation.
Both directions are O(10) numpy passes (one per possible byte position),
independent of array length.
"""

from __future__ import annotations

import numpy as np

# thresholds[i] = smallest value needing more than i+1 bytes
_THRESH = np.array([1 << (7 * i) for i in range(1, 10)], dtype=np.uint64)


def byte_lengths(values: np.ndarray) -> np.ndarray:
    """Encoded byte length of each value (int64)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    return (np.searchsorted(_THRESH, v, side="right") + 1).astype(np.int64)


def encode(values: np.ndarray, nbytes: np.ndarray | None = None) -> np.ndarray:
    """uint64 array → uint8 LEB128 stream.  ``nbytes`` may pass in the
    result of ``byte_lengths(values)`` to skip recomputing it (the encode
    kernel needs the lengths anyway for per-chunk payload boundaries)."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    if v.size == 0:
        return np.empty(0, dtype=np.uint8)
    if nbytes is None:
        nbytes = byte_lengths(v)
    ends = np.cumsum(nbytes)
    starts = ends - nbytes
    out = np.zeros(ends[-1], dtype=np.uint8)
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        vj = (v[sel] >> np.uint64(7 * j)) & np.uint64(0x7F)
        byte = vj.astype(np.uint8)
        cont = (nbytes[sel] - 1) > j
        byte[cont] |= 0x80
        out[starts[sel] + j] = byte
    return out


def decode(buf: np.ndarray, count: int | None = None) -> np.ndarray:
    """uint8 LEB128 stream → uint64 array."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    if b.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (b & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.empty_like(ends)
    starts[0] = 0
    starts[1:] = ends[:-1] + 1
    nbytes = ends - starts + 1
    if count is not None and len(ends) != count:
        raise ValueError(f"varint stream has {len(ends)} values, expected {count}")
    vals = np.zeros(len(ends), dtype=np.uint64)
    for j in range(10):
        sel = nbytes > j
        if not sel.any():
            break
        vals[sel] |= (b[starts[sel] + j] & np.uint64(0x7F)).astype(np.uint64) << np.uint64(7 * j)
    return vals
