"""PFor-style patched bit-packing for posting-list doc-id deltas
(SURVEY.md §7.1 / north-star "delta+varint/PForDelta" — the public
PForDelta family: Zukowski et al. 2006, Zhang/Long/Suel 2008; this is the
simple patched variant, not a transliteration of any implementation).

Layout per 128-value block:
    [width: u8] [n_exceptions: u8]
    [packed low ``width`` bits of all values, little-endian bit order]
    [exception indexes: u8 × n_exceptions]
    [exception values: LEB128 varint × n_exceptions  (full value)]

Width is chosen per block to minimize encoded bytes (header + packed +
patch cost), so a single huge delta (a rare-term gap) patches as an
exception instead of inflating the whole block.  The final short block
packs only its ``count % 128`` values.

Encode/decode are numpy-vectorized WITHIN a block via packbits/unpackbits;
the per-block python loop is deliberate: the engine applies this codec
only to long (head-band) posting lists — few chunks, many values each —
while short tail lists stay on the varint codec (see
config.treatment_bands)."""

from __future__ import annotations

import numpy as np

from bitfunnel_ray.functions import varint

_BLOCK = 128
_POW2 = np.array([1 << i for i in range(1, 64)], dtype=np.uint64)


def _bit_lengths(v: np.ndarray) -> np.ndarray:
    """bit_length of each value (0 for value 0)."""
    return np.searchsorted(_POW2, v, side="right").astype(np.int64) + (v > 0)


def encode_pfor(values: np.ndarray) -> np.ndarray:
    """uint64 array → uint8 PFor stream."""
    v = np.ascontiguousarray(values, dtype=np.uint64)
    out: list[np.ndarray] = []
    for lo in range(0, len(v), _BLOCK):
        blk = v[lo : lo + _BLOCK]
        bl = _bit_lengths(blk)
        # candidate widths: every distinct bit length (width == max ⇒ no
        # exceptions); pick min total bytes
        hist = np.bincount(bl, minlength=65)
        n_exc_at = len(blk) - np.cumsum(hist)  # n_exc if width = w
        widths = np.arange(65)
        exc_v_cost = 3  # ~avg varint bytes per patched value
        cost = 2 + (len(blk) * widths + 7) // 8 + n_exc_at * (1 + exc_v_cost)
        w = int(np.argmin(cost))
        exc_idx = np.flatnonzero(bl > w)
        header = np.array([w, len(exc_idx)], dtype=np.uint8)
        out.append(header)
        if w:
            low = blk & np.uint64((1 << w) - 1) if w < 64 else blk
            bits = (
                (low[:, None] >> np.arange(w, dtype=np.uint64)) & np.uint64(1)
            ).astype(np.uint8)
            out.append(np.packbits(bits.ravel(), bitorder="little"))
        if len(exc_idx):
            out.append(exc_idx.astype(np.uint8))
            out.append(varint.encode(blk[exc_idx]))
    return np.concatenate(out) if out else np.empty(0, np.uint8)


def decode_pfor(buf: np.ndarray, count: int) -> np.ndarray:
    """uint8 PFor stream → uint64 array of ``count`` values."""
    b = np.ascontiguousarray(buf, dtype=np.uint8)
    vals = np.empty(count, dtype=np.uint64)
    pos = 0
    done = 0
    while done < count:
        n = min(_BLOCK, count - done)
        w, ne = int(b[pos]), int(b[pos + 1])
        pos += 2
        if w:
            nbytes = (n * w + 7) // 8
            bits = np.unpackbits(b[pos : pos + nbytes], bitorder="little")[: n * w]
            powers = np.uint64(1) << np.arange(w, dtype=np.uint64)
            vals[done : done + n] = (
                bits.reshape(n, w).astype(np.uint64) * powers
            ).sum(axis=1)
            pos += nbytes
        else:
            vals[done : done + n] = 0
        if ne:
            idx = b[pos : pos + ne].astype(np.int64)
            pos += ne
            # varint patch stream: ne values (bounded scan — ≤10 bytes each)
            stream = b[pos : pos + ne * 10]
            endpos = np.flatnonzero((stream & 0x80) == 0)[:ne]
            patch = varint.decode(stream[: endpos[-1] + 1], count=ne)
            pos += int(endpos[-1] + 1)
            vals[done + idx] = patch
        done += n
    return vals


def byte_length_pfor(values: np.ndarray) -> int:
    """Encoded size without materializing (used by analyze/planning)."""
    return len(encode_pfor(values))
