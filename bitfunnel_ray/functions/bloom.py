"""Bloom filter over 64-bit keys — the broadcast-compression scale path
for huge blocklists (classic Bloom 1970; double hashing per Kirsch &
Mitzenmacher 2006: g_i(x) = h1(x) + i·h2(x) mod m needs only two base
hashes for k probe positions, all vectorizable).

Why: ``ops/joins.anti_join(broadcast=True)`` ships the raw blocklist
keys to every actor — right up until the blocklist stops fitting the
object store comfortably (10^10 deleted doc-ids = 80 GB).  A Bloom
filter at 1% FPR is ~1.2 GB for the same set: every actor holds it,
bloom-NEGATIVE rows (the overwhelming majority) pass with zero exchange,
and only bloom-positive rows (true hits + the 1% false positives) enter
the exact co-partitioned anti-join — exactness preserved, the exchange
shrunk by ~99%.

Keys are uint64 (doc ids, term hashes, canonical-url hashes — every key
this engine exchanges is already a 64-bit hash).  The two base hashes
are splitmix64 finalizer variants — deterministic, no RNG.
"""

from __future__ import annotations

import numpy as np

_C1 = np.uint64(0xFF51AFD7ED558CCD)
_C2 = np.uint64(0xC4CEB9FE1A85EC53)
_GOLD = np.uint64(0x9E3779B97F4A7C15)


def _mix(x: np.ndarray, c: np.uint64) -> np.ndarray:
    with np.errstate(over="ignore"):
        x = x.astype(np.uint64, copy=True)
        x ^= x >> np.uint64(33)
        x *= c
        x ^= x >> np.uint64(33)
        x *= _GOLD
        x ^= x >> np.uint64(33)
    return x


class BloomFilter:
    """Fixed-size bit array + k double-hashed probes; vectorized
    ``add_many`` / ``contains_many`` over uint64 arrays.  Filters with
    identical (m, k) merge by bitwise OR (associative + commutative —
    the distributed-build reduction)."""

    def __init__(self, n_keys: int, fpr: float = 0.01):
        if not (0 < fpr < 1):
            raise ValueError("fpr must be in (0, 1)")
        n = max(1, int(n_keys))
        m = int(np.ceil(-n * np.log(fpr) / (np.log(2) ** 2)))
        self.m = max(64, (m + 63) // 64 * 64)
        self.k = max(1, int(round(self.m / n * np.log(2))))
        self.words = np.zeros(self.m // 64, dtype=np.uint64)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(k, n) probe bit positions."""
        h1 = _mix(keys, _C1)
        h2 = _mix(keys, _C2) | np.uint64(1)  # odd stride
        out = np.empty((self.k, len(keys)), dtype=np.uint64)
        with np.errstate(over="ignore"):
            for i in range(self.k):
                out[i] = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
        return out

    def add_many(self, keys) -> None:
        keys = np.ascontiguousarray(keys).view(np.uint64)
        if not len(keys):
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self.words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )

    def contains_many(self, keys) -> np.ndarray:
        """Boolean mask — True = possibly present (never a false
        negative), False = definitely absent."""
        keys = np.ascontiguousarray(keys).view(np.uint64)
        if not len(keys):
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        hit = np.ones(len(keys), dtype=bool)
        for i in range(self.k):
            w = self.words[(pos[i] >> np.uint64(6)).astype(np.int64)]
            hit &= (w >> (pos[i] & np.uint64(63))) & np.uint64(1) != 0
        return hit

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        if (self.m, self.k) != (other.m, other.k):
            raise ValueError("merge needs identical (m, k)")
        np.bitwise_or(self.words, other.words, out=self.words)
        return self

    @property
    def nbytes(self) -> int:
        return self.words.nbytes


def bloom_from_dataset(
    ds: "ray.data.Dataset", key: str, n_keys: int, fpr: float = 0.01
) -> BloomFilter:
    """Distributed build: each block returns its packed partial bitmap
    (m/8 bytes), the driver OR-folds them streaming (peak memory 2·m/8;
    at cluster scale the fold becomes a tree reduce, same operator
    algebra).  ``n_keys`` sizes the filter — pass the known/estimated
    blocklist cardinality (an overestimate only lowers the FPR)."""
    import ray

    proto = BloomFilter(n_keys, fpr)
    m, k = proto.m, proto.k

    def per_block(t) -> "dict":
        import pyarrow as pa

        b = BloomFilter(n_keys, fpr)
        assert (b.m, b.k) == (m, k)
        b.add_many(t[key].to_numpy(zero_copy_only=False).astype(np.uint64))
        return pa.table({"words": pa.array([b.words.tobytes()], pa.binary())})

    rows = ds.select_columns([key]).map_batches(per_block, batch_format="pyarrow")
    # one ref at a time: driver peak stays 2·m/8 even with many blocks
    for ref in rows.to_arrow_refs():
        t = ray.get(ref)
        if "words" not in t.column_names:  # zero-column empty block (Ray 2.49)
            continue
        for blob in t["words"].to_pylist():
            np.bitwise_or(
                proto.words, np.frombuffer(blob, dtype=np.uint64), out=proto.words
            )
    return proto
