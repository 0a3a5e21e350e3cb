"""Serve-side fuzzy-term vocabulary matcher (the expansion backend for
the query language's ``term~d`` fuzzy operator, query/parser.py).

The matcher holds the index VOCABULARY (term text) in memory — the same
posture as the dictionary itself: serving state loads once per
actor/front and queries run against read-only arrays.  Matching is exact
Levenshtein (unit ins/del/sub), so the oracle contract is DuckDB
``levenshtein(term, q) <= d`` with no false accepts or misses.

Shape: vocabulary terms are bucketed by codepoint length; a query at
distance ``d`` only visits buckets with ``|len - len(q)| <= d``, and each
bucket is one vectorized DP over a (n_terms, len) codepoint matrix —
the row loop is over QUERY characters (~10), never vocabulary rows.
Rows whose running minimum exceeds ``d`` are compacted away after every
DP row (banded early abandon), so the common case touches a small
fraction of each bucket.

Scale note: a 10^8-term cluster vocabulary does not live on one front.
There the expansion runs where the dictionary already lives — each term
shard matches its own vocabulary slice with this same matcher and the
front unions the members (the scatter-gather pattern of
query/sharded.py); distance-1 traffic can additionally be pre-filtered
with the SymSpell deletion-neighborhood hashes of ops/fuzzy.py.

Reference analog: none (BitFunnel matches exact terms only,
src/Plan/src/TermMatchTreeConverter.cpp:182-194); the feature mirrors
Lucene's FuzzyQuery contract.
"""

from __future__ import annotations

import numpy as np


def _codes(term: str) -> np.ndarray:
    return np.frombuffer(term.encode("utf-32-le"), dtype=np.uint32).astype(np.int64)


class VocabFuzzyMatcher:
    """Callable ``(text, dist) -> tuple[str, ...]`` of vocabulary terms
    within edit distance ``dist`` (lexicographically sorted, exact-match
    term included when present).  Results are memoized per (text, dist)
    in a small LRU — repeated fuzzy queries over a hot misspelling cost
    one dict hit."""

    def __init__(self, terms, cache_cap: int = 1024):
        uniq = sorted(set(str(t) for t in terms if t is not None and len(str(t))))
        self._by_len: dict[int, tuple[np.ndarray, list[str]]] = {}
        groups: dict[int, list[str]] = {}
        for t in uniq:
            groups.setdefault(len(t), []).append(t)
        for length, group in groups.items():
            mat = np.empty((len(group), length), dtype=np.int64)
            for i, t in enumerate(group):
                mat[i] = _codes(t)
            self._by_len[length] = (mat, group)
        self.n_terms = len(uniq)
        self._cache: dict[tuple[str, int], tuple[str, ...]] = {}
        self._cache_cap = int(cache_cap)

    def __len__(self) -> int:
        return self.n_terms

    def _bucket_matches(self, q: np.ndarray, mat: np.ndarray, d: int) -> np.ndarray:
        """Row indices of ``mat`` (n, L) within distance ``d`` of query
        codes ``q`` — vectorized DP over rows, early-abandon compaction."""
        n, length = mat.shape
        alive = np.arange(n)
        prev = np.broadcast_to(np.arange(length + 1, dtype=np.int64), (n, length + 1)).copy()
        for i in range(len(q)):
            cur = np.empty_like(prev)
            cur[:, 0] = i + 1
            sub = prev[:, :-1] + (mat != q[i])
            np.minimum(sub, prev[:, 1:] + 1, out=cur[:, 1:])
            for j in range(1, length + 1):  # deletion needs the just-written cell
                np.minimum(cur[:, j], cur[:, j - 1] + 1, out=cur[:, j])
            # early abandon: a row whose whole DP front exceeds d can
            # never come back under it (costs are non-decreasing in i
            # along any alignment)
            ok = cur.min(axis=1) <= d
            if not ok.all():
                alive = alive[ok]
                cur = cur[ok]
                mat = mat[ok]
            prev = cur
            if not len(alive):
                return alive
        return alive[prev[:, length] <= d]

    def match(self, text: str, dist: int) -> tuple[str, ...]:
        key = (text, int(dist))
        hit = self._cache.get(key)
        if hit is not None:
            return hit
        d = int(dist)
        q = _codes(text)
        out: list[str] = []
        for length in range(max(1, len(q) - d), len(q) + d + 1):
            entry = self._by_len.get(length)
            if entry is None:
                continue
            mat, group = entry
            for idx in self._bucket_matches(q, mat, d):
                out.append(group[int(idx)])
        result = tuple(sorted(out))
        if len(self._cache) >= self._cache_cap:  # ring-ish eviction: drop oldest
            self._cache.pop(next(iter(self._cache)))
        self._cache[key] = result
        return result

    __call__ = match
