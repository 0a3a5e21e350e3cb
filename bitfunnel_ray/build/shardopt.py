"""Shard-boundary optimization — the ShardCostFunction +
SingleSourceShortestPath analog (reference:
src/Index/src/ShardCostFunction.cpp:54-145,
src/Index/src/SingleSourceShortestPath.cpp, driven by
tools/BitFunnel/src/ShardBuilder.cpp:114-170).

The reference chooses document-length shard boundaries by a shortest-path
DP over the doc-length histogram, where an edge (i, j) costs the memory
of one shard holding docs with posting counts in bucket range [i, j).
Our exact posting lists don't need doc-length shards for correctness, but
the same DP is useful to pick segment/doc-length bucket boundaries for
batch-size-balanced builds — so the operator is preserved: driver-scale
pure python over the (tiny) histogram, as in the reference.

Cost model (mirroring ShardCostFunction's shape): a shard over buckets
[i, j) with D docs and max posting count P costs
``D * P + overhead`` (columns × max-rows + fixed per-shard overhead).
"""

from __future__ import annotations


def choose_shard_boundaries(
    histogram: list[tuple[int, int]], max_shards: int = 8, overhead: float = 0.0
) -> list[int]:
    """histogram: [(n_postings, n_docs)] (any order).  Returns ascending
    min-posting-count boundaries, first always 0 — the ShardDefinition
    rows analog (ShardDefinition.cpp:111-131)."""
    if not histogram:
        return [0]
    hist = sorted((int(p), int(c)) for p, c in histogram)
    ps = [p for p, _ in hist]
    cs = [c for _, c in hist]
    n = len(hist)
    # prefix doc counts for O(1) range cost
    pref = [0]
    for c in cs:
        pref.append(pref[-1] + c)

    def cost(i: int, j: int) -> float:
        """cost of one shard covering histogram buckets [i, j)"""
        docs = pref[j] - pref[i]
        max_p = ps[j - 1]
        return docs * max_p + overhead

    INF = float("inf")
    # dp[k][j] = min cost partitioning buckets [0, j) into k shards
    dp = [[INF] * (n + 1) for _ in range(max_shards + 1)]
    back = [[-1] * (n + 1) for _ in range(max_shards + 1)]
    dp[0][0] = 0.0
    for k in range(1, max_shards + 1):
        for j in range(1, n + 1):
            for i in range(j):
                if dp[k - 1][i] == INF:
                    continue
                c = dp[k - 1][i] + cost(i, j)
                if c < dp[k][j]:
                    dp[k][j] = c
                    back[k][j] = i
    best_k = min(range(1, max_shards + 1), key=lambda k: dp[k][n])
    cuts = []
    j, k = n, best_k
    while k > 0:
        i = back[k][j]
        cuts.append(i)
        j, k = i, k - 1
    cuts.reverse()  # cuts[0] == 0
    return [0] + [ps[i] for i in cuts[1:]]
