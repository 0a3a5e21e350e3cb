"""Connected components (ops/cc.py) vs a brute-force union-find, plus
the dedup application (cluster → keep canonical member)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from bitfunnel_ray.ops.cc import connected_components, dedup_canonical


def _union_find(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical = min of component
    return {x: find(x) for x in parent}


def _assign(edges_tbl, **kw):
    out = (
        connected_components(rd.from_arrow(edges_tbl), **kw)
        .to_pandas()
        .drop_duplicates()
    )
    if out.empty:
        return {}
    return dict(zip(out["node"], out["component"]))


def _edges_tbl(pairs):
    a = [p[0] for p in pairs]
    b = [p[1] for p in pairs]
    return pa.table(
        {"doc_a": pa.array(a, pa.int64()), "doc_b": pa.array(b, pa.int64())}
    )


@pytest.mark.parametrize(
    "pairs",
    [
        [(0, 1)],
        [(0, 1), (1, 2), (3, 4)],                      # chain + separate pair
        [(5, 1), (1, 9), (9, 5), (2, 2)],              # cycle + self-loop
        [(10, 20), (30, 40), (20, 30)],                # chain via links
        [(i, i + 1) for i in range(100)],              # long path
        [(0, i) for i in range(1, 50)],                # star
    ],
)
def test_cc_matches_union_find(ray_session, pairs):
    got = _assign(_edges_tbl(pairs))
    want = _union_find(pairs)
    want = {n: c for n, c in want.items() if True}
    # self-loop-only nodes never enter the edge set after normalization
    want_nodes = {n for a, b in pairs if a != b for n in (a, b)}
    assert got == {n: want[n] for n in want_nodes}


def test_cc_random_graphs_match_union_find(ray_session):
    rng = np.random.default_rng(7)
    for trial in range(3):
        n = int(rng.integers(20, 200))
        m = int(rng.integers(10, 400))
        pairs = [(int(a), int(b)) for a, b in rng.integers(0, n, size=(m, 2))]
        pairs = [p for p in pairs]
        got = _assign(_edges_tbl(pairs))
        uf = _union_find([p for p in pairs if p[0] != p[1]])
        want_nodes = {x for a, b in pairs if a != b for x in (a, b)}
        assert got == {x: uf[x] for x in want_nodes}, f"trial {trial}"


def test_cc_long_path_converges_in_log_rounds(ray_session):
    # 1000-node path: label propagation would need ~1000 rounds; the
    # star algorithm must finish well inside max_rounds=16
    pairs = [(i, i + 1) for i in range(999)]
    got = _assign(_edges_tbl(pairs), max_rounds=16)
    assert set(got.values()) == {0}
    assert len(got) == 1000


def test_cc_empty(ray_session):
    assert _assign(_edges_tbl([])) == {}


def test_dedup_canonical_transitive_cluster(ray_session):
    # A~B and B~C planted (A and C NOT directly paired): the cluster
    # {A,B,C} must collapse to A alone — the transitivity case a plain
    # pairwise drop-doc_b-per-pair approach gets wrong
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(10)), pa.uint64()),
            "text": pa.array([f"doc {i}" for i in range(10)]),
        }
    )
    pairs = pa.table(
        {
            "doc_a": pa.array([2, 5], pa.int64()),
            "doc_b": pa.array([5, 8], pa.int64()),
        }
    )
    kept = sorted(
        dedup_canonical(rd.from_arrow(docs), pairs).to_pandas()["doc_id"].tolist()
    )
    assert kept == [0, 1, 2, 3, 4, 6, 7, 9]  # 5 and 8 collapse into 2


def test_dedup_canonical_no_pairs_is_identity(ray_session):
    docs = pa.table(
        {
            "doc_id": pa.array(list(range(5)), pa.uint64()),
            "text": pa.array(["x"] * 5),
        }
    )
    empty = pa.table(
        {"doc_a": pa.array([], pa.int64()), "doc_b": pa.array([], pa.int64())}
    )
    kept = sorted(
        dedup_canonical(rd.from_arrow(docs), empty).to_pandas()["doc_id"].tolist()
    )
    assert kept == [0, 1, 2, 3, 4]
