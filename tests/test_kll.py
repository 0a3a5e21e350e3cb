"""KLL quantile sketch (ops/kll.py): rank-error bound, merge, determinism."""

import numpy as np
import pytest

import ray.data as rd

from bitfunnel_ray.ops.kll import KLL, kll_quantiles, kll_sketch

QS = (0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)


def _worst_rank_err(sketch, data, qs=QS):
    srt = np.sort(data)
    return max(
        abs(np.searchsorted(srt, sketch.quantile(q), side="right") / len(data) - q)
        for q in qs
    )


def test_rank_error_bound_and_size():
    rng = np.random.default_rng(0)
    data = rng.lognormal(3, 1.5, 300_000)
    s = KLL(200)
    for chunk in np.array_split(data, 37):
        s.update_many(chunk)
    assert s.n == len(data)
    assert _worst_rank_err(s, data) < 0.01  # measured ~0.003 at k=200
    assert sum(len(lv) for lv in s.levels) < 1200  # O(k log(n/k)) values


def test_merge_matches_single_sketch_error():
    rng = np.random.default_rng(1)
    data = rng.normal(0, 1, 200_000)
    parts = [KLL(200) for _ in range(8)]
    for p, chunk in zip(parts, np.array_split(data, 8)):
        p.update_many(chunk)
    m = parts[0]
    for p in parts[1:]:
        m.merge(p)
    assert m.n == len(data)
    assert _worst_rank_err(m, data) < 0.01


def test_deterministic_and_serialization_roundtrip():
    rng = np.random.default_rng(2)
    data = rng.uniform(0, 1, 50_000)
    a, b = KLL(100), KLL(100)
    for chunk in np.array_split(data, 11):
        a.update_many(chunk)
        b.update_many(chunk)
    assert all(np.array_equal(x, y) for x, y in zip(a.levels, b.levels))
    back = KLL.from_rows(a.to_rows(), 100)
    assert back.n == a.n
    for q in QS:
        assert abs(back.quantile(q) - a.quantile(q)) <= abs(a.quantile(0.99)) * 0.05
    # rank() is consistent with quantile()
    med = a.quantile(0.5)
    assert 0.45 * a.n < a.rank(med) < 0.56 * a.n
    with pytest.raises(ValueError):
        KLL(4)


def test_dataset_path_vs_exact(ray_session):
    docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["n_chars"])
    t = kll_quantiles(docs, "n_chars", quantiles=(0.5, 0.9), k=400)
    import pyarrow.parquet as pq

    exact = np.sort(
        pq.read_table("/root/testdata/sf0.01/documents.parquet", columns=["n_chars"])
        ["n_chars"].to_numpy()
    )
    for q, v in zip(t["q"].to_pylist(), t["value"].to_pylist()):
        true_rank = np.searchsorted(exact, v, side="right") / len(exact)
        assert abs(true_rank - q) < 0.02, (q, v, true_rank)
    # empty column -> NaN quantiles, zero n
    empty = rd.from_items([]) if False else docs.filter(lambda r: False)
    s = kll_sketch(empty, "n_chars", k=64)
    assert s.n == 0 and np.isnan(s.quantile(0.5))


def test_grouped_kll_vs_exact(ray_session):
    from bitfunnel_ray.ops.kll import grouped_kll_quantiles

    docs = rd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                           columns=["lang", "n_chars"])
    t = grouped_kll_quantiles(docs, "n_chars", "lang", quantiles=(0.5, 0.9), k=300)
    import pandas as pd

    src = pd.read_parquet("/root/testdata/sf0.01/documents.parquet",
                          columns=["lang", "n_chars"])
    groups = sorted(src["lang"].unique())
    assert t["lang"].to_pylist() == [g for g in groups for _ in range(2)]
    for lang, q, v in zip(t["lang"].to_pylist(), t["q"].to_pylist(), t["value"].to_pylist()):
        vals = np.sort(src[src["lang"] == lang]["n_chars"].to_numpy())
        true_rank = np.searchsorted(vals, v, side="right") / len(vals)
        assert abs(true_rank - q) < 0.03, (lang, q, v, true_rank)
