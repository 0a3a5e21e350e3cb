"""Ranking-eval harness (query/eval.py): closed-form metric checks and
engine integration."""

import numpy as np
import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.query.eval import dcg, ndcg_at_k, rank_eval
from bitfunnel_ray.sources.corpus import corpus_from_documents


def test_dcg_closed_form():
    # rel [3,2,1]: 3/log2(2) + 2/log2(3) + 1/log2(4) = 3 + 1.2618595 + 0.5
    assert abs(dcg(np.array([3.0, 2.0, 1.0])) - (3 + 2 / np.log2(3) + 0.5)) < 1e-12
    assert dcg(np.array([])) == 0.0


def test_ndcg_perfect_and_inverted():
    rels = np.array([3, 2, 1, 0], np.int64)
    assert ndcg_at_k(rels, rels, 4) == 1.0
    inv = rels[::-1].copy()
    got = ndcg_at_k(inv, rels, 4)
    want = dcg(inv.astype(float)) / dcg(np.array([3.0, 2.0, 1.0, 0.0]))
    assert abs(got - want) < 1e-12 and got < 1.0
    # all-zero relevance → defined as 0
    z = np.zeros(4, np.int64)
    assert ndcg_at_k(z, z, 4) == 0.0


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("eval") / "seg")
    build_index(
        corpus_from_documents("/root/testdata/sf0.001"),
        out,
        EngineConfig(max_gram=2, num_buckets=6),
    )
    return SearchEngine(out, load_urls=False)


def test_rank_eval_grade_term_is_query_scorer_proxy(engine):
    """Grading by the query's own dominant term: BM25's top-10 should
    rank well (ndcg well above random) and every metric lands in [0,1]."""
    t = rank_eval(engine, {0: ("spark join", "spark"), 1: ("table merge", "merge")}, k=10)
    for r in t.to_pylist():
        assert 0.0 <= r["ndcg"] <= 1.0
        assert 0.0 <= r["recall"] <= 1.0
        assert 0.0 <= r["mrr"] <= 1.0
        assert r["n_matches"] > 0
        assert r["recall"] == 1.0  # every AND-match contains both terms → rel>0
        assert r["mrr"] == 1.0


def test_rank_eval_missing_grade_term(engine):
    t = rank_eval(engine, {0: ("spark join", "zzznope")}, k=10)
    r = t.to_pylist()[0]
    assert r["ndcg"] == 0.0 and r["recall"] == 0.0 and r["mrr"] == 0.0
