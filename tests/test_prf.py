"""Pseudo-relevance feedback expansion (query/prf.py)."""

import pyarrow as pa
import pytest
import ray.data as rd

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.query.prf import feedback_terms, prf_search
from bitfunnel_ray.sources.corpus import corpus_from_documents


@pytest.fixture(scope="module")
def setup(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("prf") / "seg")
    build_index(
        corpus_from_documents("/root/testdata/sf0.001"),
        out,
        EngineConfig(max_gram=2, num_buckets=6),
    )
    corpus = rd.read_parquet(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    return SearchEngine(out, load_urls=False), corpus


def test_feedback_terms_exclude_query_and_are_deterministic(setup):
    eng, corpus = setup
    fb = eng.search("spark join", k=10)
    terms = feedback_terms(corpus, fb["doc_id"].to_numpy(), {"spark", "join"}, n_terms=5)
    assert len(terms) == 5
    assert "spark" not in terms and "join" not in terms
    # deterministic across invocations (count desc, term asc ordering)
    assert terms == feedback_terms(
        corpus, fb["doc_id"].to_numpy(), {"spark", "join"}, n_terms=5
    )


def test_prf_equals_manual_expansion(setup):
    eng, corpus = setup
    got = prf_search(eng, corpus, ["spark", "join"], k=10, k_docs=10, n_terms=3)
    fb = eng.search("spark join", k=10)
    exp = feedback_terms(corpus, fb["doc_id"].to_numpy(), {"spark", "join"}, n_terms=3)
    want = eng.topk_or(["spark", "join"] + exp, k=10)
    assert got["doc_id"].to_pylist() == want["doc_id"].to_pylist()
    assert got["score"].to_pylist() == want["score"].to_pylist()
    assert got["expansion"][0].as_py() == " ".join(exp)


def test_prf_widens_recall(setup):
    eng, corpus = setup
    base = eng.topk_or(["spark", "join"], k=10**6).num_rows
    got = prf_search(eng, corpus, ["spark", "join"], k=10**6, n_terms=5)
    assert got.num_rows >= base
