"""Distributed brute-force verification (the verify-one-query analog)."""

import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.query.verify import expected_matches, verify_query
from bitfunnel_ray.sources.corpus import corpus_from_documents


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("verify") / "seg")
    build_index(
        corpus_from_documents("/root/testdata/sf0.001"),
        out,
        EngineConfig(max_gram=2, num_buckets=4),
    )
    return SearchEngine(out, load_urls=False)


@pytest.mark.parametrize(
    "q",
    ["table", "spark join", "merge | window", "table -join", '"batch batch"', "(spark | vector) batch"],
)
def test_verify_zero_fp_fn(setup, q):
    eng = setup
    out = verify_query(corpus_from_documents("/root/testdata/sf0.001"), eng, q)
    assert out["ok"], out
    assert out["fp"] == 0 and out["fn"] == 0
    assert out["matched"] == out["expected"]


def test_expected_matches_standalone():
    got = expected_matches(corpus_from_documents("/root/testdata/sf0.001"), "table -join", 2)
    assert len(got) > 0
