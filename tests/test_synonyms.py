"""Query-time synonym expansion (ast.expand_synonyms + engine hook)."""

import pyarrow as pa
import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query import ast
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.query.parser import parse_query
from bitfunnel_ray.sources.corpus import corpus_from_documents

SYN = {"join": ("join", "merge"), "fast": ("fast", "quick", "fast")}


def test_expand_shapes():
    n = ast.expand_synonyms(parse_query("spark join"), SYN)
    assert n == ast.And((ast.Term("spark"), ast.Or((ast.Term("join"), ast.Term("merge")))))
    # member dedupe + singleton collapse
    assert ast.expand_synonyms(ast.Term("fast"), {"fast": ("fast", "fast")}) == ast.Term("fast")
    # expansion under NOT excludes every member
    n = ast.expand_synonyms(parse_query("spark -join"), SYN)
    assert n == ast.And(
        (ast.Term("spark"), ast.Not(ast.Or((ast.Term("join"), ast.Term("merge")))))
    )
    # phrases never expand
    p = parse_query('"table join"')
    assert ast.expand_synonyms(p, SYN) == p


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("syn") / "seg")
    build_index(
        corpus_from_documents("/root/testdata/sf0.001"),
        out,
        EngineConfig(max_gram=2, num_buckets=6),
    )
    return SearchEngine(out, load_urls=False)


def test_engine_synonyms_equal_manual_expansion(engine):
    a = engine.search("spark join", k=25, synonyms=SYN)
    b = engine.search("spark (join | merge)", k=25)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()
    # and it really widens the match set
    plain = engine.search("spark join", k=10**6)
    assert engine.search("spark join", k=10**6, synonyms=SYN).num_rows >= plain.num_rows


def test_boost_scoring(engine):
    """spark^2: spark's contribution doubles; boost 1.0 is bit-exact
    identity; explain contributions still sum to the score."""
    import numpy as np

    plain = engine.search("spark join", k=10)
    one = engine.search("spark^1 join", k=10)
    assert plain["score"].to_pylist() == one["score"].to_pylist()
    boosted = engine.search("spark^2 join", k=1000)
    doc = int(boosted["doc_id"][0].as_py())
    ex_p = engine.explain("spark join", doc).to_pandas().set_index("term")
    ex_b = engine.explain("spark^2 join", doc).to_pandas().set_index("term")
    assert ex_b.loc["spark", "contribution"] == 2.0 * ex_p.loc["spark", "contribution"]
    assert ex_b.loc["join", "contribution"] == ex_p.loc["join", "contribution"]
    row = boosted.to_pandas().set_index("doc_id").loc[doc]
    assert np.isclose(ex_b["contribution"].sum(), row["score"], rtol=0, atol=0)


def test_engine_synonyms_compose_with_cursor(engine):
    p1 = engine.search("spark join", k=5, synonyms=SYN)
    cur = (p1["score"][-1].as_py(), p1["doc_id"][-1].as_py())
    p2 = engine.search("spark join", k=5, synonyms=SYN, after=cur)
    deep = engine.search("spark join", k=10, synonyms=SYN)
    assert (
        p1["doc_id"].to_pylist() + p2["doc_id"].to_pylist()
        == deep["doc_id"].to_pylist()
    )
