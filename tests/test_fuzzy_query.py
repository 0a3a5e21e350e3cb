"""Fuzzy query operator ``term~d`` (Lucene FuzzyQuery contract):
parser, the vectorized vocabulary matcher (exact Levenshtein), and the
engine rewrite to an OR group."""

import random

import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.ops.spell import levenshtein
from bitfunnel_ray.query import ast
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.query.fuzzy import VocabFuzzyMatcher
from bitfunnel_ray.query.parser import ParseError, parse_query
from bitfunnel_ray.sources.corpus import corpus_from_documents


def test_parser_fuzzy():
    assert parse_query("sprak~1") == ast.Fuzzy("sprak", 0, 1.0, 1)
    assert parse_query("sprak~2^1.5") == ast.Fuzzy("sprak", 0, 1.5, 2)
    assert parse_query("body:sprak~1") == ast.Fuzzy("sprak", 0, 1.0, 1)
    n = parse_query("sprak~1 join")
    assert n == ast.And((ast.Fuzzy("sprak", 0, 1.0, 1), ast.Term("join")))
    # group-level ~m is still minimum-should-match
    assert parse_query("(a b)~2") == ast.AtLeast(2, (ast.Term("a"), ast.Term("b")))
    for bad in ("sprak~", "sprak~0", "sprak~3", '"a b"~1'):
        with pytest.raises(ParseError):
            parse_query(bad)
    # escaped tilde stays in the token
    assert parse_query(r"a\~1") == ast.Term("a~1")


def test_matcher_exact_vs_brute_force():
    rng = random.Random(42)
    vocab = list({"".join(rng.choice("abcde") for _ in range(rng.randint(1, 7))) for _ in range(400)})
    m = VocabFuzzyMatcher(vocab)
    for _ in range(300):
        q = "".join(rng.choice("abcde") for _ in range(rng.randint(1, 7)))
        for d in (1, 2):
            got = set(m(q, d))
            want = {v for v in vocab if levenshtein(q, v) <= d}
            assert got == want, (q, d, got ^ want)
    # memoized result is the same object
    assert m("abc", 1) is m("abc", 1)


def test_expand_fuzzy_shapes():
    m = VocabFuzzyMatcher(["spark", "sparky", "join"])
    n = ast.expand_fuzzy(parse_query("spark~1 -sparky~1"), m)
    # the query term itself is kept first; members sorted after it
    assert n == ast.And(
        (
            ast.Or((ast.Term("spark"), ast.Term("sparky"))),
            ast.Not(ast.Or((ast.Term("sparky"), ast.Term("spark")))),
        )
    )
    # no vocabulary hit -> bare (df-0) term, no Or wrapper
    assert ast.expand_fuzzy(ast.Fuzzy("zzzzzz", 0, 1.0, 1), m) == ast.Term("zzzzzz")
    # boost and stream are inherited by every member
    n = ast.expand_fuzzy(ast.Fuzzy("spark", 2, 2.0, 1), m)
    assert n == ast.Or((ast.Term("spark", 2, 2.0), ast.Term("sparky", 2, 2.0)))


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("fz") / "seg")
    build_index(
        corpus_from_documents("/root/testdata/sf0.001"),
        out,
        EngineConfig(max_gram=2, num_buckets=6),
    )
    eng = SearchEngine(out, load_urls=False)
    import duckdb

    vocab = [
        r[0]
        for r in duckdb.sql(
            "SELECT DISTINCT unnest(string_split(text,' ')) FROM "
            "read_parquet('/root/testdata/sf0.001/documents.parquet')"
        ).fetchall()
    ]
    eng.set_fuzzy_vocabulary(vocab)
    return eng


def test_engine_fuzzy_equals_manual_expansion(engine):
    # rowt~2 -> {row, sort} on this corpus (plus the df-0 query term)
    exp = engine.fuzzy_matcher("rowt", 2)
    assert set(exp) == {"row", "sort"}
    a = engine.search("rowt~2 join", k=50)
    b = engine.search("(rowt | row | sort) join", k=50)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()
    # match_count and explain take the same rewrite
    assert engine.match_count("rowt~2 join") == engine.match_count("(row | sort) join")
    doc = int(a["doc_id"][0].as_py())
    ex = engine.explain("rowt~2 join", doc)
    assert abs(sum(ex["contribution"].to_pylist()) - a["score"][0].as_py()) < 1e-9


def test_engine_fuzzy_requires_vocabulary(engine):
    eng2 = SearchEngine(engine.segments[0].dir, load_urls=False)
    with pytest.raises(ValueError, match="fuzzy"):
        eng2.search("rowt~2", k=5)


def test_matcher_unicode():
    vocab = ["naïve", "naive", "café", "cafe", "日本語", "日本人"]
    m = VocabFuzzyMatcher(vocab)
    assert set(m("naive", 1)) == {"naive", "naïve"}
    assert set(m("café", 1)) == {"café", "cafe"}
    assert set(m("日本語", 1)) == {"日本語", "日本人"}


def test_query_log_serving_handles_fuzzy(engine, ray_session):
    """Fuzzy queries in a served query log go through the shared rewrite:
    without a vocabulary they become CLEAN error rows (not eval
    TypeErrors); plain queries in the same log still serve."""
    import pyarrow as pa

    from bitfunnel_ray.query.runner import run_query_log

    log = pa.table(
        {
            "query_id": pa.array([0, 1], pa.int64()),
            "query": pa.array(["spark join", "sprak~1"], pa.string()),
        }
    )
    out = run_query_log(log, engine.segments[0].dir, k=3, concurrency=1).to_pandas()
    ok = out[out.query_id == 0]
    assert (ok["error"] == "").all() and len(ok) == 3
    err = out[out.query_id == 1]
    assert len(err) == 1 and "vocabulary" in err["error"].iloc[0]
