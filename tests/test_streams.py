"""Multi-stream indexing (StreamConfiguration + stream-qualified queries;
ComputeGeneralHash parity: stored hash = rawHash + streamId)."""

import duckdb
import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.sources.corpus import corpus_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def eng(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("streams") / "seg")
    cfg = EngineConfig(
        max_gram=2,
        num_buckets=4,
        streams=(("body", "text", 0), ("lang", "lang", 1)),
    )
    build_index(corpus_from_documents(SF), out, cfg)
    return SearchEngine(out, load_urls=False)


def test_stream_map_loaded(eng):
    from bitfunnel_ray.functions.hashing import FACT_STREAM_ID

    # configured streams load verbatim; the engine also registers the
    # synthetic "fact" stream so fact:<name> parses (IFactSet analog)
    assert eng.stream_map == {"body": 0, "lang": 1, "fact": FACT_STREAM_ID}


def test_stream_query_matches_column(eng):
    want = duckdb.sql(
        f"SELECT doc_id FROM read_parquet('{SF}/documents.parquet') WHERE lang='en' ORDER BY doc_id"
    ).df()["doc_id"].tolist()
    got = eng.eval(__import__("bitfunnel_ray.query.parser", fromlist=["parse_query"]).parse_query("lang:en", eng.stream_map))
    assert got.tolist() == want


def test_stream_and_body_mix(eng):
    want = duckdb.sql(
        f"""SELECT doc_id FROM read_parquet('{SF}/documents.parquet')
            WHERE lang='de' AND list_contains(string_split(text,' '), 'table')
            ORDER BY doc_id"""
    ).df()["doc_id"].tolist()
    from bitfunnel_ray.query.parser import parse_query

    got = eng.eval(parse_query("lang:de table", eng.stream_map))
    assert got.tolist() == want


def test_body_term_does_not_leak_into_stream(eng):
    from bitfunnel_ray.query.parser import parse_query

    # 'en' never appears in the body text of the synthetic docs
    assert eng.eval(parse_query("en", eng.stream_map)).tolist() == []


def test_unknown_stream_rejected(eng):
    from bitfunnel_ray.query.parser import ParseError, parse_query

    with pytest.raises(ParseError):
        parse_query("title:foo", eng.stream_map)


def test_runner_serves_stream_query(eng):
    """QueryActor must pass the engine's stream_map to the parser
    (regression: the actor used the default {'body': 0} map, turning
    stream-qualified queries into error rows)."""
    import pyarrow as pa

    from bitfunnel_ray.query.runner import run_query_log

    qlog = pa.table(
        {"query_id": pa.array([0], pa.uint32()), "query": ["lang:de table"]}
    )
    res = run_query_log(qlog, eng.segments[0].dir, k=5, concurrency=2).to_pandas()
    assert (res["error"] == "").all()
    assert (res["n_matches"] >= 0).all()
