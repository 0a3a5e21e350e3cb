"""Serve-time facet aggregations (query/aggs.py) + sort-by-field."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.aggs import date_histogram, field_stats
from bitfunnel_ray.query.engine import SearchEngine

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def engine(tmp_path_factory, ray_session):
    from bitfunnel_ray.sources.corpus import corpus_from_documents

    out = str(tmp_path_factory.mktemp("aggs") / "seg")
    build_index(corpus_from_documents(SF), out, EngineConfig(max_gram=2))
    return SearchEngine(out, load_urls=False)


def _matching_ids(query_terms):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    ids = []
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        toks = set(text.split())
        if all(q in toks for q in query_terms):
            ids.append(doc_id)
    return np.array(sorted(ids), dtype=np.int64)


def test_date_histogram_counts(engine):
    """Fixture ts = 1704067200 + doc_id: bucket counts equal a direct
    floor-division histogram of the matching doc ids."""
    ids = _matching_ids(["spark"])
    want_buckets, want_counts = np.unique(
        (1704067200 + ids) // 100 * 100, return_counts=True
    )
    t = date_histogram(engine, "spark", interval_s=100)
    assert t["bucket_start_s"].to_pylist() == want_buckets.tolist()
    assert t["n_docs"].to_pylist() == want_counts.tolist()
    assert sum(t["n_docs"].to_pylist()) == len(ids)


def test_date_histogram_origin_shift(engine):
    """A non-zero origin shifts bucket boundaries, not membership."""
    t0 = date_histogram(engine, "spark", interval_s=100, origin_s=0)
    t7 = date_histogram(engine, "spark", interval_s=100, origin_s=7)
    assert sum(t0["n_docs"].to_pylist()) == sum(t7["n_docs"].to_pylist())
    assert all((b - 7) % 100 == 0 for b in t7["bucket_start_s"].to_pylist())


def test_date_histogram_no_matches(engine):
    t = date_histogram(engine, "zzznope", interval_s=100)
    assert len(t) == 0


def test_field_stats(engine):
    ids = _matching_ids(["spark", "join"])
    t = field_stats(engine, "spark join")
    assert t["n_docs"].to_pylist() == [len(ids)]
    assert t["min_v"].to_pylist() == [float(1704067200 + ids.min())]
    assert t["max_v"].to_pylist() == [float(1704067200 + ids.max())]
    assert t["avg_v"].to_pylist()[0] == pytest.approx(1704067200 + ids.mean())


def test_sort_by_field(engine):
    """sort_by=(warc_ts_s, desc) orders by ts desc == doc_id desc in the
    fixture; asc is the reverse; score column still populated."""
    ids = _matching_ids(["spark", "join"])
    d = engine.search("spark join", k=5, sort_by=("warc_ts_s", "desc"))
    assert d["doc_id"].to_pylist() == ids[::-1][:5].tolist()
    a = engine.search("spark join", k=5, sort_by=("warc_ts_s", "asc"))
    assert a["doc_id"].to_pylist() == ids[:5].tolist()
    assert all(s > 0 for s in d["score"].to_pylist())
    with pytest.raises(ValueError):
        engine.search("spark join", k=5, sort_by=("warc_ts_s", "sideways"))
    with pytest.raises(ValueError):
        engine.search("spark", k=5, sort_by=("warc_ts_s", "asc"), after=(1.0, 3))


def test_field_percentiles(engine):
    from bitfunnel_ray.query.aggs import field_percentiles

    ids = _matching_ids(["spark"])
    v = (1704067200 + ids).astype(np.float64)
    t = field_percentiles(engine, "spark", qs=(0.0, 0.5, 1.0))
    assert t["value"].to_pylist() == [
        float(np.quantile(v, q)) for q in (0.0, 0.5, 1.0)
    ]
    empty = field_percentiles(engine, "zzznope")
    assert all(np.isnan(x) for x in empty["value"].to_pylist())


def test_range_query_syntax(ray_session, tmp_path):
    """col:[lo TO hi] — first-class doc-values range queries (Lucene
    range contract, inclusive; '*' = open bound): parse, eval under
    AND/OR/NOT, zero score contribution, sharded parity."""
    import numpy as np

    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.query import ast
    from bitfunnel_ray.query.engine import SearchEngine
    from bitfunnel_ray.query.parser import parse_query
    from bitfunnel_ray.query.sharded import ShardedServer
    from bitfunnel_ray.sources.corpus import corpus_from_documents

    n = parse_query("warc_ts_s:[10 TO 20]")
    assert n == ast.Range("warc_ts_s", 10.0, 20.0)
    assert parse_query("warc_ts_s:[* TO 20]") == ast.Range("warc_ts_s", float("-inf"), 20.0)

    out = str(tmp_path / "seg")
    build_index(
        corpus_from_documents("/root/testdata/sf0.001"),
        out,
        EngineConfig(max_gram=1, num_buckets=4),
    )
    eng = SearchEngine(out, load_urls=False)
    v = eng.docvalue("warc_ts_s")
    lo, hi = float(np.nanpercentile(v, 25)), float(np.nanpercentile(v, 75))
    q = f"spark warc_ts_s:[{lo:.0f} TO {hi:.0f}]"

    # range eval == kwarg filter semantics ([lo, hi] inclusive here)
    got = eng.eval(parse_query(q, eng.stream_map))
    plain = eng.eval(parse_query("spark", eng.stream_map))
    vv = eng.docvalues_for(plain, "warc_ts_s")
    want = plain[(vv >= round(lo)) & (vv <= round(hi))]
    assert np.array_equal(got, want)

    # the range clause never scores: ranked results equal the plain query's
    # scores on the intersected doc set
    t = eng.search(q, k=1000)
    tp = eng.search("spark", k=10**6)
    sp = dict(zip(tp["doc_id"].to_pylist(), tp["score"].to_pylist()))
    assert all(sp[d] == s for d, s in zip(t["doc_id"].to_pylist(), t["score"].to_pylist()))

    # OR / NOT composition + open bounds
    assert eng.match_count(f"warc_ts_s:[* TO {lo:.0f}] | warc_ts_s:[{lo:.0f} TO *]") == eng.n_docs
    assert eng.match_count(f"-warc_ts_s:[* TO *]") == 0

    srv = ShardedServer(out, n_shards=3, num_cpus_per_shard=0.5)
    try:
        se = srv.engine()
        a, b = eng.search(q, k=20), se.search(q, k=20)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
        assert a["score"].to_pylist() == b["score"].to_pylist()
    finally:
        srv.shutdown()
