"""NRT refresh: newly completed segments become searchable in place
(the reference ingests into a LIVE index — Ingestor::Add; additive
segments + refresh() are the Ray-side equivalent)."""

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.sources.corpus import _lift_documents_batch, corpus_from_documents

CFG = EngineConfig(max_gram=2, num_buckets=4)
QUERIES = ["spark join", "merge | window", "table -join", '"batch batch"', "-table"]


@pytest.fixture(scope="module")
def halves(tmp_path_factory, ray_session):
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    root = tmp_path_factory.mktemp("nrt")
    s1 = str(root / "seg-000")
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))), s1, CFG)
    full = str(tmp_path_factory.mktemp("nrt_full") / "seg")
    build_index(corpus_from_documents("/root/testdata/sf0.001"), full, CFG)
    return str(root), docs, full


def _grow(root, docs):
    s2 = f"{root}/seg-001"
    import os

    if not os.path.exists(s2):
        build_index(rd.from_arrow(_lift_documents_batch(docs.slice(250))), s2, CFG)
    return s2


def test_local_engine_refresh(halves):
    root, docs, full = halves
    eng = SearchEngine(root)
    assert eng.n_docs == 250
    before = eng.search("spark join", k=10)
    _grow(root, docs)
    assert eng.refresh() == 1
    assert eng.refresh() == 0  # idempotent
    assert eng.n_docs == 500
    fresh = SearchEngine(full)
    assert eng.avgdl == fresh.avgdl
    for q in QUERIES:
        a, b = eng.search(q, 10), fresh.search(q, 10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q
    # url map refreshed too (decoration for new docs)
    t = eng.search("spark join", k=10)
    assert all(u is not None for u in t["url"].to_pylist())
    assert before["doc_id"].to_pylist() != t["doc_id"].to_pylist() or eng.n_docs == 250


def test_local_refresh_docvalues_realign(halves):
    root, docs, full = halves
    eng = SearchEngine(root, load_urls=False)
    eng.docvalue("warc_ts_s")  # warm the cache pre-refresh
    _grow(root, docs)
    eng.refresh()
    v = eng.docvalue("warc_ts_s")
    assert len(v) == 500
    assert np.array_equal(v, 1704067200 + eng.all_docs.astype(np.float64))


def test_sharded_refresh_parity(tmp_path, halves):
    """Segments completed AFTER the shard actors started serving become
    visible via server.refresh() on every replica, with results identical
    to a fresh single-process engine over the full corpus."""
    from bitfunnel_ray.query.sharded import ShardedServer

    _root, docs, full = halves
    root = str(tmp_path / "live")
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))),
                f"{root}/seg-000", CFG)
    srv = ShardedServer(root, n_shards=2, num_cpus_per_shard=0.5, n_replicas=2)
    try:
        half = srv.engine()
        assert half.n_docs == 250
        assert half.search("spark join", k=10)  # serves the half corpus
        # live growth: a new segment lands while the server is up
        build_index(rd.from_arrow(_lift_documents_batch(docs.slice(250))),
                    f"{root}/seg-001", CFG)
        assert srv.refresh() == 1
        assert srv.refresh() == 0  # idempotent
        eng = srv.engine()
        fresh = SearchEngine(full, load_urls=False)
        assert eng.n_docs == 500
        for q in QUERIES:
            a, b = eng.search(q, 10), fresh.search(q, 10)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
            assert np.allclose(a["score"].to_numpy(), b["score"].to_numpy())
        # doc values refreshed on the shards too
        from bitfunnel_ray.query.parser import parse_query

        m = fresh.eval(parse_query("spark"))
        assert np.array_equal(eng.docvalues_for(m, "warc_ts_s"),
                              fresh.docvalues_for(m, "warc_ts_s"))
    finally:
        srv.shutdown()


def test_refresh_int64_docmeta(tmp_path, ray_session):
    """NRT refresh on an index whose corpus doc_id is int64 (user-built
    parquet, no lift): an earlier version concat'd uint64 and int64
    docmeta tables and always crashed."""
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data as rd

    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.query.engine import SearchEngine

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "text"])  # doc_id: int64, no lift
    root = tmp_path / "root"
    root.mkdir()
    cfg = EngineConfig(max_gram=1, num_buckets=2)
    build_index(rd.from_arrow(docs.slice(0, 250)), str(root / "seg-0000"), cfg)
    eng = SearchEngine(str(root), load_urls=False)
    assert eng.n_docs == 250
    build_index(rd.from_arrow(docs.slice(250)), str(root / "seg-0001"), cfg)
    assert eng.refresh() == 1
    assert eng.n_docs == 500
    assert len(eng.all_docs) == 500 and eng.all_docs.dtype == np.uint64
    assert eng.match_count("table") > 0
