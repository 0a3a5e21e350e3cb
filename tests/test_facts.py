"""Document facts — the IFactSet analog (reference:
inc/BitFunnel/Index/IFactSet.h:30-46, src/Index/src/FactSetBase.cpp).
Facts are named boolean per-document predicates ingested as synthetic
terms on a reserved stream; queryable as ``fact:<name>``; they constrain
matching but contribute zero BM25 score (rank-0 filter rows — the
reference's own soft delete is such a fact)."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine


@pytest.fixture(scope="module")
def fact_index(tmp_path_factory):
    docs = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    ids = docs["doc_id"].to_numpy()
    corpus = pa.table(
        {
            "doc_id": docs["doc_id"],
            "url": pa.array([f"u{i}" for i in ids]),
            "text": docs["text"],
            "is_even": pa.array(ids % 2 == 0),
            "deleted": pa.array(ids % 7 == 0),
        }
    )
    base = tmp_path_factory.mktemp("factidx")
    plain_dir, fact_dir = str(base / "plain"), str(base / "facts")
    cfg_plain = EngineConfig(max_gram=2, num_buckets=4)
    cfg_fact = EngineConfig(
        max_gram=2, num_buckets=4,
        facts=(("even_doc", "is_even"), ("deleted", "deleted")),
    )
    build_index(rd.from_arrow(corpus), plain_dir, cfg_plain)
    build_index(rd.from_arrow(corpus), fact_dir, cfg_fact)
    return plain_dir, fact_dir, ids


def test_fact_filters_matches_but_not_scores(fact_index):
    plain_dir, fact_dir, ids = fact_index
    plain, eng = SearchEngine(plain_dir), SearchEngine(fact_dir)
    want = {int(d) for d in plain.search("table", k=10_000)["doc_id"].to_pylist() if d % 2 == 0}
    got = eng.search("table fact:even_doc", k=10_000)
    assert {int(d) for d in got["doc_id"].to_pylist()} == want
    # scores equal the plain engine's scores for the same docs: the fact
    # term contributed NOTHING to BM25
    plain_res = plain.search("table", k=10_000)
    pscore = dict(zip(plain_res["doc_id"].to_pylist(), plain_res["score"].to_pylist()))
    for d, s in zip(got["doc_id"].to_pylist(), got["score"].to_pylist()):
        assert s == pscore[d]


def test_fact_only_query_and_negation(fact_index):
    plain_dir, fact_dir, ids = fact_index
    eng = SearchEngine(fact_dir)
    evens = eng.eval_query = eng.search("fact:even_doc", k=10_000)["doc_id"].to_pylist()
    assert sorted(evens) == sorted(int(i) for i in ids if i % 2 == 0)
    odds = eng.search("-fact:even_doc", k=10_000)["doc_id"].to_pylist()
    assert sorted(odds) == sorted(int(i) for i in ids if i % 2 == 1)


def test_soft_delete_via_fact_equals_tombstones(fact_index):
    """The reference implements soft delete AS a system fact; here the
    equivalence is explicit: NOT fact:deleted == tombstone anti-join."""
    plain_dir, fact_dir, ids = fact_index
    dead = np.array([i for i in ids if i % 7 == 0], dtype=np.uint64)
    tomb = SearchEngine(plain_dir, tombstones=dead)
    factd = SearchEngine(fact_dir)
    for q in ["table", "spark | join", "merge -window"]:
        a = tomb.search(q, k=10_000)
        b = factd.search(f"({q}) -fact:deleted", k=10_000)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
        assert a["score"].to_pylist() == b["score"].to_pylist(), q


def test_fact_sharded_parity(fact_index):
    from bitfunnel_ray.query.sharded import ShardedServer

    plain_dir, fact_dir, ids = fact_index
    local = SearchEngine(fact_dir)
    srv = ShardedServer(fact_dir, n_shards=2)
    try:
        eng = srv.engine()
        for q in ["table fact:even_doc", "fact:even_doc | fact:deleted", "-fact:deleted"]:
            a = local.search(q, k=50)
            b = eng.search(q, k=50)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
            assert a["score"].to_pylist() == b["score"].to_pylist(), q
    finally:
        srv.shutdown()
