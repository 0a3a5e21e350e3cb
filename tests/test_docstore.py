"""Stored fields (build/docstore.py + EngineConfig.store_fields):
byte-identical fetch, row-group pruning, exactly-once under the
docstore cross-check."""

import os

import numpy as np
import pyarrow.parquet as pq
import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.build.docstore import DocStore
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.sources.corpus import corpus_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session):
    out = str(tmp_path_factory.mktemp("ds") / "seg")
    build_index(
        corpus_from_documents(SF),
        out,
        EngineConfig(
            max_gram=2,
            num_buckets=4,
            store_fields=("text", "lang"),
            extra={"docstore_row_group": 128},
        ),
    )
    return out


def test_fetch_byte_identical(built):
    eng = SearchEngine(built, load_urls=False)
    src = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"])
    want = {int(i): (t, s) for i, t, s in zip(
        src["doc_id"].to_pylist(), src["text"].to_pylist(), src["lang"].to_pylist()
    )}
    ids = [3, 99, 250, 499]
    got = eng.fetch(ids)
    assert got["doc_id"].to_pylist() == sorted(ids)
    for i, t, s in zip(got["doc_id"].to_pylist(), got["text"].to_pylist(), got["lang"].to_pylist()):
        assert (t, s) == want[i]
    # field projection
    only_text = eng.fetch([3], fields=["text"])
    assert only_text.column_names == ["doc_id", "text"]
    # absent ids are simply missing
    assert len(eng.fetch([10**12])) == 0
    # total row parity: every doc is fetchable exactly once
    all_ids = list(want)
    assert len(eng.fetch(all_ids)) == len(all_ids)


def test_rowgroup_pruning(built):
    store = DocStore(built)
    total_rgs = len(store.entries)
    assert total_rgs >= 2  # multiple parts/row groups to prune between
    store.fetch([0])
    assert store.rowgroups_read < total_rgs  # a 1-doc fetch must not scan all


def test_search_then_fetch_roundtrip(built):
    """The serving flow: top-k search, then render stored text for the
    page of results."""
    eng = SearchEngine(built, load_urls=False)
    top = eng.search("table join", k=5)
    rows = eng.fetch(top["doc_id"].to_pylist(), fields=["text"])
    assert len(rows) == 5
    for txt in rows["text"].to_pylist():
        assert "table" in txt and "join" in txt


def test_no_docstore_raises(tmp_path, ray_session):
    out = str(tmp_path / "plain")
    build_index(corpus_from_documents(SF), out, EngineConfig(max_gram=1, num_buckets=2))
    eng = SearchEngine(out, load_urls=False)
    with pytest.raises(FileNotFoundError, match="docstore"):
        eng.fetch([1])
    assert not os.path.isdir(os.path.join(out, "docstore"))


def test_stored_snippets_equal_scan(built, ray_session):
    import ray.data as rd

    from bitfunnel_ray.query.snippets import result_snippets, result_snippets_stored

    eng = SearchEngine(built, load_urls=False)
    top = eng.search("table join", k=5)
    corpus = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    a = result_snippets(corpus, top, ["table", "join"])
    b = result_snippets_stored(eng, top, ["table", "join"])
    assert a.equals(b)


def test_result_cache_hit_and_invalidation(built):
    eng = SearchEngine(built, load_urls=False)
    cold = eng.search("table join", k=5)
    eng.enable_result_cache(cap=2)
    m1 = eng.search("table join", k=5)
    assert m1 is eng.search("table join", k=5)  # second call is the cached object
    assert m1.equals(cold)
    # dynamic-argument paths bypass the cache
    cur = (m1["score"][-1].as_py(), m1["doc_id"][-1].as_py())
    p2 = eng.search("table join", k=5, after=cur)
    assert p2 is not m1
    # LRU eviction at cap=2
    eng.search("merge | window", k=5)
    eng.search("batch", k=5)  # evicts "table join"
    assert eng.search("table join", k=5) is not m1
    # refresh clears the cache (NRT invalidation)
    warm = eng.search("batch", k=5)
    eng.refresh()
    assert eng.search("batch", k=5).equals(warm)


def test_merge_carries_docstore(tmp_path, ray_session):
    """Compaction must keep stored fields fetchable: merge two
    docstore-bearing segments (with tombstones) and fetch from the
    merged segment."""
    import ray.data as rd

    from bitfunnel_ray.build.merge import merge_segments
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    docs = pq.read_table(f"{SF}/documents.parquet")
    cfg = EngineConfig(max_gram=1, num_buckets=2, store_fields=("text",))
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))), s1, cfg)
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(250))), s2, cfg)
    dead = np.arange(0, 500, 7, dtype=np.uint64)
    out = str(tmp_path / "merged")
    merge_segments([s1, s2], out, tombstones=dead)
    eng = SearchEngine(out, load_urls=False)
    live = [i for i in range(500) if i % 7]
    got = eng.fetch(live, fields=["text"])
    assert len(got) == len(live)
    want = dict(zip(docs["doc_id"].to_pylist(), docs["text"].to_pylist()))
    assert all(want[i] == s for i, s in zip(got["doc_id"].to_pylist(), got["text"].to_pylist()))
    # tombstoned rows are gone from the docstore too
    assert len(eng.fetch([0, 7, 14])) == 0


def test_sharded_front_fetch(built, ray_session):
    from bitfunnel_ray.query.sharded import ShardedServer

    srv = ShardedServer(built, n_shards=2, num_cpus_per_shard=0.5)
    try:
        se = srv.engine()
        local = SearchEngine(built, load_urls=False)
        top = se.search("table join", k=5)
        a = se.fetch(top["doc_id"].to_pylist(), fields=["text"])
        b = local.fetch(top["doc_id"].to_pylist(), fields=["text"])
        assert a.equals(b) and len(a) == 5
    finally:
        srv.shutdown()


def test_empty_fetch_schema_matches_hits(built):
    """A miss must return the parts' REAL column types (an earlier
    version hardcoded string and broke concat/join on typed fields)."""
    store = DocStore(built)
    hit = store.fetch([3])
    miss = store.fetch([10**15])
    assert miss.schema == hit.schema
    import pyarrow as pa

    assert len(pa.concat_tables([hit, miss])) == len(hit)


def test_merge_docstore_skips_empty_parts(tmp_path, ray_session):
    """Tombstones covering an entire source segment must not emit 0-row
    docstore parts: a 0-row parquet part has a row group with
    statistics=None, which DocStore range-indexing can't load (and two
    empty batches would collide on one part name)."""
    import ray.data as rd

    from bitfunnel_ray.build.merge import merge_segments
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    docs = pq.read_table(f"{SF}/documents.parquet")
    cfg = EngineConfig(max_gram=1, num_buckets=2, store_fields=("text",))
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))), s1, cfg)
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(250))), s2, cfg)
    dead = np.arange(0, 250, dtype=np.uint64)  # all of s1
    out = str(tmp_path / "merged")
    merge_segments([s1, s2], out, tombstones=dead)
    store = os.path.join(out, "docstore")
    parts = [p for p in os.listdir(store) if p.endswith(".parquet")]
    assert parts and all(pq.read_metadata(os.path.join(store, p)).num_rows > 0 for p in parts)
    eng = SearchEngine(out, load_urls=False)  # DocStore.__init__ must not crash
    got = eng.fetch(list(range(250, 500)), fields=["text"])
    assert len(got) == 250
    assert len(eng.fetch([0, 100, 249])) == 0


def test_merge_rejects_store_fields_mismatch(tmp_path, ray_session):
    """Segments built with different store_fields must refuse to merge —
    mixed-schema docstore parts would fail or silently drop fields."""
    import ray.data as rd

    from bitfunnel_ray.build.merge import merge_segments
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    docs = pq.read_table(f"{SF}/documents.parquet")
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(0, 100))), s1,
        EngineConfig(max_gram=1, num_buckets=2, store_fields=("text",)),
    )
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(100, 100))), s2,
        EngineConfig(max_gram=1, num_buckets=2, store_fields=("text", "lang")),
    )
    with pytest.raises(ValueError, match="store_fields"):
        merge_segments([s1, s2], str(tmp_path / "merged"))
