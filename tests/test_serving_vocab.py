"""Vocab sidecar end-to-end: the build's per-segment (term, df, bucket)
text stripes power autocomplete and fuzzy expansion on EVERY serving
surface — local engine (auto-install), term-sharded front (per-shard
stripes + scatter-gather merge), doc-sharded front (range merge with df
sums) — and stay fresh under NRT refresh (VERDICT r4 next-round tasks
#1 and #5)."""

import dataclasses

import numpy as np
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.ops.suggest import SuggestIndex
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.sources.corpus import _lift_documents_batch, corpus_from_documents

CFG = EngineConfig(max_gram=2, num_buckets=4)
VCFG = dataclasses.replace(CFG, extra={"vocab_sidecar": True})


@pytest.fixture(scope="module")
def vocab_index(tmp_path_factory, ray_session):
    """One full-corpus segment built WITH the vocab sidecar + the plain
    df-table ground truth."""
    root = tmp_path_factory.mktemp("vocab_idx")
    seg = str(root / "seg-000")
    build_index(corpus_from_documents("/root/testdata/sf0.001"), seg, VCFG)
    return str(root), seg


@pytest.fixture(scope="module")
def local_truth(vocab_index, ray_session):
    """The reference SuggestIndex/vocab built straight from the sidecar
    the segment wrote (sum-merged like the engine does)."""
    _root, seg = vocab_index
    t = pq.read_table(f"{seg}/vocab", columns=["term", "df"])
    terms = np.asarray(t["term"].to_pylist())
    dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
    return SuggestIndex(terms, dfs)


def test_sidecar_written_and_unigram(vocab_index):
    _root, seg = vocab_index
    t = pq.read_table(f"{seg}/vocab")
    assert set(t.column_names) == {"term", "df", "bucket"}
    assert len(t) > 0
    assert all(" " not in s for s in t["term"].to_pylist())
    b = t["bucket"].to_numpy(zero_copy_only=False)
    assert b.min() >= 0 and b.max() < CFG.num_buckets
    # stripe rule matches the dict-bucket rule: bucket = hash % B
    from bitfunnel_ray.functions.hashing import murmur64a

    for term, bucket in zip(t["term"].to_pylist()[:50], b[:50]):
        assert murmur64a(term) % CFG.num_buckets == bucket


def test_local_engine_autoinstalls(vocab_index, local_truth):
    root, _seg = vocab_index
    eng = SearchEngine(root)
    # LAZY contract: nothing is read in __init__ (a 10^8-term vocabulary
    # costs seconds + GBs); first suggest/fuzzy use materializes both
    assert eng.suggest_index is None and eng.fuzzy_matcher is None
    assert eng._vocab_pending
    for pfx in ("s", "spa", "q", "zz"):
        got = eng.suggest(pfx, 8)
        want = local_truth.complete(pfx, 8)
        assert got.equals(want), pfx
    # fuzzy works with no manual install
    t = eng.search("spark~1", k=10)
    assert len(t) > 0


def test_sharded_front_suggest_and_fuzzy(vocab_index, local_truth, ray_session):
    from bitfunnel_ray.query.sharded import ShardedServer

    root, _seg = vocab_index
    srv = ShardedServer(root, n_shards=2)
    try:
        eng = srv.engine()
        for pfx in ("s", "spa", "q", "zz", ""):
            got = eng.suggest(pfx, 8)
            want = local_truth.complete(pfx, 8)
            assert got.equals(want), pfx
        # fuzzy parity: sharded expansion == local expansion ⇒ identical hits
        local = SearchEngine(root)
        for q in ("spark~1", "qqqqqq~1", "join~2 table"):
            a, b = eng.search(q, k=10), local.search(q, k=10)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
            assert a["score"].to_pylist() == b["score"].to_pylist(), q
    finally:
        srv.shutdown()


def test_docsharded_front_suggest_and_fuzzy(tmp_path_factory, local_truth, ray_session):
    from bitfunnel_ray.query.docsharded import DocShardedServer

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    root = tmp_path_factory.mktemp("vocab_docshard")
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))),
        str(root / "seg-000"), VCFG,
    )
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(250))),
        str(root / "seg-001"), VCFG,
    )
    srv = DocShardedServer(str(root), n_shards=2)
    try:
        for pfx in ("s", "spa", "q", "zz"):
            got = srv.suggest(pfx, 8)
            want = local_truth.complete(pfx, 8)
            assert got.equals(want), pfx
        local = SearchEngine(str(root))
        for q in ("spark~1", "join~2 table"):
            a, b = srv.search(q, k=10), local.search(q, k=10)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), q
            assert a["score"].to_pylist() == b["score"].to_pylist(), q
    finally:
        srv.shutdown()


def test_serve_correct_all_fronts(vocab_index, tmp_path_factory, ray_session):
    """Serve-time "did you mean" parity: local engine, term-sharded
    front and doc-sharded front return identical (token, suggestion,
    dist, df) rows — the doc-sharded path proves the partial-df
    sum-merge (each shard holds local dfs only)."""
    from bitfunnel_ray.query.docsharded import DocShardedServer
    from bitfunnel_ray.query.sharded import ShardedServer

    root, _seg = vocab_index
    q = "sparkk tble zzzzqqqq spark"
    local = SearchEngine(root).correct(q)
    toks = local["token"].to_pylist()
    assert "sparkk" in toks and "spark" not in toks  # OOV corrected, in-vocab skipped
    assert "zzzzqqqq" not in toks  # uncorrectable emits nothing
    srv = ShardedServer(root, n_shards=2)
    try:
        assert srv.engine().correct(q).equals(local)
    finally:
        srv.shutdown()
    # doc-sharded over TWO segments: dfs are split per shard and must sum
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    root2 = tmp_path_factory.mktemp("correct_docshard")
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))),
        str(root2 / "seg-000"), VCFG,
    )
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(250))),
        str(root2 / "seg-001"), VCFG,
    )
    ds_srv = DocShardedServer(str(root2), n_shards=2)
    try:
        assert ds_srv.correct(q).equals(local)
    finally:
        ds_srv.shutdown()


def test_split_df_across_shards_exact(tmp_path_factory, ray_session):
    """Segments with DIFFERENT bucket counts put the same term's stripe
    in different shards (bucket = hash % B differs per segment), so each
    shard holds a PARTIAL df.  The shard-side range + front-side
    sum-then-cut merge must still return the exact global top-k — a
    shard-side k-cut on partial dfs would drop split terms."""
    from bitfunnel_ray.query.sharded import ShardedServer

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    root = tmp_path_factory.mktemp("vocab_split")
    cfg_a = dataclasses.replace(
        CFG, num_buckets=4, extra={"vocab_sidecar": True}
    )
    cfg_b = dataclasses.replace(
        CFG, num_buckets=6, extra={"vocab_sidecar": True}
    )
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))),
        str(root / "seg-000"), cfg_a,
    )
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(250))),
        str(root / "seg-001"), cfg_b,
    )
    import pyarrow as pa

    both = pa.concat_tables(
        [
            pq.read_table(f"{root}/{seg}/vocab", columns=["term", "df"])
            for seg in ("seg-000", "seg-001")
        ]
    )
    # duplicate term rows (one per segment) sum like the engine merge does
    agg = both.to_pandas().groupby("term", as_index=False)["df"].sum()
    truth = SuggestIndex(agg["term"].to_numpy(), agg["df"].to_numpy())
    srv = ShardedServer(str(root), n_shards=2)
    try:
        eng = srv.engine()
        for pfx in ("s", "sp", "q", "a", ""):
            assert eng.suggest(pfx, 8).equals(truth.complete(pfx, 8)), pfx
    finally:
        srv.shutdown()


def test_compaction_preserves_vocab(tmp_path_factory, ray_session):
    """merge_segments over vocab-sidecar segments writes a merged vocab
    (distributed group-sum, re-striped to the merged bucket space), so a
    compacted index keeps suggest/fuzzy/correct working with the SAME
    results as serving the uncompacted segments."""
    from bitfunnel_ray.build.merge import merge_segments

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    root = tmp_path_factory.mktemp("vocab_merge")
    s1, s2 = str(root / "seg-000"), str(root / "seg-001")
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))), s1, VCFG)
    build_index(rd.from_arrow(_lift_documents_batch(docs.slice(250))), s2, VCFG)
    merged = str(root / "merged")
    merge_segments([s1, s2], merged)
    import os

    assert os.path.isdir(f"{merged}/vocab")
    eng_m = SearchEngine(merged)
    eng_u = SearchEngine([s1, s2])
    for pfx in ("s", "sp", "q", ""):
        assert eng_m.suggest(pfx, 10).equals(eng_u.suggest(pfx, 10)), pfx
    assert eng_m.correct("spurk").equals(eng_u.correct("spurk"))
    # bucket column re-striped to the MERGED config's bucket count
    from bitfunnel_ray.functions.hashing import murmur64a

    vt = pq.read_table(f"{merged}/vocab")
    import json

    man = json.load(open(f"{merged}/manifest.json"))
    nb = int(man["config"]["num_buckets"])
    for term, bucket in zip(
        vt["term"].to_pylist()[:20],
        vt["bucket"].to_numpy(zero_copy_only=False)[:20],
    ):
        assert murmur64a(term) % nb == bucket


def test_mixed_vocab_segments_raise(tmp_path_factory, ray_session):
    """A root mixing sidecar and sidecar-less segments must raise loudly
    on suggest/fuzzy — silently partial vocabularies are worse than an
    error (review finding r5)."""
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    root = tmp_path_factory.mktemp("vocab_mixed")
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(0, 250))),
        str(root / "seg-000"), VCFG,
    )
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(250))),
        str(root / "seg-001"), CFG,  # no sidecar
    )
    eng = SearchEngine(str(root))
    with pytest.raises(RuntimeError, match="without a vocab sidecar"):
        eng.suggest("sp", 5)
    with pytest.raises((RuntimeError, ValueError)):
        eng.search("spark~1", k=5)
    # explicit install still works and wins over the broken sidecar state
    eng.set_suggest_vocabulary(np.array(["ok"]), np.array([3]))
    assert eng.suggest("o", 5)["term"].to_pylist() == ["ok"]


@pytest.fixture(scope="module")
def nrt_vocab(tmp_path_factory, ray_session):
    """Segment 1 from the test corpus; segment 2 adds docs with a term
    that exists NOWHERE in segment 1 ('zyzzogeton')."""
    root = tmp_path_factory.mktemp("vocab_nrt")
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    build_index(
        rd.from_arrow(_lift_documents_batch(docs.slice(0, 400))),
        str(root / "seg-000"), VCFG,
    )
    return str(root), docs


def _grow_with_new_term(root, docs):
    import os

    import pyarrow as pa

    s2 = f"{root}/seg-001"
    if not os.path.exists(os.path.join(s2, "manifest.json")):
        tail = _lift_documents_batch(docs.slice(400))
        texts = [
            (t or "") + " zyzzogeton" for t in tail["text"].to_pylist()
        ]
        tail = tail.set_column(
            tail.column_names.index("text"), "text", pa.array(texts, pa.string())
        )
        build_index(rd.from_arrow(tail), s2, VCFG)
    return s2


def test_local_refresh_updates_vocab(nrt_vocab):
    root, docs = nrt_vocab
    eng = SearchEngine(root)
    assert len(eng.suggest("zyzz", 5)) == 0
    assert len(eng.search("zyzzogeton~1", k=5)) == 0
    _grow_with_new_term(root, docs)
    assert eng.refresh() == 1
    got = eng.suggest("zyzz", 5)
    assert got["term"].to_pylist() == ["zyzzogeton"]
    assert got["df"].to_pylist() == [100]  # 500 - 400 docs grew the term
    assert len(eng.search("zyzzogeton~1", k=5)) > 0  # fuzzy sees it too
    # hand-installed vocabularies are NOT clobbered by refresh: set_* is
    # the public install API and must survive NRT segment growth
    eng2 = SearchEngine(root)
    eng2.set_suggest_vocabulary(np.array(["custom"]), np.array([1]))
    eng2.segments = eng2.segments[:1]  # make seg-001 look new again
    eng2.refresh()
    assert eng2.suggest("cust", 5)["term"].to_pylist() == ["custom"]


def test_sharded_refresh_updates_vocab(nrt_vocab, tmp_path_factory, ray_session):
    """A term that exists only in a post-refresh segment becomes
    completable and fuzzy-matchable on the SHARDED front after
    srv.refresh() — the actor-side vocab stripes re-merge in place."""
    import os

    from bitfunnel_ray.query.sharded import ShardedServer

    root, docs = nrt_vocab
    s2 = _grow_with_new_term(root, docs)
    # staged root: segment 2 appears only after the server is up
    root2 = str(tmp_path_factory.mktemp("vocab_nrt_sharded"))
    os.symlink(f"{root}/seg-000", f"{root2}/seg-000")
    srv = ShardedServer(root2, n_shards=2)
    try:
        eng = srv.engine()
        assert len(eng.suggest("zyzz", 5)) == 0
        os.symlink(s2, f"{root2}/seg-001")
        assert srv.refresh() == 1
        eng = srv.engine()  # fronts are cheap snapshots (see refresh doc)
        got = eng.suggest("zyzz", 5)
        assert got["term"].to_pylist() == ["zyzzogeton"]
        local = SearchEngine(root2)
        a = eng.search("zyzzogeton~1", k=10)
        b = local.search("zyzzogeton~1", k=10)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    finally:
        srv.shutdown()
