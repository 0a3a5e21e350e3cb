"""Block-max WAND exactness: identical top-k (doc_ids AND bit-identical
scores) to the exhaustive union scorer, across corpora, k values, term
mixes, salted builds and merged segments."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.sources.corpus import corpus_from_documents, make_zipf_corpus

TERM_SETS = [
    ["table"],
    ["spark", "join"],
    ["spark", "join", "merge", "window"],
    ["the", "a", "batch"],
    ["zzznope", "table"],
    ["table", "table", "join"],  # duplicate input terms
]


@pytest.fixture(scope="module")
def engine(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("wand") / "seg")
    build_index(
        corpus_from_documents("/root/testdata/sf0.001"),
        out,
        EngineConfig(max_gram=2, num_buckets=6),
    )
    return SearchEngine(out, load_urls=False)


@pytest.mark.parametrize("k", [1, 3, 10, 100])
def test_wand_equals_exhaustive(engine, k):
    for terms in TERM_SETS:
        a = engine.topk_or(terms, k, use_wand=True)
        b = engine.topk_or(terms, k, use_wand=False)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), (terms, k)
        assert a["score"].to_pylist() == b["score"].to_pylist(), (terms, k)


def test_search_after_pages_stitch(engine):
    """Cursor paging: concatenating pages fetched via search_after equals
    one deep top-k, bit-identically (scores AND ids); a cursor past the
    last result yields an empty page."""
    q = "spark | join | merge"
    full = engine.search(q, k=40)
    pages, cursor, got_rows = [], None, 0
    while got_rows < len(full):
        p = engine.search(q, k=10, after=cursor)
        if len(p) == 0:
            break
        pages.append(p)
        got_rows += len(p)
        cursor = (p["score"][-1].as_py(), p["doc_id"][-1].as_py())
    got = pa.concat_tables(pages)
    n = min(len(full), len(got))
    assert got["doc_id"].to_pylist()[:n] == full["doc_id"].to_pylist()[:n]
    assert got["score"].to_pylist()[:n] == full["score"].to_pylist()[:n]
    # exhausted cursor → empty page
    everything = engine.search(q, k=10**6)
    tail = (everything["score"][-1].as_py(), everything["doc_id"][-1].as_py())
    assert len(engine.search(q, k=10, after=tail)) == 0


@pytest.mark.parametrize("k", [3, 10])
def test_wand_search_after_equals_exhaustive(engine, k):
    """WAND with an after-cursor returns exactly the exhaustive page —
    including score-tie boundaries (cursor placed mid-tie)."""
    for terms in TERM_SETS:
        p1 = engine.topk_or(terms, k, use_wand=False)
        if len(p1) == 0:
            continue
        cursor = (p1["score"][-1].as_py(), int(p1["doc_id"][-1].as_py()))
        a = engine.topk_or(terms, k, use_wand=True, after=cursor)
        b = engine.topk_or(terms, k, use_wand=False, after=cursor)
        assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), (terms, k)
        assert a["score"].to_pylist() == b["score"].to_pylist(), (terms, k)
        # pages never overlap and never regress the order
        assert set(a["doc_id"].to_pylist()).isdisjoint(p1["doc_id"].to_pylist())


def test_wand_on_zipf_corpus_with_salting(tmp_path):
    """Zipf head terms + forced salting: stress ties and block skipping."""
    out = str(tmp_path / "zipf")
    corpus = rd.from_arrow(make_zipf_corpus(800, vocab_size=500))
    build_index(
        corpus, out, EngineConfig(max_gram=1, num_buckets=5, head_df_threshold=50, salt_shift=6)
    )
    eng = SearchEngine(out, load_urls=False)
    for terms in [["t000000"], ["t000000", "t000001", "t000050"], ["t000400", "t000000"]]:
        for k in (5, 20):
            a = eng.topk_or(terms, k, use_wand=True)
            b = eng.topk_or(terms, k, use_wand=False)
            assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist(), (terms, k)
            assert a["score"].to_pylist() == b["score"].to_pylist(), (terms, k)


def test_wand_multi_segment(tmp_path):
    """Interleaved doc-id ranges across segments → metadata fallback path."""
    from bitfunnel_ray.sources.corpus import _lift_documents_batch

    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet")
    # interleave: even ids in one segment, odd in the other
    even = docs.filter(pa.compute.equal(pa.compute.bit_wise_and(docs["doc_id"], 1), 0))
    odd = docs.filter(pa.compute.equal(pa.compute.bit_wise_and(docs["doc_id"], 1), 1))
    cfg = EngineConfig(max_gram=1, num_buckets=4)
    s1, s2 = str(tmp_path / "s1"), str(tmp_path / "s2")
    build_index(rd.from_arrow(_lift_documents_batch(even)), s1, cfg)
    build_index(rd.from_arrow(_lift_documents_batch(odd)), s2, cfg)
    eng = SearchEngine([s1, s2], load_urls=False)
    p = eng.term_postings("table")
    assert p.block_last is None  # interleaved → stored metadata invalidated
    a = eng.topk_or(["table", "join"], 10, use_wand=True)
    b = eng.topk_or(["table", "join"], 10, use_wand=False)
    assert a["doc_id"].to_pylist() == b["doc_id"].to_pylist()
    assert a["score"].to_pylist() == b["score"].to_pylist()


def test_champion_topk_exact_when_t_large(engine):
    """With t >= longest posting list the champion path IS exhaustive:
    identical doc ids and bit-identical scores to the exact engine."""
    terms = ["spark", "join", "merge", "window", "table"]
    exact = engine.topk_or(terms, k=10, use_wand=False)
    approx = engine.topk_or_approx(terms, k=10, t=10**9)
    assert exact["doc_id"].to_pylist() == approx["doc_id"].to_pylist()
    assert exact["score"].to_pylist() == approx["score"].to_pylist()


def test_champion_topk_small_t_scores_exact(engine):
    """With small t the candidate set shrinks, but every RETURNED score
    equals the exhaustive score of that document (no approximation in the
    scoring, only in candidate generation)."""
    import numpy as np

    terms = ["spark", "join", "merge"]
    exact = engine.topk_or(terms, k=500, use_wand=False).to_pandas()
    full = dict(zip(exact.doc_id, exact.score))
    approx = engine.topk_or_approx(terms, k=10, t=16).to_pandas()
    assert len(approx) == 10
    for d, s in zip(approx.doc_id, approx.score):
        assert s == full[int(d)]
    # recall improves monotonically-ish with t; by t=128 the fixture's
    # near-uniform tf distribution (champions' worst case) is covered
    top10 = set(exact.doc_id.head(10))
    o16 = len(set(approx.doc_id) & top10)
    o128 = len(
        set(engine.topk_or_approx(terms, k=10, t=128).to_pandas().doc_id) & top10
    )
    assert o128 >= o16 and o128 >= 8


def test_champion_topk_missing_terms(engine):
    out = engine.topk_or_approx(["zzznope", "spark"], k=5, t=8)
    assert len(out) == 5
    empty = engine.topk_or_approx(["zzznope"], k=5, t=8)
    assert len(empty) == 0
