"""Prefix autocomplete (ops/suggest.py): the distributed map-side top-k
and the serve-time binary-search index must agree exactly, and both must
match a hand-computed ranking."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from bitfunnel_ray.build.stats import document_frequency_table
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.ops.suggest import SuggestIndex, suggest_terms
from bitfunnel_ray.sources.corpus import corpus_from_documents

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def dft(ray_session):
    return document_frequency_table(
        corpus_from_documents(SF), EngineConfig(max_gram=1)
    ).materialize()


def _expected(prefix, k=10):
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    df = {}
    for doc_id, text in zip(t["doc_id"].to_pylist(), t["text"].to_pylist()):
        for w in set(text.split()):
            if w.startswith(prefix):
                df[w] = df.get(w, 0) + 1
    rows = sorted(df.items(), key=lambda kv: (-kv[1], kv[0]))[:k]
    return [r[0] for r in rows], [r[1] for r in rows]


def test_suggest_matches_hand_count(dft):
    for prefix in ("s", "sp", "zz", "table"):
        want_t, want_d = _expected(prefix)
        got = suggest_terms(dft, prefix, k=10)
        assert got["term"].to_pylist() == want_t, prefix
        assert got["df"].to_pylist() == want_d, prefix


def test_index_agrees_with_distributed(dft):
    idx = SuggestIndex.from_dft(dft)
    for prefix in ("s", "spa", "j", "nonexistentprefix", ""):
        a = suggest_terms(dft, prefix, k=10)
        b = idx.complete(prefix, k=10)
        assert a.to_pydict() == b.to_pydict(), prefix


def test_index_edge_cases():
    idx = SuggestIndex(
        np.array(["alpha", "alp", "beta", "two words", "alphabet"]),
        np.array([5, 7, 9, 100, 5]),
    )
    out = idx.complete("alp", k=10)
    # df desc, term asc; bigram excluded even with the top df
    assert out["term"].to_pylist() == ["alp", "alpha", "alphabet"]
    assert out["df"].to_pylist() == [7, 5, 5]
    assert len(idx.complete("zzz")) == 0
    # empty prefix ranks the whole unigram vocab
    assert idx.complete("", k=2)["term"].to_pylist() == ["beta", "alp"]


def test_engine_suggest_surface(dft, tmp_path, ray_session):
    """QueryAlgebra.suggest: install the df-table vocabulary once (the
    fuzzy-vocabulary lifecycle), then complete locally; the REPL command
    routes to the same surface."""
    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.cli import repl_execute
    from bitfunnel_ray.query.engine import SearchEngine

    out = str(tmp_path / "seg")
    build_index(
        corpus_from_documents(SF), out, EngineConfig(max_gram=1, num_buckets=2)
    )
    eng = SearchEngine(out, load_urls=False)
    with pytest.raises(RuntimeError, match="suggest vocabulary"):
        eng.suggest("s")
    assert "vocabulary" in repl_execute(eng, "suggest sp")
    t = dft.to_pandas()
    eng.set_suggest_vocabulary(t["term"].to_numpy(), t["df"].to_numpy())
    got = eng.suggest("s", k=10)
    want = suggest_terms(dft, "s", k=10)
    assert got.to_pydict() == want.to_pydict()
    import json

    rows = json.loads(repl_execute(eng, "suggest s"))
    assert rows[0]["term"] == want["term"][0].as_py()
