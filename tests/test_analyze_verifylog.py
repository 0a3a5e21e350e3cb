"""New diagnostics: whole-log verification, per-band storage analysis,
vocabulary growth curve, TermToText sidecar."""

import duckdb
import numpy as np
import pytest

from bitfunnel_ray.build.builder import build_index
from bitfunnel_ray.build.stats import (
    TermToText,
    vocabulary_growth,
    write_term_to_text,
)
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.functions.hashing import murmur64a
from bitfunnel_ray.query.engine import SearchEngine
from bitfunnel_ray.query.verify import verify_log, verify_query
from bitfunnel_ray.sources.corpus import corpus_from_documents


@pytest.fixture(scope="module")
def built(tmp_path_factory, ray_session, sf_tiny):
    out = str(tmp_path_factory.mktemp("avl") / "seg")
    build_index(
        corpus_from_documents(sf_tiny), out, EngineConfig(max_gram=2, num_buckets=4)
    )
    return out


QUERIES = [
    "table join",
    "merge | window",
    "table -join",
    '"batch batch"',
    "-table",
    "zzz_missing",
]


def test_verify_log_all_green(built, sf_tiny, ray_session):
    eng = SearchEngine(built, load_urls=False)
    out = verify_log(corpus_from_documents(sf_tiny), eng, QUERIES).to_pandas()
    assert len(out) == len(QUERIES)
    assert out["ok"].all()
    assert out["fp"].sum() == 0 and out["fn"].sum() == 0
    # the one-pass log verifier must agree with the per-query verifier
    single = verify_query(corpus_from_documents(sf_tiny), eng, QUERIES[0])
    row = out.iloc[0]
    assert (row["expected"], row["tp"]) == (single["expected"], single["tp"])


def test_band_stats_totals(built, ray_session):
    from bitfunnel_ray.build.analyze import segment_band_stats

    bands = segment_band_stats(built).to_pandas()
    assert len(bands) > 1  # real df spread → multiple idf bands
    assert (bands["idf_x10"] >= 0).all() and (bands["idf_x10"] <= 60).all()
    # totals must reconcile with the manifest bucket stats
    from bitfunnel_ray.build import segment as seglib

    man = seglib.load_manifest(built)
    total_postings = sum(int(v["n_postings"]) for v in man["bucket_stats"].values())
    assert int(bands["n_postings"].sum()) == total_postings
    assert (bands["bytes_per_posting"] > 0).all()


def test_vocabulary_growth_matches_duckdb(sf_tiny, ray_session):
    got = vocabulary_growth(
        corpus_from_documents(sf_tiny), EngineConfig(max_gram=1)
    ).to_pandas()
    want = duckdb.sql(
        f"""
        WITH firsts AS (
          SELECT term, min(doc_id) AS first_doc
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
                FROM read_parquet('{sf_tiny}/documents.parquet'))
          GROUP BY term)
        SELECT CAST(first_doc AS BIGINT) AS first_doc,
               CAST(count(*) AS BIGINT) AS new_terms
        FROM firsts GROUP BY first_doc ORDER BY first_doc
        """
    ).df()
    assert got["first_doc"].tolist() == want["first_doc"].tolist()
    assert got["new_terms"].tolist() == want["new_terms"].tolist()
    assert got["cum_terms"].tolist() == want["new_terms"].cumsum().tolist()
    # curve is monotone and ends at the vocabulary size
    assert (np.diff(got["cum_terms"]) > 0).all()


def test_vocabulary_growth_bucketed(sf_tiny, ray_session):
    fine = vocabulary_growth(
        corpus_from_documents(sf_tiny), EngineConfig(max_gram=1), bucket_docs=1
    ).to_pandas()
    coarse = vocabulary_growth(
        corpus_from_documents(sf_tiny), EngineConfig(max_gram=1), bucket_docs=100
    ).to_pandas()
    assert int(coarse["cum_terms"].iloc[-1]) == int(fine["cum_terms"].iloc[-1])
    assert (coarse["first_doc"] % 100 == 0).all()


def test_term_to_text_roundtrip(tmp_path, sf_tiny, ray_session):
    path = str(tmp_path / "termtext")
    write_term_to_text(corpus_from_documents(sf_tiny), path, EngineConfig(max_gram=2))
    ttt = TermToText(path)
    # every unigram hash must resolve back to its text
    assert ttt.lookup(murmur64a("table")) == "table"
    assert ttt.lookup(murmur64a("zzz_not_a_term")) is None
    many = ttt.lookup_many(
        np.array([murmur64a("table"), murmur64a("join"), np.uint64(12345)], dtype=np.uint64)
    )
    assert many[0] == "table" and many[1] == "join" and many[2] is None


def test_treatment_bands_identical_results(built, sf_tiny, tmp_path, ray_session):
    """df-banded block sizes (TermTreatmentFactory analog) change only the
    skip metadata granularity — never any result or score."""
    banded_dir = str(tmp_path / "banded")
    cfg = EngineConfig(
        max_gram=2,
        num_buckets=4,
        treatment_bands=((16, 8), (256, 32), (None, 128)),
    )
    build_index(corpus_from_documents(sf_tiny), banded_dir, cfg)
    a = SearchEngine(built, load_urls=False)
    b = SearchEngine(banded_dir, load_urls=False)
    for q in QUERIES[:5]:
        ra = a.search(q, k=10).to_pandas()
        rb = b.search(q, k=10).to_pandas()
        assert ra["doc_id"].tolist() == rb["doc_id"].tolist(), q
        assert np.allclose(ra["score"], rb["score"]), q
    # banding must actually change the block layout: small-df chunks get
    # finer blocks, so total block count rises vs the flat 128 layout
    import glob

    import pyarrow.parquet as pq

    def total_blocks(d):
        return sum(
            sum(len(x) for x in pq.read_table(f, columns=["last_docs"])["last_docs"].to_pylist())
            for f in glob.glob(f"{d}/dict-*.parquet")
        )

    assert total_blocks(banded_dir) > total_blocks(built)


def test_verify_synthetic(tmp_path, ray_session):
    """Prime-factors closed-form ground truth vs the full build+query path
    (the VerifyOneQuerySynthetic analog): every query shape exact."""
    import ray.data as rd

    from bitfunnel_ray.query.verify import synthetic_ground_truth, verify_synthetic
    from bitfunnel_ray.sources.corpus import make_prime_factors_corpus

    n = 256
    # spot-check the closed-form itself: multiples of 2 in [0, 256)
    assert len(synthetic_ground_truth("2", n)) == 127  # 2,4,...,254
    assert len(synthetic_ground_truth('"2 2"', n)) == 63  # multiples of 4
    out_dir = str(tmp_path / "synth")
    build_index(
        rd.from_arrow(make_prime_factors_corpus(n)),
        out_dir,
        EngineConfig(max_gram=2, num_buckets=4),
    )
    eng = SearchEngine(out_dir, load_urls=False)
    out = verify_synthetic(
        eng, ["2", "2 3", "2 | 3", "-2", '"2 2"', "2 -3", '"3 5"', "7 11"], n
    ).to_pandas()
    assert out["ok"].all(), out.to_string()
