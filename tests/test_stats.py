import duckdb
import pandas as pd

from bitfunnel_ray.build.stats import (
    doc_meta,
    doclen_histogram,
    document_frequency_table,
)
from bitfunnel_ray.config import EngineConfig
from bitfunnel_ray.sources.corpus import corpus_from_documents


def test_df_table_matches_duckdb(sf_tiny):
    cfg = EngineConfig(max_gram=1)
    corpus = corpus_from_documents(sf_tiny)
    got = (
        document_frequency_table(corpus, cfg)
        .to_pandas()
        .sort_values("term")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT term, count(DISTINCT doc_id) AS df, count(*) AS cf
        FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
              FROM read_parquet('{sf_tiny}/documents.parquet'))
        GROUP BY term ORDER BY term
        """
    ).df()
    assert got["term"].tolist() == want["term"].tolist()
    assert got["df"].astype(int).tolist() == want["df"].astype(int).tolist()
    assert got["cf"].astype(int).tolist() == want["cf"].astype(int).tolist()


def test_doclen_histogram_matches_duckdb(sf_tiny):
    corpus = corpus_from_documents(sf_tiny)
    got = (
        doclen_histogram(corpus, EngineConfig(max_gram=1))
        .to_pandas()
        .sort_values("n_postings")
        .reset_index(drop=True)
    )
    want = duckdb.sql(
        f"""
        SELECT n_postings, count(*) AS n_docs FROM (
          SELECT count(DISTINCT term) AS n_postings FROM (
            SELECT doc_id, unnest(string_split(text, ' ')) AS term
            FROM read_parquet('{sf_tiny}/documents.parquet'))
          GROUP BY doc_id)
        GROUP BY n_postings ORDER BY n_postings
        """
    ).df()
    assert got["n_postings"].astype(int).tolist() == want["n_postings"].astype(int).tolist()
    assert got["n_docs"].astype(int).tolist() == want["n_docs"].astype(int).tolist()


def test_doc_meta(sf_tiny):
    corpus = corpus_from_documents(sf_tiny)
    meta = doc_meta(corpus).to_pandas().sort_values("doc_id")
    assert len(meta) == 500
    want = duckdb.sql(
        f"""SELECT doc_id, len(string_split(text,' ')) AS doclen
            FROM read_parquet('{sf_tiny}/documents.parquet') ORDER BY doc_id"""
    ).df()
    assert meta["doclen"].tolist() == want["doclen"].astype(int).tolist()
    assert meta["url"].iloc[0] == "https://example.org/doc/00000000"


def test_top_k_by_matches_full_sort(sf_tiny):
    """top_k_by (map-side prune + small merge) == full sort().limit(k),
    including boundary ties, under the (df desc, term_hash asc) order."""
    from bitfunnel_ray.build.stats import top_k_by

    corpus = corpus_from_documents(sf_tiny)
    ds = document_frequency_table(corpus, EngineConfig(max_gram=1)).select_columns(
        ["term", "df", "term_hash"]
    )
    got = top_k_by(ds, k=10, col="df", tiebreak="term_hash").to_pandas()
    full = (
        document_frequency_table(corpus, EngineConfig(max_gram=1))
        .select_columns(["term", "df", "term_hash"])
        .to_pandas()
        .sort_values(["df", "term_hash"], ascending=[False, True])
        .head(10)
        .reset_index(drop=True)
    )
    assert len(got) == 10
    pd.testing.assert_frame_equal(
        got[["term", "df", "term_hash"]].reset_index(drop=True),
        full[["term", "df", "term_hash"]],
    )
