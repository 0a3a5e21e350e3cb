"""bitfunnel_ray — a Ray-Data-native full-text index build + BM25 query engine.

A from-scratch rebuild of the capabilities of BitFunnel (the SIGIR 2017
signature-based search index, reference at /root/reference) expressed as
idiomatic Ray Data pipelines over Arrow batches:

- corpus ingestion  = ``ray.data.read_parquet`` over Parquet web pages
  (url, warc_ts, html, text, lang)
- tokenize/postings = vectorized ``map_batches`` stages
- statistics        = ``groupby().aggregate()`` (document frequency table,
  document-length histogram — the ``BitFunnel statistics`` analog)
- index build       = postings → bucketed groupby shuffle → per-bucket
  delta+varint posting-list encode with block-max metadata → partitioned
  segment files + manifest (resumable)
- query serving     = actor-pool ``SearchEngine`` doing exact posting-list
  boolean evaluation + BM25 top-k (block-max WAND fast path)

The bit-sliced signature machinery of the reference (RowTables, ranks,
treatments, RankDown matching, NativeJIT) is deliberately replaced by exact
posting lists — see SURVEY.md §7.6.
"""

__version__ = "0.1.0"

from bitfunnel_ray.config import EngineConfig  # noqa: F401
