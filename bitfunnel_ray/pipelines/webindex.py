"""End-to-end web indexing: raw pages → queryable multi-stream index
with a link-derived static rank.

This is the composition a web-scale user actually runs, wired from the
repo's own oracle-checked parts — every stage is the distributed shape
documented in its module:

    pages (doc_id, url, html)
      ├─ robots filter            (ops/urls.filter_url_prefixes, map-only)
      ├─ text extraction          (stages/extract.extract_text, map-only)
      ├─ (href, anchor) extraction(ops/anchors.extract_anchors, map-only)
      │    └─ href → doc_id       (resolve_links: canonicalize both
      │         resolution          sides + ONE distributed hash join)
      ├─ PageRank over the edges  (ops/graph.pagerank — integer
      │    → static-rank parquet    fixed-point, bit-exact)
      ├─ anchor aggregation       (ops/anchors.aggregate_anchor_text,
      │    → corpus join            one exchange + distributed join)
      └─ build_index with streams body=0, anchor=1
           (build/builder — fused spill, salted heads, resumable)

Serving: ``blended_search`` = BM25 over body+anchor × the PageRank
prior (same one-multiply recipe as the ``static_rank_topk`` oracle).

The reference has no crawl-side tooling at all (it ingests
pre-extracted chunks, src/Chunks/src/ChunkReader.cpp) — this module is
the upstream pipeline its users run elsewhere, expressed Ray-Data-first.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _resolve_join_block(t: pa.Table) -> pa.Table:
    """Inner join within one key-partitioned block: side-1 rows (src,
    key) × side-0 rows (dst, key) → (src, dst) for every key match
    (full many-to-many cross product per key).  Vectorized: sort the
    page side by key, locate each link row's match range with two
    searchsorteds, expand with the standard arange-minus-offsets trick."""
    empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
    if len(t) == 0 or "key" not in t.column_names:
        return empty
    side = t["side"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    val = t["val"].to_numpy(zero_copy_only=False)
    lk, lv = key[side == 1], val[side == 1]  # links: key -> src
    rk, rv = key[side == 0], val[side == 0]  # pages: key -> dst
    if not len(lk) or not len(rk):
        return empty
    order = np.argsort(rk, kind="stable")
    rk, rv = rk[order], rv[order]
    lo = np.searchsorted(rk, lk, side="left")
    hi = np.searchsorted(rk, lk, side="right")
    lens = hi - lo
    total = int(lens.sum())
    if total == 0:
        return empty
    flat = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
        + np.repeat(lo, lens)
    )
    return pa.table(
        {
            "src": pa.array(np.repeat(lv, lens), pa.int64()),
            "dst": pa.array(rv[flat], pa.int64()),
        }
    )


def resolve_links(links, pages_urls, *, href_col: str = "href",
                  url_col: str = "url", id_col: str = "doc_id",
                  num_partitions: int | None = None):
    """(src, href) × (doc_id, url) → (src, dst) edges: canonicalize BOTH
    sides with the same recipe (ops/urls), then one co-partitioned inner
    join on the 64-bit hash of the canonical url — the same hash-identity
    space every other exchange in this engine uses (term hashes, content
    hashes; collision odds ~n²/2^64).  Hrefs pointing outside the corpus
    simply don't join (dropped) — exactly what a crawler's frontier/dedup
    layer does with out-of-scope links.

    In-house join rather than ``Dataset.join``: link extraction yields
    EMPTY blocks for linkless page batches, and on this Ray (2.49) empty
    blocks skip upstream schema-changing maps, so a wrong-schema empty
    block reaches the join operator and kills it ("No match for
    FieldRef.Name(curl)"); the block kernel here guards them, and the
    exchange carries fixed-width (id, key, side) rows instead of
    canonical-url strings."""
    from functools import partial as _p

    from bitfunnel_ray.build.builder import tune_hash_shuffle
    from bitfunnel_ray.functions.hashing import hash_terms
    from bitfunnel_ray.ops.urls import canonicalize_url_array

    def tag(t: pa.Table, *, col: str, side: int) -> pa.Table:
        if len(t) == 0 or col not in t.column_names:
            return pa.table(
                {
                    "val": pa.array([], pa.int64()),
                    "key": pa.array([], pa.int64()),
                    "side": pa.array([], pa.int8()),
                }
            )
        curl = canonicalize_url_array(t[col])
        h = hash_terms(np.asarray(curl.to_pylist(), dtype=object))
        return pa.table(
            {
                "val": t[id_col].cast(pa.int64()),
                "key": pa.array(h.view(np.int64), pa.int64()),
                "side": pa.array(np.full(len(t), side, np.int8)),
            }
        )

    both = links.select_columns([id_col, href_col]).map_batches(
        _p(tag, col=href_col, side=1), batch_format="pyarrow"
    ).union(
        pages_urls.select_columns([id_col, url_col]).map_batches(
            _p(tag, col=url_col, side=0), batch_format="pyarrow"
        )
    )
    # always configure the hash-shuffle strategy (keyed repartition
    # needs it), even when the caller pins the partition count
    default_parts = tune_hash_shuffle(both.context)
    n_parts = num_partitions or default_parts
    return both.repartition(num_blocks=n_parts, keys=["key"]).map_batches(
        _resolve_join_block, batch_size=None, batch_format="pyarrow"
    )


def build_web_index(
    pages,
    out_dir: str,
    *,
    cfg=None,
    blocked_prefixes: tuple = (),
    pagerank_iters: int = 3,
):
    """pages Dataset(doc_id, url, html) → index segment at ``out_dir``
    (body + anchor streams) plus ``{out_dir}_rank/`` static-rank parquet.
    Returns (manifest, rank_path)."""
    from bitfunnel_ray.build.builder import build_index
    from bitfunnel_ray.config import EngineConfig
    from bitfunnel_ray.ops.anchors import (
        aggregate_anchor_text,
        anchor_corpus,
        extract_anchors,
    )
    from bitfunnel_ray.ops.graph import pagerank
    from bitfunnel_ray.ops.urls import filter_url_prefixes
    from bitfunnel_ray.stages.extract import extract_text

    if blocked_prefixes:
        pages = filter_url_prefixes(pages, "url", tuple(blocked_prefixes))
    # one materialization point: every downstream arm (text, links,
    # url-resolution right side) reads the filtered pages
    pages = pages.materialize()

    links = extract_anchors(pages, html_col="html", src_col="doc_id")
    edges = resolve_links(
        links, pages.select_columns(["doc_id", "url"])
    ).materialize()

    rank_path = f"{out_dir}_rank"
    pagerank(edges, n_iter=pagerank_iters).write_parquet(rank_path)

    anchors = _resolve_anchor_targets(links, pages)
    anchor_table = aggregate_anchor_text(
        anchors, target_col="doc_id", anchor_col="anchor"
    )

    corpus = extract_text(pages, html_col="html", out_col="text", normalize_ws=True)
    joined = anchor_corpus(corpus, anchor_table)

    cfg = cfg or EngineConfig(
        max_gram=1,
        num_buckets=8,
        streams=(("body", "text", 0), ("anchor", "anchor_text", 1)),
        # the flagship pipeline serves users directly — ship the vocab
        # sidecar so suggest / term~d fuzzy / correct work on every
        # front out of the box (same spill pass, no extra corpus read)
        extra={"vocab_sidecar": True},
    )
    manifest = build_index(joined, out_dir, cfg)
    return manifest, rank_path


def _anchor_join_block(t: pa.Table) -> pa.Table:
    """Inner join within one key-partitioned block: side-1 link rows
    (key, anchor) × side-0 page rows (key, tgt) → (doc_id=tgt, anchor)
    for every key match — the anchor-carrying twin of
    ``_resolve_join_block`` (same empty-block guard)."""
    empty = pa.table(
        {"doc_id": pa.array([], pa.int64()), "anchor": pa.array([], pa.string())}
    )
    if len(t) == 0 or "key" not in t.column_names:
        return empty
    side = t["side"].to_numpy(zero_copy_only=False)
    key = t["key"].to_numpy(zero_copy_only=False)
    is_l = side == 1
    lk = key[is_l]
    la = t["anchor"].combine_chunks().filter(pa.array(is_l))
    rk = key[~is_l]
    rv = t["val"].to_numpy(zero_copy_only=False)[~is_l]
    if not len(lk) or not len(rk):
        return empty
    order = np.argsort(rk, kind="stable")
    rk, rv = rk[order], rv[order]
    lo = np.searchsorted(rk, lk, side="left")
    hi = np.searchsorted(rk, lk, side="right")
    lens = hi - lo
    total = int(lens.sum())
    if total == 0:
        return empty
    flat = (
        np.arange(total, dtype=np.int64)
        - np.repeat(np.cumsum(lens) - lens, lens)
        + np.repeat(lo, lens)
    )
    anchor_idx = pa.array(np.repeat(np.arange(len(lk), dtype=np.int64), lens))
    return pa.table(
        {
            "doc_id": pa.array(rv[flat], pa.int64()),
            "anchor": la.take(anchor_idx),
        }
    )


def _resolve_anchor_targets(links, pages, *, num_partitions: int | None = None):
    """(src, href, anchor) × pages(doc_id, url) → (doc_id=target, anchor):
    same co-partitioned canonical-url-hash join as ``resolve_links``,
    carrying the anchor text (and with the same empty-block immunity —
    see resolve_links' docstring for why ``Dataset.join`` is avoided)."""
    from functools import partial as _p

    from bitfunnel_ray.build.builder import tune_hash_shuffle
    from bitfunnel_ray.functions.hashing import hash_terms
    from bitfunnel_ray.ops.urls import canonicalize_url_array

    def tag_l(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "href" not in t.column_names:
            return _ANCHOR_TAG_SCHEMA.empty_table()
        h = hash_terms(
            np.asarray(canonicalize_url_array(t["href"]).to_pylist(), dtype=object)
        )
        return pa.table(
            {
                "key": pa.array(h.view(np.int64), pa.int64()),
                "side": pa.array(np.ones(len(t), np.int8)),
                "val": pa.array(np.zeros(len(t), np.int64)),
                "anchor": t["anchor"].cast(pa.string()),
            },
            schema=_ANCHOR_TAG_SCHEMA,
        )

    def tag_p(t: pa.Table) -> pa.Table:
        if len(t) == 0 or "url" not in t.column_names:
            return _ANCHOR_TAG_SCHEMA.empty_table()
        h = hash_terms(
            np.asarray(canonicalize_url_array(t["url"]).to_pylist(), dtype=object)
        )
        return pa.table(
            {
                "key": pa.array(h.view(np.int64), pa.int64()),
                "side": pa.array(np.zeros(len(t), np.int8)),
                "val": t["doc_id"].cast(pa.int64()),
                "anchor": pa.array([""] * len(t), pa.string()),
            },
            schema=_ANCHOR_TAG_SCHEMA,
        )

    both = links.select_columns(["href", "anchor"]).map_batches(
        tag_l, batch_format="pyarrow"
    ).union(
        pages.select_columns(["doc_id", "url"]).map_batches(
            tag_p, batch_format="pyarrow"
        )
    )
    default_parts = tune_hash_shuffle(both.context)
    n_parts = num_partitions or default_parts
    return both.repartition(num_blocks=n_parts, keys=["key"]).map_batches(
        _anchor_join_block, batch_size=None, batch_format="pyarrow"
    )


_ANCHOR_TAG_SCHEMA = pa.schema(
    [
        ("key", pa.int64()),
        ("side", pa.int8()),
        ("val", pa.int64()),
        ("anchor", pa.string()),
    ]
)


def load_static_rank(rank_path: str) -> dict:
    """Static-rank parquet → {doc_id: rank} (node-count sized — the
    rank table is O(corpus docs), served from memory like the doc map)."""
    import pyarrow.parquet as pq

    t = pq.read_table(rank_path)
    return dict(zip(t["node"].to_pylist(), t["rank"].to_pylist()))


def blended_search(eng, ranks: dict, query: str, k: int = 10) -> pa.Table:
    """BM25 over the index's streams × the PageRank prior:
    blended = round(bm25, 6) * rank (one IEEE multiply, same recipe the
    static_rank_topk oracle hash-checks).  Docs absent from the rank
    table (no in/out links survived) get the MINIMUM achieved rank as a
    neutral prior — integer fixed-point ranks sit near scale/N (~1e6 for
    a 1M-node graph at scale 1e12), so an earlier default of 1 buried
    orphan pages ~6 orders of magnitude below every linked page instead
    of letting pure-text relevance surface them."""
    t = eng.search(query, k=1_000_000)
    doc = t["doc_id"].to_numpy().astype(np.int64)
    score = np.round(t["score"].to_numpy(), 6)
    floor = min(ranks.values()) if ranks else 1
    prior = np.array([ranks.get(int(d), floor) for d in doc], dtype=np.float64)
    blended = score * prior
    order = np.lexsort((doc, -blended))[:k]
    return pa.table(
        {
            "rank": pa.array(np.arange(1, len(order) + 1), pa.int64()),
            "doc_id": pa.array(doc[order], pa.int64()),
            "blended": pa.array(blended[order], pa.float64()),
        }
    )
