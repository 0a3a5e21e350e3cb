"""Doc-sharded serving: segment-partitioned shard actors + two-phase
global-stats scoring.

The complement to term-sharded serving (``query/sharded.py``).  Term
sharding splits the DICTIONARY (each actor holds 1/S of every posting
list's vocabulary range) — right when the index outgrows one host's
memory.  Doc sharding splits the CORPUS (each actor holds ALL terms for
1/S of the documents) — the reference's own partitioning axis
(ShardDefinition routes documents to shards by posting count,
src/Common/Configuration/src/ShardDefinition.cpp:160-217; queries run
over every shard's slices, src/Plan/src/QueryRunner.cpp) and the shape
that minimizes per-query fan-in when queries are selective: each shard
answers the whole query locally and returns only its top-k.

The classic distributed-IR correctness problem: BM25 idf needs the
CORPUS-WIDE document frequency, but a doc shard only knows its local df.
This server runs the standard two-phase protocol:

1. stats round — every shard reports local df per scoring term (one
   tiny RPC per shard); the front sums them into global df.
2. scoring round — every shard runs the full match + score with the
   global (df, n_docs, avgdl) injected (``QueryAlgebra.df_override``)
   and returns its local top-k; the front merges on (score desc,
   doc_id asc) and cuts to k.

Because a document lives in exactly one shard, its score is computed in
one place with the same canonical accumulation order and the same global
constants as a single-process engine — results are BIT-IDENTICAL to
``SearchEngine`` over the union of segments (pytest-proven), unlike
naive local-idf federation.  NOT/complement stays shard-local (each
shard complements within its own doc set; the union is the global
complement).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from bitfunnel_ray.build import segment as seglib


@ray.remote(max_concurrency=4)
class DocShardActor:
    """One doc shard: a full local engine over a SUBSET of segments."""

    def __init__(self, seg_dirs: "list[str]"):
        from bitfunnel_ray.query.engine import SearchEngine

        self.engine = SearchEngine(seg_dirs, load_urls=False)

    def corpus_stats(self) -> "tuple[int, int]":
        return self.engine.n_docs, int(round(self.engine.avgdl * self.engine.n_docs))

    def scoring_pairs(self, query: str) -> "list[tuple[int, int]]":
        node = self.engine._parse_rewritten(query)
        return [(int(h), int(g)) for h, g in self.engine.scoring_terms(node)]

    def term_stats(self, pairs: "list[tuple[int, int]]") -> "list[int]":
        """Local df per (term_hash, gram)."""
        return [int(self.engine.postings(h, g).df) for h, g in pairs]

    def match_count(self, query: str) -> int:
        return self.engine.match_count(query)

    def score_bound(self, query: str, df_map, n_docs: int, avgdl: float) -> float:
        """Upper bound on any LOCAL document's score for ``query`` under
        GLOBAL statistics — the shard-granularity analog of a block-max
        bound (Broder 2003 / Ding & Suel 2011 safe-UB contract, lifted
        from block to shard).  Computed entirely from the dictionary's
        per-block ``max_tfn`` metadata: no posting list is decoded, so a
        shard that ends up skipped never touches payload bytes.

        Safe because stored max_tfn was computed with the segment's own
        avgdl and tfn is increasing in avgdl: serving avgdl below the
        build avgdl only shrinks true tfn, and above it the bound is
        inflated by the same monotone ratio the term-sharded server uses
        (query/sharded.py postings_many)."""
        eng = self.engine
        node = eng._parse_rewritten(query)
        boosts = eng.scoring_boosts(node)
        dfm = {(int(h), int(g)): int(v) for (h, g), v in df_map.items()}
        k1 = eng.k1
        total = 0.0
        for h, g in eng.scoring_terms(node):
            best = 0.0
            local_df = 0
            for s in eng.segments:
                rows = s.chunk_rows(h, g)
                if not rows:
                    continue
                local_df = 1  # presence only; global df comes from df_map
                infl = max(1.0, avgdl / s.avgdl) if s.avgdl > 0 else 1.0
                for _ld, mt in s.block_meta_rows(rows):
                    if len(mt):
                        best = max(best, float(mt.max()) * infl)
            if not local_df or best == 0.0:
                continue
            df = dfm.get((int(h), int(g)), 0)
            if df <= 0:
                continue
            idf = float(np.log((n_docs - df + 0.5) / (df + 0.5) + 1.0))
            mult = boosts.get((h, g), 1.0)
            total += idf * (k1 + 1.0) * best * mult
        return total

    def scoring_pairs_many(self, queries: "list[str]") -> "list[list[tuple[int, int]]]":
        return [self.scoring_pairs(q) for q in queries]

    def term_stats_many(self, pairs: "list[tuple[int, int]]") -> "list[int]":
        return self.term_stats(pairs)

    def search_topk_many(
        self,
        queries: "list[str]",
        k: int,
        df_map: "dict[tuple[int, int], int]",
        n_docs: int,
        avgdl: float,
    ) -> "list[tuple[np.ndarray, np.ndarray]]":
        return [self.search_topk(q, k, df_map, n_docs, avgdl) for q in queries]

    def search_topk(
        self,
        query: str,
        k: int,
        df_map: "dict[tuple[int, int], int]",
        n_docs: int,
        avgdl: float,
    ) -> "tuple[np.ndarray, np.ndarray]":
        """Local top-k under GLOBAL statistics (returns doc_ids, scores)."""
        eng = self.engine
        old = (eng.n_docs, eng.avgdl, eng.df_override)
        try:
            eng.n_docs, eng.avgdl = int(n_docs), float(avgdl)
            eng.df_override = {(int(h), int(g)): int(v) for (h, g), v in df_map.items()}
            t = eng.search(query, k=k)
            return (
                t["doc_id"].to_numpy(zero_copy_only=False),
                t["score"].to_numpy(zero_copy_only=False),
            )
        finally:
            eng.n_docs, eng.avgdl, eng.df_override = old

    def search_topk_sorted(
        self,
        query: str,
        k: int,
        df_map: "dict[tuple[int, int], int]",
        n_docs: int,
        avgdl: float,
        sort_by: "tuple[str, str]",
    ) -> "tuple[np.ndarray, np.ndarray, np.ndarray]":
        """Local sort-by-field top-k under GLOBAL statistics.  Returns
        (doc_ids, scores, keys) — keys are the RAW doc-values (NaN for
        null) so the front can merge shards in the same total order the
        local engine uses (key direction, nulls last, doc_id asc)."""
        eng = self.engine
        old = (eng.n_docs, eng.avgdl, eng.df_override)
        try:
            eng.n_docs, eng.avgdl = int(n_docs), float(avgdl)
            eng.df_override = {(int(h), int(g)): int(v) for (h, g), v in df_map.items()}
            t = eng.search(query, k=k, sort_by=sort_by)
            doc_ids = t["doc_id"].to_numpy(zero_copy_only=False)
            keys = eng.docvalues_for(doc_ids.astype(np.uint64), sort_by[0])
            return (doc_ids, t["score"].to_numpy(zero_copy_only=False), keys)
        finally:
            eng.n_docs, eng.avgdl, eng.df_override = old

    # --- aggregation partials (facets / histograms / field stats) --------

    def match_docs(self, query: str) -> np.ndarray:
        """Sorted local match ids (boolean eval only — no global stats
        needed, matching is score-free).  Parses with ``parse_query``,
        exactly like the local aggs in query/aggs.py and query/facets.py,
        so shard partials and the single-process reference path see the
        same AST (a ``_parse_rewritten`` here would diverge on fuzzy
        queries, which need the serving vocabulary)."""
        from bitfunnel_ray.query.parser import parse_query

        eng = self.engine
        return np.sort(eng.eval(parse_query(query, eng.stream_map)).astype(np.int64))

    def agg_histogram(
        self, query: str, interval_s: int, col: str, origin_s: int
    ) -> pa.Table:
        """Local date_histogram partial — per-shard buckets merge by
        summing counts (doc sets are disjoint)."""
        from bitfunnel_ray.query.aggs import date_histogram

        return date_histogram(
            self.engine, query, interval_s=interval_s, col=col, origin_s=origin_s
        )

    def agg_field_partials(self, query: str, col: str) -> "tuple[int, float, float, float]":
        """(n, min, max, sum) of the doc-values column over the local
        match set, nulls excluded — the mergeable form of the ES
        ``stats`` aggregation."""
        from bitfunnel_ray.query.parser import parse_query

        eng = self.engine
        matches = eng.eval(parse_query(query, eng.stream_map))
        v = eng.docvalues_for(matches, col)
        v = v[~np.isnan(v)]
        if not len(v):
            return 0, float("inf"), float("-inf"), 0.0
        return int(len(v)), float(v.min()), float(v.max()), float(np.sum(v))

    def agg_field_values(self, query: str, col: str) -> np.ndarray:
        """Matched non-null doc-values (for exact percentiles: the front
        concatenates shard values and takes one global quantile — ships
        O(local matches) float64, same order as a local docvalues read)."""
        from bitfunnel_ray.query.parser import parse_query

        eng = self.engine
        matches = eng.eval(parse_query(query, eng.stream_map))
        v = eng.docvalues_for(matches, col)
        return v[~np.isnan(v)]

    # --- vocabulary services (autocomplete + fuzzy expansion) ------------

    def suggest_range(self, prefix: str, cap: int = 4096):
        """This shard's FULL prefix-matching (terms, dfs) slice (df-desc
        capped at ``cap``), or None without a vocab sidecar.  Doc shards
        hold PARTIAL dfs (a term's docs span shards), so the front must
        sum per term before the top-k cut — hence a range, not a top-k.
        Raises (via the engine's sidecar loader) when only SOME of this
        shard's segments carry a sidecar — a partial vocabulary would be
        silently wrong.  Fuzzy queries need no counterpart RPC: each
        shard's engine expands ``term~d`` against its own sidecar
        vocabulary during scoring, and ``_stats_round`` unions the
        resulting scoring pairs across shards."""
        eng = self.engine
        if eng.suggest_index is None:
            eng._materialize_vocab()  # lazy sidecar load; no-op without one
        si = eng.suggest_index
        if si is None:
            return None
        terms, dfs = si.prefix_range(prefix, cap)
        return (terms.tolist(), dfs.tolist())

    def correct_candidates(self, token: str, max_dist: int = 2):
        """Did-you-mean candidates from this shard's engine vocabulary as
        (terms, dfs, dists) lists — dfs are LOCAL (this shard's docs);
        the front sums them per term for the exact global ranking.  None
        without a vocab sidecar."""
        c = self.engine.correct_candidates(token, int(max_dist))
        if c is None:
            return None
        return (
            [t for t, _df, _d in c],
            [df for _t, df, _d in c],
            [d for _t, _df, d in c],
        )


class DocShardedServer:
    """Segment-partitioned serving with exact global BM25.

    ``index_dirs``: any index locator (segment dir, waves.json root,
    seg-*/ root, or list); segments are dealt round-robin across
    ``n_shards`` actors (capped at the segment count — the doc-sharding
    unit is the segment, whose doc ranges are disjoint by construction).
    """

    def __init__(
        self,
        index_dirs,
        n_shards: int = 4,
        num_cpus_per_shard: float = 1.0,
    ):
        segs = seglib.resolve_segment_dirs(index_dirs)
        self.index_dirs = segs  # fetch() opens docstore sidecars here
        self.n_shards = max(1, min(int(n_shards), len(segs)))
        groups = [segs[i :: self.n_shards] for i in range(self.n_shards)]
        self.shards = [
            DocShardActor.options(
                num_cpus=num_cpus_per_shard, scheduling_strategy="SPREAD"
            ).remote(g)
            for g in groups
        ]
        stats = ray.get([s.corpus_stats.remote() for s in self.shards])
        self.n_docs = sum(n for n, _ in stats)
        self.avgdl = (
            sum(s for _, s in stats) / self.n_docs if self.n_docs else 1.0
        )

    def _stats_round(self, query: str) -> "dict[tuple[int, int], int]":
        # phase 1: global df for the query's scoring terms.  The pair set
        # is the UNION across shards, not shard 0's alone: with per-shard
        # vocab sidecars a fuzzy term's expansion is vocabulary-dependent,
        # and a member that exists only in another shard's docs must still
        # get a global-df entry (its score contribution there needs it).
        # For plain queries every shard derives the identical set (the
        # parse is config-determined) and the union is a no-op.
        per_shard_pairs = ray.get(
            [s.scoring_pairs.remote(query) for s in self.shards]
        )
        pairs = sorted({p for sp in per_shard_pairs for p in sp})
        per_shard = ray.get([s.term_stats.remote(pairs) for s in self.shards])
        return {
            p: sum(shard_dfs[i] for shard_dfs in per_shard)
            for i, p in enumerate(pairs)
        }

    def search(
        self,
        query: str,
        k: int = 10,
        sort_by: "tuple[str, str] | None" = None,
    ) -> pa.Table:
        df_map = self._stats_round(query)
        if sort_by is not None:
            return self._search_sorted(query, k, df_map, sort_by)
        # phase 2: local top-k under global stats, merged deterministically
        parts = ray.get(
            [
                s.search_topk.remote(query, k, df_map, self.n_docs, self.avgdl)
                for s in self.shards
            ]
        )
        doc_ids = np.concatenate([d for d, _ in parts]) if parts else np.empty(0, np.uint64)
        scores = np.concatenate([s for _, s in parts]) if parts else np.empty(0, np.float64)
        order = np.lexsort((doc_ids, -scores))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.uint32)),
                "doc_id": pa.array(doc_ids[order], pa.uint64()),
                "score": pa.array(scores[order], pa.float64()),
            }
        )

    def _search_sorted(
        self,
        query: str,
        k: int,
        df_map: "dict[tuple[int, int], int]",
        sort_by: "tuple[str, str]",
    ) -> pa.Table:
        """Sort-by-field: per-shard sorted top-k merged on the raw key in
        the engine's total order (direction, nulls last, doc_id asc) —
        the global top-k equals the top-k of per-shard top-ks because a
        doc lives in exactly one shard.  Bit-identical to the local
        engine's ``search(sort_by=...)`` (pytest)."""
        col, direction = sort_by
        if direction not in ("asc", "desc"):
            raise ValueError(f"sort_by direction {direction!r}")
        parts = ray.get(
            [
                s.search_topk_sorted.remote(
                    query, k, df_map, self.n_docs, self.avgdl, sort_by
                )
                for s in self.shards
            ]
        )
        doc_ids = np.concatenate([d for d, _, _ in parts]) if parts else np.empty(0, np.uint64)
        scores = np.concatenate([s for _, s, _ in parts]) if parts else np.empty(0, np.float64)
        keys = np.concatenate([v for _, _, v in parts]) if parts else np.empty(0, np.float64)
        if direction == "desc":
            keys = -keys
        keys = np.where(np.isnan(keys), np.inf, keys)  # nulls last, as local
        order = np.lexsort((doc_ids, keys))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.uint32)),
                "doc_id": pa.array(doc_ids[order], pa.uint64()),
                "score": pa.array(scores[order], pa.float64()),
            }
        )

    # --- serving aggregations (parity with the term-sharded front) -------

    _docstore = None

    def fetch(self, doc_ids, fields: "list[str] | None" = None) -> pa.Table:
        """Stored-field rows (ES _source analog): docstore sidecars live
        on the shared filesystem beside the segments, so the front does
        the row-group-pruned point lookups directly — no shard RPC (same
        shape as the term-sharded front's fetch)."""
        if self._docstore is None:
            from bitfunnel_ray.build.docstore import DocStore

            self._docstore = DocStore(self.index_dirs)
        return self._docstore.fetch(doc_ids, fields)

    def date_histogram(
        self,
        query: str,
        interval_s: int = 86400,
        col: str = "warc_ts_s",
        origin_s: int = 0,
    ) -> pa.Table:
        """Per-shard histogram partials summed per bucket (doc sets are
        disjoint, so local counts add exactly)."""
        parts = ray.get(
            [
                s.agg_histogram.remote(query, interval_s, col, origin_s)
                for s in self.shards
            ]
        )
        nonempty = [t for t in parts if len(t)]
        merged = pa.concat_tables(nonempty) if nonempty else None
        if merged is None or not len(merged):
            return pa.table(
                {
                    "bucket_start_s": pa.array([], pa.int64()),
                    "n_docs": pa.array([], pa.int64()),
                }
            )
        out = merged.group_by(["bucket_start_s"]).aggregate([("n_docs", "sum")])
        out = out.rename_columns(["bucket_start_s", "n_docs"])
        return out.set_column(
            1, "n_docs", out["n_docs"].cast(pa.int64())
        ).sort_by([("bucket_start_s", "ascending")])

    def field_stats(self, query: str, col: str = "warc_ts_s") -> pa.Table:
        """Mergeable (n, min, max, sum) partials per shard; avg = sum/n
        at the front.  Exact for integer-valued doc-values columns (sums
        stay below 2^53, so float64 addition is lossless in any order)."""
        parts = ray.get(
            [s.agg_field_partials.remote(query, col) for s in self.shards]
        )
        n = sum(p[0] for p in parts)
        if n == 0:
            return pa.table(
                {
                    "n_docs": pa.array([0], pa.int64()),
                    "min_v": pa.array([None], pa.float64()),
                    "max_v": pa.array([None], pa.float64()),
                    "avg_v": pa.array([None], pa.float64()),
                }
            )
        return pa.table(
            {
                "n_docs": pa.array([n], pa.int64()),
                "min_v": pa.array([min(p[1] for p in parts if p[0])], pa.float64()),
                "max_v": pa.array([max(p[2] for p in parts if p[0])], pa.float64()),
                "avg_v": pa.array([sum(p[3] for p in parts) / n], pa.float64()),
            }
        )

    def field_percentiles(
        self,
        query: str,
        col: str = "warc_ts_s",
        qs: "tuple[float, ...]" = (0.25, 0.5, 0.75),
    ) -> pa.Table:
        """Exact percentiles: shards return their matched values, the
        front takes one global quantile (quantile is order-insensitive,
        so this is bit-identical to the local engine's)."""
        parts = ray.get(
            [s.agg_field_values.remote(query, col) for s in self.shards]
        )
        v = np.concatenate(parts) if parts else np.empty(0, np.float64)
        out = (
            np.quantile(v, qs, method="linear")
            if len(v)
            else np.full(len(qs), np.nan)
        )
        return pa.table(
            {
                "q": pa.array(np.asarray(qs, np.float64), pa.float64()),
                "value": pa.array(out, pa.float64()),
            }
        )

    def facet_counts(
        self,
        meta,
        query: str,
        facet_cols: "tuple[str, ...]" = ("lang", "source"),
    ) -> pa.Table:
        """Facet counts over the global match set: per-shard match ids
        gathered (disjoint, so concatenate+sort is the exact union), then
        the shared broadcast-partial reduce from query/facets.py."""
        from bitfunnel_ray.query.facets import facet_counts_for_matches

        parts = ray.get([s.match_docs.remote(query) for s in self.shards])
        match = (
            np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
        )
        return facet_counts_for_matches(match, meta, facet_cols)

    def match_count(self, query: str) -> int:
        """Sum of shard-local match counts (doc sets are disjoint)."""
        return sum(ray.get([s.match_count.remote(query) for s in self.shards]))

    def suggest(self, prefix: str, k: int = 10, cap: int = 4096) -> pa.Table:
        """Top-k prefix completions over the doc-sharded corpus: every
        shard returns its full prefix range (partial dfs — its docs
        only), the front SUMS df per term and cuts to k — exact global
        ranking because a document lives in exactly one shard, as long
        as no shard's range hit ``cap`` (raise it for very short
        prefixes over huge vocabularies).  Needs segments built with
        EngineConfig.extra['vocab_sidecar']; raises if none carry one."""
        from bitfunnel_ray.ops.suggest import merge_suggest_partials

        parts = ray.get(
            [s.suggest_range.remote(prefix, int(cap)) for s in self.shards]
        )
        if all(p is None for p in parts):
            raise RuntimeError(
                "no vocab sidecar in any shard's segments — build with "
                "EngineConfig.extra['vocab_sidecar']=True (cli build --vocab)"
            )
        if any(p is None for p in parts):
            raise RuntimeError(
                "some doc shards have no vocab sidecar — their terms would "
                "be silently missing from completions; rebuild those "
                "segments with vocab_sidecar (cli build --vocab)"
            )
        return self._merge_suggest(parts, k)

    def _merge_suggest(self, parts, k):
        from bitfunnel_ray.ops.suggest import merge_suggest_partials

        return merge_suggest_partials(
            [
                None
                if p is None
                else (np.asarray(p[0], dtype=str), np.asarray(p[1], np.int64))
                for p in parts
            ],
            k,
        )

    def correct(self, query: str, max_dist: int = 2) -> pa.Table:
        """Serve-time "did you mean" over the doc-sharded corpus: per
        out-of-vocabulary plain token the best replacement by (edit
        distance asc, GLOBAL df desc, term asc) — each shard matches its
        local vocabulary, the front sums partial dfs per candidate term
        (a document lives in exactly one shard, so the sum is exact).
        Returns (token, suggestion, dist, df) rows; same ranking contract
        as the offline ``ops/spell.correct_terms`` and the local
        ``SearchEngine.correct``."""
        from bitfunnel_ray.ops.spell import (
            merge_candidate_partials,
            serve_correct,
        )

        def cand_fn(token: str, d: int):
            parts = ray.get(
                [s.correct_candidates.remote(token, int(d)) for s in self.shards]
            )
            if all(p is None for p in parts):
                raise RuntimeError(
                    "no vocab sidecar in any shard's segments — build with "
                    "EngineConfig.extra['vocab_sidecar']=True (cli build "
                    "--vocab)"
                )
            if any(p is None for p in parts):
                # same mixed-state contract as suggest(): partial dfs
                # would mark in-vocabulary tokens as misspelled (their
                # dist-0 candidate may live only in a vocab-less shard)
                raise RuntimeError(
                    "some doc shards have no vocab sidecar — corrections "
                    "would be silently wrong; rebuild those segments with "
                    "vocab_sidecar (cli build --vocab)"
                )
            return merge_candidate_partials(parts)

        return serve_correct(query, cand_fn, int(max_dist))

    def search_selective(self, query: str, k: int = 10, wave: int = 2) -> pa.Table:
        """Exact top-k probing as FEW shards as the scores allow — the
        selective-search / shard-selection discipline (Taily: Aly, Hiemstra
        & Demeester 2013; CORI: Callan et al. 1995), but with SAFE upper
        bounds instead of fitted score models, so the result is
        bit-identical to ``search()`` (pytest-proven), never approximate.

        Protocol: after the usual stats round, every shard returns a
        dictionary-metadata-only score upper bound (``score_bound`` — no
        posting decode).  Shards are probed in descending-bound waves of
        ``wave``; once k results are held, a shard whose bound is strictly
        below the current k-th score cannot contribute (ties keep probing:
        an equal-score smaller doc_id would still displace) and every
        shard after it in bound order is skipped.  On a 256-node corpus a
        selective query touches the few shards that can matter instead of
        fanning to all of them; ``self.last_shards_probed`` records the
        count for observability."""
        df_map = self._stats_round(query)
        bounds = ray.get(
            [
                s.score_bound.remote(query, df_map, self.n_docs, self.avgdl)
                for s in self.shards
            ]
        )
        order = sorted(range(len(self.shards)), key=lambda i: (-bounds[i], i))
        doc_parts, score_parts = [], []
        probed = 0
        i = 0
        while i < len(order):
            # current k-th score (the displacement threshold), if k held
            if doc_parts:
                all_s = np.concatenate(score_parts)
                if len(all_s) >= k:
                    kth = np.partition(all_s, -k)[-k]
                    # every remaining shard has bound <= bounds[order[i]]
                    if bounds[order[i]] < kth:
                        break
            batch = order[i : i + max(1, int(wave))]
            i += len(batch)
            probed += len(batch)
            parts = ray.get(
                [
                    self.shards[j].search_topk.remote(
                        query, k, df_map, self.n_docs, self.avgdl
                    )
                    for j in batch
                ]
            )
            for d, s in parts:
                if len(d):
                    doc_parts.append(d)
                    score_parts.append(s)
        self.last_shards_probed = probed
        doc_ids = (
            np.concatenate(doc_parts) if doc_parts else np.empty(0, np.uint64)
        )
        scores = (
            np.concatenate(score_parts) if score_parts else np.empty(0, np.float64)
        )
        order_f = np.lexsort((doc_ids, -scores))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order_f) + 1, dtype=np.uint32)),
                "doc_id": pa.array(doc_ids[order_f], pa.uint64()),
                "score": pa.array(scores[order_f], pa.float64()),
            }
        )

    def run(
        self,
        queries: "ray.data.Dataset | pa.Table",
        k: int = 10,
        concurrency: int = 2,
        batch_size: int = 64,
        num_cpus_per_front: float = 0.5,
    ):
        """Query-log serving: front-end actors in ``map_batches`` run the
        two-phase protocol PER BATCH — one scoring-pairs RPC, one
        term-stats RPC per shard for the batch's UNION of terms, one
        scoring RPC per shard for all queries — so the per-query RPC cost
        amortizes across the batch.  Output: (query_id, rank, doc_id,
        score) rows, identical to per-query ``search()``."""
        import ray.data

        if isinstance(queries, pa.Table):
            from bitfunnel_ray.query.runner import table_to_blocks

            queries = table_to_blocks(queries, batch_size, concurrency)
        return queries.map_batches(
            _DocShardedFront,
            fn_constructor_kwargs={
                "shard_handles": self.shards,
                "k": k,
                "n_docs": self.n_docs,
                "avgdl": self.avgdl,
            },
            batch_format="pyarrow",
            batch_size=batch_size,
            concurrency=concurrency,
            num_cpus=num_cpus_per_front,
        )

    def shutdown(self) -> None:
        for s in self.shards:
            ray.kill(s)
        self.shards = []


class _DocShardedFront:
    """map_batches front-end for ``DocShardedServer.run``: per batch, one
    pairs RPC + one stats RPC per shard (batch-union of terms) + one
    scoring RPC per shard; global df cached across batches."""

    def __init__(self, shard_handles, k: int, n_docs: int, avgdl: float):
        self.shards = shard_handles
        self.k = int(k)
        self.n_docs = int(n_docs)
        self.avgdl = float(avgdl)
        self._df_cache: dict[tuple[int, int], int] = {}

    def __call__(self, batch: pa.Table) -> pa.Table:
        qids = batch["query_id"].to_pylist()
        qs = batch["query"].to_pylist()
        # union of every shard's pair derivation (see _stats_round: fuzzy
        # expansion is vocabulary-dependent per shard)
        per_shard_q_pairs = ray.get(
            [s.scoring_pairs_many.remote(qs) for s in self.shards]
        )
        per_q_pairs = [
            sorted({p for sp in per_shard_q_pairs for p in sp[qi]})
            for qi in range(len(qs))
        ]
        need = sorted(
            {p for pairs in per_q_pairs for p in pairs if p not in self._df_cache}
        )
        if need:
            per_shard = ray.get(
                [s.term_stats_many.remote(need) for s in self.shards]
            )
            for i, p in enumerate(need):
                self._df_cache[p] = sum(d[i] for d in per_shard)
        df_map = {
            p: self._df_cache[p] for pairs in per_q_pairs for p in pairs
        }
        parts = ray.get(
            [
                s.search_topk_many.remote(qs, self.k, df_map, self.n_docs, self.avgdl)
                for s in self.shards
            ]
        )
        out_qid, out_rank, out_doc, out_score = [], [], [], []
        for qi in range(len(qs)):
            doc_ids = np.concatenate([shard[qi][0] for shard in parts])
            scores = np.concatenate([shard[qi][1] for shard in parts])
            order = np.lexsort((doc_ids, -scores))[: self.k]
            out_qid.extend([qids[qi]] * len(order))
            out_rank.extend(range(1, len(order) + 1))
            out_doc.extend(doc_ids[order].tolist())
            out_score.extend(scores[order].tolist())
        return pa.table(
            {
                "query_id": pa.array(out_qid, pa.int64()),
                "rank": pa.array(out_rank, pa.uint32()),
                "doc_id": pa.array(out_doc, pa.uint64()),
                "score": pa.array(out_score, pa.float64()),
            }
        )
