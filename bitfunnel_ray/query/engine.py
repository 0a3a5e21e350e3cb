"""Exact boolean matching + BM25 top-k over index segments.

This replaces the reference's whole query backend — row plan, rank-down
compiler and bytecode/JIT row-intersection engines (reference:
src/Plan/src/QueryPlanner.cpp:51-117, src/Plan/src/ByteCodeInterpreter.cpp:
163-331, src/Plan/src/NativeCodeGenerator.cpp) — with exact posting-list
set algebra in numpy:

- Unigram  → its posting list (no false positives, unlike the reference's
  probabilistic rows, TermMatchTreeConverter.cpp:182-194);
- Phrase   → AND of all 1..max_gram sliding-window terms — the reference's
  unordered co-occurrence semantics, reproduced exactly
  (TermMatchTreeConverter.cpp:156-179 + ProcessNGramBuffer:216-229);
- AND/OR/NOT → sorted-array intersect/union/difference
  (ByteCodeInterpreter AndRow/Or/Not, :183-276);
- soft delete → tombstone doc_id set subtracted from every match set (the
  DocumentActive row analog, Ingestor.cpp:302-327).

Scoring contract (rank-identity with the pytest oracle, SURVEY.md §7.5):
float64 BM25, contributions of the query's distinct positive terms added
in ascending (gram_size, term_hash) order, ties broken (score desc,
doc_id asc).

One ``SearchEngine`` instance is the actor state for serving (the
ConfigureForServing analog, SimpleIndex.cpp:219-270): dictionaries load
once per actor; queries then run against read-only in-memory state.
"""

from __future__ import annotations

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from bitfunnel_ray.build import segment as seglib
from bitfunnel_ray.build.encode import decode_chunk
from bitfunnel_ray.functions.hashing import murmur64a, ngram_hash
from bitfunnel_ray.query import ast
from bitfunnel_ray.query.parser import parse_query


class _Segment:
    """In-memory dictionary of one segment directory.

    ``buckets`` restricts the load to a subset of dict files — the unit
    of term-sharded serving (each shard actor opens only its buckets;
    see bitfunnel_ray/query/sharded.py)."""

    def __init__(self, seg_dir: str, buckets: "list[int] | None" = None):
        self.dir = seg_dir
        man = seglib.load_manifest(seg_dir)
        if man is None:
            raise FileNotFoundError(f"no manifest in {seg_dir}")
        self.manifest = man
        self.n_docs = int(man["n_docs"])
        self.sum_doclen = int(man["sum_doclen"])
        self.avgdl = float(man["avgdl"])
        cfg = man["config"]
        self.max_gram = int(cfg["max_gram"])
        self.num_buckets = int(cfg.get("num_buckets", 16))
        self.k1, self.b = float(cfg["k1"]), float(cfg["b"])
        self.streams = {name: int(sid) for (name, _col, sid) in cfg.get("streams", [["body", "text", 0]])}
        self.facts = [tuple(f) for f in cfg.get("facts", []) or []]
        if buckets is None:
            files = sorted(glob.glob(os.path.join(seg_dir, "dict-*.parquet")))
        else:
            files = [
                p
                for b in sorted(buckets)
                if os.path.exists(p := seglib.bucket_path(seg_dir, int(b)))
            ]
        tables = [pq.read_table(f) for f in files]
        self.dict = (
            pa.concat_tables(tables) if tables else None
        )
        if self.dict is not None and len(self.dict):
            self.dict = self.dict.combine_chunks()
            self._hash = self.dict["term_hash"].to_numpy()
            self._gram = self.dict["gram_size"].to_numpy()
            self._salt = self.dict["salt"].to_numpy()
            self._np = self.dict["n_postings"].to_numpy()
            self._order = np.lexsort((self._salt, self._gram, self._hash))
            self._h_sorted = self._hash[self._order]
        else:
            self._h_sorted = np.empty(0, dtype=np.uint64)

    def chunk_rows(self, term_hash: int, gram: int) -> list[int]:
        """dict row indices for a term, ascending salt (= ascending
        doc-id range, ranges disjoint by construction)."""
        if not len(self._h_sorted):
            return []
        # NB: the key must be a np.uint64 — a python int scalar is promoted
        # through float64 by searchsorted, which rounds 64-bit hashes and
        # matches neighboring values
        key = np.uint64(term_hash)
        lo = np.searchsorted(self._h_sorted, key, side="left")
        hi = np.searchsorted(self._h_sorted, key, side="right")
        rows = [int(self._order[i]) for i in range(lo, hi) if self._gram[self._order[i]] == gram]
        return rows

    def decode_rows(self, rows: list[int]):
        docs_col = self.dict["docs_payload"]
        tf_col = self.dict["tf_payload"]
        dl_col = self.dict["dl_payload"]
        # codec column absent in pre-treatment segments → all-varint
        codec_col = (
            self.dict["codec"] if "codec" in self.dict.column_names else None
        )
        parts = [
            decode_chunk(
                docs_col[r].as_py(),
                tf_col[r].as_py(),
                dl_col[r].as_py(),
                int(self._np[r]),
                int(codec_col[r].as_py()) if codec_col is not None else 0,
            )
            for r in rows
        ]
        return parts

    def block_meta_rows(self, rows: list[int]):
        """(last_docs, max_tfn) arrays per chunk row (build-time block-max
        metadata, bitfunnel_ray/build/encode.py)."""
        ld_col = self.dict["last_docs"]
        mt_col = self.dict["max_tfn"]
        return [
            (
                np.asarray(ld_col[r].as_py(), dtype=np.uint64),
                np.asarray(mt_col[r].as_py(), dtype=np.float64),
            )
            for r in rows
        ]


class Postings:
    """Merged posting list of one term across segments.

    ``block_last``/``block_max_tfn`` are the build-time block-max skip
    metadata (None when segments interleaved at merge — the WAND path then
    recomputes exact blocks from the decoded list)."""

    __slots__ = ("doc_ids", "tf", "doclen", "df", "block_last", "block_max_tfn")

    def __init__(self, doc_ids, tf, doclen, df, block_last=None, block_max_tfn=None):
        self.doc_ids, self.tf, self.doclen, self.df = doc_ids, tf, doclen, df
        self.block_last, self.block_max_tfn = block_last, block_max_tfn


_EMPTY = Postings(
    np.empty(0, np.uint64), np.empty(0, np.uint64), np.empty(0, np.uint64), 0
)


def merge_chunks(parts, metas) -> Postings:
    """Merge decoded chunks (ascending doc ranges per chunk) + block-max
    metadata into one Postings.  If chunk doc ranges interleave (multi
    segment / head-term salting across shards) the list is re-sorted and
    the block metadata dropped (WAND then recomputes exact blocks)."""
    if not parts:
        return _EMPTY
    docs = np.concatenate([p.doc_ids for p in parts])
    tf = np.concatenate([p.tf for p in parts])
    dl = np.concatenate([p.doclen for p in parts])
    block_last = np.concatenate([m[0] for m in metas])
    block_ub = np.concatenate([m[1] for m in metas])
    if len(parts) > 1 and not np.all(docs[1:] > docs[:-1]):
        order = np.argsort(docs, kind="stable")
        docs, tf, dl = docs[order], tf[order], dl[order]
        block_last = block_ub = None  # interleaved: metadata invalid
    return Postings(docs, tf, dl, len(docs), block_last, block_ub)


class QueryAlgebra:
    """Query-side algebra shared by the single-process ``SearchEngine``
    and the scatter-gather ``ShardedSearchEngine``
    (bitfunnel_ray/query/sharded.py).

    Subclasses provide the storage primitives:
      - ``postings(term_hash, gram) -> Postings``
      - ``_complement(sorted_docs) -> sorted doc ids NOT in the input``
    plus attrs ``n_docs, avgdl, max_gram, k1, b, stream_map, tombstones``
    and optionally ``urls``/``all_docs`` (URL decoration).

    NOT/complement never touches a global doc-id array here — it is a
    single ``_complement`` call, so a sharded engine can anti-join against
    per-shard doc ranges (the DocumentActive-row analog at cluster scale).
    """

    urls = None
    all_docs = None
    # stored hashes of configured FACT terms (IFactSet analog): facts
    # participate in boolean matching but score ZERO — they are rank-0
    # filter rows in the reference, not scored content
    fact_hashes: frozenset = frozenset()
    # per-engine instrumentation: posting rows touched by eval/score — the
    # QueryPipelineStatistics "quadwords read" analog
    # (reference: inc/BitFunnel/Plan/QueryInstrumentation.h:48-174); the
    # runner snapshots the counter around each query to emit a per-query
    # postings_rows column.
    stat_postings_rows = 0

    def postings(self, term_hash: int, gram: int) -> Postings:  # pragma: no cover
        raise NotImplementedError

    def _complement(self, sorted_docs: np.ndarray) -> np.ndarray:  # pragma: no cover
        raise NotImplementedError

    def _range_docs(self, col: str, lo: float, hi: float) -> np.ndarray:  # pragma: no cover
        """Sorted doc ids whose doc-values column is in [lo, hi] (the
        Range query node).  Local engines mask their cached doc-values
        array; sharded engines union per-shard stripe scans."""
        raise NotImplementedError(
            "range queries need a docmeta-backed engine (SearchEngine / "
            "ShardedSearchEngine)"
        )

    def docvalues_for(
        self, sorted_ids: np.ndarray, col: str
    ) -> np.ndarray:  # pragma: no cover
        """float64 doc values aligned to ``sorted_ids`` (NaN = null/absent).
        Local engines read one cached docmeta column; sharded engines
        scatter-gather their per-shard stripes."""
        raise NotImplementedError(
            "doc values need a docmeta-backed engine (SearchEngine / "
            "ShardedSearchEngine)"
        )

    def _docvalue_mask(
        self, matches: np.ndarray, col: str, lo: float, hi: float
    ) -> np.ndarray:
        if not len(matches):
            return np.zeros(0, dtype=bool)
        v = self.docvalues_for(matches, col)
        return (v >= lo) & (v < hi)  # NaN (null) compares False: excluded

    def term_postings(self, text: str, stream: int = 0) -> Postings:
        # general hash = rawHash + streamId (ComputeGeneralHash parity)
        return self.postings((murmur64a(text) + stream) & 0xFFFFFFFFFFFFFFFF, 1)

    # --- fuzzy expansion ---------------------------------------------------
    # the ``term~d`` operator needs the vocabulary TEXT, which posting
    # dictionaries do not store (hashes only) — serving loads it once via
    # set_fuzzy_vocabulary (from the df table / TermToText sidecar), the
    # same lifecycle as the dictionaries themselves
    fuzzy_matcher = None
    # True once a CALLER installed a vocabulary via set_*; sidecar
    # auto-installs never set it, so refresh() can tell the two apart and
    # leave hand-installed vocabularies untouched
    _vocab_user_installed = False

    def set_fuzzy_vocabulary(self, terms) -> None:
        """Install the vocabulary used to expand ``term~d`` fuzzy queries
        (an iterable / Arrow array of term strings; typically the df
        table's ``term`` column or the TermToText sidecar)."""
        from bitfunnel_ray.query.fuzzy import VocabFuzzyMatcher

        self.fuzzy_matcher = VocabFuzzyMatcher(terms)
        self._vocab_user_installed = True

    def _materialize_vocab(self) -> None:
        """Hook: engines with a DEFERRED vocabulary source (the per-
        segment vocab sidecar) load and install it here, on first
        suggest/fuzzy use — never in __init__ (a 10^8-term vocabulary
        costs seconds + GBs; most engines never touch it).  Base class:
        no-op."""

    # --- prefix autocomplete ----------------------------------------------
    # same lifecycle as the fuzzy vocabulary: dictionaries store hashes,
    # not text, so serving installs the (term, df) vocabulary once (df
    # table / TermToText sidecar) and answers keystrokes locally
    suggest_index = None

    def set_suggest_vocabulary(self, terms, dfs) -> None:
        """Install the unigram (term, df) vocabulary behind ``suggest``
        (typically the df table's term/df columns)."""
        from bitfunnel_ray.ops.suggest import SuggestIndex

        self.suggest_index = SuggestIndex(terms, dfs)
        self._vocab_user_installed = True

    def suggest(self, prefix: str, k: int = 10) -> pa.Table:
        """Top-k prefix completions (df desc, term asc) — search-as-you-
        type over the installed vocabulary."""
        if self.suggest_index is None:
            self._materialize_vocab()
        if self.suggest_index is None:
            raise RuntimeError(
                "no suggest vocabulary installed — call "
                "set_suggest_vocabulary(terms, dfs) with the df table / "
                "TermToText sidecar"
            )
        return self.suggest_index.complete(prefix, k)

    # --- "did you mean" (serve-time spelling correction) -------------------
    def correct_candidates(self, token: str, max_dist: int = 2):
        """Vocabulary candidates for one query token as [(term, df,
        dist)] — exact-token included with dist 0 when in-vocabulary, or
        None when no vocabulary is installed/available.  Backs
        ``correct()`` locally; the sharded fronts scatter this per shard
        and sum-merge dfs."""
        if self.fuzzy_matcher is None or self.suggest_index is None:
            self._materialize_vocab()
        if self.fuzzy_matcher is None or self.suggest_index is None:
            return None
        from bitfunnel_ray.ops.spell import make_cand_fn

        si = self.suggest_index
        return make_cand_fn(si.terms, si.dfs, self.fuzzy_matcher)(
            token, int(max_dist)
        )

    def correct(self, query: str, max_dist: int = 2) -> pa.Table:
        """Serve-time "did you mean": per misspelled (out-of-vocabulary)
        plain token, the best vocabulary replacement by (edit distance
        asc, df desc, term asc) — the online twin of the offline
        ``ops/spell.correct_terms`` Dataset op, powered by the same
        vocabulary the suggest/fuzzy surfaces use (vocab sidecar or
        set_* install).  Returns (token, suggestion, dist, df) rows."""
        from bitfunnel_ray.ops.spell import serve_correct

        probe = self.correct_candidates("", 0)
        if probe is None:
            raise RuntimeError(
                "correct() needs a vocabulary — build segments with "
                "vocab_sidecar (cli build --vocab) or install one via "
                "set_suggest_vocabulary + set_fuzzy_vocabulary"
            )
        return serve_correct(query, self.correct_candidates, int(max_dist))

    # --- result cache -------------------------------------------------------
    # bounded LRU over (query, k) for the static-argument search path; a
    # hit skips parse/eval/score entirely.  Engines clear it on refresh()
    # (new segments change results) — the standard serving-tier cache with
    # NRT invalidation.
    _result_cache = None

    def enable_result_cache(self, cap: int = 1024) -> None:
        from bitfunnel_ray.query.sharded import LruCache

        self._result_cache = LruCache(int(cap))

    def _invalidate_result_cache(self) -> None:
        if self._result_cache is not None:
            self.enable_result_cache(self._result_cache.cap)

    def _parse_rewritten(
        self, query: str, synonyms: dict[str, tuple[str, ...]] | None = None
    ) -> "ast.Node":
        """Parse + query rewrites shared by search/match_count/explain:
        synonym expansion first (a synonym member may itself be fuzzy-
        matched only if written that way), then fuzzy expansion against
        the installed vocabulary."""
        node = parse_query(query, self.stream_map)
        if synonyms:
            node = ast.expand_synonyms(node, synonyms)
        if ast.has_fuzzy(node):
            if self.fuzzy_matcher is None:
                self._materialize_vocab()
            if self.fuzzy_matcher is None:
                raise ValueError(
                    "query uses the fuzzy operator (~d) but no vocabulary is "
                    "installed — call set_fuzzy_vocabulary(terms) first"
                )
            node = ast.expand_fuzzy(node, self.fuzzy_matcher)
        return node

    # --- term extraction --------------------------------------------------
    def _phrase_grams(self, tokens: tuple[str, ...], stream: int = 0) -> list[tuple[int, int]]:
        """All 1..max_gram sliding-window (hash, gram) pairs of a phrase —
        exactly the reference's ring-buffer emission
        (TermMatchTreeConverter::ProcessNGramBuffer); stream folded into
        each gram's stored hash."""
        h1 = [murmur64a(t) for t in tokens]
        out = []
        n = len(tokens)
        for i in range(n):
            for g in range(1, min(self.max_gram, n - i) + 1):
                out.append(((ngram_hash(h1[i : i + g]) + stream) & 0xFFFFFFFFFFFFFFFF, g))
        return out

    def query_pairs(self, node: ast.Node) -> "list[tuple[int, int]]":
        """Every (hash, gram) a query's evaluation will touch (positive AND
        negated terms — eval needs both).  This is the PLAN phase's work
        list: the runner resolves these against storage (dict lookup +
        decode, or one batched RPC per shard) before matching."""
        acc: set[tuple[int, int]] = set()

        def walk(n):
            if isinstance(n, ast.Not):
                walk(n.child)
            elif isinstance(n, (ast.And, ast.Or, ast.AtLeast)):
                for c in n.children:
                    walk(c)
            elif isinstance(n, ast.Term):
                acc.add(((murmur64a(n.text) + n.stream) & 0xFFFFFFFFFFFFFFFF, 1))
            elif isinstance(n, ast.Phrase):
                acc.update(self._phrase_grams(n.tokens, n.stream))

        walk(node)
        return sorted(acc)

    def scoring_terms(self, node: ast.Node) -> list[tuple[int, int]]:
        """Distinct positive (hash, gram) terms, ascending (gram, hash) —
        the canonical BM25 accumulation order."""
        acc: set[tuple[int, int]] = set()

        def walk(n: ast.Node, negated: bool):
            if isinstance(n, ast.Not):
                walk(n.child, not negated)
            elif isinstance(n, (ast.And, ast.Or, ast.AtLeast)):
                for c in n.children:
                    walk(c, negated)
            elif isinstance(n, ast.Term):
                if not negated:
                    acc.add(((murmur64a(n.text) + n.stream) & 0xFFFFFFFFFFFFFFFF, 1))
            elif isinstance(n, ast.Phrase):
                if not negated:
                    acc.update(self._phrase_grams(n.tokens, n.stream))

        walk(node, False)
        if self.fact_hashes:
            acc = {p for p in acc if p[0] not in self.fact_hashes}
        return sorted(acc, key=lambda p: (p[1], p[0]))

    def scoring_boosts(self, node: ast.Node) -> dict[tuple[int, int], float]:
        """(hash, gram) → query-time boost for every positive scoring
        term.  A term occurring more than once takes the MAX boost (so
        an unboosted duplicate stays the identity, matching the
        dedupe in ``scoring_terms``); phrase boosts apply to every
        constituent gram.  Empty dict when nothing is boosted — the
        common case costs one AST walk and no score-path work."""
        boosts: dict[tuple[int, int], float] = {}

        def put(key, b):
            if b != 1.0:
                boosts[key] = max(boosts.get(key, 1.0), b)

        def walk(n, negated: bool):
            if isinstance(n, ast.Not):
                walk(n.child, not negated)
            elif isinstance(n, (ast.And, ast.Or, ast.AtLeast)):
                for c in n.children:
                    walk(c, negated)
            elif isinstance(n, ast.Term):
                if not negated:
                    put(((murmur64a(n.text) + n.stream) & 0xFFFFFFFFFFFFFFFF, 1),
                        getattr(n, "boost", 1.0))
            elif isinstance(n, ast.Phrase):
                if not negated:
                    b = getattr(n, "boost", 1.0)
                    for key in self._phrase_grams(n.tokens, n.stream):
                        put(key, b)

        walk(node, False)
        return boosts

    # --- boolean evaluation ----------------------------------------------
    def eval(self, node: ast.Node) -> np.ndarray:
        """Sorted unique doc_id array matching the node."""
        m = self._eval(node)
        if self.tombstones is not None:
            m = np.setdiff1d(m, self.tombstones, assume_unique=True)
        return m

    def _eval(self, node: ast.Node) -> np.ndarray:
        if isinstance(node, ast.Term):
            return self.term_postings(node.text, node.stream).doc_ids
        if isinstance(node, ast.Range):
            return self._range_docs(node.col, node.lo, node.hi)
        if isinstance(node, ast.Phrase):
            grams = self._phrase_grams(node.tokens, node.stream)
            lists = [self.postings(h, g).doc_ids for h, g in grams]
            lists.sort(key=len)
            m = lists[0]
            for d in lists[1:]:
                if not len(m):
                    return m
                m = np.intersect1d(m, d, assume_unique=True)
            return m
        if isinstance(node, ast.And):
            pos = [c for c in node.children if not isinstance(c, ast.Not)]
            neg = [c for c in node.children if isinstance(c, ast.Not)]
            if pos:
                lists = sorted((self._eval(c) for c in pos), key=len)
                m = lists[0]
                for d in lists[1:]:
                    if not len(m):
                        break
                    m = np.intersect1d(m, d, assume_unique=True)
                for c in neg:
                    if not len(m):
                        break
                    m = np.setdiff1d(m, self._eval(c.child), assume_unique=True)
            else:
                # pure-negative conjunction: ONE complement of the union of
                # negated children (never materializes all_docs per child)
                negs = np.empty(0, dtype=np.uint64)
                for c in neg:
                    negs = np.union1d(negs, self._eval(c.child))
                m = self._complement(negs)
            return m
        if isinstance(node, ast.Or):
            m = np.empty(0, dtype=np.uint64)
            for c in node.children:
                d = (
                    self._complement(self._eval(c.child))
                    if isinstance(c, ast.Not)
                    else self._eval(c)
                )
                m = np.union1d(m, d)
            return m
        if isinstance(node, ast.Not):
            return self._complement(self._eval(node.child))
        if isinstance(node, ast.AtLeast):
            # minimum-should-match: each child's eval is unique, so a
            # doc's multiplicity across the concatenation IS its clause
            # count — one unique(return_counts) does the whole group
            lists = [self._eval(c) for c in node.children]
            ids = np.concatenate(lists) if lists else np.empty(0, np.uint64)
            if not len(ids):
                return np.empty(0, dtype=np.uint64)
            u, c = np.unique(ids, return_counts=True)
            return u[c >= node.m]
        raise TypeError(f"unknown node {node!r}")

    # --- scoring ----------------------------------------------------------
    # df_override: {(term_hash, gram): corpus-wide df} — set by
    # doc-sharded serving (query/docsharded.py), where each shard holds
    # only its documents' postings but BM25 idf must use the GLOBAL df
    # (two-phase distributed scoring: stats round, then scoring round).
    df_override: "dict[tuple[int, int], int] | None" = None

    def _df(self, h: int, g: int, p) -> int:
        o = self.df_override
        if o is None:
            return p.df
        return int(o.get((int(h), int(g)), p.df))

    def score(self, node: ast.Node, matches: np.ndarray) -> np.ndarray:
        """float64 BM25 score of each match (canonical accumulation order)."""
        scores = np.zeros(len(matches), dtype=np.float64)
        if not len(matches):
            return scores
        k1, b = self.k1, self.b
        boosts = self.scoring_boosts(node)
        for h, g in self.scoring_terms(node):
            p = self.postings(h, g)
            if not p.df:
                continue
            idx = np.searchsorted(p.doc_ids, matches)
            idx[idx == len(p.doc_ids)] = 0
            present = p.doc_ids[idx] == matches
            if not present.any():
                continue
            tf = p.tf[idx[present]].astype(np.float64)
            dl = p.doclen[idx[present]].astype(np.float64)
            df = self._df(h, g, p)
            idf = np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)
            tfn = tf / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
            contrib = idf * (k1 + 1.0) * tfn
            mult = boosts.get((h, g))
            scores[present] += contrib * mult if mult is not None else contrib
        return scores

    # --- explain ----------------------------------------------------------
    def scoring_term_labels(self, node: "ast.Node") -> dict[tuple[int, int], str]:
        """(hash, gram) → human-readable label for every positive scoring
        term (phrases label their constituent 1..max_gram windows)."""
        labels: dict[tuple[int, int], str] = {}

        def walk(n, negated: bool):
            if isinstance(n, ast.Not):
                walk(n.child, not negated)
            elif isinstance(n, (ast.And, ast.Or, ast.AtLeast)):
                for c in n.children:
                    walk(c, negated)
            elif isinstance(n, ast.Term):
                if not negated:
                    labels[
                        ((murmur64a(n.text) + n.stream) & 0xFFFFFFFFFFFFFFFF, 1)
                    ] = n.text
            elif isinstance(n, ast.Phrase):
                if not negated:
                    toks = n.tokens
                    h1 = [murmur64a(t) for t in toks]
                    for g in range(1, min(self.max_gram, len(toks)) + 1):
                        for i in range(len(toks) - g + 1):
                            key = (
                                (ngram_hash(h1[i : i + g]) + n.stream)
                                & 0xFFFFFFFFFFFFFFFF,
                                g,
                            )
                            labels[key] = " ".join(toks[i : i + g])

        walk(node, False)
        return labels

    def explain(self, query: str, doc_id: int) -> pa.Table:
        """Per-term BM25 breakdown for one (query, doc) pair — the
        debugging surface every engine ships.  Columns (term, gram, tf,
        doclen, df, idf, contribution); the SAME recipe and accumulation
        order as ``score``, so contribution sums bit-exactly to the
        document's score."""
        node = self._parse_rewritten(query)
        labels = self.scoring_term_labels(node)
        boosts = self.scoring_boosts(node)
        doc = np.uint64(doc_id)
        k1, b = self.k1, self.b
        terms, grams, tfs, dls, dfs, idfs, contribs = [], [], [], [], [], [], []
        for h, g in self.scoring_terms(node):
            p = self.postings(h, g)
            if not p.df:
                continue
            i = int(np.searchsorted(p.doc_ids, doc))
            if i >= len(p.doc_ids) or p.doc_ids[i] != doc:
                continue
            tf = float(p.tf[i])
            dl = float(p.doclen[i])
            df = self._df(h, g, p)
            idf_v = float(np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0))
            tfn = tf / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
            terms.append(labels.get((h, g), f"0x{h:016x}"))
            grams.append(g)
            tfs.append(int(tf))
            dls.append(int(dl))
            dfs.append(int(df))
            idfs.append(idf_v)
            c = idf_v * (k1 + 1.0) * tfn
            mult = boosts.get((h, g))
            contribs.append(c * mult if mult is not None else c)
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "gram": pa.array(grams, pa.uint8()),
                "tf": pa.array(tfs, pa.int64()),
                "doclen": pa.array(dls, pa.int64()),
                "df": pa.array(dfs, pa.int64()),
                "idf": pa.array(idfs, pa.float64()),
                "contribution": pa.array(contribs, pa.float64()),
            }
        )

    # --- top-k ------------------------------------------------------------
    def search(
        self,
        query: str,
        k: int = 10,
        after: tuple[float, int] | None = None,
        synonyms: dict[str, tuple[str, ...]] | None = None,
        range_filter: "tuple[str, float, float] | None" = None,
        sort_by: "tuple[str, str] | None" = None,
    ) -> pa.Table:
        """Parse → match → score → top-k (score desc, doc_id asc).

        ``after=(score, doc_id)`` is a search-after cursor (the last row of
        the previous page): only documents STRICTLY later in the total
        order (score desc, doc_id asc) are returned, so deep paging keeps a
        k-sized working set instead of an offset+k heap.  Cursors are
        copied from the engine's own output, so the float comparison is
        exact (same doubles).

        ``synonyms`` maps a term to its expansion group (see
        ``ast.expand_synonyms``): each matching unigram becomes an OR of
        its group, scored as an ordinary disjunction."""
        cacheable = (
            self._result_cache is not None
            and after is None
            and synonyms is None
            and range_filter is None
            and sort_by is None
        )
        if cacheable:
            hit = self._result_cache.get((query, k))
            if hit is not None:
                return hit
        node = self._parse_rewritten(query, synonyms)
        matches = self.eval(node)
        if range_filter is not None:
            # doc-values fast-field filter (Lucene NumericDocValues /
            # Tantivy fast-field analog): [lo, hi) over a numeric docmeta
            # column, applied BEFORE scoring so filtered docs cost nothing
            col, lo, hi = range_filter
            matches = matches[self._docvalue_mask(matches, col, lo, hi)]
        scores = self.score(node, matches)
        if after is not None:
            s0, d0 = float(after[0]), np.uint64(after[1])
            keep = (scores < s0) | ((scores == s0) & (matches > d0))
            matches, scores = matches[keep], scores[keep]
        if sort_by is not None:
            # sort-by-field (the Elasticsearch ``sort`` contract): order
            # matches by a doc-values column instead of relevance; docs
            # with a null value sort LAST either direction; score is still
            # computed and returned for display
            if after is not None:
                raise ValueError("sort_by and after (score cursor) conflict")
            col, direction = sort_by
            key = self.docvalues_for(matches, col)
            if direction == "desc":
                key = -key
            elif direction != "asc":
                raise ValueError(f"sort_by direction {direction!r}")
            key = np.where(np.isnan(key), np.inf, key)
            order = np.lexsort((matches, key))[:k]
        else:
            order = np.lexsort((matches, -scores))[:k]
        doc_ids = matches[order]
        cols = {
            "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.uint32)),
            "doc_id": pa.array(doc_ids, pa.uint64()),
            "score": pa.array(scores[order], pa.float64()),
        }
        if self.urls is not None:
            pos = np.searchsorted(self.all_docs, doc_ids)
            cols["url"] = pa.array(self.urls[pos].tolist(), pa.string())
        out = pa.table(cols)
        if cacheable:
            self._result_cache.put((query, k), out)
        return out

    def match_count(self, query: str) -> int:
        return int(len(self.eval(self._parse_rewritten(query))))

    # --- ranked disjunctive top-k (block-max WAND fast path) --------------
    def _term_cursor(self, text: str):
        from bitfunnel_ray.query.wand import _TermCursor

        p = self.term_postings(text)
        if not p.df:
            return None
        k1, b = self.k1, self.b
        # stream 0 — same key term_postings() hashed with
        df = self._df(murmur64a(text) & 0xFFFFFFFFFFFFFFFF, 1, p)
        idf = float(np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0))
        tf = p.tf.astype(np.float64)
        dl = p.doclen.astype(np.float64)
        contrib = idf * (k1 + 1.0) * (tf / (tf + k1 * (1.0 - b + b * dl / self.avgdl)))
        if p.block_last is not None:
            last, ub = p.block_last, idf * (k1 + 1.0) * p.block_max_tfn
        else:
            # interleaved segments: recompute exact blocks from decoded list
            bs = 128
            starts = np.arange(0, len(contrib), bs)
            last = p.doc_ids[np.minimum(starts + bs - 1, len(contrib) - 1)]
            ub = np.maximum.reduceat(contrib, starts)
        return _TermCursor(p.doc_ids, contrib, last, ub)

    def topk_or(
        self,
        terms: list[str],
        k: int = 10,
        use_wand: bool = True,
        after: tuple[float, int] | None = None,
    ) -> pa.Table:
        """Exact top-k under disjunctive (sum over matching terms) BM25 —
        WAND skips blocks that cannot beat the running threshold; with
        ``use_wand=False`` scores the full union exhaustively (used by
        tests to prove WAND exactness).

        ``after`` is the search-after cursor (see ``search``).  On the
        WAND path it filters at heap-insert time — it must NOT seed the
        skip threshold, since page-2 documents score BELOW the cursor and
        a threshold of cursor-score would skip exactly the blocks that
        hold them.  The efficiency win of a cursor is that the heap stays
        k-sized at any page depth (offset paging needs offset+k).

        Tombstoned docs are excluded before ranking."""
        from bitfunnel_ray.query.wand import wand_topk

        seen = set()
        uniq = [t for t in terms if not (t in seen or seen.add(t))]
        if use_wand and self.tombstones is None:
            # canonical (hash) order so accumulation matches score() exactly
            uniq_sorted = sorted(uniq, key=murmur64a)
            cursors = [c for c in (self._term_cursor(t) for t in uniq_sorted) if c]
            pairs = wand_topk(cursors, k, after=after)
            doc_ids = np.array([d for _, d in pairs], dtype=np.uint64)
            scores = np.array([s for s, _ in pairs], dtype=np.float64)
        else:
            node = ast.Or(tuple(ast.Term(t) for t in uniq)) if len(uniq) > 1 else ast.Term(uniq[0])
            matches = self.eval(node)
            sc = self.score(node, matches)
            if after is not None:
                s0, d0 = float(after[0]), np.uint64(after[1])
                keep = (sc < s0) | ((sc == s0) & (matches > d0))
                matches, sc = matches[keep], sc[keep]
            order = np.lexsort((matches, -sc))[:k]
            doc_ids, scores = matches[order], sc[order]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(doc_ids) + 1, dtype=np.uint32)),
                "doc_id": pa.array(doc_ids, pa.uint64()),
                "score": pa.array(scores, pa.float64()),
            }
        )

    def topk_or_approx(self, terms: list[str], k: int = 10, t: int = 128) -> pa.Table:
        """Approximate disjunctive top-k via CHAMPION LISTS (static index
        pruning — Carmel et al. SIGIR'01; "champion lists", Manning IIR
        §7.1.3): candidates = the union of each term's top-``t`` postings
        by BM25 contribution (deterministic tie-break on doc_id), then the
        candidates are scored EXACTLY over all terms.  Returned scores are
        exact; recall can miss a doc that is mediocre in every list but
        good in sum — overlap@k vs the exact engine is reported in bench
        extras.  Useful for WIDE disjunctions (PRF-expanded queries, MLT),
        where WAND's skip threshold degrades: cost is O(Σ t log t + |cand|
        × n_terms) after decode, independent of posting-list lengths.

        Tombstones are honored (dead docs never become candidates)."""
        seen = set()
        uniq = [x for x in terms if not (x in seen or seen.add(x))]
        # canonical (hash) accumulation order → scores bit-identical to the
        # exact engine's for every candidate it shares
        uniq.sort(key=murmur64a)
        k1, b = self.k1, self.b
        decoded = []
        cands = []
        for text in uniq:
            p = self.term_postings(text)
            if not p.df:
                continue
            df = self._df(murmur64a(text) & 0xFFFFFFFFFFFFFFFF, 1, p)
            idf = float(np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0))
            tf = p.tf.astype(np.float64)
            dl = p.doclen.astype(np.float64)
            contrib = idf * (k1 + 1.0) * (
                tf / (tf + k1 * (1.0 - b + b * dl / self.avgdl))
            )
            decoded.append((p.doc_ids, contrib))
            if len(contrib) > t:
                # top-t by contribution, ties broken toward lower doc_id
                top = np.lexsort((p.doc_ids, -contrib))[:t]
                cands.append(p.doc_ids[top])
            else:
                cands.append(p.doc_ids)
        if not cands:
            return pa.table(
                {
                    "rank": pa.array([], pa.uint32()),
                    "doc_id": pa.array([], pa.uint64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        cand = np.unique(np.concatenate(cands))
        if self.tombstones is not None:
            cand = np.setdiff1d(cand, self.tombstones, assume_unique=True)
        scores = np.zeros(len(cand), dtype=np.float64)
        for doc_ids, contrib in decoded:
            pos = np.searchsorted(doc_ids, cand)
            pos_c = np.minimum(pos, len(doc_ids) - 1)
            hit = doc_ids[pos_c] == cand
            scores[hit] += contrib[pos_c[hit]]
        order = np.lexsort((cand, -scores))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.uint32)),
                "doc_id": pa.array(cand[order], pa.uint64()),
                "score": pa.array(scores[order], pa.float64()),
            }
        )

    def qld_topk(self, terms: list[str], k: int = 10, mu: float = 2000.0) -> pa.Table:
        """Query-likelihood ranking with Dirichlet-prior smoothing (Zhai &
        Lafferty, SIGIR 2001) — the standard language-model alternative to
        BM25 (Lucene ``LMDirichletSimilarity`` analog):

            score(q, d) = Σ_t  ln( (tf(t,d) + μ·p(t|C)) / (|d| + μ) )

        with p(t|C) = cf(t) / |C| (collection frequency over total corpus
        tokens).  Every query term contributes to every candidate — docs
        that miss a term pay the smoothed-background cost, so longer docs
        are not spuriously favored.  Candidates = docs matching ≥1 term
        (the usual driver set: docs matching nothing share a constant,
        strictly lower score).  OOV terms (cf = 0) are skipped — their
        contribution is an identical -inf for every document.

        cf comes from the decoded posting list (Σ tf), |C| from the
        segment manifests (sum_doclen) — no extra dictionary state.  Note
        cf/|C| are whole-index statistics: tombstoned docs are excluded
        from the candidates but still count toward the background model
        (exactly how a lazy-delete index behaves until compaction)."""
        seen = set()
        uniq = [x for x in terms if not (x in seen or seen.add(x))]
        total_tokens = float(sum(s.sum_doclen for s in self.segments))
        plists = [(x, self.term_postings(x)) for x in uniq]
        plists = [(x, p) for x, p in plists if p.df]
        if not plists or total_tokens <= 0:
            return pa.table(
                {
                    "rank": pa.array([], pa.uint32()),
                    "doc_id": pa.array([], pa.uint64()),
                    "score": pa.array([], pa.float64()),
                }
            )
        docs = np.unique(np.concatenate([p.doc_ids for _, p in plists]))
        if self.tombstones is not None:
            docs = np.setdiff1d(docs, self.tombstones, assume_unique=True)
        dl = np.zeros(len(docs), dtype=np.float64)
        for _, p in plists:
            pos = np.searchsorted(docs, p.doc_ids)
            pos_c = np.minimum(pos, len(docs) - 1)
            hit = docs[pos_c] == p.doc_ids  # tombstoned docs are absent
            dl[pos_c[hit]] = p.doclen[hit].astype(np.float64)
        denom = dl + mu
        scores = np.zeros(len(docs), dtype=np.float64)
        for _, p in plists:
            mu_p = (mu * float(p.tf.sum())) / total_tokens
            tfv = np.zeros(len(docs), dtype=np.float64)
            pos = np.searchsorted(docs, p.doc_ids)
            pos_c = np.minimum(pos, len(docs) - 1)
            hit = docs[pos_c] == p.doc_ids
            tfv[pos_c[hit]] = p.tf[hit].astype(np.float64)
            scores += np.log((tfv + mu_p) / denom)
        order = np.lexsort((docs, -scores))[:k]
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.uint32)),
                "doc_id": pa.array(docs[order], pa.uint64()),
                "score": pa.array(scores[order], pa.float64()),
            }
        )

    def qld_scores(
        self, terms: list[str], docs: np.ndarray, mu: float = 2000.0
    ) -> np.ndarray:
        """LM-Dirichlet scores (see ``qld_topk``) for a GIVEN sorted
        uint64 doc-id array — the feature-extraction entry point (LTR
        featurization wants scores for an externally chosen candidate
        set, e.g. the AND-match set, not the scorer's own top-k).  Every
        doc must match ≥ 1 surviving term (its doclen is recovered from a
        matching posting); docs matching none raise."""
        seen = set()
        uniq = [x for x in terms if not (x in seen or seen.add(x))]
        total_tokens = float(sum(s.sum_doclen for s in self.segments))
        plists = [p for p in (self.term_postings(x) for x in uniq) if p.df]
        if not plists or total_tokens <= 0:
            raise ValueError("no query term occurs in the corpus")
        dl = np.full(len(docs), -1.0, dtype=np.float64)
        tfs = []
        for p in plists:
            pos = np.searchsorted(p.doc_ids, docs)
            pos_c = np.minimum(pos, len(p.doc_ids) - 1)
            hit = p.doc_ids[pos_c] == docs
            dl[hit] = p.doclen[pos_c[hit]].astype(np.float64)
            tfv = np.zeros(len(docs), dtype=np.float64)
            tfv[hit] = p.tf[pos_c[hit]].astype(np.float64)
            tfs.append((p, tfv))
        if (dl < 0).any():
            raise ValueError("doc matches no query term; doclen unknown")
        denom = dl + mu
        scores = np.zeros(len(docs), dtype=np.float64)
        for p, tfv in tfs:
            mu_p = (mu * float(p.tf.sum())) / total_tokens
            scores += np.log((tfv + mu_p) / denom)
        return scores


class SearchEngine(QueryAlgebra):
    """Single-process query engine over one or more segments: every dict
    bucket and the full doc-id array live in THIS process (fine for tests,
    CLI and small indexes; serving at scale uses
    ``bitfunnel_ray.query.sharded.ShardedServer`` where each actor opens
    only its bucket subset)."""

    def __init__(
        self,
        index_dirs: str | list[str],
        load_urls: bool = True,
        tombstones: np.ndarray | None = None,
    ):
        self._locator = index_dirs  # pre-resolution, for refresh()
        self._load_urls = bool(load_urls)
        index_dirs = seglib.resolve_segment_dirs(index_dirs)
        self.segments = [_Segment(d) for d in index_dirs]
        self.n_docs = sum(s.n_docs for s in self.segments)
        self.avgdl = (
            sum(s.sum_doclen for s in self.segments) / self.n_docs if self.n_docs else 1.0
        )
        s0 = self.segments[0]
        self.max_gram, self.k1, self.b = s0.max_gram, s0.k1, s0.b
        self.stream_map = dict(s0.streams)  # name -> id (StreamConfiguration analog)
        from bitfunnel_ray.functions.hashing import FACT_STREAM_ID, fact_term_hash

        self.stream_map.setdefault("fact", FACT_STREAM_ID)
        self.fact_hashes = frozenset(
            fact_term_hash(n) for s in self.segments for (n, _c) in s.facts
        )
        metas = []
        for s in self.segments:
            cols = ["doc_id", "url"] if load_urls else ["doc_id"]
            metas.append(pq.read_table(os.path.join(s.dir, "docmeta"), columns=cols))
        meta = pa.concat_tables(metas)
        ids = meta["doc_id"].to_numpy()
        order = np.argsort(ids, kind="stable")
        self.all_docs = ids[order].astype(np.uint64)
        self.urls = (
            np.asarray(meta["url"].to_pylist(), dtype=object)[order] if load_urls else None
        )
        self.tombstones = (
            np.sort(np.asarray(tombstones, dtype=np.uint64))
            if tombstones is not None and len(tombstones)
            else None
        )
        self._cache: dict[tuple[int, int], Postings] = {}
        self._docvalues: dict[str, np.ndarray] = {}
        # vocab sidecar (built with EngineConfig.extra["vocab_sidecar"]):
        # segments carry their (term, df) text stripes — suggest + fuzzy
        # install LAZILY from them on first use (_materialize_vocab), and
        # re-merge on refresh() so NRT-ingested terms become
        # completable/fuzzy-matchable without a rebuild.  Detection here
        # is isdir-cheap; nothing is read until a suggest/fuzzy call.
        self._vocab_from_sidecar = False
        self._vocab_pending = self._any_vocab_sidecar()

    def _any_vocab_sidecar(self) -> bool:
        return any(
            os.path.isdir(os.path.join(s.dir, "vocab")) for s in self.segments
        )

    def _materialize_vocab(self) -> None:
        """Merge every segment's ``vocab/`` sidecar (term, df; df sums per
        term across segments) into the suggest + fuzzy vocabularies —
        called on FIRST suggest/fuzzy use, never in __init__.  A mix of
        sidecar and sidecar-less segments raises (a silently partial
        vocabulary would complete/expand with missing terms and
        undercounted dfs); rebuild the old segments with --vocab or
        install a vocabulary explicitly via set_*."""
        if not self._vocab_pending or self._vocab_user_installed:
            return
        from bitfunnel_ray.ops.suggest import SuggestIndex
        from bitfunnel_ray.query.fuzzy import VocabFuzzyMatcher

        missing = [
            s.dir
            for s in self.segments
            if not os.path.isdir(os.path.join(s.dir, "vocab"))
        ]
        if missing:
            raise RuntimeError(
                "segments without a vocab sidecar alongside segments that "
                f"have one: {missing} — a partial vocabulary would return "
                "silently wrong completions/expansions; rebuild those "
                "segments with vocab_sidecar (cli build --vocab) or install "
                "a vocabulary explicitly via set_suggest_vocabulary/"
                "set_fuzzy_vocabulary"
            )
        parts = [
            pq.read_table(os.path.join(s.dir, "vocab"), columns=["term", "df"])
            for s in self.segments
        ]
        t = pa.concat_tables(parts)
        terms = np.asarray(t["term"].to_pylist())
        dfs = t["df"].to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.argsort(terms, kind="stable")
        terms, dfs = terms[order], dfs[order]
        if len(terms):
            starts = np.flatnonzero(
                np.concatenate([[True], terms[1:] != terms[:-1]])
            )
            terms, dfs = terms[starts], np.add.reduceat(dfs, starts)
        # install directly (NOT via set_*: those latch the user-installed
        # flag that protects hand-installed vocabularies from refresh)
        self.suggest_index = SuggestIndex(terms, dfs)
        self.fuzzy_matcher = VocabFuzzyMatcher(terms)
        self._vocab_from_sidecar = True
        self._vocab_pending = False

    def refresh(self) -> int:
        """Open segments that completed since this engine loaded — the
        Lucene NRT-reopen analog (the reference ingests into a LIVE index,
        Ingestor::Add / src/Index/src/Ingestor.cpp; our additive-segment
        equivalent re-resolves the build root in place).  Corpus stats
        (n_docs/avgdl), doc maps, facts, and both caches update; returns
        the number of newly opened segments (0 = nothing new)."""
        dirs = seglib.resolve_segment_dirs(self._locator)
        have = {s.dir for s in self.segments}
        new = [d for d in dirs if d not in have]
        if not new:
            return 0
        self.segments.extend(_Segment(d) for d in new)
        self.n_docs = sum(s.n_docs for s in self.segments)
        self.avgdl = (
            sum(s.sum_doclen for s in self.segments) / self.n_docs if self.n_docs else 1.0
        )
        from bitfunnel_ray.functions.hashing import fact_term_hash

        self.fact_hashes = frozenset(
            fact_term_hash(n) for s in self.segments for (n, _c) in s.facts
        )
        cols = ["doc_id", "url"] if self._load_urls else ["doc_id"]
        metas = [pa.table({"doc_id": pa.array(self.all_docs, pa.uint64())})]
        if self._load_urls:
            metas[0] = metas[0].append_column("url", pa.array(self.urls.tolist(), pa.string()))
        for d in new:
            t = pq.read_table(os.path.join(d, "docmeta"), columns=cols)
            # docmeta keeps the corpus doc_id dtype (int64 for user-built
            # corpora); align to uint64 so the concat never type-clashes
            metas.append(
                t.set_column(
                    t.column_names.index("doc_id"),
                    "doc_id",
                    pa.array(
                        t["doc_id"].to_numpy(zero_copy_only=False).astype(np.uint64),
                        pa.uint64(),
                    ),
                )
            )
        meta = pa.concat_tables(metas)
        ids = meta["doc_id"].to_numpy().astype(np.uint64)
        order = np.argsort(ids, kind="stable")
        self.all_docs = ids[order]
        if self._load_urls:
            self.urls = np.asarray(meta["url"].to_pylist(), dtype=object)[order]
        # decoded postings merge ACROSS segments, doc values align to
        # all_docs, cached results and the docstore footer index cover the
        # old segment set — all stale now
        self._cache.clear()
        self._docvalues.clear()
        self._docstore = None
        self._invalidate_result_cache()
        # vocabulary staleness under NRT ingest: a sidecar-installed
        # suggest/fuzzy vocabulary is a point-in-time df snapshot — drop it
        # so the next suggest/fuzzy use re-merges over the grown segment
        # set (terms that exist only in the new segments become
        # immediately completable and matchable).  Hand-installed
        # vocabularies (set_* latches _vocab_user_installed) are left
        # untouched; an engine that opened WITHOUT sidecars also picks up
        # sidecar-built segments added later (pending re-detects).
        if not self._vocab_user_installed:
            if self._vocab_from_sidecar:
                self.suggest_index = None
                self.fuzzy_matcher = None
                self._vocab_from_sidecar = False
            self._vocab_pending = self._any_vocab_sidecar()
        return len(new)

    # --- stored fields (ES _source analog) ---------------------------------
    _docstore = None

    def fetch(self, doc_ids, fields: "list[str] | None" = None) -> pa.Table:
        """Stored-field rows for ``doc_ids`` — row-group-pruned point
        lookups over the segments' docstore sidecars (build/docstore.py);
        requires a build with ``EngineConfig(store_fields=...)``."""
        if self._docstore is None:
            from bitfunnel_ray.build.docstore import DocStore

            self._docstore = DocStore([s.dir for s in self.segments])
        return self._docstore.fetch(doc_ids, fields)

    def _range_docs(self, col: str, lo: float, hi: float) -> np.ndarray:
        v = self.docvalue(col)  # aligned to all_docs; NaN = null/absent
        return self.all_docs[(v >= lo) & (v <= hi)]  # NaN compares False

    # --- doc values (numeric fast fields) ----------------------------------
    def docvalue(self, col: str) -> np.ndarray:
        """float64 doc-values array aligned with ``all_docs`` (NaN where the
        column is null or the doc is absent) — one columnar docmeta read,
        cached; the Lucene NumericDocValues / Tantivy fast-field analog.
        Epoch-second timestamps and other <2^53 integers stay exact."""
        hit = self._docvalues.get(col)
        if hit is not None:
            return hit
        vals = np.full(len(self.all_docs), np.nan, dtype=np.float64)
        for s in self.segments:
            try:
                t = pq.read_table(os.path.join(s.dir, "docmeta"), columns=["doc_id", col])
            except Exception as exc:
                raise KeyError(
                    f"doc-values column {col!r} not in docmeta of {s.dir} "
                    "(built from a corpus without it?)"
                ) from exc
            ids = t["doc_id"].to_numpy().astype(np.uint64)
            v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
            vals[np.searchsorted(self.all_docs, ids)] = v
        self._docvalues[col] = vals
        return vals

    def docvalues_for(self, sorted_ids: np.ndarray, col: str) -> np.ndarray:
        if not len(sorted_ids):
            return np.empty(0, dtype=np.float64)
        return self.docvalue(col)[np.searchsorted(self.all_docs, sorted_ids)]

    # --- storage primitives ----------------------------------------------
    def postings(self, term_hash: int, gram: int) -> Postings:
        key = (int(term_hash), int(gram))
        hit = self._cache.get(key)
        if hit is not None:
            self.stat_postings_rows += len(hit.doc_ids)
            return hit
        parts, metas = [], []
        for s in self.segments:
            rows = s.chunk_rows(term_hash, gram)
            parts.extend(s.decode_rows(rows))
            # inflate stored max_tfn when serving avgdl > build avgdl (tfn is
            # monotone in avgdl with ratio bounded by avgdl_serve/avgdl_build)
            infl = max(1.0, self.avgdl / s.avgdl) if s.avgdl > 0 else 1.0
            metas.extend((ld, mt * infl) for ld, mt in s.block_meta_rows(rows))
        out = merge_chunks(parts, metas)
        self.stat_postings_rows += len(out.doc_ids)
        if len(self._cache) < 100_000:
            self._cache[key] = out
        return out

    def _complement(self, sorted_docs: np.ndarray) -> np.ndarray:
        return np.setdiff1d(self.all_docs, sorted_docs, assume_unique=True)
