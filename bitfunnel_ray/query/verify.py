"""Query verification — the ``verify one`` pipeline re-expressed
(reference: src/Plan/src/VerifyOneQuery.cpp:47-125 evaluates the query AST
against every cached document with TermMatchTreeEvaluator
(TermMatchTreeEvaluator.cpp:37-91) and diffs against the matcher:
false negatives are hard errors, false positives were tolerated because
the signature index is probabilistic).

Here ground truth is computed DISTRIBUTED (a vectorized map_batches scan
over the corpus — no document cache needed), and the index is exact, so
the contract is FP = FN = 0.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from bitfunnel_ray.functions.hashing import murmur64a, ngram_hash
from bitfunnel_ray.query import ast
from bitfunnel_ray.query.parser import parse_query
from bitfunnel_ray.stages.tokenize import tokenize_batch


def _query_term_hashes(node: ast.Node, max_gram: int) -> list[tuple[int, int]]:
    """All (hash, gram) terms the boolean evaluation touches."""
    acc: set[tuple[int, int]] = set()

    def phrase_grams(tokens):
        h1 = [murmur64a(t) for t in tokens]
        for i in range(len(tokens)):
            for g in range(1, min(max_gram, len(tokens) - i) + 1):
                acc.add((ngram_hash(h1[i : i + g]), g))

    def walk(n):
        if isinstance(n, ast.Term):
            acc.add((murmur64a(n.text), 1))
        elif isinstance(n, ast.Phrase):
            phrase_grams(n.tokens)
        elif isinstance(n, ast.Not):
            walk(n.child)
        elif isinstance(n, (ast.And, ast.Or, ast.AtLeast)):
            for c in n.children:
                walk(c)

    walk(node)
    return sorted(acc)


class BruteForceMatcher:
    """map_batches stage: evaluate the query per document from raw text
    (vectorized presence bitmask per query term, then the boolean tree)."""

    def __init__(self, query: str, max_gram: int = 2):
        self.node = parse_query(query)
        self.max_gram = max_gram
        self.terms = _query_term_hashes(self.node, max_gram)
        self.term_index = {t: i for i, t in enumerate(self.terms)}

    def _presence(self, t: pa.Table) -> np.ndarray:
        """(n_docs, n_terms) bool presence matrix."""
        r = tokenize_batch(t["text"], self.max_gram, emit_text=False)
        n = len(t)
        pres = np.zeros((n, len(self.terms)), dtype=bool)
        if len(r.term_hash):
            for j, (h, g) in enumerate(self.terms):
                m = (r.term_hash == np.uint64(h)) & (r.gram_size == g)
                if m.any():
                    pres[r.row[m], j] = True
        return pres

    def _eval(self, node: ast.Node, pres: np.ndarray) -> np.ndarray:
        if isinstance(node, ast.Term):
            return pres[:, self.term_index[(murmur64a(node.text), 1)]]
        if isinstance(node, ast.Phrase):
            h1 = [murmur64a(tok) for tok in node.tokens]
            out = np.ones(len(pres), dtype=bool)
            for i in range(len(node.tokens)):
                for g in range(1, min(self.max_gram, len(node.tokens) - i) + 1):
                    out &= pres[:, self.term_index[(ngram_hash(h1[i : i + g]), g)]]
            return out
        if isinstance(node, ast.And):
            out = np.ones(len(pres), dtype=bool)
            for c in node.children:
                out &= self._eval(c, pres)
            return out
        if isinstance(node, ast.Or):
            out = np.zeros(len(pres), dtype=bool)
            for c in node.children:
                out |= self._eval(c, pres)
            return out
        if isinstance(node, ast.Not):
            return ~self._eval(node.child, pres)
        if isinstance(node, ast.AtLeast):
            counts = np.zeros(len(pres), dtype=np.int64)
            for c in node.children:
                counts += self._eval(c, pres)
            return counts >= node.m
        raise TypeError(node)

    def __call__(self, t: pa.Table) -> pa.Table:
        pres = self._presence(t)
        match = self._eval(self.node, pres)
        return pa.table({"doc_id": t["doc_id"].filter(pa.array(match)).cast(pa.int64())})


def expected_matches(
    corpus: "ray.data.Dataset", query: str, max_gram: int = 2
) -> np.ndarray:
    """Distributed ground-truth match set (sorted doc ids)."""
    out = (
        corpus.select_columns(["doc_id", "text"])
        .map_batches(BruteForceMatcher(query, max_gram), batch_format="pyarrow")
        .to_pandas()
    )
    ids = out["doc_id"].to_numpy() if len(out) else np.empty(0, np.int64)
    return np.sort(ids.astype(np.uint64))


class BruteForceLogMatcher:
    """Whole-query-log ground truth in ONE corpus pass: the union of every
    query's term hashes becomes one shared presence matrix per batch, and
    each query's boolean tree is evaluated against it — the Ray-first
    re-expression of ``verify log`` looping VerifyOneQuery per query over
    the document cache (reference:
    tools/BitFunnel/src/VerifyCommand.cpp:169-232).  Emits
    (query_idx, doc_id) match rows."""

    def __init__(self, queries: "list[str]", max_gram: int = 2, stream_map=None):
        self.max_gram = max_gram
        self.nodes = [parse_query(q, stream_map) if stream_map else parse_query(q) for q in queries]
        terms: set[tuple[int, int]] = set()
        self._per_query = []
        for node in self.nodes:
            t = _query_term_hashes(node, max_gram)
            self._per_query.append(t)
            terms.update(t)
        self.terms = sorted(terms)
        self.term_index = {t: i for i, t in enumerate(self.terms)}
        # reuse BruteForceMatcher's evaluator on the shared matrix
        self._m = BruteForceMatcher.__new__(BruteForceMatcher)
        self._m.max_gram = max_gram
        self._m.terms = self.terms
        self._m.term_index = self.term_index

    def __call__(self, t: pa.Table) -> pa.Table:
        pres = self._m._presence(t)
        doc_ids = t["doc_id"].cast(pa.int64()).to_numpy()
        out_q, out_d = [], []
        for qi, node in enumerate(self.nodes):
            match = self._m._eval(node, pres)
            ids = doc_ids[match]
            out_q.append(np.full(len(ids), qi, dtype=np.int64))
            out_d.append(ids)
        return pa.table(
            {
                "query_idx": pa.array(np.concatenate(out_q) if out_q else [], pa.int64()),
                "doc_id": pa.array(np.concatenate(out_d) if out_d else [], pa.int64()),
            }
        )


def verify_log(corpus: "ray.data.Dataset", engine, queries: "list[str]") -> pa.Table:
    """Verify a whole query log: one distributed brute-force corpus pass
    for ground truth, then a per-query diff against the engine.  Returns
    the VerifyCommand CSV shape — one row per query with
    (query, expected, matched, tp, fp, fn, ok)."""
    stream_map = getattr(engine, "stream_map", None)
    truth = (
        corpus.select_columns(["doc_id", "text"])
        .map_batches(
            BruteForceLogMatcher(queries, engine.max_gram, stream_map),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    rows = []
    for qi, q in enumerate(queries):
        want = np.sort(
            truth.loc[truth["query_idx"] == qi, "doc_id"].to_numpy().astype(np.uint64)
        )
        got = engine.eval(parse_query(q, stream_map) if stream_map else parse_query(q))
        tp = np.intersect1d(got, want, assume_unique=True)
        fp = np.setdiff1d(got, want, assume_unique=True)
        fn = np.setdiff1d(want, got, assume_unique=True)
        rows.append(
            {
                "query": q,
                "expected": int(len(want)),
                "matched": int(len(got)),
                "tp": int(len(tp)),
                "fp": int(len(fp)),
                "fn": int(len(fn)),
                "ok": bool(len(fp) == 0 and len(fn) == 0),
            }
        )
    return pa.Table.from_pylist(rows)


def verify_query(
    corpus: "ray.data.Dataset", engine, query: str
) -> dict:
    """Engine vs distributed brute force → TP/FP/FN counts (the
    VerifyCommand output shape, VerifyCommand.cpp:106-167)."""
    want = expected_matches(corpus, query, engine.max_gram)
    got = engine.eval(parse_query(query))
    tp = np.intersect1d(got, want, assume_unique=True)
    fp = np.setdiff1d(got, want, assume_unique=True)
    fn = np.setdiff1d(want, got, assume_unique=True)
    return {
        "query": query,
        "expected": int(len(want)),
        "matched": int(len(got)),
        "tp": int(len(tp)),
        "fp": int(len(fp)),
        "fn": int(len(fn)),
        "ok": bool(len(fp) == 0 and len(fn) == 0),
    }


def synthetic_ground_truth(query: str, n_docs: int, max_gram: int = 2) -> np.ndarray:
    """Closed-form match set for a boolean query over the prime-factors
    synthetic corpus (doc i's text = its sorted prime factorization) — the
    ``verify synthetic`` analog (reference:
    tools/BitFunnel/src/VerifyOneQuerySynthetic.cpp evaluates queries
    against the PrimeFactors mock corpus whose ground truth is
    divisibility).  Evaluation walks the factor lists generated by the
    same closed-form rule the corpus writer uses — fully independent of
    the tokenizer, hash, codec and index."""
    from bitfunnel_ray.sources.corpus import prime_factors_text

    node = parse_query(query)

    def matches(factors: "list[str]", n: ast.Node) -> bool:
        if isinstance(n, ast.Term):
            return n.text in factors
        if isinstance(n, ast.Phrase):
            t = n.tokens
            return any(
                factors[i : i + len(t)] == list(t)
                for i in range(len(factors) - len(t) + 1)
            )
        if isinstance(n, ast.And):
            return all(matches(factors, c) for c in n.children)
        if isinstance(n, ast.Or):
            return any(matches(factors, c) for c in n.children)
        if isinstance(n, ast.Not):
            return not matches(factors, n.child)
        raise TypeError(n)

    out = [
        i for i in range(n_docs) if matches(prime_factors_text(i).split(), node)
    ]
    return np.asarray(out, dtype=np.uint64)


def verify_synthetic(engine, queries: "list[str]", n_docs: int) -> pa.Table:
    """Diff the engine against the closed-form prime-factors ground truth
    for a list of queries; same result shape as ``verify_log``."""
    rows = []
    for q in queries:
        want = synthetic_ground_truth(q, n_docs, engine.max_gram)
        got = engine.eval(parse_query(q))
        tp = np.intersect1d(got, want, assume_unique=True)
        fp = np.setdiff1d(got, want, assume_unique=True)
        fn = np.setdiff1d(want, got, assume_unique=True)
        rows.append(
            {
                "query": q,
                "expected": int(len(want)),
                "matched": int(len(got)),
                "tp": int(len(tp)),
                "fp": int(len(fp)),
                "fn": int(len(fn)),
                "ok": bool(len(fp) == 0 and len(fn) == 0),
            }
        )
    return pa.Table.from_pylist(rows)
