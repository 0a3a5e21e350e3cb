"""Brute-force oracle: exact boolean eval + BM25 per document.

The analog of the reference's ground-truth verifier
(src/Plan/src/TermMatchTreeEvaluator.cpp:37-91 over the DocumentCache,
src/Index/src/DocumentCache.cpp) — evaluates the query AST against every
document's token multiset independently of the index/codec/shuffle code
paths.  Scoring follows the canonical contract (float64, contributions in
ascending (gram_size, term_hash) order, ties (score desc, doc_id asc)) so
engine results must be rank-identical AND bit-identical in score.
"""

from __future__ import annotations

from collections import Counter

import numpy as np

from bitfunnel_ray.functions.hashing import murmur64a, ngram_hash
from bitfunnel_ray.query import ast
from bitfunnel_ray.query.parser import parse_query


class OracleIndex:
    def __init__(self, doc_ids, texts, max_gram=2, k1=1.2, b=0.75):
        self.max_gram, self.k1, self.b = max_gram, k1, b
        self.doc_ids = [int(d) for d in doc_ids]
        self.terms: dict[int, Counter] = {}   # doc -> Counter[(hash, gram)]
        self.doclen: dict[int, int] = {}
        for d, text in zip(self.doc_ids, texts):
            toks = (text or "").split()
            c = Counter()
            h1 = [murmur64a(t) for t in toks]
            for i in range(len(toks)):
                for g in range(1, min(max_gram, len(toks) - i) + 1):
                    c[(ngram_hash(h1[i : i + g]), g)] += 1
            self.terms[d] = c
            self.doclen[d] = len(toks)
        self.n_docs = len(self.doc_ids)
        self.avgdl = sum(self.doclen.values()) / self.n_docs if self.n_docs else 1.0
        self.df: Counter = Counter()
        for c in self.terms.values():
            for key in c:
                self.df[key] += 1

    # --- per-doc boolean eval (unordered co-occurrence phrase) ----------
    def _phrase_grams(self, tokens):
        h1 = [murmur64a(t) for t in tokens]
        out = []
        for i in range(len(tokens)):
            for g in range(1, min(self.max_gram, len(tokens) - i) + 1):
                out.append((ngram_hash(h1[i : i + g]), g))
        return out

    def _matches(self, node, doc) -> bool:
        c = self.terms[doc]
        if isinstance(node, ast.Term):
            return (murmur64a(node.text), 1) in c
        if isinstance(node, ast.Phrase):
            return all(t in c for t in self._phrase_grams(node.tokens))
        if isinstance(node, ast.And):
            return all(self._matches(ch, doc) for ch in node.children)
        if isinstance(node, ast.Or):
            return any(self._matches(ch, doc) for ch in node.children)
        if isinstance(node, ast.Not):
            return not self._matches(node.child, doc)
        if isinstance(node, ast.AtLeast):
            return sum(self._matches(ch, doc) for ch in node.children) >= node.m
        raise TypeError(node)

    def _scoring_terms(self, node):
        acc = set()

        def walk(n, negated):
            if isinstance(n, ast.Not):
                walk(n.child, not negated)
            elif isinstance(n, (ast.And, ast.Or, ast.AtLeast)):
                for ch in n.children:
                    walk(ch, negated)
            elif isinstance(n, ast.Term):
                if not negated:
                    acc.add((murmur64a(n.text), 1))
            elif isinstance(n, ast.Phrase):
                if not negated:
                    acc.update(self._phrase_grams(n.tokens))

        walk(node, False)
        return sorted(acc, key=lambda p: (p[1], p[0]))

    def _score(self, node, doc) -> float:
        c = self.terms[doc]
        s = 0.0
        for key in self._scoring_terms(node):
            if key not in c or self.df[key] == 0:
                continue
            df = self.df[key]
            tf = float(c[key])
            dl = float(self.doclen[doc])
            idf = np.log((self.n_docs - df + 0.5) / (df + 0.5) + 1.0)
            tfn = tf / (tf + self.k1 * (1.0 - self.b + self.b * dl / self.avgdl))
            s += float(idf) * (self.k1 + 1.0) * tfn
        return s

    def search(self, query: str, k: int = 10, tombstones=None):
        node = parse_query(query)
        dead = set(int(t) for t in tombstones) if tombstones is not None else set()
        matches = [d for d in self.doc_ids if d not in dead and self._matches(node, d)]
        scored = sorted(
            ((self._score(node, d), d) for d in matches), key=lambda p: (-p[0], p[1])
        )
        return {
            "matches": sorted(matches),
            "topk": [(d, s) for s, d in scored[:k]],
        }
