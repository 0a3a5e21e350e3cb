"""Query AST — the TermMatchNode analog
(reference: inc/BitFunnel/Plan/TermMatchNode.h:45-63: And/Or/Not/Phrase/
Unigram nodes, plus Fact which we do not carry)."""

from __future__ import annotations

from dataclasses import dataclass, field


class Node:
    pass


@dataclass(frozen=True)
class Term(Node):
    text: str
    stream: int = 0
    boost: float = 1.0  # query-time score multiplier (term^2.5 syntax)


@dataclass(frozen=True)
class Phrase(Node):
    tokens: tuple[str, ...]
    stream: int = 0
    boost: float = 1.0


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Not(Node):
    child: Node = None


@dataclass(frozen=True)
class Fuzzy(Node):
    """Fuzzy term (query syntax ``term~1`` / ``term~2`` — the Lucene
    fuzzy-query contract): matches every VOCABULARY term within
    Levenshtein distance ``dist`` of ``text``.  A Fuzzy node never
    reaches evaluation — engines rewrite it to an Or of its expansion
    members first (``expand_fuzzy``), so matching and scoring are the
    ordinary disjunction over the expanded group (per-member df, as with
    synonym expansion)."""

    text: str
    stream: int = 0
    boost: float = 1.0
    dist: int = 1


@dataclass(frozen=True)
class Range(Node):
    """Doc-values range predicate (query syntax ``col:[lo TO hi]`` — the
    Lucene range-query contract, both bounds INCLUSIVE): matches docs
    whose numeric doc-values column ``col`` is in [lo, hi]; null/absent
    never matches.  Like facts, a Range participates in boolean matching
    but contributes ZERO BM25 score — it is a filter, not content."""

    col: str
    lo: float
    hi: float


@dataclass(frozen=True)
class AtLeast(Node):
    """Minimum-should-match group: a document matches when >= ``m`` of
    the children match (the Lucene/Elasticsearch minimum_should_match
    contract; query syntax ``(a b c)~2``).  ``m=1`` is Or, ``m=len``
    is And; BM25 scores only the clauses that matched — absent terms
    contribute zero, exactly as in a plain disjunction."""

    m: int = 1
    children: tuple[Node, ...] = field(default_factory=tuple)


def expand_synonyms(node: Node, synonyms: dict[str, tuple[str, ...]]) -> Node:
    """Query-time synonym expansion: every ``Term(t)`` whose text is a
    key of ``synonyms`` becomes ``Or(Term(m) for m in synonyms[t])``
    (the original term should be listed in its own group, conventionally
    first).  Member duplicates are dropped order-preservingly.

    Scope rules:
    - only unigram ``Term`` nodes on the SAME stream expand; the member
      terms inherit the stream;
    - ``Phrase`` tokens are NOT expanded — positional synonymy changes
      phrase semantics (a phrase slot spanning multiple surface forms
      needs index-time synonym injection, not a query rewrite);
    - expansion recurses under ``Not``: ``-join`` with join→{join,merge}
      excludes documents containing ANY member.

    Scoring: the expanded node goes through the ordinary Or scorer, so a
    document matching several members sums their BM25 contributions
    (df stays per-member; engines that want blended df do it at
    treatment time)."""
    if isinstance(node, Term):
        group = synonyms.get(node.text)
        if not group:
            return node
        seen: set[str] = set()
        members = tuple(
            Term(m, node.stream, node.boost)  # members inherit the boost
            for m in group
            if not (m in seen or seen.add(m))
        )
        return members[0] if len(members) == 1 else Or(members)
    if isinstance(node, And):
        return And(tuple(expand_synonyms(c, synonyms) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(expand_synonyms(c, synonyms) for c in node.children))
    if isinstance(node, Not):
        return Not(expand_synonyms(node.child, synonyms))
    if isinstance(node, AtLeast):
        # the threshold counts CLAUSES, so it is unchanged: an expanded
        # clause matches when any synonym member does
        return AtLeast(node.m, tuple(expand_synonyms(c, synonyms) for c in node.children))
    return node


def has_fuzzy(node: Node) -> bool:
    if isinstance(node, Fuzzy):
        return True
    if isinstance(node, (And, Or)):
        return any(has_fuzzy(c) for c in node.children)
    if isinstance(node, AtLeast):
        return any(has_fuzzy(c) for c in node.children)
    if isinstance(node, Not):
        return has_fuzzy(node.child)
    return False


def expand_fuzzy(node: Node, matcher) -> Node:
    """Rewrite every ``Fuzzy(t, dist=d)`` to the Or-group of its
    vocabulary expansion: ``matcher(text, dist) -> tuple[str]`` returns
    the vocabulary terms within edit distance ``dist`` (the engine's
    ``VocabFuzzyMatcher``; exact Levenshtein, so the oracle contract is
    DuckDB ``levenshtein(term, q) <= d``).

    The query term itself is always included first (whether or not it is
    in the vocabulary — an unindexed term has df 0 and contributes
    nothing, but keeps AND/NOT semantics stable when the expansion is
    otherwise empty).  Members inherit stream and boost; like synonym
    expansion this recurses under Not/AtLeast and leaves phrases alone
    (the grammar does not produce fuzzy phrases)."""
    if isinstance(node, Fuzzy):
        seen = {node.text}
        members = [Term(node.text, node.stream, node.boost)]
        for m in matcher(node.text, node.dist):
            if m not in seen:
                seen.add(m)
                members.append(Term(m, node.stream, node.boost))
        return members[0] if len(members) == 1 else Or(tuple(members))
    if isinstance(node, And):
        return And(tuple(expand_fuzzy(c, matcher) for c in node.children))
    if isinstance(node, Or):
        return Or(tuple(expand_fuzzy(c, matcher) for c in node.children))
    if isinstance(node, Not):
        return Not(expand_fuzzy(node.child, matcher))
    if isinstance(node, AtLeast):
        return AtLeast(node.m, tuple(expand_fuzzy(c, matcher) for c in node.children))
    return node
