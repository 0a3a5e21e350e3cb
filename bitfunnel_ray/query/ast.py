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


@dataclass(frozen=True)
class Phrase(Node):
    tokens: tuple[str, ...]
    stream: int = 0


@dataclass(frozen=True)
class And(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Or(Node):
    children: tuple[Node, ...] = field(default_factory=tuple)


@dataclass(frozen=True)
class Not(Node):
    child: Node = None
