"""Boolean query tree (the engine's IR).

Recreates the reference's recursive AND/OR TermQuery shape and combinator
semantics (reference: api/term_query.proto:9-13, gen/term_query.go:8-96):

- a node is a leaf keyword, a ``must`` (AND) list, or a ``should`` (OR) list
- combinators drop Empty children (gen/term_query.go:28-35, 44-51)
- ``str()`` renders the same parenthesized infix ``&&``/``||`` form the
  reference uses as its debug/cache key (gen/term_query.go:55-96)

Terms are field-namespaced exactly like the reference: the index key is
``field + '\\x01' + word`` (reference: gen/document.go:3-9).
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field

FIELD_SEP = "\x01"


@dataclass(frozen=True)
class TermQuery:
    keyword: str = ""  # field-namespaced term key, "" for inner nodes
    must: tuple["TermQuery", ...] = field(default_factory=tuple)
    should: tuple["TermQuery", ...] = field(default_factory=tuple)
    # nested exclusion (ES bool-query ``must_not`` at any depth): the
    # node matches its positive part MINUS the union of these subtrees.
    # Only valid alongside a positive part — a pure-NOT node would need
    # the corpus-sized complement and is Empty by construction (the
    # Lucene "cannot search for pure negation inside a clause" rule).
    # The reference IR has no NOT (api/term_query.proto:9-13); this is
    # the ES-parity extension the round-4 verdict asked for.
    must_not: tuple["TermQuery", ...] = field(default_factory=tuple)

    # -- predicates -------------------------------------------------------
    def empty(self) -> bool:
        return not self.keyword and not self.must and not self.should

    # -- combinators (Empty-pruning, like gen/term_query.go:23-53) --------
    def and_(self, *others: "TermQuery") -> "TermQuery":
        return And(self, *others)

    def or_(self, *others: "TermQuery") -> "TermQuery":
        return Or(self, *others)

    # -- rendering --------------------------------------------------------
    def __str__(self) -> str:
        if self.keyword:
            return self.keyword.replace(FIELD_SEP, "\\")
        if self.must:
            inner = [str(q) for q in self.must if not q.empty()]
            base = "(" + "&&".join(inner) + ")" if inner else ""
        elif self.should:
            inner = [str(q) for q in self.should if not q.empty()]
            base = "(" + "||".join(inner) + ")" if inner else ""
        else:
            base = ""
        if base and self.must_not:
            negs = [str(q) for q in self.must_not if not q.empty()]
            if negs:
                return "(" + base + "&&!(" + "||".join(negs) + "))"
        return base

    def terms(self) -> set[str]:
        """All leaf term keys in the tree — the SCAN set (includes
        ``must_not`` subtrees: exclusion needs their postings too)."""
        if self.keyword:
            return {self.keyword}
        out: set[str] = set()
        for q in self.must + self.should + self.must_not:
            out |= q.terms()
        return out

    def pos_terms(self) -> set[str]:
        """Leaf term keys NOT under any ``must_not`` subtree — the
        SCORING set (negated terms never contribute score)."""
        if self.keyword:
            return {self.keyword}
        out: set[str] = set()
        for q in self.must + self.should:
            out |= q.pos_terms()
        return out

    def has_must_not(self) -> bool:
        if self.must_not:
            return True
        return any(q.has_must_not() for q in self.must + self.should)

    # -- (de)serialization (mirrors the proto shape, FIXTURES.md §4) ------
    def to_dict(self) -> dict:
        if self.keyword:
            f, _, w = self.keyword.partition(FIELD_SEP)
            return {"keyword": {"field": f, "word": w}}
        d: dict = {}
        if self.must:
            d["must"] = [q.to_dict() for q in self.must]
        else:
            d["should"] = [q.to_dict() for q in self.should]
        if self.must_not:
            d["must_not"] = [q.to_dict() for q in self.must_not]
        return d

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @staticmethod
    def from_dict(d: dict) -> "TermQuery":
        if "keyword" in d:
            kw = d["keyword"]
            return NewTermQuery(kw.get("field", ""), kw.get("word", ""))
        if "must" in d:
            pos = And(*[TermQuery.from_dict(c) for c in d["must"]])
        elif "should" in d:
            pos = Or(*[TermQuery.from_dict(c) for c in d["should"]])
        else:
            return Empty()
        if d.get("must_not"):
            return AndNot(pos, *[TermQuery.from_dict(c)
                                 for c in d["must_not"]])
        return pos

    @staticmethod
    def from_json(s: str) -> "TermQuery":
        return TermQuery.from_dict(json.loads(s))


def NewTermQuery(field_name: str, word: str) -> TermQuery:
    """Leaf term; empty word -> Empty (gen/term_query.go:8-21)."""
    if not word:
        return TermQuery()
    return TermQuery(keyword=f"{field_name}{FIELD_SEP}{word}")


def Empty() -> TermQuery:
    return TermQuery()


def And(*queries: TermQuery) -> TermQuery:
    """AND node, dropping Empty children (gen/term_query.go:23-35)."""
    kids = tuple(q for q in queries if q is not None and not q.empty())
    if not kids:
        return TermQuery()
    if len(kids) == 1:
        return kids[0]
    return TermQuery(must=kids)


def Or(*queries: TermQuery) -> TermQuery:
    """OR node, dropping Empty children (gen/term_query.go:37-53)."""
    kids = tuple(q for q in queries if q is not None and not q.empty())
    if not kids:
        return TermQuery()
    if len(kids) == 1:
        return kids[0]
    return TermQuery(should=kids)


def AndNot(positive: TermQuery, *negs: TermQuery) -> TermQuery:
    """Positive subtree MINUS the union of ``negs`` (nested ES
    ``must_not``). Empty negs are dropped (excluding nothing is a
    no-op); an empty POSITIVE is Empty — pure negation matches nothing
    rather than the corpus-sized complement."""
    kids = tuple(q for q in negs if q is not None and not q.empty())
    if positive is None or positive.empty():
        return TermQuery()
    if not kids:
        return positive
    if positive.keyword:
        return TermQuery(must=(positive,), must_not=kids)
    return TermQuery(must=positive.must, should=positive.should,
                     must_not=positive.must_not + kids)
