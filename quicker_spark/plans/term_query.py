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
            return "(" + "&&".join(inner) + ")" if inner else ""
        if self.should:
            inner = [str(q) for q in self.should if not q.empty()]
            return "(" + "||".join(inner) + ")" if inner else ""
        return ""

    def terms(self) -> set[str]:
        """All leaf term keys in the tree."""
        if self.keyword:
            return {self.keyword}
        out: set[str] = set()
        for q in self.must + self.should:
            out |= q.terms()
        return out

    # -- (de)serialization (mirrors the proto shape, FIXTURES.md §4) ------
    def to_dict(self) -> dict:
        if self.keyword:
            f, _, w = self.keyword.partition(FIELD_SEP)
            return {"keyword": {"field": f, "word": w}}
        if self.must:
            return {"must": [q.to_dict() for q in self.must]}
        return {"should": [q.to_dict() for q in self.should]}

    def to_json(self) -> str:
        return json.dumps(self.to_dict(), sort_keys=True)

    @staticmethod
    def from_dict(d: dict) -> "TermQuery":
        if "keyword" in d:
            kw = d["keyword"]
            return NewTermQuery(kw.get("field", ""), kw.get("word", ""))
        if "must" in d:
            return And(*[TermQuery.from_dict(c) for c in d["must"]])
        if "should" in d:
            return Or(*[TermQuery.from_dict(c) for c in d["should"]])
        return Empty()

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
