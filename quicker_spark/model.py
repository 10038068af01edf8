"""Shared engine constants and pure math — no Spark imports.

Single source of truth for everything the Spark engine, the Python oracle,
and the DuckDB oracle SQL must agree on exactly: term key format, the lang
bit enum, the bit-flag predicate, and the BM25 formula.
"""

from __future__ import annotations

import math
from collections.abc import Iterable

FIELD_SEP = "\x01"

# Fixed bit enum derived from `lang` (mirrors the reference's 14-class
# keyword bit enum, reference: demo/job/bits.go:6-21; ours is keyed on the
# corpus `lang` column per FIXTURES.md §2).
LANG_BITS = {"python": 1 << 0, "go": 1 << 1, "java": 1 << 2, "js": 1 << 3,
             "rust": 1 << 4, "c": 1 << 5,
             # natural-language classes (driver `documents` corpus)
             "en": 1 << 6, "de": 1 << 7, "zh": 1 << 8, "fr": 1 << 9,
             "es": 1 << 10}

# BM25 parameters mandated by the north rule (BASELINE.json).
K1 = 1.2
B = 0.75


def business_id(repo: str, path: str, commit: str) -> str:
    return f"{repo}:{path}@{commit}"


def term_key(field: str, word: str) -> str:
    """Field-namespaced index key (reference: gen/document.go:3-9)."""
    return f"{field}{FIELD_SEP}{word}"


def filter_by_bits(bits: int, on: int = 0, off: int = 0,
                   or_flags: Iterable[int] = ()) -> bool:
    """Exact predicate semantics of the reference
    (internal/reverse_index/skiplist_reverse_index.go:158-171):
    ``bits&on == on AND bits&off == 0 AND for every f in or_flags with
    f > 0: bits&f > 0``. A zero-valued orFlag is a no-op, not a
    reject-everything predicate (the reference guards ``orFlag > 0``).
    """
    if bits & on != on:
        return False
    if bits & off != 0:
        return False
    for f in or_flags:
        if f > 0 and bits & f == 0:
            return False
    return True


def bm25_idf(n_docs: int, df: int) -> float:
    """Robertson/Sparck-Jones idf with the +1 floor (always positive):
    ``ln((N - df + 0.5)/(df + 0.5) + 1)``."""
    return math.log((n_docs - df + 0.5) / (df + 0.5) + 1.0)


def bm25_term_score(tf: float, dl: float, avgdl: float, idf: float,
                    k1: float = K1, b: float = B) -> float:
    """One term's BM25 contribution. Expression order is fixed — the Spark
    engine and the DuckDB SQL compute the same float64 ops in the same
    order so scores agree bit-for-bit (BASELINE.md rank-identity)."""
    return idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * dl / avgdl))
