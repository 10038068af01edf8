"""Significant-terms aggregation (`SearchEngine.significant_terms`).

Contract (ES significant_terms): foreground df over the boolean match
set (distinct per doc), background df from the global term stats,
lift = (fg_df/fg_n)/(bg_df/n_docs), min_doc_count floor, rank
(lift desc, word asc), top size.
"""

from __future__ import annotations

import shutil
from collections import Counter

import pytest

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.functions.tokenize import tokenize_py
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.plans.term_query import And, NewTermQuery, Or

N_DOCS = 300


@pytest.fixture(scope="module")
def corpus():
    return corpus_pdf(N_DOCS)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("sig") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, spark.createDataFrame(corpus), out,
                IndexConfig(seg_docs=100), resume=False)
    return SearchEngine(spark, out)


def _brute(corpus, match_terms, size, min_df):
    doc_toks = [set(tokenize_py(t)) for t in corpus["content"]]
    m = [i for i, s in enumerate(doc_toks)
         if all(t in s for t in match_terms)]
    fg = Counter(w for i in m for w in doc_toks[i])
    bg = Counter(w for s in doc_toks for w in s)
    fg_n, n = float(len(m)), float(len(doc_toks))
    rows = [(w, c, bg[w], (c / fg_n) / (bg[w] / n))
            for w, c in fg.items() if c >= min_df]
    rows.sort(key=lambda r: (-r[3], r[0]))
    return rows[:size]


def test_matches_brute_force(eng, corpus):
    q = And(NewTermQuery("content", "def"),
            NewTermQuery("content", "import"))
    got = [(r["word"], r["fg_df"], r["bg_df"], r["lift"])
           for r in eng.significant_terms(q, size=15,
                                          min_doc_count=3).collect()]
    # brute-force uses row-index ids; doc ids are a permutation of rows,
    # so per-term counts (and therefore the ranked rows) are identical
    assert got == _brute(corpus, ("def", "import"), 15, 3)
    assert got


def test_min_doc_count_floors_rare_terms(eng):
    q = Or(NewTermQuery("content", "def"))
    rows = eng.significant_terms(q, size=10 ** 6, min_doc_count=5).collect()
    assert rows and all(r["fg_df"] >= 5 for r in rows)


def test_no_matches_is_empty_with_schema(eng):
    q = Or(NewTermQuery("content", "zzzznothere"))
    out = eng.significant_terms(q)
    assert out.count() == 0
    assert out.columns == ["word", "fg_df", "bg_df", "lift"]


def _n_broadcast_hints(df) -> int:
    """Count EXPLICIT broadcast hints in the analyzed plan (AQE may
    still add runtime broadcasts; those are legitimate and invisible
    here)."""
    return df._jdf.queryExecution().analyzed().toString().count(
        "ResolvedHint")


def test_vocabulary_never_broadcast_at_scale(eng, monkeypatch):
    """The background term-stats side scales with the corpus VOCABULARY
    (10^8+ terms at the target scale) — it must carry an explicit
    broadcast hint ONLY while n_terms is broadcast-sized."""
    import quicker_spark.engine as E

    q = Or(NewTermQuery("content", "def"))
    small = eng.significant_terms(q, size=5)
    assert int(eng.stats["n_terms"]) <= E._SIG_TERMS_BCAST_MAX
    n_small = _n_broadcast_hints(small)

    monkeypatch.setitem(eng.stats, "n_terms", E._SIG_TERMS_BCAST_MAX + 1)
    large = eng.significant_terms(q, size=5)
    n_large = _n_broadcast_hints(large)
    assert n_small == n_large + 1, (
        f"expected exactly the vocabulary broadcast hint to disappear "
        f"past the threshold (small={n_small}, large={n_large})")
    # and the de-hinted plan still returns the same ranked rows
    assert [tuple(r) for r in large.collect()] == \
        [tuple(r) for r in small.collect()]
