"""minimum_should_match (ES should-clause quorum; Lucene
``BooleanQuery.setMinimumNumberShouldMatch``).

Contract: a candidate must match >= msm DISTINCT positive query terms;
survivors are scored over EVERY matching term (exactly like the plain
query), so msm<=1 is bitwise-identical to no constraint and
msm==len(terms) has the AND query's candidate set with the OR query's
scores. Beyond the reference (its boolean tree has no quorum operator,
skiplist_reverse_index.go:192-206) — standard serving surface.
"""

from __future__ import annotations

import shutil

import pytest

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.plans.term_query import And, NewTermQuery, Or

TERMS = ("def", "return", "import")


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("msm") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, spark.createDataFrame(corpus_pdf(300)), out,
                IndexConfig(seg_docs=100), resume=False)
    return SearchEngine(spark, out)


def _q(terms=TERMS):
    return Or(*[NewTermQuery("content", t) for t in terms])


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _term_docs(eng, term):
    return {r["doc_id"]
            for r in eng.search(_q((term,)), k=10 ** 6).collect()}


def _brute_msm(eng, msm, k, exclude_docs=frozenset()):
    """Reference result: full OR scores, quorum-filtered driver-side."""
    full = _rows(eng.search(_q(), k=10 ** 6, mode="taat"))
    sets = [_term_docs(eng, t) for t in TERMS]
    keep = [(d, s) for d, s in full
            if d not in exclude_docs
            and sum(d in ds for ds in sets) >= msm]
    keep.sort(key=lambda r: (-r[1], r[0]))
    return keep[:k]


def test_msm_leq_one_is_plain_query(eng):
    plain = _rows(eng.search(_q(), k=10, mode="taat"))
    assert _rows(eng.search(_q(), k=10, min_should_match=0)) == plain
    assert _rows(eng.search(_q(), k=10, min_should_match=1)) == plain


def test_msm_two_of_three_matches_brute_force(eng):
    got = _rows(eng.search(_q(), k=10, min_should_match=2))
    assert got == _brute_msm(eng, 2, 10)
    # the quorum actually bites on this corpus: one-term-only docs exist
    # and are dropped from the candidate set
    n_plain = eng.search(_q(), k=10 ** 6, mode="taat").count()
    n_msm = eng.search(_q(), k=10 ** 6, min_should_match=2).count()
    assert 0 < n_msm < n_plain


def test_msm_all_terms_is_and_candidates_with_or_scores(eng):
    got = _rows(eng.search(_q(), k=10 ** 6, min_should_match=len(TERMS)))
    and_ids = {r["doc_id"] for r in eng.search(
        And(*[NewTermQuery("content", t) for t in TERMS]),
        k=10 ** 6, mode="taat").collect()}
    assert {d for d, _ in got} == and_ids
    # scores are the OR query's (sum over every matching term) — for
    # all-terms candidates that equals the AND query's score too
    full = dict(_rows(eng.search(_q(), k=10 ** 6, mode="taat")))
    assert all(full[d] == s for d, s in got)


def test_msm_above_term_count_is_empty(eng):
    out = eng.search(_q(), k=10, min_should_match=len(TERMS) + 1)
    assert out.count() == 0
    assert out.columns == ["doc_id", "score"]


def test_msm_rejects_nested_and_pruned_modes(eng):
    nested = And(Or(NewTermQuery("content", "def"),
                    NewTermQuery("content", "class")),
                 NewTermQuery("content", "return"))
    with pytest.raises(ValueError, match="flat OR"):
        eng.search(nested, k=10, min_should_match=2)
    with pytest.raises(ValueError, match="mode"):
        eng.search(_q(), k=10, mode="wand", min_should_match=2)


def test_msm_composes_with_exclude(eng):
    neg = Or(NewTermQuery("content", "class"))
    got = _rows(eng.search(_q(), k=10, min_should_match=2, exclude=neg))
    assert got == _brute_msm(eng, 2, 10,
                             exclude_docs=_term_docs(eng, "class"))
    assert got  # fixture sanity: exclusion leaves survivors


def test_msm_paging_continues_constrained_order(eng):
    ten = _rows(eng.search(_q(), k=10, min_should_match=2))
    page1 = _rows(eng.search(_q(), k=5, min_should_match=2))
    assert page1 == ten[:5]
    cursor = (page1[-1][1], page1[-1][0])
    page2 = _rows(eng.search(_q(), k=5, min_should_match=2, after=cursor))
    assert page2 == ten[5:10]


def test_batch_msm_matches_solo_bitwise(eng):
    qs = {"quorum": _q(), "plain": _q(), "and2":
          And(NewTermQuery("content", "def"),
              NewTermQuery("content", "import"))}
    batch = eng.search_many(qs, k=7, min_should_match={"quorum": 2})
    rows = {}
    for r in batch.collect():
        rows.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    assert rows["quorum"] == _rows(
        eng.search(_q(), k=7, min_should_match=2))
    assert rows["plain"] == _rows(eng.search(_q(), k=7))
    assert rows["and2"] == _rows(eng.search(qs["and2"], k=7))


def test_batch_msm_unreachable_quorum_drops_only_that_query(eng):
    qs = {"dead": _q(), "live": _q()}
    batch = eng.search_many(qs, k=5,
                            min_should_match={"dead": len(TERMS) + 1})
    rows = {}
    for r in batch.collect():
        rows.setdefault(r["qid"], []).append((r["doc_id"], r["score"]))
    assert "dead" not in rows
    assert rows["live"] == _rows(eng.search(_q(), k=5))


def test_batch_msm_rejects_nested(eng):
    nested = And(Or(NewTermQuery("content", "def"),
                    NewTermQuery("content", "class")),
                 NewTermQuery("content", "return"))
    with pytest.raises(ValueError, match="flat OR"):
        eng.search_many({"x": nested}, k=5, min_should_match={"x": 2})
