"""SynonymQuery + DisjunctionMaxQuery (Lucene semantics, beyond the
reference's And/Or IR — standard serving surface).

Synonym contract: a group of words scores as ONE pseudo-term with
tf(d) = sum of member tfs and docFreq = MAX of member global dfs;
groups combine as a flat OR. Dis-max contract: score(d) =
max_t c_t(d) + tie * (sum_t c_t(d) - max_t), c_t = idf * u; tie=1 is
bitwise the plain OR sum, tie=0 pure max.

Both are checked bitwise against brute-force references computed from
the Python Oracle's posting maps (the same float64 expression order).
"""

from __future__ import annotations

import shutil

import pytest

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.model import B, K1, bm25_idf, term_key
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.oracle import Oracle
from quicker_spark.plans.term_query import NewTermQuery, Or

N_DOCS = 300
GROUPS = {"definition": ("def", "func"), "yield": ("return",)}
DISMAX_WORDS = ("def", "return", "import")


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("syn") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, spark.createDataFrame(corpus_pdf(N_DOCS)), out,
                IndexConfig(seg_docs=100), resume=False)
    return SearchEngine(spark, out)


@pytest.fixture(scope="module")
def oracle():
    return Oracle(corpus_pdf(N_DOCS))


def _rows(df):
    return [(r["doc_id"], r["score"]) for r in df.collect()]


def _c(tf, dl, avgdl, idf):
    """One contribution in the KERNEL's float-op order: idf * (num/den)
    (model.bm25_term_score rounds (idf*num)/den — 1 ulp apart)."""
    return idf * ((tf * (K1 + 1.0)) / (tf + K1 * (1.0 - B + B * dl / avgdl)))


def _brute_synonyms(o: Oracle, groups: dict, field: str, k: int):
    scores: dict[int, float] = {}
    for name in sorted(groups):  # engine accumulates in group-key order
        words = groups[name]
        words = [words] if isinstance(words, str) else list(words)
        plists = [o.postings.get(term_key(field, w), {}) for w in words]
        dfm = max((len(p) for p in plists), default=0)
        if dfm == 0:
            continue
        idf = bm25_idf(o.n_docs, dfm)
        for d in set().union(*[set(p) for p in plists]):
            tf = sum(p.get(d, 0) for p in plists)
            scores[d] = scores.get(d, 0.0) + _c(tf, o.doc_len[d],
                                                o.avgdl, idf)
    out = sorted(scores.items(), key=lambda r: (-r[1], r[0]))
    return out[:k]


def _brute_dismax(o: Oracle, words, field: str, tie: float, k: int):
    mx: dict[int, float] = {}
    sm: dict[int, float] = {}
    for w in sorted(words):
        t = term_key(field, w)
        plist = o.postings.get(t, {})
        if not plist:
            continue
        idf = bm25_idf(o.n_docs, len(plist))
        for d, tf in plist.items():
            c = _c(tf, o.doc_len[d], o.avgdl, idf)
            sm[d] = sm.get(d, 0.0) + c
            mx[d] = max(mx.get(d, 0.0), c)
    out = sorted(((d, (1.0 - tie) * mx[d] + tie * sm[d]) for d in mx),
                 key=lambda r: (-r[1], r[0]))
    return out[:k]


# -- synonyms -----------------------------------------------------------------

def test_synonym_matches_brute_force(eng, oracle):
    got = _rows(eng.search_synonyms(GROUPS, k=10))
    assert got == _brute_synonyms(oracle, GROUPS, "content", 10)


def test_synonym_single_member_group_equals_term_query(eng):
    got = _rows(eng.search_synonyms({"g": ("return",)}, k=10))
    want = _rows(eng.search(NewTermQuery("content", "return"), k=10,
                            mode="taat"))
    assert got == want


def test_synonym_absent_member_is_inert(eng):
    with_ghost = _rows(eng.search_synonyms(
        {"definition": ("def", "func", "zzz_never_indexed")}, k=10))
    without = _rows(eng.search_synonyms({"definition": ("def", "func")},
                                        k=10))
    assert with_ghost == without


def test_synonym_tf_blend_differs_from_or(eng, oracle):
    """The blend must NOT equal the plain OR sum whenever some doc
    contains both members (tf-sum through one saturation curve != sum
    of two saturated contributions)."""
    q = Or(NewTermQuery("content", "def"), NewTermQuery("content", "func"))
    or_rows = dict(_rows(eng.search(q, k=10 ** 6, mode="taat")))
    syn_rows = dict(_rows(eng.search_synonyms(
        {"definition": ("def", "func")}, k=10 ** 6)))
    both = [d for d in syn_rows
            if d in oracle.postings.get(term_key("content", "def"), {})
            and d in oracle.postings.get(term_key("content", "func"), {})]
    assert both, "fixture must contain docs with both members"
    assert any(syn_rows[d] != or_rows[d] for d in both)


def test_synonym_all_absent_returns_empty(eng):
    assert _rows(eng.search_synonyms({"g": ("zzz_nope",)}, k=10)) == []


# -- dis_max ------------------------------------------------------------------

def test_dismax_tie_one_is_or_sum(eng):
    got = _rows(eng.search_dismax(DISMAX_WORDS, tie=1.0, k=10))
    q = Or(*[NewTermQuery("content", w) for w in DISMAX_WORDS])
    assert got == _rows(eng.search(q, k=10, mode="taat"))


@pytest.mark.parametrize("tie", [0.0, 0.3])
def test_dismax_matches_brute_force(eng, oracle, tie):
    got = _rows(eng.search_dismax(DISMAX_WORDS, tie=tie, k=10))
    assert got == _brute_dismax(oracle, DISMAX_WORDS, "content", tie, 10)


def test_dismax_changes_ranking_vs_or(eng, oracle):
    """tie=0 ranks by best single clause — differs from the OR sum's
    scores on any doc matching >= 2 terms."""
    got = dict(_rows(eng.search_dismax(DISMAX_WORDS, tie=0.0, k=10 ** 6)))
    q = Or(*[NewTermQuery("content", w) for w in DISMAX_WORDS])
    or_rows = dict(_rows(eng.search(q, k=10 ** 6, mode="taat")))
    multi = [d for d in got
             if sum(d in oracle.postings.get(term_key("content", w), {})
                    for w in DISMAX_WORDS) >= 2]
    assert multi and all(got[d] < or_rows[d] for d in multi)


def test_dismax_invalid_tie_raises(eng):
    with pytest.raises(ValueError):
        eng.search_dismax(DISMAX_WORDS, tie=1.5)
