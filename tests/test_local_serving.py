"""Resident single-node serving (`quicker_spark.serving.LocalSearcher`).

The local path must be rank- AND score-identical to the Spark path on
the same index bytes — it reuses `resolve_search_spec` and
`_score_segment_rows`, so any drift is a wiring bug. Bitwise equality
is asserted across modes, flags, boosts, paging cursors, excludes, and
quorums, on both the v5 bucket-partitioned layout and the legacy
unbucketed one.
"""

from __future__ import annotations

import shutil

import pytest

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.plans.term_query import And, NewTermQuery, Or
from quicker_spark.serving import LocalSearcher, StaleIndexError


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("local") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, spark.createDataFrame(corpus_pdf(300)), out,
                IndexConfig(seg_docs=100), resume=False)
    from quicker_spark.operators.positions import build_positions
    build_positions(spark, out, fields=("content",))
    return out


@pytest.fixture(scope="module")
def eng(spark, idx):
    return SearchEngine(spark, idx)


@pytest.fixture(scope="module")
def ls(idx):
    return LocalSearcher(idx)


def _t(w):
    return NewTermQuery("content", w)


def _assert_same(spark_hits, local_pdf):
    want = [(r["doc_id"], r["score"]) for r in spark_hits.collect()]
    got = list(zip(local_pdf["doc_id"].tolist(),
                   local_pdf["score"].tolist()))
    assert got == want  # bitwise: same kernels, same merge order


@pytest.mark.parametrize("mode", ["wand", "taat", "auto"])
def test_flat_or_identity(eng, ls, mode):
    q = Or(_t("def"), _t("return"), _t("import"))
    _assert_same(eng.search(q, k=7, mode=mode), ls.search(q, k=7, mode=mode))


@pytest.mark.parametrize("mode", ["conj", "taat", "auto"])
def test_flat_and_identity(eng, ls, mode):
    q = And(_t("def"), _t("return"))
    _assert_same(eng.search(q, k=7, mode=mode), ls.search(q, k=7, mode=mode))


def test_nested_tree_identity(eng, ls):
    q = And(Or(_t("def"), _t("class")), _t("return"))
    _assert_same(eng.search(q, k=9), ls.search(q, k=9))


def test_bit_flags_identity(eng, ls):
    q = Or(_t("def"), _t("return"))
    for on, off, orf in ((1, 0, ()), (0, 1, ()), (0, 0, (1, 2))):
        _assert_same(eng.search(q, k=8, on=on, off=off, or_flags=orf),
                     ls.search(q, k=8, on=on, off=off, or_flags=orf))


def test_boosts_identity(eng, ls):
    q = Or(_t("def"), _t("return"))
    boosts = {"content\x01def": 0.3, "content\x01return": 2.5}
    _assert_same(eng.search(q, k=6, boosts=boosts),
                 ls.search(q, k=6, boosts=boosts))


def test_paging_cursor_identity(eng, ls):
    q = Or(_t("def"), _t("return"))
    p1 = ls.search(q, k=5)
    cursor = (float(p1["score"].iloc[-1]), int(p1["doc_id"].iloc[-1]))
    _assert_same(eng.search(q, k=5, after=cursor),
                 ls.search(q, k=5, after=cursor))
    # pages never overlap and page2 continues the rank order
    p2 = ls.search(q, k=5, after=cursor)
    assert not set(p1["doc_id"]) & set(p2["doc_id"])


def test_exclude_identity(eng, ls):
    q = Or(_t("def"), _t("return"))
    ex = Or(_t("import"))
    _assert_same(eng.search(q, k=8, exclude=ex),
                 ls.search(q, k=8, exclude=ex))


def test_min_should_match_identity(eng, ls):
    q = Or(_t("def"), _t("return"), _t("import"))
    _assert_same(eng.search(q, k=8, min_should_match=2),
                 ls.search(q, k=8, min_should_match=2))
    assert len(ls.search(q, k=8, min_should_match=4)) == 0  # unreachable


def test_validation_errors_match(ls):
    with pytest.raises(ValueError):
        ls.search(And(_t("a"), _t("b")), mode="wand")
    with pytest.raises(ValueError):
        ls.search(Or(_t("a")), boosts={"content\x01a": -1.0})
    with pytest.raises(ValueError):
        ls.search(Or(_t("a")), mode="nope")


def test_absent_and_empty_terms(ls):
    assert len(ls.search(Or(_t("zzznotaterm")), k=5)) == 0
    assert len(ls.search(Or(), k=5)) == 0


def test_warm_cache_identity_and_residency(idx, eng):
    ls = LocalSearcher(idx)
    q = Or(_t("def"), _t("return"))
    cold = ls.search(q, k=7)
    assert "content\x01def" in ls._rows  # rows resident after first call
    warm = ls.search(q, k=7)
    assert cold.equals(warm)
    assert any("content\x01def" in c for c in ls._seg_dec.values()) or \
        any("content\x01def" in c for c in ls._seg_enc.values())
    _assert_same(eng.search(q, k=7), warm)


def test_lru_eviction_keeps_results_correct(idx, eng):
    ls = LocalSearcher(idx, max_terms=1)  # pathological cap: thrash
    q = Or(_t("def"), _t("return"), _t("import"))
    _assert_same(eng.search(q, k=7), ls.search(q, k=7))
    assert len(ls._rows) <= 1
    _assert_same(eng.search(q, k=7), ls.search(q, k=7))


def test_threaded_segment_scatter_identity(idx, eng):
    """Thread-parallel segment scoring is rank/score-identical at any
    thread count (total-order merge makes completion order irrelevant)."""
    q = Or(_t("def"), _t("return"), _t("import"))
    want = eng.search(q, k=9)
    for n in (1, 2, 8):
        _assert_same(want, LocalSearcher(idx, threads=n).search(q, k=9))


def test_search_many_identity(eng, ls):
    qs = {"a": Or(_t("def"), _t("return")), "b": And(_t("def"), _t("import"))}
    got = ls.search_many(qs, k=6)
    for qid, q in qs.items():
        part = got[got["qid"] == qid]
        _assert_same(eng.search(q, k=6),
                     part.drop(columns="qid").reset_index(drop=True))


def test_lookup_and_hydrate(eng, ls):
    ids = [0, 5, 42, 10_000_000]  # last one absent
    want = {(r["doc_id"], r["content"]) for r in
            eng.lookup(ids).select("doc_id", "content").collect()}
    got_pdf = ls.lookup(ids)
    assert {(int(r.doc_id), r.content)
            for r in got_pdf.itertuples()} == want
    hits = ls.search(Or(_t("def")), k=3)
    hyd = ls.hydrate(hits, cols=("content",))
    assert list(hyd["doc_id"]) == list(hits["doc_id"])  # order preserved
    assert hyd["content"].notna().all()


def test_legacy_unbucketed_layout(spark, eng, tmp_path):
    out = str(tmp_path / "idx_v4")
    build_index(spark, spark.createDataFrame(corpus_pdf(300)), out,
                IndexConfig(seg_docs=100, term_buckets=0), resume=False)
    ls4 = LocalSearcher(out)
    assert not ls4._has_bucket
    q = Or(_t("def"), _t("return"))
    _assert_same(eng.search(q, k=7), ls4.search(q, k=7))


def test_stale_after_maintenance(spark, tmp_path):
    from quicker_spark.operators.maintain import delete_docs

    out = str(tmp_path / "idx_stale")
    build_index(spark, spark.createDataFrame(corpus_pdf(200)), out,
                IndexConfig(seg_docs=100), resume=False)
    ls = LocalSearcher(out)
    assert len(ls.search(Or(_t("def")), k=3))
    delete_docs(spark, out, [0, 1])
    with pytest.raises(StaleIndexError):
        ls.search(Or(_t("def")), k=3)
    # a fresh open serves the new generation
    fresh = LocalSearcher(out)
    assert 0 not in set(fresh.search(Or(_t("def")), k=50)["doc_id"])


# -- term-dictionary expansion + query strings on the local tier --------------

def test_local_expansions_equal_engine(eng, ls):
    for args in (("expand_prefix", ("content", "tok5"), {}),
                 ("expand_prefix", ("content", "tok"),
                  {"max_expansions": 7}),
                 ("expand_regexp", ("content", "tok5[0-9]"), {}),
                 ("expand_regexp", ("content", "t.k5."),
                  {"max_expansions": 5}),
                 ("expand_fuzzy", ("content", "tok50"),
                  {"max_edits": 1, "prefix_len": 3}),
                 ("expand_fuzzy", ("content", "tok50"),
                  {"max_edits": 2, "prefix_len": 1,
                   "max_expansions": 9})):
        name, a, kw = args
        assert getattr(ls, name)(*a, **kw) == \
            getattr(eng, name)(*a, **kw), args


def test_search_string_local_equals_spark(eng, ls):
    from quicker_spark.plans.qparse import search_string

    for qs in ("def return", "+tok50 def", "def -tok50",
               "tok5* AND def", "tok50~1", "def^2.5 tok50"):
        spark_hits = [(r["doc_id"], r["score"]) for r in
                      search_string(eng, qs, k=10,
                                    max_expansions=64).collect()]
        local = search_string(ls, qs, k=10, max_expansions=64)
        local_hits = list(zip(local["doc_id"].tolist(),
                              local["score"].tolist()))
        assert local_hits == spark_hits, qs   # bitwise, not approx


def test_phrase_identity(eng, ls):
    # whole-query phrase: local sidecar serving == Spark sidecar path
    for gap in (0, 3):
        want = [(r["doc_id"], r["score"]) for r in
                eng.search_phrase(["def", "tok50"], k=8, gap=gap).collect()]
        got_pdf = ls.search_phrase(["def", "tok50"], k=8, gap=gap)
        got = list(zip(got_pdf["doc_id"].tolist(),
                       got_pdf["score"].tolist()))
        assert got == want and (got or gap == 0)


def test_phrase_clause_identity(eng, ls):
    # phrase as one clause of a boolean — pseudo-leaf path, both tiers
    from quicker_spark.engine import PhraseSpec
    from quicker_spark.plans.term_query import TermQuery

    P = TermQuery(keyword="\x02p0")
    spec = (PhraseSpec("\x02p0", "content", ("def", "tok50"), 3, True),)
    tree = And(P, Or(_t("return"), P))
    _assert_same(eng.search(tree, k=8, phrases=spec),
                 ls.search(tree, k=8, phrases=spec))


def test_search_string_phrase_local_identity(eng, ls):
    from quicker_spark.plans.qparse import search_string

    for qs in ('"def tok50"~3', '+"def tok50"~3 return',
               'def -"def tok50"'):
        want = [(r["doc_id"], r["score"]) for r in
                search_string(eng, qs, k=8).collect()]
        got_pdf = search_string(ls, qs, k=8)
        got = list(zip(got_pdf["doc_id"].tolist(),
                       got_pdf["score"].tolist()))
        assert got == want and got


def test_suggest_identity(eng, ls):
    for w, me in (("tok5", 2), ("def", 1), ("zzzz", 1)):
        want = [(r["word"], r["distance"], r["df"]) for r in
                eng.suggest("content", w, max_edits=me, n=5).collect()]
        got_pdf = ls.suggest("content", w, max_edits=me, n=5)
        got = list(zip(got_pdf["word"], got_pdf["distance"].tolist(),
                       got_pdf["df"].tolist()))
        assert got == want
