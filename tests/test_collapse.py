"""Field collapsing (`SearchEngine.search_collapse`) and the
full-match-set scorer it builds on (`_scored_matches`).

Contract (ES collapse): global top-k over the BEST-scoring doc per
group key — exact (every match scored), one hit per group, engine
tie-break (score desc, doc_id asc) at both levels.
"""

from __future__ import annotations

import shutil

import pytest

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.plans.term_query import NewTermQuery, Or


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("collapse") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, spark.createDataFrame(corpus_pdf(300)), out,
                IndexConfig(seg_docs=100), resume=False)
    return SearchEngine(spark, out)


def _q():
    return Or(NewTermQuery("content", "def"),
              NewTermQuery("content", "return"))


def test_scored_matches_is_search_without_topk(eng):
    full = {r["doc_id"]: r["score"]
            for r in eng._scored_matches(_q()).collect()}
    topk = [(r["doc_id"], r["score"])
            for r in eng.search(_q(), k=10, mode="taat").collect()]
    assert len(full) >= len(topk)
    for d, s in topk:  # the top-k is a prefix of the full scored set
        assert full[d] == s
    match_ids = {r["doc_id"] for r in eng.search_bool(_q()).collect()}
    assert set(full) == match_ids  # every boolean match is scored


def test_collapse_matches_brute_force(eng):
    scored = eng._scored_matches(_q()).collect()
    langs = {r["doc_id"]: r["lang"]
             for r in eng.hydrate_join(
                 eng._scored_matches(_q()), cols=("lang",)).collect()}
    best: dict[str, tuple] = {}
    for r in sorted(scored, key=lambda r: (-r["score"], r["doc_id"])):
        g = langs[r["doc_id"]]
        if g not in best:
            best[g] = (r["doc_id"], r["score"], g)
    expect = sorted(best.values(), key=lambda t: (-t[1], t[0]))[:5]
    got = [(r["doc_id"], r["score"], r["lang"])
           for r in eng.search_collapse(_q(), by="lang", k=5).collect()]
    assert got == expect
    assert len({g for _, _, g in got}) == len(got)  # one hit per group


def test_collapse_empty_query(eng):
    out = eng.search_collapse(Or(NewTermQuery("content", "zzzznothere")),
                              by="lang", k=5)
    assert out.count() == 0
