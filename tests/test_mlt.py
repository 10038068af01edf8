"""More-like-this (`SearchEngine.more_like_this` / `mlt_terms`).

Term selection contract (Lucene MoreLikeThis): the seed doc's distinct
terms ranked by tf*idf — tf from the seed's own token stream, idf from
the engine's global term stats — ties by term ascending; hits are the
normal OR-query top-k with the seed excluded.
"""

from __future__ import annotations

import shutil
from collections import Counter

import pytest

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.functions.tokenize import tokenize_py
from quicker_spark.model import bm25_idf
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.plans.term_query import NewTermQuery, Or

N_DOCS = 300
SEED = 17


@pytest.fixture(scope="module")
def corpus():
    return corpus_pdf(N_DOCS)


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory, corpus):
    out = str(tmp_path_factory.mktemp("mlt") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, spark.createDataFrame(corpus), out,
                IndexConfig(seg_docs=100), resume=False)
    return SearchEngine(spark, out)


def _expected_terms(corpus, seed_row, max_terms):
    """Brute-force reference over the raw corpus."""
    tf = Counter(tokenize_py(corpus.iloc[seed_row]["content"]))
    df = Counter()
    for text in corpus["content"]:
        df.update(set(tokenize_py(text)))
    ranked = sorted(tf, key=lambda t: (-(float(tf[t])
                                         * bm25_idf(len(corpus), df[t])), t))
    return ranked[:max_terms]


def _seed_doc_id(eng, seed_row, corpus):
    """Engine doc id of the corpus row (ids are rank-assigned)."""
    r = corpus.iloc[seed_row]
    rows = (eng.docs.filter(
        (eng.docs.repo == r["repo"]) & (eng.docs.path == r["path"]))
        .select("doc_id").collect())
    assert len(rows) == 1
    return int(rows[0]["doc_id"])


def test_mlt_terms_match_brute_force(eng, corpus):
    seed = _seed_doc_id(eng, SEED, corpus)
    for m in (3, 5, 8):
        assert eng.mlt_terms(seed, max_terms=m) == \
            _expected_terms(corpus, SEED, m)


def test_mlt_hits_are_or_query_minus_seed(eng, corpus):
    seed = _seed_doc_id(eng, SEED, corpus)
    terms = eng.mlt_terms(seed, max_terms=5)
    got = [(r["doc_id"], r["score"])
           for r in eng.more_like_this(seed, max_terms=5, k=10).collect()]
    q = Or(*[NewTermQuery("content", t) for t in terms])
    ref = [(r["doc_id"], r["score"])
           for r in eng.search(q, k=11).collect() if r["doc_id"] != seed]
    assert got == ref[:10]
    assert seed not in {d for d, _ in got}
    assert got  # similar docs exist in the fixture corpus


def test_mlt_missing_doc_raises(eng):
    with pytest.raises(KeyError):
        eng.more_like_this(10 ** 9, k=5)


def test_mlt_hydrate_carries_payload(eng, corpus):
    seed = _seed_doc_id(eng, SEED, corpus)
    out = eng.more_like_this(seed, max_terms=5, k=3, hydrate=True)
    assert {"doc_id", "score", "repo", "path"} <= set(out.columns)
    assert out.count() == 3
