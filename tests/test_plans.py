"""Physical-plan assertions: the plans we designed are the plans we get.

Scale behavior is decided by the plan shape (SURVEY.md §4): term filters
must reach the postings parquet scan as pushed filters, hydration must be
a broadcast join, and the scan must prune to the queried columns. These
tests freeze that contract so a regression shows up as a failed assert,
not as a 10x slowdown at the next scale-up.
"""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from quicker_spark.engine import SearchEngine
from quicker_spark.fixtures import corpus_pdf
from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.plans.term_query import NewTermQuery, Or


@pytest.fixture(scope="module")
def eng(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("plans") / "idx")
    shutil.rmtree(out, ignore_errors=True)
    build_index(spark, spark.createDataFrame(corpus_pdf(200)), out,
                IndexConfig(seg_docs=100), resume=False)
    return SearchEngine(spark, out)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _formatted(df) -> str:
    jvm = df.sparkSession._jvm
    return jvm.org.apache.spark.sql.api.python.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_term_filter_pushed_to_postings_scan(eng):
    df = eng._postings_for({"content\x01def", "content\x01return"})
    plan = _formatted(df)
    assert "PushedFilters" in plan
    # the IN-filter on term must reach the parquet reader
    assert "In(term" in plan or "term IN" in plan


def test_postings_scan_prunes_columns(eng):
    df = eng.postings.select("term", "df")
    plan = _formatted(df)
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "ids" not in read_schema[0]


def test_hydration_join_is_broadcast(eng):
    hits = eng.search(Or(NewTermQuery("content", "def")), k=5, hydrate=True)
    plan = _plan(hits)
    assert "BroadcastHashJoin" in plan


def test_topk_is_take_ordered(eng):
    hits = eng.search(Or(NewTermQuery("content", "def")), k=5)
    assert "TakeOrderedAndProject" in _plan(hits)


def test_docs_scan_prunes_for_count(eng):
    plan = _formatted(eng.docs.select("doc_id"))
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema and "content" not in read_schema[0]
