"""Iceberg catalog-table integration: build -> query -> delete against a
catalog table identifier, and the maintenance docs commit as one
overwritePartitions snapshot.

SKIPPED in this sandbox — the local PySpark install ships no Iceberg
runtime jar (verified by classpath scan) — but present so a deployment
WITH the runtime exercises the io seam end-to-end instead of trusting a
docstring. Catalog configs are set at runtime (Spark resolves catalogs
lazily on first use), so the shared test session works unchanged.
"""

from __future__ import annotations

import glob
import os

import pytest


def _iceberg_jar_present() -> bool:
    try:
        import pyspark

        jars = os.path.join(os.path.dirname(pyspark.__file__), "jars")
        return bool(glob.glob(os.path.join(jars, "iceberg-spark-runtime*.jar")))
    except Exception:
        return False


pytestmark = pytest.mark.skipif(
    not _iceberg_jar_present(),
    reason="no Iceberg runtime jar on the classpath (sandbox limitation; "
           "runs on a deployment with iceberg-spark-runtime)")


@pytest.fixture()
def catalog(spark, tmp_path):
    spark.conf.set("spark.sql.catalog.it",
                   "org.apache.iceberg.spark.SparkCatalog")
    spark.conf.set("spark.sql.catalog.it.type", "hadoop")
    spark.conf.set("spark.sql.catalog.it.warehouse",
                   str(tmp_path / "warehouse"))
    spark.sql("CREATE NAMESPACE IF NOT EXISTS it.db")
    return "it.db"


def test_catalog_corpus_build_query_delete(spark, catalog, tmp_path):
    """The full lifecycle with the corpus read from a CATALOG TABLE
    identifier through the io seam (io.read_corpus), exactly as
    `--corpus my_cat.raw.source_files` would run on a cluster."""
    from quicker_spark.engine import SearchEngine
    from quicker_spark.fixtures import corpus_pdf
    from quicker_spark.io import read_corpus, write_corpus
    from quicker_spark.operators.build import IndexConfig, build_index
    from quicker_spark.operators.maintain import delete_docs
    from quicker_spark.plans.term_query import NewTermQuery, Or

    tbl = f"{catalog}.corpus"
    write_corpus(spark.createDataFrame(corpus_pdf(200)), tbl)
    corpus = read_corpus(spark, tbl)
    out = str(tmp_path / "idx")
    build_index(spark, corpus, out, IndexConfig(seg_docs=100), resume=False)

    eng = SearchEngine(spark, out)
    assert eng.count() == 200
    q = Or(NewTermQuery("content", "def"), NewTermQuery("content", "return"))
    before = eng.search(q, k=10).collect()
    assert before

    delete_docs(spark, out, [int(before[0]["doc_id"])])
    eng2 = SearchEngine(spark, out)
    assert eng2.count() == 199
    after = {r["doc_id"] for r in eng2.search(q, k=10).collect()}
    assert int(before[0]["doc_id"]) not in after


def test_overwrite_docs_partitions_snapshot(spark, catalog):
    """The maintenance docs commit in catalog mode: one
    overwritePartitions call replaces exactly the affected segment
    partitions, leaves the others untouched, and is atomic."""
    from pyspark.sql import functions as F

    from quicker_spark.io import overwrite_docs_partitions

    tbl = f"{catalog}.docs"
    spark.sql(f"DROP TABLE IF EXISTS {tbl}")
    base = spark.range(0, 300).select(
        F.col("id").alias("doc_id"),
        (F.col("id") / 100).cast("long").alias("segment_id"),
        F.concat(F.lit("doc"), F.col("id")).alias("content"))
    base.writeTo(tbl).partitionedBy(F.col("segment_id")).create()

    # replace segment 1 with half its rows; segments 0 and 2 untouched
    repl = base.filter((F.col("segment_id") == 1) & (F.col("doc_id") < 150))
    overwrite_docs_partitions(repl, tbl)

    out = spark.table(tbl)
    assert out.filter("segment_id = 0").count() == 100
    assert out.filter("segment_id = 1").count() == 50
    assert out.filter("segment_id = 2").count() == 100
