"""Driver contract for the spark-graft builder (PySpark target).

``entry``    — flagship BM25 top-k over the sf0.001 documents corpus via
               the full segmented-index pipeline (tokenize -> salted
               posting build -> varbyte segments -> block-max WAND).
``queries``  — one entry per implemented operator (SURVEY.md §2 + the
               training-data operators), from quicker_spark.driver_queries.
``oracle_sql`` — exact DuckDB twins, column-aligned, floats rounded 4 dp.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from pyspark.sql import functions as F

    from quicker_spark.driver_queries import _bm25_query, get_engine

    eng = get_engine(spark, "/root/testdata/sf0.001")
    hits = eng.search(_bm25_query(), k=10, mode="wand", hydrate=True)
    return hits.select("doc_id", F.round("score", 4).alias("score_r"),
                       "id", "repo", "lang", "doc_sha")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from quicker_spark.driver_queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from quicker_spark.driver_queries import ORACLE_SQL

    return dict(ORACLE_SQL)
