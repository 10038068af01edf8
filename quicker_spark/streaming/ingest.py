"""Structured Streaming ingest: micro-batch upserts into a live index.

The reference has no streaming path — ingest is batch CSV plus point
AddDoc upserts over gRPC (reference: demo/job/build_index.go:23-102,
index_service/sentinel.go:88-103; SURVEY.md §2.5 documents the absence).
This is the Spark-native equivalent: a ``readStream`` source feeds
``foreachBatch``, and every micro-batch applies the same delete-then-
insert upsert contract the reference's AddDoc has (fresh larger ids for
replaced business keys) via :func:`quicker_spark.operators.maintain.
upsert_docs`. The streaming checkpoint gives exactly-once batch replay;
the index's own wave manifests make the upsert idempotent per batch.

At scale you would buffer several micro-batches into a staging
generation and compact on a cadence instead of rebuilding affected waves
per batch — the wave-granular rebuild keeps per-batch cost proportional
to touched segments either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

from quicker_spark.operators.build import IndexConfig, build_index
from quicker_spark.operators.docs import DOC_KEY_COLS
from quicker_spark.operators.maintain import upsert_docs


def index_exists(index_dir: str) -> bool:
    return os.path.exists(os.path.join(index_dir, "stats.json"))


def stream_ingest(spark: SparkSession, source: DataFrame, index_dir: str,
                  checkpoint_dir: str, cfg: IndexConfig | None = None,
                  key_cols=DOC_KEY_COLS, available_now: bool = True):
    """Start a streaming query that maintains the index under
    ``index_dir`` from a streaming corpus source.

    ``source`` is a streaming DataFrame with the corpus schema
    (repo, path, commit, lang, content). The first non-empty batch
    bootstraps the index with a full build; later batches upsert.
    ``available_now=True`` drains what's currently available and stops
    (the testable batch-ish mode); False runs continuously.
    """
    cfg = cfg or IndexConfig()

    def handle(batch_df: DataFrame, batch_id: int) -> None:
        batch_df = batch_df.dropDuplicates(list(key_cols))
        if batch_df.isEmpty():
            return
        if not index_exists(index_dir):
            build_index(spark, batch_df, index_dir, cfg, resume=False)
        else:
            upsert_docs(spark, index_dir, batch_df, key_cols=key_cols)

    writer = (
        source.writeStream
        .foreachBatch(handle)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
