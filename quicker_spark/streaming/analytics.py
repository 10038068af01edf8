"""Structured Streaming analytics over the events table.

The reference is a batch index engine with no stream analytics
(SURVEY.md §2.5); this is the Spark-native layer a serving cluster
runs NEXT TO the index: continuous windowed aggregation over an event
stream (query logs, click events) with the standard
``readStream -> window -> writeStream`` shape.

Determinism contract (what lets the driver hash-compare a STREAMING
result against a batch SQL oracle): ``Trigger.AvailableNow`` processes
exactly the data present at start and stops; ``complete`` output mode
emits every window regardless of watermark progress; and the measure
columns are integers (counts + cent-scaled sums), so partial-aggregate
accumulation order cannot perturb the values. Under those three
choices a streaming run over a static directory equals the batch
aggregation over the same files, row for row.

Scale notes:
- The aggregation state is (n_windows x n_groups) rows — bounded by
  time span, not event volume; partial aggregation happens map-side
  before the one shuffle per micro-batch.
- The memory sink holds only that bounded result and exists for the
  driver/test harness; a production deployment swaps in a parquet/
  Kafka sink with the checkpointed exactly-once contract
  (:mod:`quicker_spark.streaming.ingest` shows the foreachBatch side).
- In continuous production mode the same plan runs with ``append``
  output + ``withWatermark`` so state is evicted as windows finalize;
  ``complete`` here is what makes the one-shot run oracle-equal (no
  final-window emission race at stream end).
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def windowed_event_stats(spark: SparkSession, events_path: str,
                         window: str = "1 hour",
                         ts_col: str = "ts",
                         group_col: str = "event_type",
                         value_col: str = "value") -> DataFrame:
    """Tumbling-window event statistics computed BY A STREAMING QUERY:
    per (window, group), event count and cent-scaled value sum. Runs
    the stream to completion (AvailableNow) and returns the bounded
    result frame: ``(hour, <group_col>, n, sum_x2)`` with the window
    start formatted as a string (timezone-pinned, hash-stable).

    Sums are ``round(value * 100)`` longs: integer accumulation is
    associative, so the streaming partial aggregates, the batch plan,
    and a SQL oracle agree bit-for-bit — a float sum would drift with
    accumulation order and could never be hash-compared."""
    schema = spark.read.parquet(events_path).schema
    # the file stream source wants a DIRECTORY; point it at the parent
    # and glob the one table's files (works for both a single file and
    # a part-file directory)
    if os.path.isdir(events_path):
        src = spark.readStream.schema(schema).parquet(events_path)
    else:
        parent, fname = os.path.split(events_path.rstrip("/"))
        src = (spark.readStream.schema(schema)
               .option("pathGlobFilter", fname).parquet(parent))
    cents = F.round(F.col(value_col) * F.lit(100.0)).cast("long")
    agg = (src.groupBy(F.window(ts_col, window).alias("_w"), group_col)
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(cents).alias("sum_x2")))
    name = f"stream_win_{uuid.uuid4().hex[:12]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table(name).select(
        F.date_format(F.col("_w.start"), "yyyy-MM-dd HH:mm:ss")
        .alias("hour"),
        F.col(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("sum_x2").cast("long").alias("sum_x2"))
    # materialize before dropping the backing in-memory sink table
    rows = out.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, out.schema)


def windowed_event_stats_append(spark: SparkSession, events_path: str,
                                window: str = "1 hour",
                                delay: str = "3 hours",
                                ts_col: str = "ts",
                                group_col: str = "event_type",
                                value_col: str = "value") -> DataFrame:
    """The PRODUCTION shape of :func:`windowed_event_stats`:
    ``withWatermark(delay)`` + **append** output — state is evicted as
    windows finalize, so the aggregation holds only the open windows
    regardless of how long the stream runs (the unbounded-state hazard
    ``complete`` mode would have on a continuous deployment).

    Determinism contract for the one-shot harness run: over a static
    directory under ``Trigger.AvailableNow``, the terminal no-data
    micro-batch (``spark.sql.streaming.noDataMicroBatches.enabled``,
    default on) advances the watermark to ``max(ts) - delay`` and
    flushes every FINALIZED window — exactly the windows whose end is
    at or before that watermark. Result = the batch aggregation
    restricted to those closed windows, which is the hash-comparable
    oracle twin (``stream_hourly_append``). Events that arrive behind
    the watermark after their window closed are DROPPED, never
    re-emitted — the append contract (tested with an out-of-order
    two-file stream in tests/test_streaming_analytics.py).

    Returns ``(hour, <group_col>, n, sum_x2)`` for the closed windows;
    open windows (the last ``delay`` of event time) remain in state and
    are not emitted — a continuous deployment emits them as the
    watermark passes."""
    schema = spark.read.parquet(events_path).schema
    if os.path.isdir(events_path):
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1).parquet(events_path))
    else:
        parent, fname = os.path.split(events_path.rstrip("/"))
        src = (spark.readStream.schema(schema)
               .option("maxFilesPerTrigger", 1)
               .option("pathGlobFilter", fname).parquet(parent))
    # watermarks require TIMESTAMP (tz-aware); the events table stores
    # TIMESTAMP_NTZ — the cast is wall-clock-preserving under the
    # engine's pinned UTC session timezone
    src = src.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    cents = F.round(F.col(value_col) * F.lit(100.0)).cast("long")
    agg = (src.withWatermark(ts_col, delay)
              .groupBy(F.window(ts_col, window).alias("_w"), group_col)
              .agg(F.count(F.lit(1)).alias("n"),
                   F.sum(cents).alias("sum_x2")))
    name = f"stream_app_{uuid.uuid4().hex[:12]}"
    q = (agg.writeStream.format("memory").queryName(name)
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    out = spark.table(name).select(
        F.date_format(F.col("_w.start"), "yyyy-MM-dd HH:mm:ss")
        .alias("hour"),
        F.col(group_col),
        F.col("n").cast("long").alias("n"),
        F.col("sum_x2").cast("long").alias("sum_x2"))
    rows = out.collect()
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, out.schema)
