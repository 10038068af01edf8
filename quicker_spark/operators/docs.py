"""Document preparation: deterministic doc_ids + the forward index.

The reference assigns DocIds from a per-worker atomic counter
(reference: index_service/indexer.go:20,82) — ids depend on arrival order
and are only unique per worker. That breaks rank-identity across cluster
sizes, so this engine derives ids deterministically: the dense rank of
``sha256(repo \\x01 path \\x01 commit)`` over the whole corpus (SURVEY.md
§1.3). Rank assignment is the scalable two-pass scheme (range-partition by
the hash, count per partition, broadcast the offsets, number rows within
partitions) — no single-task global window, works at 10^12 rows.

The ``docs`` table is the engine's forward index (reference: KV store of
serialized documents, internal/kvdb/kv_db.go:20-33): one row per doc with
business id, bit features, doc stats, sha256(content) (the per-row
ingestion invariant) and the payload columns themselves.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quicker_spark.functions.tokenize import tokenize_col
from quicker_spark.model import LANG_BITS

DOC_KEY_COLS = ("repo", "path", "commit")


def lang_bits_col(lang: F.Column | str) -> F.Column:
    """Fixed lang -> bit enum as a pure column expression (mirrors the
    reference's keyword bit derivation, demo/job/bits.go:24-69)."""
    c = F.col(lang) if isinstance(lang, str) else lang
    expr = F.lit(0)
    for name, bit in LANG_BITS.items():
        expr = F.when(c == name, F.lit(bit)).otherwise(expr)
    return expr.cast("long")


def assign_doc_ids(df: DataFrame, key_cols=DOC_KEY_COLS,
                   n_parts: int | None = None) -> DataFrame:
    """Add a ``doc_id`` column = dense rank of sha256(key) over the corpus.

    Partition-count independent (the rank is a property of the global sort
    order of unique hashes), and scalable: range partition + per-partition
    offsets instead of a global window.
    """
    spark = df.sparkSession
    n_parts = n_parts or spark.sparkContext.defaultParallelism
    keyed = df.withColumn(
        "_h", F.sha2(F.concat_ws("\x01", *[F.col(c) for c in key_cols]), 256)
    )
    # repartitionByRange SAMPLES its input to pick bounds, then reads it
    # again — persist first so the upstream plan (e.g. corpus generation)
    # runs once, not twice.
    keyed.persist(StorageLevel.MEMORY_AND_DISK)
    parted = keyed.repartitionByRange(n_parts, "_h").sortWithinPartitions("_h")
    parted.persist(StorageLevel.MEMORY_AND_DISK)

    # Per-partition (first key, row count). Offsets are keyed by the
    # partition's FIRST HASH, not its partition index: TaskContext
    # partition ids are physical task indices and get renumbered when this
    # plan is embedded under a union/join, which would silently misalign
    # every offset. Range partitions are disjoint in _h, so the first key
    # identifies a partition in any later job over the same cache.
    # (spark_partition_id is only the GROUP KEY within this one job — the
    # collected rows are matched to partitions by first_h, so later-job
    # renumbering cannot bite.) Pure-JVM aggregate with map-side combine:
    # one row per partition enters the shuffle, and the full-width corpus
    # rows never cross the Arrow boundary just to be counted — that pass
    # was a fixed multi-second cost in the build's prepare phase.
    stats = (parted.groupBy(F.spark_partition_id().alias("_pid"))
             .agg(F.min("_h").alias("first_h"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    keyed.unpersist()
    offsets: dict[str, int] = {}
    acc = 0
    for r in sorted(stats, key=lambda r: r["first_h"]):
        offsets[r["first_h"]] = acc
        acc += r["n"]
    b_offsets = spark.sparkContext.broadcast(offsets)

    out_schema = T.StructType(parted.schema.fields + [T.StructField("doc_id", T.LongType())])

    def add_ids(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        start = None
        for pdf in batches:
            n = len(pdf)
            if n and start is None:
                start = b_offsets.value[pdf["_h"].iloc[0]]
            pdf = pdf.copy()
            pdf["doc_id"] = np.arange(start, start + n, dtype=np.int64)
            start += n
            yield pdf

    return parted.mapInPandas(add_ids, out_schema).drop("_h")


def dedupe_latest(df: DataFrame, key_cols=DOC_KEY_COLS,
                  order_col: str | None = None) -> DataFrame:
    """Latest-write-wins upsert semantics (reference deletes then re-inserts
    on AddDoc, index_service/indexer.go:76-82). With no order column the
    rows are identical duplicates and dropDuplicates suffices."""
    if order_col is None:
        return df.dropDuplicates(list(key_cols))
    w = Window.partitionBy(*key_cols).orderBy(F.desc(order_col))
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def prepare_docs(corpus: DataFrame, seg_docs: int,
                 n_parts: int | None = None,
                 id_col: str | None = None,
                 start_id: int = 0) -> DataFrame:
    """Corpus -> forward-index rows with deterministic ids and segments.

    segment_id = doc_id // seg_docs: contiguous doc ranges, so posting-list
    deltas stay small and a wave of segments maps to a doc_id range filter
    (row-group pruning on the sorted docs table).

    ``id_col``: when the business side already owns a dense unique int64
    key (the reference likewise lets callers supply the business Id,
    api/document.proto:13), trust it instead of the sha256 dense rank —
    skips the ranking passes entirely and keeps engine ids == business ids.
    """
    if id_col is not None:
        spark = corpus.sparkSession
        n = n_parts or spark.sparkContext.defaultParallelism
        ids = (corpus.withColumn("doc_id", F.col(id_col).cast("long"))
                     .repartitionByRange(n, "doc_id"))
    else:
        ids = assign_doc_ids(corpus, n_parts=n_parts)
    if start_id:
        # fresh-id appends for upsert (reference: re-added docs always get
        # larger DocIds, index_service/indexer.go:76-82)
        ids = ids.withColumn("doc_id", F.col("doc_id") + F.lit(int(start_id)))
    return ids.select(
        "doc_id",
        F.concat_ws("", F.col("repo"), F.lit(":"), F.col("path"),
                    F.lit("@"), F.col("commit")).alias("id"),
        "repo", "path", "commit", "lang",
        lang_bits_col("lang").alias("bits_feature"),
        # NULL content == empty content (doc_len 0, sha of ""), never a
        # NULL doc_len leaking into the posting encoder's dl stream
        F.size(tokenize_col(F.coalesce(F.col("content"), F.lit(""))))
        .cast("long").alias("doc_len"),
        F.sha2(F.coalesce(F.col("content"), F.lit("")), 256).alias("doc_sha"),
        (F.col("doc_id") / F.lit(seg_docs)).cast("long").alias("segment_id"),
        "content",
    )
