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

from pyspark import StorageLevel
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

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
    # no persist of the pre-exchange plan: repartitionByRange's sampling
    # pass recomputes scan+sha2 (a second cheap columnar read), which
    # measures far cheaper than materializing a full-width corpus cache
    # just to avoid it
    keyed = df.withColumn(
        "_h", F.sha2(F.concat_ws("\x01", *[F.col(c) for c in key_cols]), 256)
    )
    parted = keyed.repartitionByRange(n_parts, "_h").sortWithinPartitions("_h")
    parted.persist(StorageLevel.MEMORY_AND_DISK)

    # Per-partition (first key, row count): pure-JVM aggregate with
    # map-side combine — one row per partition enters the shuffle.
    # Offsets are ORDERED by the partition's first hash (range partitions
    # are disjoint in _h), then laid out as an array indexed by this
    # job's physical partition index.
    stats = (parted.groupBy(F.spark_partition_id().alias("pid"))
             .agg(F.min("_h").alias("first_h"),
                  F.count(F.lit(1)).alias("n"))
             .collect())
    n_phys = parted.rdd.getNumPartitions()
    offsets = [0] * max(n_phys, 1)
    acc = 0
    for r in sorted(stats, key=lambda r: r["first_h"]):
        offsets[int(r["pid"])] = acc
        acc += int(r["n"])

    # doc_id entirely in the JVM: monotonically_increasing_id encodes
    # (partition index << 33) + row-index-in-partition, so doc_id =
    # offsets[pid] + local index — no Arrow round-trip of the full-width
    # corpus rows (round 3 measured that pass at 2-3x the cost of the
    # actual tokenize+write it fed).
    #
    # Partition-index hazard (the round-1 duplicate-id bug): physical
    # partition indices get renumbered when this plan is embedded under a
    # union/join in a LATER job. Fenced by materializing the ids into
    # their own cache with a top-level count() BEFORE returning — the
    # nondeterministic mid expression is evaluated exactly once, in a
    # plain scan job whose partition indices match the offsets job's
    # (both are direct scans of the same cached exchange); consumers only
    # ever read the materialized values (MEMORY_AND_DISK: evicted blocks
    # spill, never recompute).
    mid = F.monotonically_increasing_id()
    local = mid.bitwiseAND(F.lit((1 << 33) - 1))
    pid = F.shiftright(mid, 33)
    off = F.element_at(
        F.array(*[F.lit(int(o)).cast("long") for o in offsets]),
        (pid + F.lit(1)).cast("int"))
    ids = (parted.withColumn("doc_id", (off + local).cast("long"))
           .drop("_h"))
    ids.persist(StorageLevel.MEMORY_AND_DISK)
    ids.count()
    parted.unpersist()
    # The persist is load-bearing (it fences the nondeterministic mid
    # expression), so it cannot be dropped here — but it must not leak
    # either: Spark's CacheManager holds it until an explicit unpersist,
    # so a long-lived caller (streaming ingest: one prepare per
    # compaction) would accumulate corpus-sized caches without bound.
    # Callers release it via release_id_cache() once the ids are
    # materialized downstream (e.g. the docs table is written).
    return ids


def release_id_cache(df: DataFrame) -> None:
    """Unpersist the doc-id fence cache behind a :func:`prepare_docs` /
    :func:`assign_doc_ids` result, once the caller has durably
    materialized the ids (written the docs table). No-op for frames
    without one (``id_col`` path)."""
    fence = getattr(df, "_id_cache", None)
    if fence is not None:
        fence.unpersist()


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
    fence = None
    if id_col is not None:
        spark = corpus.sparkSession
        n = n_parts or spark.sparkContext.defaultParallelism
        ids = (corpus.withColumn("doc_id", F.col(id_col).cast("long"))
                     .repartitionByRange(n, "doc_id"))
    else:
        ids = fence = assign_doc_ids(corpus, n_parts=n_parts)
    if start_id:
        # fresh-id appends for upsert (reference: re-added docs always get
        # larger DocIds, index_service/indexer.go:76-82)
        ids = ids.withColumn("doc_id", F.col("doc_id") + F.lit(int(start_id)))
    out = ids.select(
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
    out._id_cache = fence
    return out
