"""Index maintenance: delete + upsert over immutable posting segments.

The reference mutates in place — DeleteDoc removes the doc from every
term's skiplist and the KV store (reference: index_service/indexer.go:
100-124, skiplist_reverse_index.go:62-74), and AddDoc is delete-then-
insert with a fresh, larger DocId (indexer.go:76-82). This engine's
segments are immutable parquet, so maintenance is partition-granular:

- delete: dynamic-partition-overwrite ONLY the docs segment directories
  that lost docs, rebuild only the posting waves covering those segments
  (manifest tells which), re-derive corpus stats. Untouched waves and
  untouched docs partitions are never rewritten — the WAND block bounds
  are derived from the CURRENT avgdl at query time (kernels.py
  with_bounds), so an avgdl shift costs zero I/O.
- upsert: remove the replaced business keys from their segments, append
  the new docs with fresh ids past the current max (the reference's
  fresh-DocId contract), and build the waves covering replaced + new
  segments. The boundary segment (old max id's partial segment) is
  included so old and new docs merge.

Nothing data-sized ever reaches the driver: the only collects are the
distinct affected-segment set and per-segment row counts (one row per
affected segment). At warehouse scale the dynamic partition overwrite
becomes an Iceberg MERGE/overwrite-partitions commit through the same
code seam; the wave rebuild is already a partition-local job.

Crash safety: a commit marker (`maintain_pending.json`) records segment
directories scheduled for removal before any is deleted; every
maintenance entry point first completes a half-done removal. The posting
wave + manifest writes are idempotent overwrites, so re-running the same
maintenance call after a crash converges.
"""

from __future__ import annotations

import json
import os
import shutil
from collections import defaultdict
from collections.abc import Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quicker_spark.operators.build import IndexConfig, write_wave
from quicker_spark.operators.docs import DOC_KEY_COLS, prepare_docs

_PENDING = "maintain_pending.json"


def _load_stats(index_dir: str) -> dict:
    with open(os.path.join(index_dir, "stats.json")) as fh:
        return json.load(fh)


def _cfg_from_stats(stats: dict) -> IndexConfig:
    return IndexConfig(
        seg_docs=int(stats["seg_docs"]),
        n_salts=int(stats.get("n_salts", 16)),
        block_size=int(stats["block_size"]),
        k1=float(stats["k1"]), b=float(stats["b"]),
        wave_segments=int(stats.get("wave_segments", 64)),
        fields=tuple(stats["fields"]),
        id_col=stats.get("id_col"),
        tf_mode=stats.get("tf_mode", "arrow_pairs"),
    )


def _recover(index_dir: str) -> None:
    """Finish a half-done maintenance commit: remove any segment dirs the
    crashed run had scheduled for deletion (idempotent)."""
    marker = os.path.join(index_dir, _PENDING)
    if not os.path.exists(marker):
        return
    with open(marker) as fh:
        pending = json.load(fh)
    for rel in pending.get("remove_dirs", []):
        shutil.rmtree(os.path.join(index_dir, rel), ignore_errors=True)
    os.remove(marker)


def _remove_seg_dirs(index_dir: str, segs: Iterable[int]) -> None:
    """Crash-safe removal of now-empty docs segment directories."""
    rels = [os.path.join("docs", f"segment_id={int(s)}") for s in segs]
    rels = [r for r in rels if os.path.isdir(os.path.join(index_dir, r))]
    if not rels:
        return
    marker = os.path.join(index_dir, _PENDING)
    with open(marker, "w") as fh:
        json.dump({"remove_dirs": rels}, fh)
    for rel in rels:
        shutil.rmtree(os.path.join(index_dir, rel), ignore_errors=True)
    os.remove(marker)


def _recompute_stats(spark: SparkSession, index_dir: str, stats: dict) -> dict:
    agg = spark.read.parquet(os.path.join(index_dir, "docs")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("total")
    ).collect()[0]
    stats = dict(stats)
    stats["n_docs"] = int(agg["n"])
    stats["total_len"] = int(agg["total"] or 0)
    stats["avgdl"] = (stats["total_len"] / stats["n_docs"]
                      if stats["n_docs"] else 0.0)
    with open(os.path.join(index_dir, "stats.json"), "w") as fh:
        json.dump(stats, fh)
    return stats


def _wave_map(spark: SparkSession, index_dir: str) -> dict[int, list[int]]:
    """wave key -> its segment ids, from the lineage manifest."""
    rows = (spark.read.parquet(os.path.join(index_dir, "manifest"))
            .select("wave", "segment_id").distinct().collect())
    m: dict[int, list[int]] = defaultdict(list)
    for r in rows:
        m[int(r["wave"])].append(int(r["segment_id"]))
    return dict(m)


def _refresh_term_stats(spark: SparkSession, index_dir: str) -> None:
    # column-pruned scan of (term, df) + map-side combine; one row per
    # (term, segment) enters the shuffle
    posts = spark.read.parquet(os.path.join(index_dir, "postings"))
    (posts.groupBy("term").agg(F.sum("df").alias("df_global"))
          .write.mode("overwrite")
          .parquet(os.path.join(index_dir, "term_stats")))


def _overwrite_affected_docs(docs_kept: DataFrame, affected: set[int],
                             index_dir: str) -> set[int]:
    """Dynamic-partition-overwrite the affected docs segment dirs with
    ``docs_kept`` (rows of affected segments only, already filtered).
    Returns the segments that ended up EMPTY (dynamic overwrite writes no
    partition for them, so their stale dirs must be removed)."""
    counts = {int(r["segment_id"]): int(r["n"])
              for r in docs_kept.groupBy("segment_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    (docs_kept.sortWithinPartitions("doc_id")
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("segment_id")
     .parquet(os.path.join(index_dir, "docs")))
    return {s for s in affected if counts.get(s, 0) == 0}


def _rebuild(spark: SparkSession, index_dir: str, stats: dict,
             affected_segments: set[int]) -> dict:
    """Shared tail of delete/upsert: refresh stats, rebuild the waves
    covering ``affected_segments`` (plus new waves for unmanifested
    segments), refresh term stats. Untouched waves are never read or
    written."""
    cfg = _cfg_from_stats(stats)
    stats = _recompute_stats(spark, index_dir, stats)
    avgdl = float(stats["avgdl"])  # rebuilt waves get a fresh avgdl_ref;
    # untouched waves keep their stale one — bounds stay admissible
    # (with_bounds' corner correction), just marginally less tight
    wave_map = _wave_map(spark, index_dir)
    manifested = {s for segs in wave_map.values() for s in segs}

    docs_df = spark.read.parquet(os.path.join(index_dir, "docs"))
    rebuilt_waves: list[int] = []
    for wkey, segs in sorted(wave_map.items()):
        if affected_segments & set(segs):
            write_wave(spark, docs_df, segs, cfg, avgdl, index_dir, wkey=wkey)
            rebuilt_waves.append(wkey)
    new_segs = sorted(s for s in affected_segments if s not in manifested)
    new_waves = [new_segs[i:i + cfg.wave_segments]
                 for i in range(0, len(new_segs), cfg.wave_segments)]
    for wave in new_waves:
        write_wave(spark, docs_df, wave, cfg, avgdl, index_dir)
        rebuilt_waves.append(min(wave))

    _refresh_term_stats(spark, index_dir)
    return {"rebuilt_waves": sorted(rebuilt_waves),
            "n_docs": stats["n_docs"]}


def _ids_dataframe(spark: SparkSession,
                   doc_ids: Iterable[int] | DataFrame) -> DataFrame:
    if isinstance(doc_ids, DataFrame):
        return doc_ids.select(F.col(doc_ids.columns[0]).cast("long")
                              .alias("doc_id"))
    return spark.createDataFrame([(int(i),) for i in doc_ids], "doc_id long")


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: Iterable[int] | DataFrame) -> dict:
    """Delete documents by engine doc_id (reference: Indexer.DeleteDoc,
    index_service/indexer.go:100-124; batch form of kvdb BatchDelete).

    Touches only the segment partitions/waves containing victims; the
    only driver-side data is the distinct affected-segment set.
    """
    _recover(index_dir)
    stats = _load_stats(index_dir)
    seg_docs = int(stats["seg_docs"])
    ids_df = _ids_dataframe(spark, doc_ids)
    segs = {int(r[0]) for r in
            ids_df.select((F.col("doc_id") / seg_docs).cast("long").alias("s"))
            .distinct().collect()}

    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    affected_docs = docs.filter(
        F.col("segment_id").isin([int(s) for s in segs]))
    kept = affected_docs.join(F.broadcast(ids_df), "doc_id", "left_anti")
    emptied = _overwrite_affected_docs(kept, segs, index_dir)
    _remove_seg_dirs(index_dir, emptied)
    return _rebuild(spark, index_dir, stats, segs)


def upsert_docs(spark: SparkSession, index_dir: str, new_corpus: DataFrame,
                key_cols=DOC_KEY_COLS) -> dict:
    """Delete-then-insert upsert (reference: Indexer.AddDoc,
    indexer.go:70-97 — replaced business keys get FRESH, larger doc ids).

    One dynamic-partition-overwrite covers everything: replaced segments
    are rewritten without their victims, the boundary segment keeps its
    surviving rows, and new segments appear as fresh partitions.
    """
    _recover(index_dir)
    stats = _load_stats(index_dir)
    seg_docs = int(stats["seg_docs"])
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))

    keys = new_corpus.select(*key_cols).distinct()
    replaced = docs.join(F.broadcast(keys), list(key_cols), "left_semi")
    n_replaced = replaced.count()
    start = (docs.agg(F.max("doc_id")).collect()[0][0] or -1) + 1

    new_docs = prepare_docs(new_corpus, seg_docs,
                            id_col=stats.get("id_col"),
                            start_id=int(start)).cache()
    n_new = new_docs.count()
    # affected segments: replaced docs' + new docs' (tiny distinct aggs)
    segs = {int(r[0]) for r in replaced.select("segment_id").distinct().collect()}
    segs |= {int(r[0]) for r in new_docs.select("segment_id").distinct().collect()}

    affected_docs = docs.filter(F.col("segment_id").isin([int(s) for s in segs]))
    kept = affected_docs.join(F.broadcast(replaced.select("doc_id")),
                              "doc_id", "left_anti")
    merged = kept.unionByName(new_docs.select(*kept.columns))
    emptied = _overwrite_affected_docs(merged, segs, index_dir)
    _remove_seg_dirs(index_dir, emptied)
    new_docs.unpersist()

    res = _rebuild(spark, index_dir, stats, segs)
    res["n_inserted"] = n_new
    res["n_replaced"] = n_replaced
    return res
