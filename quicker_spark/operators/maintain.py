"""Index maintenance: delete + upsert over immutable posting segments.

The reference mutates in place — DeleteDoc removes the doc from every
term's skiplist and the KV store (reference: index_service/indexer.go:
100-124, skiplist_reverse_index.go:62-74), and AddDoc is delete-then-
insert with a fresh, larger DocId (indexer.go:76-82). This engine's
segments are immutable parquet, so maintenance is wave-granular rebuild
(SURVEY.md §7 hard part (e): segment generations + latest-wins):

- delete: rewrite the docs table without the victims, rebuild only the
  waves whose segments lost docs (manifest tells which), refresh the
  WAND block-max bounds everywhere else (avgdl changed), re-derive term
  stats. Untouched waves' posting bytes are never rewritten.
- upsert: delete the replaced business keys, append the new docs with
  fresh ids past the current max (the reference's fresh-DocId contract),
  and build the new waves; the boundary segment (old max id's segment)
  is rebuilt so old and new docs merge.

At 10^12-doc scale the docs-table swap becomes an Iceberg
MERGE/overwrite-partitions commit; the wave rebuild and block-max
refresh are already partition-local jobs.
"""

from __future__ import annotations

import json
import os
import shutil
from collections import defaultdict
from collections.abc import Iterable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from quicker_spark.functions.codec import varbyte_decode
from quicker_spark.functions.kernels import bm25_u
from quicker_spark.operators.build import IndexConfig, write_wave
from quicker_spark.operators.docs import DOC_KEY_COLS, prepare_docs


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
    )


def _swap_dir(tmp: str, final: str) -> None:
    """Replace ``final`` with ``tmp`` (local FS; an Iceberg commit at scale)."""
    bak = final + ".old"
    shutil.rmtree(bak, ignore_errors=True)
    if os.path.exists(final):
        os.rename(final, bak)
    os.rename(tmp, final)
    shutil.rmtree(bak, ignore_errors=True)


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


def refresh_block_max(spark: SparkSession, index_dir: str, avgdl: float,
                      waves: Iterable[int], stats: dict) -> None:
    """Re-derive the WAND block-max bounds of untouched waves under a new
    ``avgdl`` (a map-only pass: decode tf/dl streams, recompute max-u per
    block; posting bytes unchanged)."""
    k1, b, bs = float(stats["k1"]), float(stats["b"]), int(stats["block_size"])

    def refresh(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = []
            for bm, tf_b, dl_b in zip(pdf["block_max_u"], pdf["tfs"], pdf["dls"]):
                tfs = varbyte_decode(bytes(tf_b)).astype(np.int64)
                dls = varbyte_decode(bytes(dl_b)).astype(np.int64)
                u = bm25_u(tfs, dls, avgdl, k1, b)
                starts = np.arange(0, len(tfs), bs)
                outs.append(np.nextafter(
                    np.maximum.reduceat(u, starts), np.inf).tolist()
                    if len(tfs) else list(bm))
            pdf = pdf.copy()
            pdf["block_max_u"] = outs
            yield pdf

    for wkey in waves:
        wdir = os.path.join(index_dir, "postings", f"wave={wkey}")
        df = spark.read.parquet(wdir)
        out = df.mapInPandas(refresh, df.schema)
        tmp = wdir + ".tmp"
        out.write.mode("overwrite").parquet(tmp)
        _swap_dir(tmp, wdir)


def _refresh_term_stats(spark: SparkSession, index_dir: str) -> None:
    posts = spark.read.parquet(os.path.join(index_dir, "postings"))
    (posts.groupBy("term").agg(F.sum("df").alias("df_global"))
          .write.mode("overwrite")
          .parquet(os.path.join(index_dir, "term_stats")))


def _rebuild(spark: SparkSession, index_dir: str, stats: dict,
             affected_segments: set[int]) -> dict:
    """Shared tail of delete/upsert: refresh stats, rebuild waves covering
    ``affected_segments`` (plus new waves for unmanifested segments),
    refresh block-max elsewhere, recompute term stats."""
    cfg = _cfg_from_stats(stats)
    stats = _recompute_stats(spark, index_dir, stats)
    avgdl = float(stats["avgdl"])
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

    untouched = [w for w in wave_map if w not in rebuilt_waves]
    refresh_block_max(spark, index_dir, avgdl, untouched, stats)
    _refresh_term_stats(spark, index_dir)
    return {"rebuilt_waves": sorted(rebuilt_waves),
            "refreshed_waves": sorted(untouched),
            "n_docs": stats["n_docs"]}


def delete_docs(spark: SparkSession, index_dir: str,
                doc_ids: Iterable[int] | DataFrame) -> dict:
    """Delete documents by engine doc_id (reference: Indexer.DeleteDoc,
    index_service/indexer.go:100-124; batch form of kvdb BatchDelete)."""
    stats = _load_stats(index_dir)
    seg_docs = int(stats["seg_docs"])
    if isinstance(doc_ids, DataFrame):
        ids_df = doc_ids.select(F.col(doc_ids.columns[0]).cast("long")
                                .alias("doc_id"))
    else:
        ids_df = spark.createDataFrame(
            [(int(i),) for i in doc_ids], "doc_id long")
    segs = {int(r[0]) // seg_docs
            for r in ids_df.select("doc_id").distinct().collect()}

    docs_path = os.path.join(index_dir, "docs")
    docs = spark.read.parquet(docs_path)
    kept = docs.join(F.broadcast(ids_df), "doc_id", "left_anti")
    tmp = docs_path + ".tmp"
    kept.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, docs_path)
    return _rebuild(spark, index_dir, stats, segs)


def upsert_docs(spark: SparkSession, index_dir: str, new_corpus: DataFrame,
                key_cols=DOC_KEY_COLS) -> dict:
    """Delete-then-insert upsert (reference: Indexer.AddDoc,
    indexer.go:70-97 — replaced business keys get FRESH, larger doc ids).
    """
    stats = _load_stats(index_dir)
    seg_docs = int(stats["seg_docs"])
    docs_path = os.path.join(index_dir, "docs")
    docs = spark.read.parquet(docs_path)

    keys = new_corpus.select(*key_cols).distinct()
    replaced = docs.join(F.broadcast(keys), list(key_cols), "left_semi")
    replaced_ids = [int(r[0]) for r in replaced.select("doc_id").collect()]
    start = (docs.agg(F.max("doc_id")).collect()[0][0] or -1) + 1

    new_docs = prepare_docs(new_corpus, seg_docs, start_id=int(start))
    kept = docs.join(F.broadcast(replaced.select("doc_id")),
                     "doc_id", "left_anti")
    merged = kept.unionByName(new_docs.select(*kept.columns))
    tmp = docs_path + ".tmp"
    merged.sortWithinPartitions("doc_id").write.mode("overwrite").parquet(tmp)
    _swap_dir(tmp, docs_path)

    n_new = new_docs.count()
    affected = {i // seg_docs for i in replaced_ids}
    affected |= {(int(start) + i) // seg_docs for i in (0, max(n_new - 1, 0))}
    affected |= set(range(int(start) // seg_docs,
                          (int(start) + max(n_new - 1, 0)) // seg_docs + 1))
    res = _rebuild(spark, index_dir, stats, affected)
    res["n_inserted"] = n_new
    res["n_replaced"] = len(replaced_ids)
    return res
