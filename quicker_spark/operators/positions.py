"""Positional sidecar index: build + segment-granular refresh.

The reference's inverted index has no positions (reference:
internal/reverseindex/skiplist_reverse_index.go:23-36 — values are
(DocId, bits) pairs), so this sidecar is a beyond-the-reference
capability: exact-phrase queries over any indexed text field. It is a
DERIVED artifact of an existing index directory — built from the
engine's own ``docs`` forward index, laid out exactly like the main
postings tree (``positions/wave=K/segment_id=S``, files sorted by term)
so the same partition-pruned term scan and segment-parallel Arrow kernel
serve it, and the same segment-granular maintenance keeps it consistent:
:func:`refresh_positions` rewrites only the (wave, segment) directories a
delete/upsert touched (maintain._commit calls it whenever the sidecar
exists).

Scale shape mirrors the main build: tokenise + posexplode is map-side,
per-(term, doc) position lists aggregate with one shuffle, hot terms go
through the same salted two-phase merge as the postings build
(IndexConfig.effective_salts), and the writer clusters by segment with a
term-hash salt so parallelism tracks the cluster, not the wave width.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from quicker_spark.functions.phrase import encode_positions_batch
from quicker_spark.functions.tokenize import tokenize_col
from quicker_spark.io import atomic_write_json
from quicker_spark.operators.build import IndexConfig

POSITIONS_STRUCT = T.StructType([
    T.StructField("df", T.LongType()),
    T.StructField("ids", T.BinaryType()),
    T.StructField("tfs", T.BinaryType()),
    T.StructField("dls", T.BinaryType()),
    T.StructField("bits", T.BinaryType()),
    T.StructField("pos", T.BinaryType()),
])

# default: positions only for the free-text field — repo/path/lang are
# identifier-like fields where phrase adjacency is meaningless
DEFAULT_POSITION_FIELDS = ("content",)


def _encode_positions_udf():
    @F.pandas_udf(POSITIONS_STRUCT)
    def enc(a_ids, a_dls, a_bits, a_tfs, a_pos):
        import pandas as pd
        rows = encode_positions_batch(a_ids, a_dls, a_bits, a_tfs, a_pos)
        return pd.DataFrame(
            rows, columns=["df", "ids", "tfs", "dls", "bits", "pos"])
    return enc


def wave_positions(docs_wave: DataFrame, cfg: IndexConfig,
                   fields=DEFAULT_POSITION_FIELDS) -> DataFrame:
    """Positional posting rows for one wave of docs segments.

    Positions are the token's ordinal in ITS FIELD's token array (the
    tokenizer spec shared with the oracle: maximal ``[a-z0-9_]`` runs on
    lowered text), so adjacency never crosses a field boundary. One
    pipeline per field, unioned — terms are field-namespaced
    (``field\\x01token``) exactly like the main postings."""
    parts = []
    for f_name in fields:
        toks = docs_wave.select(
            "segment_id", "doc_id", F.col("doc_len").alias("dl"),
            F.col("bits_feature").alias("bitsf"),
            F.posexplode(
                tokenize_col(F.coalesce(F.col(f_name), F.lit("")))
            ).alias("p", "t"),
        ).withColumn("term", F.concat(F.lit(f_name + "\x01"), F.col("t")))
        parts.append(toks.select("segment_id", "term", "doc_id", "dl",
                                 "bitsf", "p"))
    toks = parts[0]
    for extra in parts[1:]:
        toks = toks.unionByName(extra)

    perdoc = toks.groupBy("segment_id", "term", "doc_id", "dl", "bitsf").agg(
        F.sort_array(F.collect_list("p")).alias("ps"))
    entry = F.struct("doc_id", "dl", "bitsf", "ps")
    n_salts = cfg.effective_salts()
    if n_salts > 1:
        # salted two-phase merge — a hot term's per-reducer state is
        # bounded by seg_docs/n_salts docs (same law as wave_postings,
        # and positions payloads are HEAVIER than postings entries, so
        # the bound matters sooner here)
        partial = (
            perdoc.withColumn("salt", F.pmod(F.col("doc_id"),
                                             F.lit(n_salts)))
            .groupBy("segment_id", "term", "salt")
            .agg(F.collect_list(entry).alias("plist"))
        )
        merged = partial.groupBy("segment_id", "term").agg(
            F.flatten(F.collect_list("plist")).alias("plist"))
    else:
        merged = perdoc.groupBy("segment_id", "term").agg(
            F.collect_list(entry).alias("plist"))
    # flatten JVM-side: parallel doc-order arrays + ONE flat position
    # stream per row — the Arrow encoder never sees nested lists
    cols = merged.select(
        "segment_id", "term",
        F.transform("plist", lambda x: x["doc_id"]).alias("a_ids"),
        F.transform("plist", lambda x: x["dl"]).alias("a_dls"),
        F.transform("plist", lambda x: x["bitsf"]).alias("a_bits"),
        F.transform("plist", lambda x: F.size(x["ps"])).alias("a_tfs"),
        F.flatten(F.transform("plist", lambda x: x["ps"])).alias("a_pos"),
    )
    enc = _encode_positions_udf()
    return cols.select(
        "segment_id", "term",
        enc("a_ids", "a_dls", "a_bits", "a_tfs", "a_pos").alias("e"),
    ).select("segment_id", "term", "e.*")


def write_positions_wave(spark: SparkSession, docs_df: DataFrame,
                         wave: list[int], cfg: IndexConfig, out_dir: str,
                         fields=DEFAULT_POSITION_FIELDS,
                         wkey: int | None = None,
                         rebuild_segs: list[int] | None = None) -> None:
    """Build + write one wave of positional postings
    (``positions/wave=K/segment_id=S``). Same granularity contract as
    build.write_wave: ``rebuild_segs=None`` is the idempotent full-wave
    overwrite; a seg list is the maintenance-granular rewrite (affected
    segment dirs removed first so emptied segments can't resurrect)."""
    wkey = min(wave) if wkey is None else wkey
    segs = sorted(int(s) for s in (rebuild_segs if rebuild_segs is not None
                                   else wave))
    wave_dir = os.path.join(out_dir, "positions", f"wave={wkey}")
    lo, hi = min(segs) * cfg.seg_docs, (max(segs) + 1) * cfg.seg_docs
    docs_wave = docs_df.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        & F.col("segment_id").isin(segs))
    rows = wave_positions(docs_wave, cfg, fields)
    # same occupancy-targeted salt law as build.write_wave: ~3 keys per
    # shuffle partition so the clustered write never under-fills slots
    par = spark.sparkContext.defaultParallelism
    sp = int(spark.conf.get("spark.sql.shuffle.partitions", str(par)))
    n_salt = max(1, -(-3 * max(par, sp) // max(1, len(segs))))
    writer = (rows.repartition(F.col("segment_id"),
                               F.pmod(F.xxhash64("term"), F.lit(n_salt)))
              .sortWithinPartitions("term")
              .write.mode("overwrite").partitionBy("segment_id"))
    if rebuild_segs is None:
        writer.parquet(wave_dir)
    else:
        for s in segs:
            shutil.rmtree(os.path.join(wave_dir, f"segment_id={s}"),
                          ignore_errors=True)
        writer.option("partitionOverwriteMode", "dynamic").parquet(wave_dir)


def _meta_path(index_dir: str) -> str:
    return os.path.join(index_dir, "positions", "_meta.json")


def positions_meta(index_dir: str) -> dict | None:
    """The sidecar's meta, or None when no sidecar exists."""
    import json
    p = _meta_path(index_dir)
    if not os.path.isfile(p):
        return None
    with open(p) as fh:
        return json.load(fh)


def build_positions(spark: SparkSession, index_dir: str,
                    fields=DEFAULT_POSITION_FIELDS) -> dict:
    """Build the positional sidecar for an existing index directory,
    wave by wave (same wave geometry as the main build, read from the
    index's own stats.json). Idempotent full overwrite; records the
    indexed fields in ``positions/_meta.json`` (written LAST — its
    presence marks a complete sidecar, and maintenance keys off it)."""
    import json
    with open(os.path.join(index_dir, "stats.json")) as fh:
        stats = json.load(fh)
    cfg = IndexConfig.from_stats(stats)
    bad = [f for f in fields if f not in cfg.fields]
    if bad:
        raise ValueError(
            f"fields {bad} are not indexed fields {cfg.fields}")
    docs_df = spark.read.parquet(os.path.join(index_dir, "docs"))
    segs = sorted(r["segment_id"] for r in
                  docs_df.select("segment_id").distinct().collect())
    shutil.rmtree(os.path.join(index_dir, "positions"), ignore_errors=True)
    waves: dict[int, list[int]] = {}
    for s in segs:
        waves.setdefault(
            (s // cfg.wave_segments) * cfg.wave_segments, []).append(s)
    for wkey, wave in sorted(waves.items()):
        write_positions_wave(spark, docs_df, wave, cfg, index_dir,
                             fields=fields, wkey=wkey)
    meta = {"fields": list(fields), "format": 1}
    atomic_write_json(_meta_path(index_dir), meta)
    return meta


def refresh_positions(spark: SparkSession, index_dir: str,
                      affected_segments: set[int],
                      present_segs: set[int]) -> list[int]:
    """Segment-granular sidecar refresh after a delete/upsert — the
    positions twin of maintain._rebuild_waves, same wave/segment
    granularity, idempotent (crash recovery just replays it). No-op when
    no sidecar exists. Returns the rewritten wave keys."""
    import json
    meta = positions_meta(index_dir)
    if meta is None:
        return []
    with open(os.path.join(index_dir, "stats.json")) as fh:
        stats = json.load(fh)
    cfg = IndexConfig.from_stats(stats)
    fields = tuple(meta["fields"])
    pos_root = os.path.join(index_dir, "positions")
    manifested: dict[int, list[int]] = {}
    for e in os.listdir(pos_root):
        if not e.startswith("wave="):
            continue
        wk = int(e.split("=", 1)[1])
        segs = [int(d.split("=", 1)[1])
                for d in os.listdir(os.path.join(pos_root, e))
                if d.startswith("segment_id=")]
        manifested[wk] = segs
    docs_df = spark.read.parquet(os.path.join(index_dir, "docs"))
    rebuilt: list[int] = []
    seen: set[int] = set()
    for wk, segs in sorted(manifested.items()):
        seen.update(segs)
        touch = sorted(affected_segments & set(segs))
        if touch:
            write_positions_wave(spark, docs_df, segs, cfg, index_dir,
                                 fields=fields, wkey=wk,
                                 rebuild_segs=touch)
            rebuilt.append(wk)
    new_segs = sorted(s for s in affected_segments
                      if s not in seen and s in present_segs)
    for s in new_segs:
        wk = (s // cfg.wave_segments) * cfg.wave_segments
        write_positions_wave(spark, docs_df, [s], cfg, index_dir,
                             fields=fields, wkey=wk, rebuild_segs=[s])
        if wk not in rebuilt:
            rebuilt.append(wk)
    return rebuilt
