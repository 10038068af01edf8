"""Table IO seam: Iceberg catalog tables when available, parquet paths
otherwise.

The north rule targets Iceberg tables for the corpus and for checkpointed
index segments (BASELINE.json). This sandbox's PySpark 4.1.2 install
ships no Iceberg runtime jar (verified: no
org.apache.iceberg.spark.SparkCatalog on the classpath), so the engine
runs on the parquet layout everywhere here; this module is the switch
point so a deployment WITH the Iceberg runtime flips formats without
touching operator code.

Location convention: a location containing ``/`` is a filesystem path
(parquet); otherwise it is a dotted catalog table identifier
(``catalog.db.table`` -> Iceberg). ``read_corpus`` is what the
spark-submit CLIs use, so `--corpus my_cat.raw.source_files` works
unchanged on a cluster with Iceberg configured.

Index segments stay on the path layout in both modes: wave directories
with idempotent overwrite ARE the checkpoint/lineage mechanism
(SURVEY.md §7); an Iceberg-native variant would map waves to snapshots
of a partitioned segments table, noted as future work.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def atomic_write_json(path: str, obj) -> None:
    """Crash-atomic JSON write: temp file in the same directory, fsync,
    ``os.rename`` over the target (atomic on POSIX). Every commit marker
    and stats file in the engine goes through this — a truncate-in-place
    ``json.dump`` that dies mid-write leaves unparsable JSON that wedges
    every later maintenance/recovery call, which would defeat the
    two-phase-commit protocol the markers exist for."""
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "w") as fh:
        json.dump(obj, fh)
        fh.flush()
        os.fsync(fh.fileno())
    os.rename(tmp, path)


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark runtime is on the classpath."""
    try:
        spark._jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def is_path(location: str) -> bool:
    return "/" in location or location.startswith(("file:", "s3:", "hdfs:"))


# the corpus shape the north rule pins (BASELINE.json input_hint); used
# only for the CSV source, where nothing else carries the schema
CORPUS_SCHEMA = ("repo string, path string, commit string, "
                 "lang string, content string")


def read_corpus(spark: SparkSession, location: str) -> DataFrame:
    """Read a corpus from a parquet path, a ``.csv`` path, or a catalog
    (Iceberg) table.

    CSV recreates the reference's only bulk source (a typed CSV scan,
    demo/job/build_index.go:23-102) with the north-rule corpus schema;
    ``multiLine`` + quote-escape because source-code ``content`` carries
    newlines and quotes (the reference sidesteps this by keeping payloads
    on one line; a general engine cannot)."""
    if is_path(location):
        if location.rstrip("/").endswith(".csv"):
            return (spark.read.schema(CORPUS_SCHEMA)
                    .option("header", True)
                    .option("multiLine", True)
                    .option("escape", '"')
                    .csv(location))
        return spark.read.parquet(location)
    return spark.read.table(location)


def write_corpus(df: DataFrame, location: str, mode: str = "overwrite") -> None:
    if is_path(location):
        df.write.mode(mode).parquet(location)
    elif mode == "append":
        df.writeTo(location).append()
    else:
        df.writeTo(location).createOrReplace()


def apply_dir_ops(base_dir: str, ops: list[dict]) -> None:
    """Physical commit of partition replacements on the PATH layout:
    ``{"op": "swap", "src": rel, "dst": rel}`` renames a staged directory
    over the live one; ``{"op": "drop", "dst": rel}`` removes an emptied
    partition. Idempotent — a swap whose staging source is already gone
    was completed by a previous run, so maintenance recovery can replay
    the same op list after a crash.

    This is the format seam maintenance commits through: on a deployment
    with the Iceberg runtime the same logical operation is ONE
    snapshot commit — :func:`overwrite_docs_partitions` — instead of
    per-directory renames (which are only atomic per directory on a
    local/HDFS filesystem; object stores and multi-partition atomicity
    need the table format)."""
    import os
    import shutil

    for op in ops:
        dst = os.path.join(base_dir, op["dst"])
        if op["op"] == "swap":
            src = os.path.join(base_dir, op["src"])
            if os.path.isdir(src):
                shutil.rmtree(dst, ignore_errors=True)
                os.rename(src, dst)
        elif op["op"] == "drop":
            shutil.rmtree(dst, ignore_errors=True)


# Maintenance physical-commit backend. The default is the path layout's
# directory swaps (apply_dir_ops); a deployment with a table format
# registers its own committer ONCE at startup — maintenance code calls
# commit_partition_ops and never needs editing to switch formats. An
# Iceberg backend would translate the op list into a single
# overwritePartitions snapshot (overwrite_docs_partitions) for the docs
# swaps and a REPLACE TABLE for the term-stats swap.
_commit_backend = None


def set_commit_backend(fn) -> None:
    """Install a custom physical-commit backend: ``fn(base_dir, ops)``
    with the op dicts documented on :func:`apply_dir_ops`. Pass ``None``
    to restore the path-layout default."""
    global _commit_backend
    _commit_backend = fn


def commit_partition_ops(base_dir: str, ops: list[dict]) -> None:
    """Format seam for maintenance commits: dispatches to the registered
    backend (Iceberg snapshot commit on a deployment that installed one)
    or the path layout's idempotent directory swaps."""
    if _commit_backend is not None:
        _commit_backend(base_dir, ops)
    else:
        apply_dir_ops(base_dir, ops)


def overwrite_docs_partitions(df: DataFrame, table: str) -> None:
    """Catalog-table (Iceberg) form of the maintenance docs commit: one
    ``overwritePartitions`` snapshot replaces exactly the partitions
    present in ``df`` (Iceberg's dynamic partition overwrite) —
    atomically across every affected segment, which the path layout's
    per-directory rename cannot guarantee. ``df`` must carry the
    ``segment_id`` partition column. Exercised by the skip-if-no-jars
    integration test (tests/test_iceberg_seam.py)."""
    df.writeTo(table).overwritePartitions()
