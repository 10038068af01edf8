"""SparkSession factory tuned for this engine.

Local mode is the sandbox stand-in for a multi-executor cluster: the same
code runs unchanged under ``spark-submit --master yarn|k8s`` because every
operator is expressed as DataFrame transformations + Arrow UDFs (no
driver-side loops over data, no local filesystem assumptions beyond the
configured warehouse/index paths).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | None = None,
    shuffle_partitions: int | None = None,
    app: str = "quicker_spark",
    driver_memory: str | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` defaults to ``$SPARK_GRAFT_CPUS`` (driver contract) or all
    local cores. ``shuffle_partitions`` defaults to the core count — at
    cluster scale this would instead be ~2-3x total executor cores (or left
    to AQE coalescing, which is enabled).
    """
    if cores is None:
        cores = int(os.environ.get("SPARK_GRAFT_CPUS", 0)) or os.cpu_count() or 4
    if shuffle_partitions is None:
        shuffle_partitions = max(int(cores), 4)
    if driver_memory is None:
        driver_memory = os.environ.get("QS_DRIVER_MEMORY", "16g")

    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.driver.memory", driver_memory)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.compression.codec", "zstd")
        # zstd shuffle codec: denser than lz4, trading a little per-core
        # CPU for shuffle bytes. Measured faster at every pinned core
        # count on the bench VM (shuffle spill lands on tmpfs there, so
        # shuffle bytes are memory-controller traffic — BENCH.md round-4
        # scaling section); on a disk-spilling cluster the byte savings
        # help the same way via IO. Override via extra_conf if needed.
        .config("spark.io.compression.codec",
                os.environ.get("QS_SHUFFLE_CODEC", "zstd"))
    )
    # Prefer tmpfs shuffle dirs only where /dev/shm actually exists (it
    # removes virtio-disk contention in this sandbox). Trade-off: on tmpfs
    # shuffle spill competes with the JVM heap for physical RAM — at real
    # cluster scale leave Spark's default local dirs on disk.
    local_dir = os.environ.get("QS_LOCAL_DIR")
    if local_dir is None and os.path.isdir("/dev/shm"):
        local_dir = "/dev/shm/spark-local"
    if local_dir:
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
