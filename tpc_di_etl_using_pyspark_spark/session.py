"""SparkSession factory tuned for this engine.

Local testing runs on ``local[N]`` (single JVM); the configuration is
chosen so that the same declarative plans scale to a multi-executor
cluster: AQE handles partition coalescing / skew splitting / join
strategy switches at runtime, Arrow keeps any pandas exchange
vectorized, and shuffle partitions stay modest for local mode (a real
cluster deployment would raise ``spark.sql.shuffle.partitions`` or rely
on AQE's coalescing from a higher initial number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "tpcdi-spark-engine", master: str | None = None) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    AQE on (runtime re-planning: partition coalescing, skew-join
    splitting, broadcast switch), Arrow on (vectorized pandas-UDF and
    toPandas exchange), timestamps truncated to microseconds on parquet
    read (events.ts is ns — FIXTURES.md).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    # Scale-dependent settings are parameterised (optimization r13):
    # the LOCAL defaults below keep the driver bench comparable
    # round-over-round; a cluster deployment overrides via env.
    # - SHUFFLE_PARTITIONS: local default 32 (≈ one reducer per core;
    #   AQE coalescing trims small stages). Production: set to
    #   ~2-3× total executor cores, or high enough that partitions
    #   land in the 100MB-1GB band (guide §2.2) — AQE coalesces the
    #   excess, so erring high is safe.
    # - BROADCAST_THRESHOLD: local default 32 MiB (the reference dims
    #   and 1-row aggregates always broadcast). Production: keep ≤ a
    #   few hundred MB — executors hold the built relation per task
    #   slot (guide §3.1).
    shuffle_parts = os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    bcast = os.environ.get(
        "SPARK_GRAFT_BROADCAST_THRESHOLD", str(32 * 1024 * 1024)
    )
    # - IO_CODEC: shuffle/spill/broadcast compression codec (guide
    #   §2.3). Local default stays Spark's lz4 so the driver bench is
    #   comparable round-over-round; the r14 idle A/B (BASELINE.md)
    #   measured zstd a wash-to-slightly-slower at fixture scale
    #   (shuffle payloads are KB-scale, so codec CPU dominates the
    #   byte savings). Production: zstd usually wins once shuffle
    #   partitions carry 100MB+ — measure per guide §2.3.
    io_codec = os.environ.get("SPARK_GRAFT_IO_CODEC", "lz4")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", shuffle_parts)
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", bcast)
        .config("spark.io.compression.codec", io_codec)
    )
    return builder.getOrCreate()
