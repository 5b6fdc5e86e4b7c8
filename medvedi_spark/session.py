"""SparkSession factory tuned for the medvedi-spark engine.

Configured for correctness against a DuckDB oracle (UTC session timezone,
Arrow execution) and for scale (AQE with coalescing + skew-join handling).
On a real cluster the same config applies; only ``master`` and the shuffle
partition count change (cluster deploys should leave
``spark.sql.shuffle.partitions`` to AQE's coalescing with a high initial
partition number).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark", "DEFAULT_SF_DIR"]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))


def get_spark(
    app_name: str = "medvedi-spark",
    *,
    shuffle_partitions: int | None = None,
    ui: bool = False,
) -> SparkSession:
    """Create (or fetch) the tuned SparkSession.

    The config is scale-first:

    - AQE enabled: runtime re-planning, partition coalescing, skew-join
      splitting — the mechanisms that make a fixed logical plan survive a
      100x data-size change.
    - Arrow enabled: every pandas-UDF / toPandas boundary is columnar.
    - UTC timezone: deterministic timestamp semantics (matches the DuckDB
      oracle, which is UTC-naive).
    - shuffle partitions default to the local core count; at cluster scale
      AQE coalesces from a larger initial number instead.
    """
    cpus = _cpus()
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Size reducers by data (64MB advisory), not by core count: tiny
        # shuffles collapse to one task instead of `cpus` near-empty ones,
        # and at 100 TB the same advisory yields thousands of partitions.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.ui.enabled", str(ui).lower())  # probes read stage facts from the UI REST API
        .config("spark.sql.ansi.enabled", "false")
        # Earlier testdata generations stored events.ts as TIMESTAMP(NANOS),
        # which Spark's parquet reader rejects; keep the long fallback so the
        # schema-adaptive catalog load (catalog.normalize_event_ts) handles
        # either on-disk encoding.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    return builder.getOrCreate()
