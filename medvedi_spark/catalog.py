"""Table loading for the driver's TPC-H-ish testdata.

All tables are Parquet; ``load`` returns a plain ``pyspark.sql.DataFrame``
so every downstream operator benefits from parquet column pruning and
predicate pushdown (Catalyst pushes filters/projections into the scan —
check ``.explain("formatted")`` for ``PushedFilters`` / ``ReadSchema``).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

__all__ = ["TABLES", "load", "load_all", "register_views", "ensure_session_confs"]

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor.
BROADCAST_TABLES = frozenset({"region", "nation", "supplier"})


# Analyzed-DataFrame cache: a metastore's job. Re-calling spark.read
# re-lists the path and re-reads parquet footers on every query; the
# returned DataFrame is immutable, so one per (session, path) suffices.
_DF_CACHE: dict[tuple[str, str, str], DataFrame] = {}

# Runtime-settable confs every query's correctness depends on. The engine
# contract is "run on ANY SparkSession the caller hands in", so these are
# pinned at table-load time rather than only in the private session factory:
#  - nanosAsLong: the events table stores TIMESTAMP(NANOS), which Spark's
#    parquet reader rejects outright; read as epoch-nanos bigint instead.
#  - UTC timezone: deterministic timestamp rendering (matches the DuckDB
#    oracle, which is UTC-naive).
#  - ANSI off: reference semantics are permissive (NULL on bad cast, no
#    overflow errors), matching medvedi/numpy behavior.
_REQUIRED_CONFS = {
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.ansi.enabled": "false",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Pin runtime-settable confs the query contract depends on.

    Idempotent and cheap (conf get is a local map lookup); called from every
    table-load entry point so queries are portable to a vanilla session.
    """
    for conf_key, value in _REQUIRED_CONFS.items():
        try:
            if spark.conf.get(conf_key, None) != value:
                spark.conf.set(conf_key, value)
        except Exception:
            # Unknown conf on an older/newer Spark: set unconditionally.
            spark.conf.set(conf_key, value)


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    ensure_session_confs(spark)
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _DF_CACHE.get(key)
    if cached is not None:
        return cached
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # ts is TIMESTAMP(NANOS) on disk; with nanosAsLong it arrives as a
        # bigint of epoch nanos. The data has no sub-microsecond content,
        # so truncating to micros is lossless (and matches DuckDB's view).
        from pyspark.sql import functions as F

        # Integer division: epoch-nanos exceeds double precision, so a
        # float divide would corrupt the low microseconds.
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    _DF_CACHE[key] = df
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for the SQL API surface."""
    for name in TABLES:
        load(spark, sf_dir, name).createOrReplaceTempView(name)
