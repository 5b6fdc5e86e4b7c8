"""Streaming query surface (SURVEY §2.9 — new capability vs the reference).

Each query is a real Structured Streaming plan (readStream → stateful op →
writeStream) drained synchronously into a memory sink so the driver can
hash-compare it against a batch DuckDB oracle. Watermark/window semantics
are chosen so the drained result equals the batch answer (complete mode
for aggregations; append for streaming dedup whose output is key-only).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from medvedi_spark.queries._det import DEC
from medvedi_spark.queries.registry import register
from medvedi_spark.streaming.ops import read_events_stream, run_to_memory

# --------------------------------------------------------------------------
# st1 — tumbling-window aggregation (6h windows, epoch-aligned like
# DuckDB's time_bucket).
# --------------------------------------------------------------------------


@register(
    "st1_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL 6 HOUR, CAST(ts AS TIMESTAMP)) AS window_start,
           event_type,
           COUNT(*) AS n,
           CAST(CAST(SUM(CAST(value AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE) AS value_sum
    FROM events
    GROUP BY 1, 2
    """,
    tags=("streaming", "window"),
)
def st1_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.groupBy(F.window("ts", "6 hours"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast(DEC)).cast("string").cast("double").alias("value_sum"),
        )
        .select(F.col("window.start").alias("window_start"), "event_type", "n", "value_sum")
    )
    return run_to_memory(agg, output_mode="complete")


# --------------------------------------------------------------------------
# st2 — session windows (30-minute gap) per user. Spark's session_window
# start == first event ts; the oracle reproduces it with the islands
# (lag + cumulative-flag) construction.
# --------------------------------------------------------------------------


@register(
    "st2_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - LAG(ts) OVER w > INTERVAL 30 MINUTE
                  OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ),
    islands AS (
      SELECT user_id, ts,
             SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS sid
      FROM flagged
    )
    SELECT user_id,
           CAST(MIN(ts) AS TIMESTAMP) AS session_start,
           COUNT(*) AS n_events
    FROM islands
    GROUP BY user_id, sid
    """,
    tags=("streaming", "session"),
)
def st2_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    agg = (
        events.groupBy(F.session_window("ts", "30 minutes"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
    return run_to_memory(agg, output_mode="complete")


# --------------------------------------------------------------------------
# st3 — streaming dedup: first-seen (user_id, event_type) pairs. Key-only
# output so "which row was first" (nondeterministic under parallel read)
# never leaks into the result.
# --------------------------------------------------------------------------


@register(
    "st3_stream_dedup",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
    tags=("streaming", "dedup"),
)
def st3_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = read_events_stream(spark, sf_dir)
    deduped = events.select("user_id", "event_type").dropDuplicates(["user_id", "event_type"])
    return run_to_memory(deduped, output_mode="append")
