"""Structured Streaming operators over the events table.

The reference has no streaming at all (SURVEY §2.9) — this module is the
new-capability surface: tumbling/session windows, watermarks, streaming
dedup. Each helper runs a file-source stream to completion against an
in-memory sink and hands back the result as a DataFrame, which makes the
operators testable in the same oracle harness as the batch queries while
remaining genuine ``readStream`` → ``writeStream`` plans (swap the source
for Kafka and the sink for a real table and the plan is production-shaped).
"""

from __future__ import annotations

import itertools
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_SINK_IDS = itertools.count()


def read_events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-source stream of the events table (ns→µs ts like catalog.load)."""
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file source requires a directory; glob-filter to the one table.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    return stream.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def run_to_memory(result: DataFrame, *, output_mode: str) -> DataFrame:
    """Drain a streaming DataFrame into a memory sink, return its table."""
    name = f"ms_sink_{next(_SINK_IDS)}_{os.getpid()}"
    query = (
        result.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()
    return result.sparkSession.table(name)
