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
    """File-source stream of the events table (ts normalized like catalog.load)."""
    from ..catalog import ensure_session_confs, normalize_event_ts

    ensure_session_confs(spark)  # nanosAsLong etc. — portable to any session
    path = os.path.join(sf_dir, "events.parquet")
    schema = spark.read.parquet(path).schema
    # The file source requires a directory; glob-filter to the one table.
    stream = (
        spark.readStream.schema(schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Schema-adaptive ns→µs / ntz→tz normalization shared with the batch
    # loader — the on-disk encoding has changed between data generations.
    return normalize_event_ts(stream)


def run_to_memory(result: DataFrame, *, output_mode: str, state_partitions: int = 8) -> DataFrame:
    """Drain a streaming DataFrame into a memory sink, return its table.

    Stateful operators allocate one state store per shuffle partition at
    query START, and that count is frozen into the checkpoint. 32 stores
    for a single-file drain is pure constant overhead, so the drain runs
    with ``state_partitions``; the batch session conf is restored after.
    On a real cluster this knob is sized to stream throughput, not to
    the batch session's shuffle width — same code path.
    """
    spark = result.sparkSession
    name = f"ms_sink_{next(_SINK_IDS)}_{os.getpid()}"
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
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
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    return spark.table(name)
