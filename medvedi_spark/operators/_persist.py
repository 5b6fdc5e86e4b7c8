"""Tracked operator-lifetime persists.

Spark has no "plan was materialized" callback, so an operator that
persists an intermediate (the adaptive-Jaccard gram table, the global
as-of join's range-partitioned stream) cannot self-unpersist; long-lived
sessions (bench, notebooks) call :func:`release_persisted` between
queries — otherwise disk blocks of evicted cache entries linger until
context shutdown (round-4 ADVICE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

_PERSISTED: list[DataFrame] = []


def persist_tracked(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.append(df)
    return df


def release_persisted() -> int:
    """Unpersist every operator-persisted DataFrame; returns the count.
    Safe once earlier plans are no longer needed — blocks drop, plans
    stay valid (they recompute if re-executed)."""
    n = 0
    while _PERSISTED:
        df = _PERSISTED.pop()
        try:
            # blocking: callers snapshot getPersistentRDDs for leak
            # accounting right after this returns — the default async
            # unpersist leaves entries draining and the count races
            df.unpersist(blocking=True)
            n += 1
        except Exception:
            pass  # session already stopped — nothing to release
    return n
