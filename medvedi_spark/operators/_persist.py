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


#: input-size ceiling for :func:`size_guarded_persist` — persists whose
#: source exceeds this recompute instead of materializing a cache that
#: is a multiple of a huge input (duplicate_spans' anchors are ~30x the
#: source text; a 100 TB corpus would cache multi-PB)
PERSIST_INPUT_CAP = 1 << 30


def size_guarded_persist(source: DataFrame, df: DataFrame, cap: int = PERSIST_INPUT_CAP) -> DataFrame:
    """Tracked-persist ``df`` only when Catalyst's free input-size
    estimate of ``source`` stays under ``cap`` (conservative: estimate
    unavailable → no persist). The shared ruling for operator-internal
    caches that are proportional to the corpus (gram tables, anchor
    tables, signature tables): below the cap the cache beats 2-5
    shuffling recomputes; above it the recompute is the corpus-scale
    plan."""
    try:
        est = int(source._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    except Exception:  # noqa: BLE001 — estimate unavailable → be conservative
        est = cap + 1
    if est <= cap:
        return persist_tracked(df)
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
