"""Tracked operator-lifetime persists.

Spark has no "plan was materialized" callback, so an operator that
persists an intermediate (the adaptive-Jaccard gram table, the global
as-of join's range-partitioned stream) cannot self-unpersist; long-lived
sessions (bench, notebooks) call :func:`release_persisted` between
queries — otherwise disk blocks of evicted cache entries linger until
context shutdown (round-4 ADVICE).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# Keyed by the owning SparkSession (id) so release_persisted() from one
# consumer (a bench loop, a test) cannot unpersist frames a concurrent
# query in ANOTHER session is still reading (round-5 ADVICE). Within one
# session the original contract stands: callers release between queries.
_PERSISTED: dict[int, list[DataFrame]] = {}


def _session_key(df: DataFrame) -> int:
    try:
        return id(df.sparkSession)
    except Exception:  # noqa: BLE001 — detached frame; fall back to shared bucket
        return 0


def persist_tracked(df: DataFrame) -> DataFrame:
    from pyspark import StorageLevel

    df = df.persist(StorageLevel.MEMORY_AND_DISK)
    _PERSISTED.setdefault(_session_key(df), []).append(df)
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


def release_persisted(spark: SparkSession | None = None) -> int:
    """Unpersist the operator-persisted DataFrames of ``spark`` (default:
    the active session, falling back to ALL sessions when none is active —
    process teardown); returns the count. Safe once earlier plans are no
    longer needed — blocks drop, plans stay valid (they recompute if
    re-executed). Scoped per session so one consumer's cleanup cannot
    evict caches a concurrent session still reads."""
    if spark is None:
        spark = SparkSession.getActiveSession()
    keys = [id(spark), 0] if spark is not None else list(_PERSISTED)
    n = 0
    for key in keys:
        bucket = _PERSISTED.get(key)
        while bucket:
            df = bucket.pop()
            try:
                # blocking: callers snapshot getPersistentRDDs for leak
                # accounting right after this returns — the default async
                # unpersist leaves entries draining and the count races
                df.unpersist(blocking=True)
                n += 1
            except Exception:
                pass  # session already stopped — nothing to release
        _PERSISTED.pop(key, None)
    return n
