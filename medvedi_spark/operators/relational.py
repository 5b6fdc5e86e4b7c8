"""Reusable relational operators Spark lacks as single calls.

Beyond-reference surface (SURVEY §2.3 / §2.9 "not implemented" rows),
exposed as parameterized DataFrame→DataFrame functions. The registered
queries (q17, q19) are fixed-parameter instances of these.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """As-of join: for every left row, the latest (``backward``) or
    earliest (``forward``) right row at-or-before/after its timestamp,
    optionally within ``tolerance_seconds`` and per ``by`` keys
    (``pandas.merge_asof`` semantics: left rows keep nulls on no match,
    duplicate left rows are preserved).

    Plan shape (merge-asof): both sides union into one tagged stream, ONE
    shuffle on the ``by`` keys, one window pass carries the most recent
    right-row payload (an atomic struct — all value columns from the SAME
    matched row) onto each left row. Every input row participates exactly
    once: no row-multiplying range join, so the cost is sort+scan even
    when each left row has millions of candidate right rows. With empty
    ``by`` the stream is RANGE-partitioned on the timestamp instead of
    collapsing to one window partition: each range computes its local
    running pick, a per-range last-right-payload table (rows = partition
    count, not data rows) gets a running carry-in via one tiny window,
    and broadcasts back — the global merge-asof parallelizes with only
    the range exchange plus a partition-count-sized broadcast.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"bad direction={direction!r}")
    values = value_cols if value_cols is not None else [c for c in right.columns if c != right_ts and c not in by]
    payload = F.struct(*([F.col(v).alias(v) for v in values] + [F.col(right_ts).alias("__asof_ts__")]))
    # a null right timestamp can never be "at-or-before/after" anything
    # (pandas.merge_asof rejects null keys outright; the range-join
    # comparand's <=/>= is false on null) — drop such rows up front so
    # BOTH window paths agree with that contract instead of null-ts
    # payloads sorting first and leaking into the running pick.
    r_pay = right.filter(F.col(right_ts).isNotNull()).select(
        *by, F.col(right_ts).alias("__ts__"), payload.alias("__pay__")
    )
    pay_type = r_pay.schema["__pay__"].dataType
    lcols = list(left.columns)
    by_set = set(by)
    l_side = left.select(
        *lcols,
        F.col(left_ts).alias("__ts__"),
        F.lit(1).alias("__side__"),
        F.lit(None).cast(pay_type).alias("__pay__"),
    )
    r_side = r_pay.select(
        *[(F.col(c) if c in by_set else F.lit(None).cast(left.schema[c].dataType)).alias(c) for c in lcols],
        "__ts__",
        F.lit(0).alias("__side__"),
        "__pay__",
    )
    unioned = l_side.unionByName(r_side)
    # at equal timestamps the right row must precede the left row so the
    # match is inclusive (<= / >=), hence the __side__ tiebreak.
    if direction == "backward":
        order = [F.col("__ts__").asc_nulls_first(), F.col("__side__").asc()]
    else:
        order = [F.col("__ts__").desc_nulls_first(), F.col("__side__").asc()]
    if by:
        w = (
            Window.partitionBy(*[F.col(k) for k in by])
            .orderBy(*order)
            .rowsBetween(Window.unboundedPreceding, 0)
        )
        out = unioned.withColumn("__pick__", F.last("__pay__", ignorenulls=True).over(w))
    else:
        out = _global_running_pick(unioned, order, direction)
    out = out.filter(F.col("__side__") == 1)
    if tolerance_seconds is not None:
        gap = F.abs(F.col(left_ts).cast("long") - F.col("__pick__.__asof_ts__").cast("long"))
        out = out.withColumn("__pick__", F.when(gap <= tolerance_seconds, F.col("__pick__")))
    return out.select(
        *lcols,
        *[F.col(f"__pick__.{v}").alias(v) for v in values],
        F.col("__pick__.__asof_ts__").alias(f"asof_{right_ts}"),
    )


def _global_running_pick(unioned: DataFrame, order: list[Column], direction: str) -> DataFrame:
    """Distributed global running-last for the empty-``by`` as-of join.

    1. Range-partition the tagged stream on the scan order (timestamp,
       then side so an equal-timestamp right row never lands AFTER its
       left row's range) and compute the running pick inside each range —
       windows bounded by range size, never SinglePartition over the
       data.
    2. Per range, take the scan-order-last RIGHT payload (max_by /
       min_by on the timestamp — one row per range, null when the range
       holds no right rows).
    3. Running carry-in over that partition-count-sized table (the only
       single-partition window; its input is #ranges rows) broadcasts
       back; a row's pick = its local running pick, else the carry from
       earlier ranges.
    """
    spark = unioned.sparkSession
    n_part = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    # The carry table below re-references `rng`, and correctness near
    # range boundaries requires both references to see the SAME boundary
    # sampling. The planner does NOT dedupe them (column pruning makes
    # the two exchange subtrees non-identical — verified: two separate
    # rangepartitioning exchanges, no ReusedExchange), so the shared
    # partitioning is made EXPLICIT with a tracked persist: both branches
    # read the one materialized InMemoryTableScan, and even a
    # block-eviction recompute reproduces identical boundaries because
    # range sampling is seed-deterministic for a given input. Pinned by
    # tests/test_scale_fixes_r5.py. Bonus: the union+shuffle is computed
    # once, not twice.
    from medvedi_spark.operators._persist import persist_tracked

    rng = persist_tracked(
        unioned.repartitionByRange(n_part, *order)
        .sortWithinPartitions(*order)
        .withColumn("__pid__", F.spark_partition_id())
    )
    wloc = Window.partitionBy("__pid__").orderBy(*order).rowsBetween(Window.unboundedPreceding, 0)
    rng = rng.withColumn("__pick_loc__", F.last("__pay__", ignorenulls=True).over(wloc))
    # scan-order-last right payload per range; max_by/min_by skip null
    # ordering keys, so left rows never win and empty ranges yield null
    agg_fn = F.max_by if direction == "backward" else F.min_by
    parts = rng.groupBy("__pid__").agg(
        agg_fn("__pay__", F.when(F.col("__side__") == 0, F.col("__ts__"))).alias("__last__")
    )
    wcarry = Window.orderBy("__pid__").rowsBetween(Window.unboundedPreceding, -1)
    carry = parts.withColumn("__carry__", F.last("__last__", ignorenulls=True).over(wcarry)).select(
        "__pid__", "__carry__"
    )
    return (
        rng.join(F.broadcast(carry), "__pid__", "left")
        .withColumn("__pick__", F.coalesce("__pick_loc__", "__carry__"))
        .drop("__pid__", "__pick_loc__", "__carry__")
    )


def asof_join_rangejoin(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    by: Sequence[str] = (),
    value_cols: Sequence[str] | None = None,
    direction: str = "backward",
    tolerance_seconds: int | None = None,
) -> DataFrame:
    """Range-join formulation of :func:`asof_join` — property-test
    comparand. Each left row joins ALL admissible right rows before
    ``max_by`` collapses them, so the intermediate multiplies; the
    merge-asof plan above replaces it as the default. A surrogate id keeps
    duplicate left rows distinct through the groupBy (matching merge_asof)
    and makes grouping safe for non-groupable column types."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"bad direction={direction!r}")
    left = left.withColumn("__lid__", F.monotonically_increasing_id())
    lcols = [c for c in left.columns if c != "__lid__"]
    cond = (
        F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}")
        if direction == "backward"
        else F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}")
    )
    for k in by:
        cond = cond & (F.col(f"l.{k}") == F.col(f"r.{k}"))
    if tolerance_seconds is not None:
        gap = F.abs(F.col(f"l.{left_ts}").cast("long") - F.col(f"r.{right_ts}").cast("long"))
        cond = cond & (gap <= tolerance_seconds)
    values = value_cols if value_cols is not None else [c for c in right.columns if c != right_ts and c not in by]
    pick = F.max_by if direction == "backward" else F.min_by
    extreme = F.max if direction == "backward" else F.min
    aggs = [F.first(F.col(f"l.{c}")).alias(c) for c in lcols]
    aggs += [pick(F.col(f"r.{v}"), F.col(f"r.{right_ts}")).alias(v) for v in values]
    aggs.append(extreme(F.col(f"r.{right_ts}")).alias(f"asof_{right_ts}"))
    return (
        left.alias("l")
        .join(right.alias("r"), cond, "left_outer")
        .groupBy(F.col("l.__lid__"))
        .agg(*aggs)
        .drop("__lid__")
    )


def sessionize(
    df: DataFrame,
    ts_col: str,
    gap_seconds: int,
    by: Sequence[str],
    order_tiebreak: Sequence[str] = (),
) -> DataFrame:
    """Assign batch session ids: a new session starts after a silence of
    more than ``gap_seconds`` within each ``by`` partition (islands via
    lag + running sum — one shuffle on the keys, two window passes over
    already-partitioned data). Streaming variant: F.session_window
    (see queries/stream_ops.st2)."""
    w = Window.partitionBy(*by).orderBy(ts_col, *order_tiebreak)
    w_cum = Window.partitionBy(*by).orderBy(ts_col, *order_tiebreak).rowsBetween(Window.unboundedPreceding, 0)
    is_new = F.when(
        F.col(ts_col).cast("long") - F.lag(F.col(ts_col)).over(w).cast("long") > gap_seconds,
        F.lit(1),
    ).otherwise(F.lit(0))
    return df.withColumn("__is_new__", is_new).withColumn(
        "session_id", F.sum("__is_new__").over(w_cum)
    ).drop("__is_new__")


def top_k_per_group(df: DataFrame, by: Sequence[str], order: Sequence[Column], k: int) -> DataFrame:
    """Rank-and-take inside each group (TakeOrderedAndProject per key)."""
    w = Window.partitionBy(*by).orderBy(*order)
    return df.withColumn("__rank__", F.row_number().over(w)).filter(F.col("__rank__") <= k).drop("__rank__")


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    how: str = "inner",
    num_salts: int = 8,
) -> DataFrame:
    """Equi-join with key salting for skew: hot keys on the (big, skewed)
    left side would otherwise pile into one shuffle partition and strand
    the rest of the cluster. The left side salts each row into one of
    ``num_salts`` sub-keys from a hash of all its columns; the right side
    replicates ``num_salts``-fold so every sub-key still finds its match.
    Semantics are identical to ``left.join(right, on, how)`` for inner
    and left joins; cost trades a ``num_salts``x replication of the
    small side for an even shuffle of the big side. (AQE's skew-join
    splitting handles moderate skew automatically — salting is for the
    pathological single-key case AQE can't split, e.g. one key holding
    half the rows.)"""
    if how not in ("inner", "left", "left_outer"):
        raise ValueError("salted_join supports inner/left joins")
    salt = F.pmod(F.hash(*[F.col(c) for c in left.columns]), F.lit(num_salts))
    lsalted = left.withColumn("__salt__", salt)
    rsalted = right.withColumn(
        "__salt__", F.explode(F.array(*[F.lit(i) for i in range(num_salts)]))
    )
    out = lsalted.join(rsalted, [*on, "__salt__"], how)
    return out.drop("__salt__")


def upsert(
    base: DataFrame,
    changes: DataFrame,
    key_cols: Sequence[str],
    op_col: str | None = None,
    delete_op: str = "D",
) -> DataFrame:
    """CDC merge (MERGE INTO semantics without a table format): apply a
    change set to a snapshot — updates and inserts replace/add rows by
    key; rows whose ``op_col`` equals ``delete_op`` are removed.

    next = (base ANTI-JOIN change keys) UNION ALL (changes - deletes)

    Scale shape: the anti join shuffles both sides once on the key (or
    broadcasts the change set when it is batch-sized, which CDC batches
    are — Catalyst/AQE picks by size); the union is a no-shuffle
    bag-concat. This is exactly how Delta/Iceberg MERGE rewrites files,
    minus the transactional manifest.
    """
    keys = list(key_cols)
    payload_cols = [c for c in changes.columns if c != op_col]
    if set(payload_cols) != set(base.columns):
        raise ValueError(
            f"changes payload columns {sorted(payload_cols)} must match base columns {sorted(base.columns)}"
        )
    survivors = base.join(changes.select(*keys), keys, "left_anti")
    applied = changes
    if op_col is not None:
        applied = applied.filter(F.col(op_col) != delete_op).drop(op_col)
    return survivors.unionByName(applied.select(*base.columns))
