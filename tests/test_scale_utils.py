"""Scale utilities: bucketed co-located joins and salted skew joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from medvedi_spark.frame import MDF
from medvedi_spark.operators.relational import salted_join
from medvedi_spark.sources import readers as src
from tools.explain_audit import plan_facts


def test_bucketed_join_skips_shuffle(spark):
    n = 1000
    a = MDF({"k": list(range(n)), "va": [i * 2 for i in range(n)]}, spark=spark)
    b = MDF({"k": list(range(n)), "vb": [i * 3 for i in range(n)]}, spark=spark)
    src.write_bucketed(a, "bkt_a", ["k"], n_buckets=8, sort_cols=["k"])
    src.write_bucketed(b, "bkt_b", ["k"], n_buckets=8, sort_cols=["k"])
    ta, tb = spark.table("bkt_a"), spark.table("bkt_b")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force non-broadcast
        joined = ta.join(tb, "k")
        facts = plan_facts(joined)
        assert facts["exch"] == 0, "bucketed join must not shuffle"
        assert joined.count() == n
        # control: the same join on unbucketed parquet shuffles both sides
        ua = a.df.drop("__row_id__")
        ub = b.df.drop("__row_id__")
        assert plan_facts(ua.join(ub, "k"))["exch"] == 2
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS bkt_a")
        spark.sql("DROP TABLE IF EXISTS bkt_b")


def test_salted_join_matches_plain_join(spark):
    # one pathological key holding half the left side
    left = spark.createDataFrame(
        [(0, i) for i in range(500)] + [(k, k) for k in range(1, 500)],
        "k int, v int",
    )
    right = spark.createDataFrame([(k, f"r{k}") for k in range(600)], "k int, name string")
    plain = left.join(right, ["k"], "inner").orderBy("k", "v").collect()
    salted = salted_join(left, right, ["k"], "inner", num_salts=4).orderBy("k", "v").collect()
    assert plain == salted


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([(1, "a"), (99, "b")], "k int, v string")
    right = spark.createDataFrame([(1, "x")], "k int, r string")
    out = {r.k: r.r for r in salted_join(left, right, ["k"], "left", num_salts=3).collect()}
    assert out == {1: "x", 99: None}


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Partition pruning: a filter on the partition column must reach the
    scan as a PartitionFilter and cut the files read — the mechanism that
    turns a 100 TB date-partitioned table into a one-day scan."""
    df = MDF(
        {"day": ["a"] * 5 + ["b"] * 5 + ["c"] * 5, "v": list(range(15))},
        spark=spark,
    )
    p = str(tmp_path / "parted.parquet")
    src.write_parquet(df, p, partition_by=["day"])
    back = spark.read.parquet(p).filter(F.col("day") == "b")
    formatted = back._jdf.queryExecution().explainString(
        back._sc._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "PartitionFilters: [isnotnull(day" in formatted or "PartitionFilters: [" in formatted
    assert back.count() == 5
    # only the day=b directory is read
    import re

    m = re.search(r"Location: InMemoryFileIndex[^\n]*", formatted)
    assert m is not None
