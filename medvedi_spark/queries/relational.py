"""Relational query surface — SURVEY.md §2 operator inventory as queries.

Each query exercises one or more inventory rows (cited per query) and is
paired with a DuckDB oracle. Filters and projections are written so
Catalyst pushes them into the parquet scan; joins keep small dimensions
broadcast-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from medvedi_spark.catalog import load
from medvedi_spark.queries._det import davg, dsum, sql_davg, sql_dsum
from medvedi_spark.queries.registry import register

# --------------------------------------------------------------------------
# q1 — TPC-H Q1 shape: scan → filter → groupBy → 8 aggs → (sorted by keys)
# Covers: S1 scan, P5 take(mask), G1/G2 groupby+reduceat, O1 sort_values.
# Reference: medvedi/dataframe.py:866-899 (groupby), :201-216 (reduceat).
# --------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    oracle=f"""
    SELECT
      l_returnflag,
      l_linestatus,
      {sql_dsum('l_quantity')} AS sum_qty,
      {sql_dsum('l_extendedprice')} AS sum_base_price,
      {sql_dsum('l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
      {sql_dsum('l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
      {sql_davg('l_quantity')} AS avg_qty,
      {sql_davg('l_extendedprice')} AS avg_price,
      {sql_davg('l_discount')} AS avg_disc,
      COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("groupby", "agg", "filter"),
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg("l_quantity").alias("avg_qty"),
            davg("l_extendedprice").alias("avg_price"),
            davg("l_discount").alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )
