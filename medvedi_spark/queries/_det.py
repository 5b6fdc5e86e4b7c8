"""Deterministic-aggregation helpers for oracle parity.

The driver hash-compares Spark results against a DuckDB oracle. Plain
``SUM(double)`` is order-dependent (Spark sums per-partition then merges;
DuckDB sums sequentially), so the same data can produce different last
bits. Policy:

- Per-row double arithmetic is fine: identical IEEE-754 ops on identical
  inputs give identical bits in both engines.
- Any aggregate over doubles is computed as
  ``CAST(SUM(CAST(expr AS DECIMAL(28,10))) AS DOUBLE)`` — the decimal sum
  is exact (order-free) and the final cast is deterministic. A double
  can never be an exact decimal-tie at scale 10, so the double→decimal
  rounding is also engine-independent.
- Averages divide the exact decimal sum (as double) by the count.

``DECIMAL(28,10)`` leaves 18 integer digits — sums up to 10^18 before
overflow, plenty for the bench scale factors and checked by tests.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DEC = "decimal(28,10)"


def dsum(expr: Column | str) -> Column:
    """Order-independent SUM over a double expression (exact via decimal).

    The final decimal→double conversion goes through a string because
    DuckDB's direct decimal→double cast is not correctly rounded while
    Spark's is; string→double parsing is correctly rounded in both.
    """
    col = F.col(expr) if isinstance(expr, str) else expr
    return F.sum(col.cast(DEC)).cast("string").cast("double")


def davg(expr: Column | str) -> Column:
    """Order-independent AVG: exact decimal sum / count."""
    col = F.col(expr) if isinstance(expr, str) else expr
    return dsum(col) / F.count(col)


def sql_dsum(expr: str) -> str:
    return f"CAST(CAST(SUM(CAST(({expr}) AS DECIMAL(28,10))) AS VARCHAR) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    return f"{sql_dsum(expr)} / COUNT({expr})"
