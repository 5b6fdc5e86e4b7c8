"""Query registry: every engine capability exposed as a named query.

Each entry pairs a Spark DataFrame builder with (where expressible) an
equivalent ANSI-SQL oracle string for DuckDB. The driver hash-compares the
two at sf=0.01, so builders follow two hard rules:

1. **Deterministic floats.** Sums over doubles go through exact DECIMAL
   arithmetic and are cast back to DOUBLE at the end, so Spark's
   partial-aggregation order can't produce different bits than DuckDB's
   sequential sum. See ``dsum``/``davg``.
2. **Identical column names.** Every computed column is aliased the same
   in the DataFrame code and the oracle SQL.

Reference parity: the relational queries cover SURVEY.md §2's operator
inventory (citations inline); the ``d*``/``s*``/``t*`` queries are the
north-star LLM-pipeline extensions (§2.10).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

__all__ = ["QUERIES", "Query", "register", "queries", "oracle_sql"]


@dataclass
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, doc: str = "", tags: tuple[str, ...] = ()):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags)
        return fn

    return deco


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {name: q.builder for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {name: q.oracle for name, q in QUERIES.items() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query-defining module exactly once (registration side effect)."""
    global _LOADED
    if _LOADED:
        return
    from medvedi_spark.queries import compat_ops, llm_ops, relational, stream_ops, text_ops  # noqa: F401

    _LOADED = True
