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


# The driver's correctness gate checks the FIRST ``GATE_WINDOW`` entries of
# ``queries()``. Every operator family must keep a verified entry inside the
# window, so ``queries()`` orders gate=True queries first. gate=False marks a
# deliberate duplicate whose operator is already proven by an in-window query
# (recorded in its ``doc``); such extras still run in bench and local
# check_oracle, they just don't spend gate budget.
GATE_WINDOW = 50


@dataclass
class Query:
    name: str
    builder: Callable[[SparkSession, str], DataFrame]
    oracle: str | None  # None → driver records rows-only check
    doc: str = ""
    tags: tuple[str, ...] = field(default_factory=tuple)
    gate: bool = True


QUERIES: dict[str, Query] = {}


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    tags: tuple[str, ...] = (),
    gate: bool = True,
):
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: Callable[[SparkSession, str], DataFrame]):
        QUERIES[name] = Query(
            name=name, builder=fn, oracle=oracle, doc=doc or fn.__doc__ or "", tags=tags, gate=gate
        )
        return fn

    return deco


def _gate_ordered() -> list[Query]:
    """Gated queries first (registration order), then the extras."""
    qs = list(QUERIES.values())
    return [q for q in qs if q.gate] + [q for q in qs if not q.gate]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    _ensure_loaded()
    return {q.name: q.builder for q in _gate_ordered()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {q.name: q.oracle for q in _gate_ordered() if q.oracle is not None}


_LOADED = False


def _ensure_loaded() -> None:
    """Import every query-defining module exactly once (registration side effect)."""
    global _LOADED
    if _LOADED:
        return
    from medvedi_spark.queries import compat_ops, llm_ops, relational, stream_ops, text_ops  # noqa: F401

    _LOADED = True
