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

# Round-4 gate rotation (VERDICT r3 directive #2). Rounds 1-3 drove the same
# 50 queries through the driver oracle; all 50 are green in
# CORRECTNESS_r03.json, so they rotate OUT and the 55 queries that so far had
# only local check_oracle evidence rotate IN. The window holds 50, so 5
# extras whose operator family is redundantly covered inside the new window
# stay local-only: m7 (aHash near-dup; m4 gates the same aHash kernel),
# q7 (duplicated() pairs; driver-green via c5 in r1-r3), q15 (cube; q14
# rollup + q24 grouping-sets gate the same expansion), q30 (plain
# groupBy-agg; q23/q28/q29 gate the family), c10 (non-strict concat fills;
# c8/c9 gate the same fill/scatter path and q9 gated strict concat in r1-r3).
# Membership here OVERRIDES the per-registration ``gate=`` flag, which now
# records only the round-1 layout.
GATE_ROTATION_R4 = frozenset(
    {
        # compat surface never driver-verified before r4
        "c8_join_fill_defaults", "c9_join_last_wins", "c11_mdf_dedup_pipeline",
        "c12_mdf_explode", "c13_mdf_fillna_astype", "c14_csv_roundtrip",
        "c15_json_roundtrip", "c16_orc_roundtrip", "c17_upsert_merge",
        # dedup / similarity
        "d8_edit_distance", "d9_decontamination", "d10_semantic_dedup",
        "d11_duplicate_spans", "s3_kmeans_assign", "s4_pq_encode",
        "s5_pq_adc_topk",
        # relational
        "q2_top_orders", "q14_rollup", "q22_exists_semijoin", "q23_custdist",
        "q24_grouping_sets", "q25_above_brand_avg", "q28_local_supplier_volume",
        "q29_returned_items", "q32_array_roundtrip", "q33_datetime_surface",
        "q34_string_surface", "q36_unpivot_metrics", "q37_ranking_windows",
        "q38_multires_rollup",
        # streaming
        "st8_stream_static_join", "st9_stream_ingest",
        # text analysis
        "t5_winnow_fingerprint", "t6_repetition", "t7_tfidf_topterms",
        "t8_collocations", "t9_pii_redaction", "t10_boilerplate_filter",
        # pipeline
        "p1_corpus_clean", "p2_stratified_sample", "p3_pack_sequences",
        "p4_training_pipeline", "p5_shard_shuffle", "p6_chunk_overlap",
        "p7_domain_mixing", "p8_bpe_merges", "p9_bpe_segment",
        # multimodal
        "m4_image_ahash_dedup", "m5_audio_fingerprint_dedup",
        "m6_video_scene_cuts",
    }
)


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

    for q in QUERIES.values():
        q.gate = q.name in GATE_ROTATION_R4
    _LOADED = True
