"""Snapshot per-query physical-plan budgets into tools/plan_budget.json.

The budget pins, for every registered BATCH query, the plan facts that
matter at 100 TB: shuffle-exchange count, shuffle-join count (SMJ+SHJ),
broadcast-nested-loop count, and row-at-a-time Python UDF count.
``tests/test_plan_budget.py`` asserts current plans stay within these
numbers, so a refactor that silently adds an exchange (or demotes a
broadcast join to a shuffle join) fails CI instead of surfacing as a
straggler on the cluster.

Usage: python tools/plan_budget.py [sf_dir]   # regenerates the snapshot
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.explain_audit import plan_facts

from medvedi_spark.queries.registry import QUERIES, _ensure_loaded
from medvedi_spark.session import get_spark

BUDGET_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)), "plan_budget.json")
# streaming builders read a drained memory sink; their batch re-plan is
# not the production readStream plan, so they are audited separately
SKIP_PREFIXES = ("st",)
# side-effecting builders: evaluating them writes real tables (c18
# CREATEs bucketed tables, c19 writes a partitioned dataset) — excluded
# from the generic sweep and audited by their own dedicated tests
# (round-4 ADVICE)
SKIP_QUERIES = frozenset(
    {
        "c18_bucketed_join", "c19_partition_pruned_scan", "p10_export_jsonl",
        "c20_schema_evolution",
        # write the saved index, and their serving-plan facts (no training
        # stages, partition-pruned scan) are pinned by tests/test_ann_index
        "s11_ivf_sq8_index", "s12_ivfadc_index", "s15_ivfadc_index_rerank",
        "s16_ivfadc_batched_serve",
        # writes the dedup signature index; ingest-plan facts pinned by
        # tests/test_round7_fixes
        "d17_fuzzy_dedup_ingest",
    }
)


def skip_in_sweep(name: str) -> bool:
    if name in SKIP_QUERIES:
        return True
    fam = name.split("_")[0]
    return any(fam.startswith(p) and fam[len(p):].isdigit() for p in SKIP_PREFIXES)


def snapshot(sf_dir: str) -> dict[str, dict[str, int]]:
    _ensure_loaded()
    spark = get_spark("plan-budget")
    spark.sparkContext.setLogLevel("ERROR")
    from medvedi_spark.operators._persist import release_persisted

    out: dict[str, dict[str, int]] = {}
    for name, q in QUERIES.items():
        if skip_in_sweep(name):
            continue
        # clean cache per query: builders leave tracked persists, and the
        # cache manager substitutes InMemoryRelation into any matching
        # later subplan — budgets must describe each query's standalone
        # plan, in lockstep with test_plan_budget's per-query clear
        release_persisted()
        spark.catalog.clearCache()
        facts = plan_facts(q.builder(spark, sf_dir))
        out[name] = {
            "exch": facts["exch"],
            "shuffle_joins": facts["smj"] + facts["shj"],
            "bnlj": facts["bnlj"],
            "pyudf": facts["pyudf"],
        }
    return out


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001"
    )
    out = snapshot(sf_dir)
    with open(BUDGET_PATH, "w") as fh:
        json.dump({"sf_dir": sf_dir, "budgets": out}, fh, indent=1, sort_keys=True)
    print(f"wrote {len(out)} budgets to {BUDGET_PATH}")


if __name__ == "__main__":
    main()
