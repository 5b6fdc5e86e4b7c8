"""Shuffle-budget regression guard.

`tools/plan_budget.json` pins every batch query's shuffle-exchange count,
shuffle-join count, broadcast-nested-loop count, and Python-UDF count
(snapshotted by `tools/plan_budget.py`). A refactor that silently adds an
exchange or demotes a broadcast join to a shuffle join fails HERE, not as
a straggler at 100 TB. Intentional plan changes regenerate the snapshot:

    python tools/plan_budget.py
"""

from __future__ import annotations

import json
import os

import pytest

from tools.explain_audit import plan_facts
from tools.plan_budget import BUDGET_PATH, SKIP_PREFIXES

from medvedi_spark.queries.registry import QUERIES, _ensure_loaded


def _budgets():
    with open(BUDGET_PATH) as fh:
        return json.load(fh)["budgets"]


def test_every_batch_query_has_a_budget():
    _ensure_loaded()
    budgets = _budgets()
    for name in QUERIES:
        fam = name.split("_")[0]
        if any(fam.startswith(p) and fam[len(p):].isdigit() for p in SKIP_PREFIXES):
            continue
        assert name in budgets, f"{name} lacks a plan budget — run tools/plan_budget.py"


def test_plans_stay_within_budget(spark, sf_dir):
    _ensure_loaded()
    budgets = _budgets()
    over: list[str] = []
    for name, budget in budgets.items():
        if name not in QUERIES:
            continue
        facts = plan_facts(QUERIES[name].builder(spark, sf_dir))
        got = {
            "exch": facts["exch"],
            "shuffle_joins": facts["smj"] + facts["shj"],
            "bnlj": facts["bnlj"],
            "pyudf": facts["pyudf"],
        }
        for key, limit in budget.items():
            if got[key] > limit:
                over.append(f"{name}: {key} {got[key]} > budget {limit}")
    assert not over, "plan regressions:\n" + "\n".join(over)
