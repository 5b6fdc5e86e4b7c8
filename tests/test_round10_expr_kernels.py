"""Focused tests for the round-10 expr-path kernel construction
(``llm._EXPR_KERNELS``): the vector-distance kernels, ``_pq_lut`` and
pq_encode's subspace distances built as single ``F.expr`` SQL strings.

The optimization's whole contract is "same analyzed expression, one
py4j round-trip instead of thousands" — so these tests pin, for every
flag-gated construction:

- the OPTIMIZED LOGICAL PLAN is identical to the composed branch's
  (modulo exprIds and lambda-variable names, which are fresh per
  construction on both paths);
- the results are identical on real data.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

import medvedi_spark.operators.llm as llm


@pytest.fixture
def both_arms(monkeypatch):
    """Run a builder under each arm, restoring the flag afterwards."""

    def run(build):
        monkeypatch.setattr(llm, "_EXPR_KERNELS", True)
        on = build()
        monkeypatch.setattr(llm, "_EXPR_KERNELS", False)
        off = build()
        monkeypatch.setattr(llm, "_EXPR_KERNELS", True)
        return on, off

    return run


def _norm_optimized_plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(True)
    text = buf.getvalue()
    m = re.search(r"== Optimized Logical Plan ==\n(.*?)\n== Physical", text, re.S)
    assert m, "explain(True) output missing the optimized plan"
    # exprIds (#123) and lambda-variable names (x_7, acc_12) are fresh
    # per construction on BOTH paths — normalize them away
    return re.sub(r"#\d+|lambda [a-z]+_?\d*", "@", m.group(1))


def _rows(df):
    return sorted(map(tuple, df.collect()))


@pytest.mark.parametrize(
    "kernel", [llm.sqdist_dec, llm.sqdist_double, llm.dot_dec, llm.dot_double]
)
def test_kernel_expr_path_equals_composed(spark, both_arms, kernel):
    df = spark.createDataFrame(
        [(i, [float(i), 2.5 * i, -i * 0.125], [1.0, -2.0, 3.5]) for i in range(50)],
        "id long, a array<double>, b array<double>",
    )
    on, off = both_arms(lambda: df.select("id", kernel("a", "b").alias("v")))
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)


def test_sq8_d2_expr_path_equals_composed(spark, both_arms):
    df = spark.createDataFrame(
        [(i, [i % 256, (3 * i) % 256], [(i + 7) % 256, i % 256]) for i in range(40)],
        "id long, codes array<int>, qcodes array<int>",
    )
    on, off = both_arms(lambda: df.select("id", llm._sq8_d2().alias("d2")))
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)


def test_pq_lut_expr_path_equals_composed(spark, both_arms):
    q = spark.createDataFrame(
        [(i, [float(j + i) for j in range(8)]) for i in range(4)],
        "query_id long, q_emb array<double>",
    )
    cent = spark.createDataFrame(
        [(i, [float(j * i + 1) for j in range(8)]) for i in range(4)],
        "cent_id int, c_emb array<double>",
    )
    codes = spark.createDataFrame(
        [(i, i % 4, (i + 1) % 4) for i in range(20)],
        "neighbor_id long, code0 int, code1 int",
    )

    def build():
        lut_arr, d2 = llm._pq_lut(q, cent, 2, n_codes=4)
        return codes.crossJoin(lut_arr).select(
            "query_id", "neighbor_id", d2.cast("string").cast("double").alias("d2")
        )

    on, off = both_arms(build)
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)


def test_pq_encode_decimal_expr_path_equals_composed(spark, both_arms):
    emb = spark.createDataFrame(
        [(i, [float(j * (i + 1)) for j in range(8)]) for i in range(10)],
        "vec_id long, embedding array<double>",
    )
    cent = spark.createDataFrame(
        [(i, [float(j + i) for j in range(8)]) for i in range(3)],
        "cent_id int, c_emb array<double>",
    )
    on, off = both_arms(
        lambda: llm.pq_encode(emb, cent, "vec_id", "embedding", n_subspaces=2)
    )
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)
