"""Focused tests for the round-11 expr-path kernel constructions —
the residual composed call sites VERDICT r10 directive #4 named:
``hashing.minhash_agg_cols`` / ``hashing.simhash_col`` (~1 100 / ~3 900
py4j round-trips composed), ``llm._sq8_code``'s literal-array transform
(~800-1 100), ``llm._argmin_cell`` (st13's per-centroid routing array,
~4 700), and ``stream_ops._st10_row_minhash_bands`` (the row-wise
minhash fold). Same contract as the r10 kernels: IDENTICAL analyzed
expression, one py4j round-trip — so these pin, per flag-gated
construction, optimized-logical-plan equality (modulo exprIds and
lambda-variable names) and result equality on real data.
"""

from __future__ import annotations

import contextlib
import io
import re

import pytest
from pyspark.sql import functions as F

import medvedi_spark.functions.hashing as hashing
import medvedi_spark.operators.llm as llm
import medvedi_spark.queries.stream_ops as stream_ops


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


@pytest.fixture
def hashing_arms(monkeypatch):
    def run(build):
        monkeypatch.setattr(hashing, "_EXPR_KERNELS", True)
        on = build()
        monkeypatch.setattr(hashing, "_EXPR_KERNELS", False)
        off = build()
        monkeypatch.setattr(hashing, "_EXPR_KERNELS", True)
        return on, off

    return run


@pytest.fixture
def llm_arms(monkeypatch):
    def run(build):
        monkeypatch.setattr(llm, "_EXPR_KERNELS", True)
        on = build()
        monkeypatch.setattr(llm, "_EXPR_KERNELS", False)
        off = build()
        monkeypatch.setattr(llm, "_EXPR_KERNELS", True)
        return on, off

    return run


@pytest.fixture
def hash_df(spark):
    return spark.createDataFrame(
        [(i % 5, (1_000_003 * i + 17) % 2_147_483_647) for i in range(200)],
        "doc_id int, h bigint",
    )


def test_minhash_agg_cols_expr_path_equals_composed(hash_df, hashing_arms):
    on, off = hashing_arms(
        lambda: hash_df.groupBy("doc_id").agg(*hashing.minhash_agg_cols("h"))
    )
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)


def test_simhash_col_expr_path_equals_composed(hash_df, hashing_arms):
    on, off = hashing_arms(
        lambda: hash_df.groupBy("doc_id").agg(hashing.simhash_col("h").alias("sh"))
    )
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)


def test_minhash_agg_cols_quotes_reserved_word_column(spark):
    # ADVICE r10: a reserved-word column name must parse on the expr path
    df = spark.createDataFrame([(1, 10), (1, 20)], "doc_id int, `order` bigint")
    got = df.groupBy("doc_id").agg(*hashing.minhash_agg_cols("order")).collect()
    assert len(got) == 1


@pytest.fixture
def emb_df(spark):
    return spark.createDataFrame(
        [
            (i, [0.125 * i - 1.0, 2.5 * (i % 7), -0.001 * i, 42.0])
            for i in range(60)
        ],
        "vec_id long, embedding array<double>",
    )


def test_sq8_code_expr_path_equals_composed(emb_df, llm_arms):
    stats = llm._sq8_train(emb_df, "embedding")
    vmin_vals, vmax_vals = llm._sq8_range_literals(stats)

    on, off = llm_arms(
        lambda: emb_df.select(
            "vec_id", llm._sq8_code("embedding", vmin_vals, vmax_vals).alias("codes")
        )
    )
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert [r["codes"] for r in on.orderBy("vec_id").collect()] == [
        r["codes"] for r in off.orderBy("vec_id").collect()
    ]


def test_sq8_code_column_args_still_compose(emb_df):
    # Column vec / Column literal args keep the composed branch working
    vmin_c, vmax_c = F.lit([-1.0, 0.0, -0.059, 42.0]), F.lit([6.375, 15.0, 0.0, 42.0])
    got = emb_df.select(
        llm._sq8_code(F.col("embedding"), vmin_c, vmax_c).alias("codes")
    ).collect()
    assert all(len(r["codes"]) == 4 for r in got)


def test_argmin_cell_expr_path_equals_composed(emb_df, llm_arms):
    cents = (
        emb_df.filter(F.col("vec_id") < 4)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb"))
        .orderBy("cent_id")
        .collect()
    )
    on, off = llm_arms(
        lambda: emb_df.select(
            "vec_id", llm._argmin_cell("embedding", cents).alias("cell")
        )
    )
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)


def test_argmin_cell_matches_coarse_route_ranking(emb_df):
    # the in-row argmin must agree with the crossJoin+window ranking
    cents_df = emb_df.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("cent_id"), F.col("embedding").alias("c_emb")
    )
    cents = cents_df.orderBy("cent_id").collect()
    inrow = {
        r["vec_id"]: r["cell"]
        for r in emb_df.select(
            "vec_id", llm._argmin_cell("embedding", cents).alias("cell")
        ).collect()
    }
    assign, _ = llm._coarse_route(
        emb_df.select("vec_id", "embedding"), cents_df, F.lit(False), 1
    )
    windowed = {r["vec_id"]: r["cell"] for r in assign.collect()}
    assert inrow == windowed


def test_st10_row_minhash_bands_expr_path_equals_composed(spark, llm_arms):
    df = spark.createDataFrame(
        [
            (i, [(1_000_003 * (i + j) + 17) % 2_147_483_647 for j in range(5)])
            for i in range(40)
        ],
        "doc_id long, harr array<bigint>",
    )
    on, off = llm_arms(
        lambda: df.select(
            "doc_id",
            F.explode(stream_ops._st10_row_minhash_bands("harr")).alias("bd"),
        ).select("doc_id", "bd.band_idx", "bd.band_val")
    )
    assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
    assert _rows(on) == _rows(off)


def test_minhash_band_index_bands_expr_path_equals_composed(spark, llm_arms):
    df = spark.createDataFrame(
        [(i, f"w{i} w{i + 1} w{i + 2} common tail text") for i in range(30)],
        "doc_id long, text string",
    )
    on, off = llm_arms(lambda: llm.minhash_band_index(df, "doc_id", "text")[1])
    try:
        assert _norm_optimized_plan(on) == _norm_optimized_plan(off)
        assert _rows(on) == _rows(off)
    finally:
        llm.release_persisted()
