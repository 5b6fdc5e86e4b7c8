"""MDF core semantics: construction, projection, mutation, null handling.

Cases model the reference suite's behavior (SURVEY §5: test_init,
test_columns, test_isnull, test_fillna, test_astype, test_take,
test_iloc, test_sample, test_unique, test_iter) without copying it.
"""

from __future__ import annotations

import numpy as np
import pytest

from medvedi_spark.frame import MDF


@pytest.fixture
def basic(spark):
    return MDF(
        {
            "a": np.array([3, 1, 2, 1], dtype=np.int64),
            "b": np.array([1.5, np.nan, 0.5, 2.5]),
            "s": np.array(["x", "", "y", "x"]),
        },
        spark=spark,
    )


def test_init_columns_and_len(basic):
    assert basic.columns == ("a", "b", "s")
    assert len(basic) == 4


def test_init_rejects_unequal_lengths(spark):
    with pytest.raises(ValueError):
        MDF({"a": [1, 2], "b": [1]}, spark=spark)


def test_init_from_iterable_with_columns(spark):
    m = MDF([[1, 2], ["u", "v"]], columns=["x", "y"], spark=spark)
    assert m.columns == ("x", "y")
    assert list(m["x"]) == [1, 2]


def test_getitem_returns_ndarray_in_row_order(basic):
    np.testing.assert_array_equal(basic["a"], [3, 1, 2, 1])


def test_getitem_collection_projects(basic):
    sub = basic[["a", "s"]]
    assert sub.columns == ("a", "s")


def test_projection_keeps_index_columns(spark):
    m = MDF({"k": [1, 2], "v": [10, 20], "w": [5, 6]}, index="k", spark=spark)
    sub = m[["v"]]
    assert set(sub.columns) == {"k", "v"}


def test_setitem_scalar_broadcast(basic):
    basic["c"] = 7
    np.testing.assert_array_equal(basic["c"], [7, 7, 7, 7])


def test_setitem_array(basic):
    basic["c"] = np.array([10, 20, 30, 40])
    np.testing.assert_array_equal(basic["c"], [10, 20, 30, 40])


def test_setitem_length_mismatch(basic):
    with pytest.raises(ValueError):
        basic["c"] = np.array([1, 2])


def test_delitem(basic):
    del basic["b"]
    assert basic.columns == ("a", "s")
    with pytest.raises(KeyError):
        del basic["nope"]


def test_delitem_refuses_index(spark):
    m = MDF({"k": [1], "v": [2]}, index="k", spark=spark)
    with pytest.raises(ValueError):
        del m["k"]


def test_take_mask(basic):
    out = basic.take(np.array([True, False, True, False]))
    np.testing.assert_array_equal(out["a"], [3, 2])


def test_take_indexes_reorders(basic):
    out = basic.take(np.array([2, 0]))
    np.testing.assert_array_equal(out["a"], [2, 3])


def test_iloc_scalar_row(basic):
    row = basic.iloc[1]
    assert row["a"] == 1 and row["s"] == ""


def test_iloc_negative(basic):
    assert basic.iloc[-1]["a"] == 1


def test_iloc_slice(basic):
    out = basic.iloc[1:3]
    np.testing.assert_array_equal(out["a"], [1, 2])


def test_iterrows(basic):
    rows = list(basic.iterrows("a", "s"))
    assert rows == [(3, "x"), (1, ""), (2, "y"), (1, "x")]


def test_astype(basic):
    out = basic.astype({"a": "float64"})
    assert out["a"].dtype.kind == "f"


def test_rename(basic):
    out = basic.rename({"a": "alpha"})
    assert "alpha" in out.columns and "a" not in out.columns


def test_rename_errors_raise(basic):
    with pytest.raises(KeyError):
        basic.rename({"nope": "x"}, errors="raise")


def test_fillna_float_nan(basic):
    out = basic.fillna(0.0, column="b")
    np.testing.assert_array_equal(out["b"], [1.5, 0.0, 0.5, 2.5])


def test_isnull_float(basic):
    np.testing.assert_array_equal(basic.isnull("b"), [False, True, False, False])
    np.testing.assert_array_equal(basic.notnull("b"), [True, False, True, True])


def test_isnull_int_never_null(basic):
    np.testing.assert_array_equal(basic.isnull("a"), [False] * 4)


def test_unique_sorted(basic):
    np.testing.assert_array_equal(basic.unique("a"), [1, 2, 3])


def test_unique_unordered(basic):
    assert set(basic.unique("a", unordered=True)) == {1, 2, 3}


def test_nonemin_nonemax_skip_nan(basic):
    assert basic.nonemin("b") == 0.5
    assert basic.nonemax("b") == 2.5


def test_nonemin_empty_is_none(spark):
    m = MDF({"x": np.array([np.nan, np.nan])}, spark=spark)
    assert m.nonemin("x") is None


def test_isin(basic):
    np.testing.assert_array_equal(basic.isin("a", [1, 3]), [True, True, False, True])
    np.testing.assert_array_equal(basic.isin("a", [1, 3], invert=True), [False, False, True, False])


def test_sample_n(basic):
    assert len(basic.sample(n=2)) == 2


def test_copy_independent(basic):
    c = basic.copy()
    c["z"] = 1
    assert "z" not in basic.columns


def test_to_pandas_row_order(basic):
    pdf = basic.to_pandas()
    assert list(pdf["a"]) == [3, 1, 2, 1]


def test_arrow_roundtrip(spark, basic):
    table = basic.to_arrow()
    back = MDF.from_arrow(table, spark=spark)
    np.testing.assert_array_equal(back["a"], basic["a"])


def test_parquet_roundtrip(spark, basic, tmp_path):
    path = str(tmp_path / "t.parquet")
    basic.to_parquet(path)
    back = MDF.read_parquet(path, spark=spark)
    assert sorted(back["a"]) == sorted(basic["a"])


def test_timestamps_and_nat(spark):
    ts = np.array(["2024-01-02", "NaT", "2023-12-31"], dtype="datetime64[us]")
    m = MDF({"t": ts}, spark=spark)
    np.testing.assert_array_equal(m.isnull("t"), [False, True, False])
    assert m.nonemin("t") == ts[2].item()


def test_isin_mdf_haystack_joins_not_collects(basic, spark):
    """J3 scale ruling: an MDF haystack lowers to a marker join — the
    haystack must appear as a join build side in the plan, never as an
    in-plan literal IN-list (which would mean it was collected)."""
    hay = MDF({"v": np.array([1, 3, 99])}, spark=spark)
    np.testing.assert_array_equal(basic.isin("a", hay), [True, True, False, True])
    np.testing.assert_array_equal(
        basic.isin("a", hay, invert=True), [False, False, True, False]
    )
    # Plan shape: build the marked frame the same way isin does and check
    # for a join, not an IN-list.
    from pyspark.sql import functions as F

    hay_df = hay.df.select(F.col("v").alias("__hay__")).distinct()
    marked = basic.df.join(
        hay_df.withColumn("__hit__", F.lit(True)),
        F.col("a") == F.col("__hay__"),
        "left",
    )
    plan = marked._jdf.queryExecution().executedPlan().toString()
    assert "Join" in plan


def test_isin_large_literal_haystack_joins(basic):
    """A literal haystack past the IN-list cap routes through the join
    path and still returns the right mask."""
    big = list(range(1, MDF._ISIN_LITERAL_MAX + 10))
    np.testing.assert_array_equal(basic.isin("a", big), [True, True, True, True])
    np.testing.assert_array_equal(
        basic.isin("a", [v + 10_000 for v in big]), [False, False, False, False]
    )


def test_isin_null_rows_follow_invert(spark):
    """Null probe values: False normally, True inverted (fillna(invert)
    semantics) — identical between literal and join paths."""
    df = MDF({"a": np.array([1.0, np.nan, 3.0])}, spark=spark)
    hay = MDF({"v": np.array([1.0])}, spark=spark)
    np.testing.assert_array_equal(df.isin("a", hay), [True, False, False])
    np.testing.assert_array_equal(df.isin("a", hay, invert=True), [False, True, True])
    np.testing.assert_array_equal(df.isin("a", [1.0]), [True, False, False])
    np.testing.assert_array_equal(df.isin("a", [1.0], invert=True), [False, True, True])


def test_sample_weighted_column_distributed(spark):
    """Column-name weights take the distributed Efraimidis–Spirakis path:
    no weights array on the driver, sample size honored, zero/negative
    weights excluded."""
    n_rows = 1000
    m = MDF(
        {
            "id": np.arange(n_rows),
            "w": np.where(np.arange(n_rows) < 10, 1000.0, np.where(np.arange(n_rows) < 500, 1.0, 0.0)),
        },
        spark=spark,
    )
    out = m.sample(n=50, weights="w")
    ids = out["id"]
    assert len(ids) == 50
    assert len(set(ids)) == 50  # without replacement
    assert all(i < 500 for i in ids)  # zero-weight rows never sampled
    # heavy rows (1000x weight) should essentially always be in a 50-sample
    assert sum(1 for i in ids if i < 10) >= 8


def test_sample_weighted_column_replace_distributed(spark):
    """Weighted WITH-replacement sampling on a column: n independent
    inverse-CDF draws — every draw lands on a positive-weight row, heavy
    rows dominate, duplicates are allowed, n is exact."""
    n_rows = 200
    m = MDF(
        {
            "id": np.arange(n_rows),
            "w": np.where(np.arange(n_rows) < 5, 1000.0, np.where(np.arange(n_rows) < 100, 1.0, 0.0)),
        },
        spark=spark,
    )
    out = m.sample(n=120, weights="w", replace=True)
    ids = out["id"]
    assert len(ids) == 120  # exactly n draws, with multiplicity
    assert all(i < 100 for i in ids)  # zero-weight rows never sampled
    # ~98% of the mass sits on the 5 heavy rows
    assert sum(1 for i in ids if i < 5) >= 100
    assert len(set(ids)) <= 100  # replacement: duplicates expected


def test_sample_weighted_replace_small_and_empty(spark):
    m = MDF({"id": [1, 2], "w": [1.0, 2.0]}, spark=spark)
    assert len(m.sample(n=5, weights="w", replace=True)) == 5  # n > len OK with replace
    assert len(m.sample(n=0, weights="w", replace=True)) == 0
    zero_w = MDF({"id": [1, 2], "w": [0.0, 0.0]}, spark=spark)
    with pytest.raises(ValueError):
        zero_w.sample(n=1, weights="w", replace=True)


def test_sample_replace_empty_frame_raises(spark):
    """np.random.choice on an empty arange raises for n>0
    (`medvedi/dataframe.py:545`)."""
    m = MDF({"id": np.array([], dtype=np.int64)}, spark=spark)
    with pytest.raises(ValueError):
        m.sample(n=2, replace=True)


def test_sample_numpy_weights_reference_errors(spark):
    """The numpy compat path surfaces np.random.choice's own errors:
    length mismatch, non-normalized weights; and n=0 returns empty."""
    m = MDF({"id": [1, 2, 3]}, spark=spark)
    with pytest.raises(ValueError):
        m.sample(n=1, weights=[0.5, 0.5])  # shorter than the frame
    with pytest.raises(ValueError):
        m.sample(n=1, weights=[1.0, 2.0, 3.0])  # does not sum to 1
    assert len(m.sample(frac=0.1, weights=[0.2, 0.3, 0.5])) == 0  # int(3*0.1)==0


def test_init_mapping_with_columns_raises_even_empty(spark):
    """ANY mapping combined with columns= raises — including {}
    (`medvedi/dataframe.py:348-350`); only data=None synthesizes an
    empty typed frame."""
    with pytest.raises(ValueError):
        MDF({}, columns=["a"], spark=spark)
    with pytest.raises(ValueError):
        MDF({"a": [1]}, columns=["a"], spark=spark)
    empty = MDF(None, columns=["a", "b"], spark=spark)
    assert tuple(empty.columns) == ("a", "b") and len(empty) == 0


def test_iloc_scalar_matches_positions(spark):
    m = MDF({"a": np.array([10, 20, 30, 40])}, spark=spark)
    assert m.iloc[0]["a"] == 10
    assert m.iloc[2]["a"] == 30
    assert m.iloc[-1]["a"] == 40
    with pytest.raises(IndexError):
        m.iloc[4]


def test_isin_reference_dtype_protocol(spark):
    """Reference tests/test_isin.py: bad column KeyError, un-coercible
    haystack ValueError, numpy unsafe-cast coercion (float 2.1 matches
    int 2), set/dict/keys haystacks accepted."""
    m = MDF({"a": [1, 2, 3]}, spark=spark)
    with pytest.raises(KeyError):
        m.isin("b", [1, 2])
    with pytest.raises(ValueError):
        m.isin("a", ["x", "y"])
    np.testing.assert_array_equal(m.isin("a", [2, 3, 4]), [False, True, True])
    np.testing.assert_array_equal(m.isin("a", [2.1, 3.2, 4.3]), [False, True, True])
    np.testing.assert_array_equal(m.isin("a", {2, 3, 4}), [False, True, True])
    np.testing.assert_array_equal(m.isin("a", {2: 1, 3: 1, 4: 1}), [False, True, True])
    np.testing.assert_array_equal(m.isin("a", frozenset({2, 3, 4})), [False, True, True])
    np.testing.assert_array_equal(m.isin("a", {2: 1, 3: 1}.keys()), [False, True, True])
    s = MDF({"a": np.array(["1", "2", "3"], dtype="S1")}, spark=spark)
    np.testing.assert_array_equal(s.isin("a", [b"2", b"3", b"4"]), [False, True, True])
    np.testing.assert_array_equal(s.isin("a", ["2", "3"]), [False, True, True])


def test_isin_mdf_haystack_dtype_mismatch_raises(spark):
    m = MDF({"a": [1, 2, 3]}, spark=spark)
    hay = MDF({"v": ["x", "y"]}, spark=spark)
    with pytest.raises(ValueError):
        m.isin("a", hay)


def test_iloc_garbage_raises(spark):
    m = MDF({"a": [1, 2]}, spark=spark)
    with pytest.raises(TypeError):
        m.iloc["test"]


def test_take_empty_is_empty(spark):
    m = MDF({"a": [0, 1]}, spark=spark)
    assert m.take(np.array([], dtype=np.int64)).empty


def test_unique_unordered(spark):
    m = MDF({"a": [3, 2, 2, 1]}, spark=spark)
    np.testing.assert_array_equal(m.unique("a"), [1, 2, 3])
    assert sorted(m.unique("a", unordered=True).tolist()) == [1, 2, 3]


def test_inplace_mutators_return_self(spark):
    """Reference convention: inplace mutators return the frame itself
    (`medvedi/dataframe.py` returns self 13 times), so calls chain."""
    m = MDF({"a": [2.0, np.nan, 1.0], "b": [1, 2, 3]}, index="b", spark=spark)
    assert m.fillna(5.0, "a", inplace=True) is m
    assert m.rename({"a": "x"}, inplace=True) is m
    assert "x" in m.columns
    assert m.take(np.array([0, 1]), inplace=True) is m
    assert m.set_index("x", inplace=True) is m
    assert m.reset_index(inplace=True) is m


def test_rename_errors_and_mapping_type(spark):
    m = MDF({"a": [0, 1, 2]}, spark=spark)
    with pytest.raises(KeyError):
        m.rename({"a": "b", "b": "c"}, errors="raise")
    out = m.rename({"a": "b", "b": "c"}, errors="ignore")
    assert out.columns == ("b",)
    with pytest.raises(TypeError):
        m.rename([("a", "b")])


def test_rename_renames_index_levels(spark):
    m = MDF({"a": [0, 1, 2]}, index="a", spark=spark)
    out = m.rename({"a": "b"})
    assert out.columns == ("b",)
    assert out.index.names == ("b",)
    np.testing.assert_array_equal(out["b"], [0, 1, 2])


def test_fillna_object_column_accepts_numeric_fill(spark):
    m = MDF({"b": np.array([None, "test", None], dtype=object)}, spark=spark)
    out = m.fillna(5)
    assert out["b"][0] == "5"  # StringType column: fill renders as string
    assert out["b"][1] == "test"


def test_astype_scalar_copy_false_and_dtype_accessor(spark):
    m = MDF({"a": [1, 2], "b": [3, 4]}, spark=spark)
    ret = m.astype(float, copy=False)
    assert ret is m
    assert m.dtype == {"a": np.dtype(np.float64), "b": np.dtype(np.float64)}


def test_astype_errors_ignore_keeps_failed_column(spark):
    m = MDF({"a": np.array(["a", "b"]), "b": [3, 4]}, spark=spark)
    with pytest.raises(ValueError):
        m.astype({"a": int}, copy=False)
    m.astype({"a": int, "b": float}, copy=False, errors="ignore")
    assert m.dtype["a"] == np.dtype(object)  # unchanged string column
    assert m.dtype["b"] == np.dtype(np.float64)
    np.testing.assert_array_equal(m["a"], ["a", "b"])


def test_index_protocol_edges(spark):
    """Reference tests/test_index.py: repr format, multi-level .name
    raises ValueError, diff type check, unknown set_index name KeyError."""
    m = MDF({"a": [0, 1, 2]}, spark=spark).set_index("a")
    assert str(m.index) == "(a), unique"
    assert m.index.__sentry_repr__() == str(m.index)
    dup = MDF({"a": [1, 1, 2]}, index="a", spark=spark)
    assert str(dup.index) == "(a), not unique"
    two = MDF({"a": [1], "b": [2]}, index=("a", "b"), spark=spark)
    with pytest.raises(ValueError):
        two.index.name
    with pytest.raises(TypeError):
        m.index.diff(m)  # frame, not Index
    with pytest.raises(KeyError):
        m.set_index("zzz")
    with pytest.raises(KeyError):
        m.set_index([5, 6, 7])  # list elements are NAMES, not values
    out = m.set_index(np.array([5, 6, 7]))  # ndarray IS a value level
    np.testing.assert_array_equal(out.index.get_level_values(0), [5, 6, 7])


def test_sample_n_and_frac_raises(spark):
    m = MDF({"a": [0, 1, 2, 3]}, spark=spark)
    with pytest.raises(ValueError):
        m.sample(n=1, frac=0.5)
    with pytest.raises(ValueError):
        m.sample()


def test_isnull_bad_column_raises(spark):
    m = MDF({"a": [1, 2, 3]}, spark=spark)
    with pytest.raises(KeyError):
        m.isnull("b")
    with pytest.raises(KeyError):
        m.notnull("b")


def test_init_scalar_column_raises_typeerror(spark):
    with pytest.raises(TypeError):
        MDF({"a": "xxx"}, spark=spark)


def test_init_check_false_pads_ragged(spark):
    with pytest.raises(ValueError):
        MDF({"a": [1, 2, 3], "b": ["1", "2"]}, spark=spark)
    m = MDF({"a": [1, 2, 3], "b": ["1", "2"]}, check=False, spark=spark)
    assert len(m) == 3


def test_init_index_object_becomes_value_level(spark):
    a = MDF({"a": [1, 2, 3], "b": ["1", "2", "3"]}, index="b", spark=spark)
    m = MDF({"a": [1, 2, 3], "c": ["1", "2", "3"]}, index=a.index, spark=spark)
    assert "b" not in m
    assert m.index.names == ("_index0",)
    np.testing.assert_array_equal(m.index.get_level_values(0), ["1", "2", "3"])


def test_init_dtype_mapping(spark):
    m = MDF({"a": [1, 2, 3], "b": ["1", "2", "3"]}, dtype={"b": "S1"}, spark=spark)
    assert m.dtype["b"] == np.dtype("S")
    assert m["b"][0] == b"1"


def test_arrow_roundtrip_full_dtype_matrix(spark):
    """Reference tests/test_arrow.py: every SURVEY §1.2 dtype survives
    the to_arrow/from_arrow round trip; non-tables raise TypeError."""
    m = MDF(
        {
            "a": [1, 2, 3],
            "b": [1.5, 2.3, 3.1],
            "c": np.array(["a", "b", "c"], dtype="S1"),
            "d": np.array(["a", "b", "c"], dtype="U1"),
            "e": np.array([10000000, 20000000, 30000000], dtype="datetime64[s]"),
            "f": np.array([1, 2, -3], dtype="timedelta64[s]"),
            "g": [False, True, False],
        },
        spark=spark,
    )
    back = MDF.from_arrow(m.to_arrow(), spark=spark)
    np.testing.assert_array_equal(back["a"], [1, 2, 3])
    np.testing.assert_array_equal(back["b"], [1.5, 2.3, 3.1])
    np.testing.assert_array_equal(back["c"], [b"a", b"b", b"c"])
    np.testing.assert_array_equal(back["d"], ["a", "b", "c"])
    np.testing.assert_array_equal(
        back["e"], np.array([10000000, 20000000, 30000000], dtype="datetime64[s]")
    )
    np.testing.assert_array_equal(
        back["f"], np.array([1, 2, -3], dtype="timedelta64[s]")
    )
    np.testing.assert_array_equal(back["g"], [False, True, False])
    with pytest.raises(TypeError):
        MDF.from_arrow(777, spark=spark)


def test_shape_and_index_levels(spark):
    m = MDF({"k": [1, 2], "v": [10, 20], "w": [5, 6]}, index="k", spark=spark)
    assert m.shape == (2, 3)
    lv = m.index.levels
    assert len(lv) == 1
    np.testing.assert_array_equal(lv[0], [1, 2])


def test_serialize_deserialize_unsafe_roundtrip(spark):
    """S4/S5 functional replacement: Arrow IPC bytes, index preserved."""
    m = MDF(
        {"k": [3, 1, 2], "v": [1.5, np.nan, 2.5], "s": ["a", "b", "c"]},
        index="k",
        spark=spark,
    )
    blob = m.serialize_unsafe()
    assert isinstance(blob, bytes) and len(blob) > 0
    back = MDF.deserialize_unsafe(blob, spark=spark)
    assert back.index.names == ("k",)
    np.testing.assert_array_equal(back["k"], [3, 1, 2])  # row order preserved
    np.testing.assert_array_equal(back["s"], ["a", "b", "c"])
    np.testing.assert_array_equal(back.isnull("v"), [False, True, False])


def test_len_memoized_per_plan(spark, monkeypatch):
    m = MDF({"a": [1, 2, 3]}, spark=spark)
    cls = type(m.df)
    calls = []
    orig = cls.count
    monkeypatch.setattr(cls, "count", lambda self: (calls.append(1), orig(self))[1])
    assert len(m) == 3
    assert len(m) == 3
    assert len(calls) == 1, "second len() must hit the cache"
    m.take(np.array([0, 1]), inplace=True)  # rebinds the plan
    assert len(m) == 2
    assert len(calls) >= 2


def test_unpivot_matches_pandas_melt(spark):
    import pandas as pd

    data = {"k": [1, 2], "a": [10, 20], "b": [30, 40]}
    df = MDF(data, spark=spark)
    out = df.unpivot(["k"], ["a", "b"], var_name="var", value_name="val")
    exp = (
        pd.DataFrame(data)
        .melt(id_vars=["k"], value_vars=["a", "b"], var_name="var", value_name="val")
        .sort_values(["k", "var"])  # row-major source order then values order
        .reset_index(drop=True)
    )
    got = out.to_pandas().reset_index(drop=True)
    # engine order: source-row-major then values order = k asc, var asc here
    assert got["k"].tolist() == [1, 1, 2, 2]
    assert got["var"].tolist() == ["a", "b", "a", "b"]
    assert sorted(map(tuple, got[["k", "var", "val"]].values.tolist())) == sorted(
        map(tuple, exp[["k", "var", "val"]].values.tolist())
    )


def test_pivot_table_sum_and_count(spark):
    df = MDF(
        {"k": [1, 1, 2, 2, 2], "c": ["x", "y", "x", "x", "y"], "v": [1, 2, 3, 4, 5]},
        spark=spark,
    )
    out = df.pivot_table("k", "c", "v", aggfunc="sum").to_pandas()
    assert out["k"].tolist() == [1, 2]
    assert out["x"].tolist() == [1, 7] and out["y"].tolist() == [2, 5]
    cnt = df.pivot_table("k", "c", "v", aggfunc="count", pivot_values=["x", "y"]).to_pandas()
    assert cnt["x"].tolist() == [1, 2] and cnt["y"].tolist() == [1, 1]


def test_sql_over_mdfs(spark):
    from medvedi_spark.frame import sql

    left = MDF({"k": [1, 2, 3], "v": [10, 20, 30]}, spark=spark)
    right = MDF({"k": [2, 3, 4], "w": ["b", "c", "d"]}, spark=spark)
    out = sql(
        "SELECT l.k, l.v, r.w FROM l JOIN r ON l.k = r.k ORDER BY l.k",
        {"l": left, "r": right},
    ).to_pandas()
    assert out["k"].tolist() == [2, 3]
    assert out["w"].tolist() == ["b", "c"]


def test_persist_roundtrip(spark):
    df = MDF({"a": [1, 2]}, spark=spark).cache()
    assert df["a"].tolist() == [1, 2]
    df.unpersist()


def test_fillna_dict_mapping(spark):
    import math

    df = MDF({"a": [1.0, float("nan")], "s": ["x", None]}, spark=spark)
    out = df.fillna({"a": 0.5, "s": "gone"})
    assert out["a"].tolist() == [1.0, 0.5]
    assert out["s"].tolist() == ["x", "gone"]
    # original untouched (copy semantics)
    assert math.isnan(df["a"][1])
    # a dict that is NOT a column mapping stays a scalar JSON payload
    obj = MDF({"o": [{"k": 1}, None]}, spark=spark)
    filled = obj.fillna({"weird": "payload"})
    import json

    assert json.loads(filled["o"][1]) == {"weird": "payload"}
