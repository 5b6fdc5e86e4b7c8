"""MDF relational semantics: join/concat/groupby/sort/dedup/explode.

Models the reference's richest spec files (test_join.py's 28 cases,
test_concat, test_groupby, test_duplicates, test_sort_values,
test_explode — SURVEY §5) without copying them.
"""

from __future__ import annotations

import numpy as np
import pytest

from medvedi_spark.frame import MDF, concat, join


@pytest.fixture
def left(spark):
    return MDF({"k": [2, 0, 1, 0], "v": [20, 0, 10, 1]}, index="k", spark=spark)


@pytest.fixture
def right(spark):
    return MDF({"k": [1, 2, 7], "w": [100, 200, 700]}, index="k", spark=spark)


# -- joins (J1 semantics) ----------------------------------------------------


def test_left_join_sorted_by_key_and_fills_zero(left, right):
    out = left.join(right, how="left")
    # output sorted by merged key (reference: np.unique ordering)
    np.testing.assert_array_equal(out["k"], [0, 0, 1, 2])
    # missing matches fill with int default 0, not NULL (δ-1)
    np.testing.assert_array_equal(out["w"], [0, 0, 100, 200])
    np.testing.assert_array_equal(out["v"], [0, 1, 10, 20])


def test_inner_join(left, right):
    out = left.join(right, how="inner")
    np.testing.assert_array_equal(out["k"], [1, 2])
    np.testing.assert_array_equal(out["w"], [100, 200])


def test_outer_join(left, right):
    out = left.join(right, how="outer")
    np.testing.assert_array_equal(out["k"], [0, 0, 1, 2, 7])
    np.testing.assert_array_equal(out["v"], [0, 1, 10, 20, 0])
    np.testing.assert_array_equal(out["w"], [0, 0, 100, 200, 700])


def test_right_join_is_reversed_left(spark, right):
    # right = reversed left, so the (now non-first) left frame must have
    # unique keys — the reference's m:n guard applies after reversal.
    uleft = MDF({"k": [2, 0, 1], "v": [20, 0, 10]}, index="k", spark=spark)
    out = uleft.join(right, how="right")
    np.testing.assert_array_equal(out["k"], [1, 2, 7])
    np.testing.assert_array_equal(out["w"], [100, 200, 700])
    np.testing.assert_array_equal(out["v"], [10, 20, 0])


def test_right_join_with_dup_left_raises(left, right):
    with pytest.raises(NotImplementedError):
        left.join(right, how="right")


def test_join_keys_match_by_position_not_name(spark):
    a = MDF({"a": [1, 2], "x": [10, 20]}, index="a", spark=spark)
    b = MDF({"A": [2, 1], "y": [200, 100]}, index="A", spark=spark)
    out = a.join(b, how="inner")
    np.testing.assert_array_equal(out["a"], [1, 2])
    np.testing.assert_array_equal(out["y"], [100, 200])


def test_join_duplicate_keys_in_left_replicate_right(spark, right):
    dup_left = MDF({"k": [1, 1, 2], "v": [10, 11, 20]}, index="k", spark=spark)
    out = dup_left.join(right, how="left")
    np.testing.assert_array_equal(out["k"], [1, 1, 2])
    np.testing.assert_array_equal(out["w"], [100, 100, 200])


def test_join_duplicate_keys_in_right_raise(spark, left):
    dup_right = MDF({"k": [1, 1], "w": [5, 6]}, index="k", spark=spark)
    with pytest.raises(NotImplementedError):
        left.join(dup_right)


def test_join_collision_last_wins(spark):
    a = MDF({"k": [1, 2], "v": [10, 20]}, index="k", spark=spark)
    b = MDF({"k": [1, 2], "v": [77, 88]}, index="k", spark=spark)
    out = a.join(b, how="inner")
    np.testing.assert_array_equal(out["v"], [77, 88])


def test_join_collision_suffixes(spark):
    a = MDF({"k": [1, 2], "v": [10, 20]}, index="k", spark=spark)
    b = MDF({"k": [1, 2], "v": [77, 88]}, index="k", spark=spark)
    out = a.join(b, how="inner", suffixes=("_1", "_2"))
    np.testing.assert_array_equal(out["v_1"], [10, 20])
    np.testing.assert_array_equal(out["v_2"], [77, 88])


def test_join_multilevel_index(spark):
    a = MDF({"k1": [1, 1, 2], "k2": ["x", "y", "x"], "v": [1, 2, 3]}, index=("k1", "k2"), spark=spark)
    b = MDF({"k1": [1, 2], "k2": ["y", "x"], "w": [20, 30]}, index=("k1", "k2"), spark=spark)
    out = a.join(b, how="inner")
    np.testing.assert_array_equal(out["v"], [2, 3])
    np.testing.assert_array_equal(out["w"], [20, 30])


def test_nary_join_three_frames(spark):
    a = MDF({"k": [1, 2, 3], "x": [1, 2, 3]}, index="k", spark=spark)
    b = MDF({"k": [1, 2], "y": [10, 20]}, index="k", spark=spark)
    c = MDF({"k": [2, 3], "z": [200, 300]}, index="k", spark=spark)
    out = join(a, b, c, how="left")
    np.testing.assert_array_equal(out["k"], [1, 2, 3])
    np.testing.assert_array_equal(out["y"], [10, 20, 0])
    np.testing.assert_array_equal(out["z"], [0, 200, 300])


def test_join_no_fill_mode_keeps_nulls(left, right):
    out = left.join(right, how="left", fill_defaults=False)
    w = out["w"]
    assert sum(1 for v in w if v is None or (isinstance(v, float) and np.isnan(v))) == 2


def test_join_string_fill_empty(spark):
    a = MDF({"k": [1, 2], "v": [1, 2]}, index="k", spark=spark)
    b = MDF({"k": [1], "s": ["hi"]}, index="k", spark=spark)
    out = a.join(b, how="left")
    np.testing.assert_array_equal(out["s"], ["hi", ""])


# -- concat (U1) ---------------------------------------------------------------


def test_concat_strict_appends_in_order(spark):
    a = MDF({"x": [1, 2]}, spark=spark)
    b = MDF({"x": [3, 4]}, spark=spark)
    out = concat(a, b)
    np.testing.assert_array_equal(out["x"], [1, 2, 3, 4])


def test_concat_strict_rejects_column_mismatch(spark):
    a = MDF({"x": [1]}, spark=spark)
    b = MDF({"y": [2]}, spark=spark)
    with pytest.raises(ValueError):
        concat(a, b)


def test_concat_nonstrict_fills_defaults(spark):
    a = MDF({"x": [1, 2], "s": ["p", "q"]}, spark=spark)
    b = MDF({"x": [3]}, spark=spark)
    out = concat(a, b, strict=False)
    np.testing.assert_array_equal(out["x"], [1, 2, 3])
    np.testing.assert_array_equal(out["s"], ["p", "q", ""])


# -- groupby (G1-G4) --------------------------------------------------------------


def test_groupby_agg_sorted_by_key(spark):
    m = MDF({"a": [2, 1, 2, 1, 3], "b": [1, 2, 3, 4, 5]}, spark=spark)
    out = m.groupby("a").agg({"b": "sum"})
    np.testing.assert_array_equal(out["a"], [1, 2, 3])
    np.testing.assert_array_equal(out["b_sum"], [6, 4, 5])


def test_groupby_named_aggs(spark):
    m = MDF({"a": [1, 1, 2], "b": [5, 7, 9]}, spark=spark)
    out = m.groupby("a").agg(total=("b", "sum"), lo=("b", "min"), n=("b", "count"))
    np.testing.assert_array_equal(out["total"], [12, 9])
    np.testing.assert_array_equal(out["lo"], [5, 9])
    np.testing.assert_array_equal(out["n"], [2, 1])


def test_groupby_iter_groups(spark):
    """Reference contract: iteration yields per-group ROW-INDEX arrays in
    sorted-key order (`medvedi/dataframe.py:236-261`), addressing the
    materialized columns positionally."""
    m = MDF({"a": [1, 2, 1], "b": [10, 20, 30]}, spark=spark)
    a, b = m["a"], m["b"]
    groups = list(m.groupby("a"))
    assert [a[g[0]] for g in groups] == [1, 2]
    assert [sorted(b[g]) for g in groups] == [[10, 30], [20]]
    # pandas-style sub-frames stay available under iter_frames()
    got = {k: sorted(sub["b"]) for k, sub in m.groupby("a").iter_frames()}
    assert got == {1: [10, 30], 2: [20]}


def test_groupby_apply_grouped_map(spark):
    m = MDF({"a": [1, 1, 2], "b": [1.0, 3.0, 5.0]}, spark=spark)

    def center(pdf):
        pdf = pdf.copy()
        pdf["b"] = pdf["b"] - pdf["b"].mean()
        return pdf[["a", "b"]]

    out = m.groupby("a").apply(center, schema="a bigint, b double")
    assert sorted(out["b"]) == [-1.0, 0.0, 1.0]


def test_groupby_unknown_key_raises(spark):
    m = MDF({"a": [1]}, spark=spark)
    with pytest.raises(KeyError):
        m.groupby("zz")


# -- sorts (O1/O2) -------------------------------------------------------------------


def test_sort_values_stable(spark):
    m = MDF({"k": [1, 1, 0, 1], "tag": ["a", "b", "c", "d"]}, spark=spark)
    out = m.sort_values("k")
    np.testing.assert_array_equal(out["tag"], ["c", "a", "b", "d"])


def test_sort_values_descending_reverses_ties(spark):
    m = MDF({"k": [1, 1, 0], "tag": ["a", "b", "c"]}, spark=spark)
    out = m.sort_values("k", ascending=False)
    np.testing.assert_array_equal(out["tag"], ["b", "a", "c"])


def test_sort_values_nan_position(spark):
    m = MDF({"x": [2.0, np.nan, 1.0]}, spark=spark)
    last = m.sort_values("x", na_position="last")["x"]
    assert np.isnan(last[-1]) and list(last[:2]) == [1.0, 2.0]
    first = m.sort_values("x", na_position="first")["x"]
    assert np.isnan(first[0]) and list(first[1:]) == [1.0, 2.0]


def test_sort_multi_column(spark):
    m = MDF({"a": [1, 1, 0], "b": [2, 1, 9]}, spark=spark)
    out = m.sort_values(["a", "b"])
    np.testing.assert_array_equal(out["b"], [9, 1, 2])


def test_sort_index(spark):
    m = MDF({"k": [3, 1, 2], "v": [30, 10, 20]}, index="k", spark=spark)
    out = m.sort_index()
    np.testing.assert_array_equal(out["v"], [10, 20, 30])


# -- dedup (G6/G7) -----------------------------------------------------------------------


def test_drop_duplicates_keep_first(spark):
    m = MDF({"a": [1, 2, 1, 2], "tag": ["p", "q", "r", "s"]}, spark=spark)
    out = m.drop_duplicates(subset=["a"]).sort_values("tag")
    np.testing.assert_array_equal(out["tag"], ["p", "q"])


def test_drop_duplicates_keep_last(spark):
    m = MDF({"a": [1, 2, 1, 2], "tag": ["p", "q", "r", "s"]}, spark=spark)
    out = m.drop_duplicates(subset=["a"], keep="last").sort_values("tag")
    np.testing.assert_array_equal(out["tag"], ["r", "s"])


def test_drop_duplicates_keep_false(spark):
    m = MDF({"a": [1, 2, 1], "tag": ["p", "q", "r"]}, spark=spark)
    out = m.drop_duplicates(subset=["a"], keep=False)
    np.testing.assert_array_equal(out["tag"], ["q"])


def test_duplicated_mask(spark):
    m = MDF({"a": [1, 2, 1, 1]}, spark=spark)
    np.testing.assert_array_equal(m.duplicated(subset=["a"]), [False, False, True, True])
    np.testing.assert_array_equal(m.duplicated(subset=["a"], keep="last"), [True, False, True, False])


# -- explode (U3) -----------------------------------------------------------------------------


def test_explode_replicates_siblings(spark):
    m = MDF({"k": np.array([1, 2], dtype=np.int64), "vals": np.array([[10, 11], [20]], dtype=object)}, spark=spark)
    out = m.explode("vals")
    np.testing.assert_array_equal(out["k"], [1, 1, 2])
    np.testing.assert_array_equal(out["vals"], [10, 11, 20])


def test_explode_empty_list_drops_row(spark):
    m = MDF({"k": np.array([1, 2], dtype=np.int64), "vals": np.array([[], [5]], dtype=object)}, spark=spark)
    out = m.explode("vals")
    np.testing.assert_array_equal(out["k"], [2])


def test_explode_non_list_column_noop(spark):
    m = MDF({"k": [1, 2], "v": [5, 6]}, spark=spark)
    out = m.explode("v")
    np.testing.assert_array_equal(out["v"], [5, 6])


# -- index (X1/X2, J2) ----------------------------------------------------------------------------


def test_set_reset_index(spark):
    m = MDF({"k": [1, 2], "v": [5, 6]}, spark=spark)
    m2 = m.set_index("k")
    assert m2.index.names == ("k",)
    m3 = m2.reset_index()
    assert m3.index.names == ()


def test_set_index_from_array(spark):
    m = MDF({"v": [5, 6]}, spark=spark)
    m2 = m.set_index(np.array([10, 20]))
    assert m2.index.names == ("_index0",)
    np.testing.assert_array_equal(m2["_index0"], [10, 20])


def test_index_is_unique(spark):
    assert MDF({"k": [1, 2], "v": [0, 0]}, index="k", spark=spark).index.is_unique
    assert not MDF({"k": [1, 1], "v": [0, 0]}, index="k", spark=spark).index.is_unique


def test_index_diff_positions(spark):
    a = MDF({"k": [5, 6, 7], "v": [0, 0, 0]}, index="k", spark=spark)
    b = MDF({"k": [6], "w": [0]}, index="k", spark=spark)
    np.testing.assert_array_equal(a.index.diff(b.index), [0, 2])


def test_index_monotonic(spark):
    inc = MDF({"k": [1, 2, 2, 3], "v": [0] * 4}, index="k", spark=spark)
    assert inc.index.is_monotonic_increasing
    assert not inc.index.is_monotonic_decreasing
    dec = MDF({"k": [3, 2, 1], "v": [0] * 3}, index="k", spark=spark)
    assert dec.index.is_monotonic_decreasing


def test_join_unique_guard_is_single_action(spark, monkeypatch):
    """The m:n guard must issue ONE action (early-exit isEmpty) per
    checked frame — it used to run two full counts, and at scale the
    guard would out-cost the join. AQE may split one action into several
    jobs, so count ACTIONS, not jobs."""
    import medvedi_spark.frame as fr

    a = fr.MDF({"k": [1, 2, 3], "x": [10, 20, 30]}, index="k", spark=spark)
    b = fr.MDF({"k": [1, 2, 3], "y": [4, 5, 6]}, index="k", spark=spark)

    # Patch the CONCRETE class (pyspark.sql.classic overrides the base).
    cls = type(a.df)
    actions: list[str] = []
    orig_count, orig_isempty = cls.count, cls.isEmpty
    monkeypatch.setattr(cls, "count", lambda self: (actions.append("count"), orig_count(self))[1])
    monkeypatch.setattr(cls, "isEmpty", lambda self: (actions.append("isEmpty"), orig_isempty(self))[1])
    fr.join(a, b, how="inner", check_unique=True)
    assert actions == ["isEmpty"], f"guard actions: {actions}"


# -- join protocol edges (reference tests/test_join.py:10-50,208-290) --------


def test_join_zero_and_one_frame(spark):
    m = MDF({"a": [1, 2]}, index="a", spark=spark)
    assert join().empty
    assert join(m) is m
    cp = join(m, copy=True)
    assert cp is not m
    np.testing.assert_array_equal(cp["a"], m["a"])


def test_join_rejects_non_frames_and_bad_suffixes(spark):
    m = MDF({"a": [1]}, index="a", spark=spark)
    with pytest.raises(TypeError):
        join(m, "b")
    with pytest.raises(TypeError):
        join(m, m, suffixes="ab")
    with pytest.raises(ValueError):
        join(m, m, suffixes=("_x",))  # one entry per frame
    with pytest.raises(ValueError):
        join(m, m, how="xxx")


def test_join_incompatible_index_dtypes_raise_eagerly(spark):
    a = MDF({"k": [1, 2], "v": [1, 2]}, index="k", spark=spark)
    b = MDF({"k": np.array([b"1", b"2"], dtype="S"), "w": [3, 4]}, index="k", spark=spark)
    with pytest.raises(ValueError, match="incompatible index dtypes"):
        join(a, b)


def test_join_empty_left_is_empty(spark):
    for how in ("left", "inner"):
        a = MDF({"k": np.array([], dtype=np.int64)}, index="k", spark=spark)
        b = MDF({"k": [0, 1, 2], "v": [4, 5, 6]}, index="k", spark=spark)
        assert join(a, b, how=how).empty


def test_join_outer_left_empty_keeps_right(spark):
    a = MDF({"k": np.array([], dtype=np.int64)}, index="k", spark=spark)
    b = MDF({"k": [0, 1], "v": [4, 5]}, index="k", spark=spark)
    out = join(a, b, how="outer")
    np.testing.assert_array_equal(out["k"], [0, 1])
    np.testing.assert_array_equal(out["v"], [4, 5])


def test_join_inner_dupes_in_first_frame(spark):
    # dup keys legal in frame #1 only; inner keeps both matched copies
    a = MDF({"a": [2, 1, 1], "c": [0, 1, 2]}, index="a", spark=spark)
    b = MDF({"A": [1, 0], "b": ["x", "y"]}, index="A", spark=spark)
    out = join(a, b, how="inner")
    np.testing.assert_array_equal(out["a"], [1, 1])
    np.testing.assert_array_equal(out["b"], ["x", "x"])
    np.testing.assert_array_equal(sorted(out["c"]), [1, 2])


def test_join_string_object_index(spark):
    a = MDF({"i": [0, 1, 2], "a": np.array(["0", "1", "2"], dtype=object)}, index=("i", "a"), spark=spark)
    b = MDF({"i": [2, 1, 0], "a": np.array(["2", "1", "0"], dtype=object), "z": [20, 10, 0]}, index=("i", "a"), spark=spark)
    out = join(a, b)
    assert out.index.names == ("i", "a")
    np.testing.assert_array_equal(out["i"], [0, 1, 2])
    np.testing.assert_array_equal(out["z"], [0, 10, 20])


# -- concat protocol edges (reference tests/test_concat.py) ------------------


def test_concat_zero_one_copy(spark):
    m = MDF({"a": [1, 2, 3]}, spark=spark)
    assert concat().empty
    assert concat(m) is m
    assert concat(m, copy=True) is not m
    with pytest.raises(TypeError):
        concat(m, "b")


def test_concat_index_mismatch_rules(spark):
    a = MDF({"a": [3, 4, 5]}, spark=spark)
    b = MDF({"a": [0, 1, 2]}, index="a", spark=spark)
    with pytest.raises(ValueError):
        concat(a, b)
    out = concat(a, b, ignore_index=True)
    np.testing.assert_array_equal(out["a"], [3, 4, 5, 0, 1, 2])
    assert out.index.names == ()


def test_concat_keeps_index_names(spark):
    a = MDF({"a": [1, 2, 3]}, index="a", spark=spark)
    out = concat(a, a.take(np.array([1, 2])))
    assert len(out) == 5
    np.testing.assert_array_equal(out["a"], [1, 2, 3, 2, 3])
    assert out.index.names == ("a",)


def test_concat_empty_frame_adopts_dtype(spark):
    """An empty object column must not stringify a populated int column
    (`tests/test_concat.py:84-90` in the reference)."""
    a = MDF({"a": [1, 2, 3]}, spark=spark)
    b = MDF({"a": np.array([], dtype=object)}, spark=spark)
    out = concat(a, b)
    assert len(out) == 3
    arr = out["a"]
    np.testing.assert_array_equal(arr, [1, 2, 3])
    assert arr.dtype.kind == "i"


def test_concat_is_lazy_no_actions(spark, monkeypatch):
    """Concat must not run per-frame driver actions (counts/renumbers) —
    order is re-established in one lazy distributed renumber."""
    a = MDF({"a": [1, 2]}, spark=spark)
    b = MDF({"a": [3, 4]}, spark=spark)
    cls = type(a.df)
    actions = []
    for name in ("count", "collect", "isEmpty", "toPandas"):
        orig = getattr(cls, name)
        def wrap(self, *args, _n=name, _o=orig, **kw):
            actions.append(_n)
            return _o(self, *args, **kw)
        monkeypatch.setattr(cls, name, wrap)
    concat(a, b)
    assert actions == [], f"concat ran driver actions: {actions}"


def test_class_call_static_style(spark):
    """Reference `pure_static.py`: users call DataFrame.join(a, b) /
    DataFrame.concat(a, b) class-style; the bound forms accept the same
    arguments including the single-frame copy= case."""
    a = MDF({"k": [1, 2], "x": [1, 2]}, index="k", spark=spark)
    b = MDF({"k": [1, 2], "y": [3, 4]}, index="k", spark=spark)
    out = MDF.join(a, b, how="inner")
    np.testing.assert_array_equal(out["y"], [3, 4])
    assert MDF.join(a) is a
    assert MDF.join(a, copy=True) is not a
    cat = MDF.concat(a, b.rename({"y": "x"}), ignore_index=True, strict=False)
    assert len(cat) == 4
    assert MDF.concat(a) is a
    assert MDF.concat(a, copy=True) is not a


def test_join_last_wins_preserves_unmatched_rows(spark):
    """Reference scatter semantics (`medvedi/dataframe.py:1245-1275`): a
    later frame's colliding column overwrites ONLY at rows it matched;
    unmatched rows keep the earlier frame's value (found via the c9
    oracle gate — the old implementation dropped the earlier copy and
    default-filled unmatched rows)."""
    left = MDF({"k": [1, 2, 3], "tag": ["a", "b", "c"]}, index=("k",), spark=spark)
    right = MDF({"k": [2], "tag": ["Z"]}, index=("k",), spark=spark)
    out = left.join(right)
    assert dict(zip(out["k"], out["tag"])) == {1: "a", 2: "Z", 3: "c"}
    # three-way: latest matched frame wins per row
    mid = MDF({"k": [1, 2], "tag": ["M1", "M2"]}, index=("k",), spark=spark)
    out3 = left.join(mid, right)
    assert dict(zip(out3["k"], out3["tag"])) == {1: "M1", 2: "Z", 3: "c"}
