"""Property-based differential testing: MDF vs pandas on random frames.

SURVEY §5 notes the reference has NO property-based or differential
testing — this goes beyond it: hypothesis generates small frames and the
MDF result must match the equivalent pandas computation row-for-row.
Generators stay small (Spark job per example); examples are capped so
the suite stays fast.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from medvedi_spark.frame import MDF, concat

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

keys = st.lists(st.integers(min_value=0, max_value=3), min_size=1, max_size=8)
vals = st.lists(st.integers(min_value=-5, max_value=5), min_size=1, max_size=8)


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_sort_values_matches_pandas(spark, k, v):
    n = min(len(k), len(v))
    k, v = k[:n], v[:n]
    mdf = MDF({"k": k, "v": v}, spark=spark).sort_values(["k", "v"])
    pdf = pd.DataFrame({"k": k, "v": v}).sort_values(["k", "v"], kind="mergesort")
    np.testing.assert_array_equal(mdf["k"], pdf["k"].to_numpy())
    np.testing.assert_array_equal(mdf["v"], pdf["v"].to_numpy())


@given(k=keys)
@settings(**SETTINGS)
def test_drop_duplicates_keep_first_matches_pandas(spark, k):
    mdf = MDF({"k": k}, spark=spark).drop_duplicates(["k"], keep="first")
    pdf = pd.DataFrame({"k": k}).drop_duplicates(["k"], keep="first")
    np.testing.assert_array_equal(mdf["k"], pdf["k"].to_numpy())


@given(k=keys)
@settings(**SETTINGS)
def test_duplicated_mask_matches_pandas(spark, k):
    mdf = MDF({"k": k}, spark=spark)
    np.testing.assert_array_equal(
        mdf.duplicated(["k"], keep="first"),
        pd.DataFrame({"k": k}).duplicated(["k"], keep="first").to_numpy(),
    )


@given(a=vals, b=vals)
@settings(**SETTINGS)
def test_concat_matches_pandas(spark, a, b):
    mdf = concat(MDF({"x": a}, spark=spark), MDF({"x": b}, spark=spark), ignore_index=True)
    np.testing.assert_array_equal(mdf["x"], np.concatenate([a, b]))


@given(k=keys, v=vals)
@settings(**SETTINGS)
def test_groupby_sum_matches_pandas(spark, k, v):
    n = min(len(k), len(v))
    k, v = k[:n], v[:n]
    out = MDF({"k": k, "v": v}, spark=spark).groupby("k").agg(total=("v", "sum")).to_pandas()
    exp = pd.DataFrame({"k": k, "v": v}).groupby("k", sort=True)["v"].sum()
    np.testing.assert_array_equal(out["total"].to_numpy(), exp.to_numpy())
    np.testing.assert_array_equal(out["k"].to_numpy(), exp.index.to_numpy())


@given(col=vals, hay=st.lists(st.integers(min_value=-5, max_value=5), min_size=0, max_size=6))
@settings(**SETTINGS)
def test_isin_literal_and_join_paths_agree(spark, col, hay, monkeypatch):
    """The IN-list path and the marker-join path are the same function:
    force the join path by dropping the literal cap to 0 and compare
    against both pandas and the literal path."""
    mdf = MDF({"k": col}, spark=spark)
    expected = pd.Series(col).isin(hay).to_numpy()
    lit = mdf.isin("k", hay)
    monkeypatch.setattr(MDF, "_ISIN_LITERAL_MAX", 0)
    joined = mdf.isin("k", hay)
    np.testing.assert_array_equal(lit, expected)
    np.testing.assert_array_equal(joined, expected)
    np.testing.assert_array_equal(
        mdf.isin("k", hay, invert=True), ~expected
    )


@given(k=keys, start=st.integers(min_value=-10, max_value=10), stop=st.integers(min_value=-10, max_value=10))
@settings(**SETTINGS)
def test_iloc_slice_matches_numpy(spark, k, start, stop):
    """The OFFSET/LIMIT fast path agrees with numpy slicing for every
    (start, stop) combination including negatives and empty results."""
    mdf = MDF({"k": k}, spark=spark)
    out = mdf.iloc[start:stop]
    np.testing.assert_array_equal(out["k"], np.asarray(k)[start:stop])


sizes = st.lists(st.integers(min_value=1, max_value=40), min_size=1, max_size=12)


@given(n=sizes, cap=st.integers(min_value=8, max_value=64))
@settings(**SETTINGS)
def test_pack_sequences_matches_reference_next_fit(spark, n, cap):
    """Distributed next-fit (applyInPandas) vs the sequential definition."""
    from medvedi_spark.operators.llm import pack_sequences

    df = spark.createDataFrame(
        [("g", i, int(s)) for i, s in enumerate(n)], "grp string, doc_id bigint, n bigint"
    )
    out = pack_sequences(df, "doc_id", "n", cap, group_cols=("grp",))
    got = {r.doc_id: (r.bin, r.fill) for r in out.collect()}
    b, fill = 0, 0
    for i, s in enumerate(n):
        if i > 0 and fill + s <= cap:
            fill += s
        else:
            b += 1 if i > 0 else 0
            fill = s
        assert got[i] == (b, fill), (i, n, cap, got)
