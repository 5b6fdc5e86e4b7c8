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
