"""Reference API-surface parity: metadata module, accelerator helpers,
column mutation edge cases, and frame iteration.

Mirrors `/root/reference/medvedi/tests/test_metadata.py`,
`test_accelerators.py`, `test_columns.py`, `test_iter.py`,
`test_unique.py` behaviors against the Spark-backed MDF and the
driver-side compat helpers.
"""

from __future__ import annotations

import numpy as np
import pytest
from numpy.testing import assert_array_equal

from medvedi_spark import MDF, metadata
from medvedi_spark.accelerators import (
    array_of_objects,
    in1d_str,
    is_not_null,
    is_null,
    unordered_unique,
)
from medvedi_spark.testing import assert_frame_equal


def test_metadata_smoke():
    assert metadata.__package__ == "medvedi_spark"
    assert isinstance(metadata.__description__, str)
    assert isinstance(metadata.__version__, str)


@pytest.mark.parametrize("kwarg", [{"verbatim": True}, {}])
@pytest.mark.parametrize("invert", [False, True])
def test_in1d_str_flags(kwarg, invert):
    mask = in1d_str(
        np.array(
            [
                b"\x00\x00\x00\x00\x00\x02}Dsrc-d/go-git;",
                b"\x00\x00\x00\x00\x00\x02}Gsrc-d/go-git;",
                b"\x00\x00\x00\x00\x00\x02|\xe7src-d/go-git;",
            ],
        ),
        np.array([b"\x00\x00\x00\x00\x00\x02|\xe7src-d/go-git;"]),
        invert=invert,
        **kwarg,
    )
    assert mask.sum() == 2 if invert else 1


@pytest.mark.parametrize(
    "dtype_left, dtype_right",
    [("S", "S"), ("U", "U"), ("S33", "S100"), ("U17", "U100")],
)
def test_in1d_str_dtype(dtype_left, dtype_right):
    mask = in1d_str(
        np.array(["A", "BB", "CCC"], dtype=dtype_left),
        np.array(["BB", "DDDD"], dtype=dtype_right),
    )
    assert mask.sum() == 1


def test_in1d_str_trailing():
    mask = in1d_str(
        np.array(
            [
                b"\x00\x00\x00\x00\x00\x02}Dsrc-d/go-git",
                b"\x00\x00\x00\x00\x00\x02}Gsrc-d/go-git",
                b"\x00\x00\x00\x00\x00\x02|\xe7src-d/go-git",
            ],
        ),
        np.array([b"\x00\x00\x00\x00\x00\x02|\xe7src-d/go-git\x00\x00"]),
    )
    assert mask.sum() == 1


def test_in1d_str_verbatim_width_mismatch_never_matches():
    mask = in1d_str(
        np.array(["BB"], dtype="U17"),
        np.array(["BB"], dtype="U100"),
        verbatim=True,
    )
    assert mask.sum() == 0


def test_array_of_objects_aliasing():
    arr = array_of_objects(10, None)
    assert_array_equal(arr, [None] * 10)
    arr = array_of_objects(10, [])
    assert len(arr) == 10
    assert arr.dtype == object
    arr[0].append(1)
    assert arr[1] == [1]


def test_is_null_object_exact_none():
    arr = np.array([None, 0, "", np.nan], dtype=object)
    assert_array_equal(is_null(arr), [True, False, False, False])
    assert_array_equal(is_not_null(arr), [False, True, True, True])


def test_is_null_non_object_all_false():
    arr = np.array([1.0, np.nan])
    assert_array_equal(is_null(arr), [False, False])
    assert_array_equal(is_not_null(arr), [True, True])


def test_unordered_unique_preserves_dtype():
    arr = np.array([3, 2, 2, 1], dtype="timedelta64[s]")
    uniq = unordered_unique(arr)
    assert uniq.dtype == arr.dtype
    assert sorted(uniq.astype(np.int64).tolist()) == [1, 2, 3]


def test_dataframe_iter(spark):
    assert list(MDF({"a": [0, 1, 2]}, spark=spark)) == ["a"]
    assert "a" in MDF({"a": [0]}, spark=spark)


def test_delete_last_column_empties_frame(spark):
    df = MDF({"a": [0, 1, 2]}, spark=spark)
    del df["a"]
    assert len(df) == 0


def test_delete_column_bad_key(spark):
    df = MDF({"a": [0, 1, 2]}, spark=spark)
    with pytest.raises(KeyError):
        del df["b"]


def test_set_column_rejects_2d(spark):
    df = MDF({"a": [0, 1]}, spark=spark)
    with pytest.raises(ValueError):
        df["b"] = np.ones((2, 2))


def test_set_column_scalar_preserves_string_dtype(spark):
    df = MDF({"a": ["0", "1", "2"]}, spark=spark)
    df["a"] = "test"
    assert_array_equal(df["a"], ["test"] * 3)
    with pytest.raises(ValueError):
        df["a"] = 45


def test_set_column_none_into_string_ok(spark):
    df = MDF({"a": ["0", "1"]}, spark=spark)
    df["a"] = None
    assert df["a"].tolist() == [None, None]


def test_get_column_tuple_keeps_index(spark):
    df = MDF({"a": [0, 1, 2], "b": [5, 6, 7]}, index="b", spark=spark)
    assert_frame_equal(df[("a",)], df)


def test_merge_to_str_layout():
    import struct

    import numpy as np

    from medvedi_spark.accelerators import merge_to_str

    ints = np.array([1, -2, 255], dtype=np.int64)
    bts = np.array([b"ab", b"cd", b"ef"], dtype="S2")
    # last array bytes -> no pad byte
    out = merge_to_str(ints, bts)
    assert out.dtype == np.dtype("S10")
    exp = [struct.pack(">q", int(v)) + b for v, b in zip(ints, bts)]
    assert [bytes(x) for x in out] == exp
    # last array numeric -> ';' pad appended
    out2 = merge_to_str(bts, ints)
    assert out2.dtype == np.dtype("S11")
    assert [bytes(x) for x in out2] == [b + struct.pack(">q", int(v)) + b";" for v, b in zip(ints, bts)]
    # datetime64 packs big-endian like the reference
    ts = np.array(["2024-01-01", "2024-01-02", "2024-01-03"], dtype="datetime64[s]")
    out3 = merge_to_str(ts)
    assert out3.dtype == np.dtype("S9")
    # errors: float dtype, ragged lengths
    import pytest

    with pytest.raises(ValueError):
        merge_to_str(np.array([1.5]))
    with pytest.raises(ValueError):
        merge_to_str(ints, np.array([1], dtype=np.int64))


def test_io_module_roundtrip(spark):
    import numpy as np

    from medvedi_spark import io as mio
    from medvedi_spark.frame import MDF

    df = MDF({"k": [1, 2], "s": np.array(["x", "y"], dtype=object)}, spark=spark)
    back = mio.deserialize_df(mio.serialize_df(df))
    assert back["k"].tolist() == [1, 2]
    assert back["s"].tolist() == ["x", "y"]
    assert mio.json_dumps({"a": [1, "é"]}) == '{"a":[1,"é"]}'.encode()
