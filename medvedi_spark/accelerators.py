"""Driver-side ndarray helpers mirroring the reference accelerator API.

The reference ships a Cython module (`/root/reference/medvedi/
accelerators.pyx`) with string-membership, null-mask, unique, and
object-array kernels that user code imports directly
(``from medvedi.accelerators import in1d_str``).  In this engine the
*distributed* equivalents are the MDF methods (``isin`` lowers to a
broadcast semi/anti join, ``unique`` to a shuffle-distinct,
``isnull``/``notnull`` to ``isNull`` expressions) — see
`medvedi_spark/frame.py`.  These functions exist so ported code that
post-processes *collected* numpy arrays keeps working; they are
numpy-vectorized, never loop per element on the hot path, and are not
part of any Spark plan.

Semantics matched against `/root/reference/medvedi/accelerators.pyx`:

- ``in1d_str`` (`accelerators.pyx:192-276`): fixed-width ``S``/``U``
  arrays compare with trailing NUL padding stripped, so the same text at
  different declared widths (``S33`` vs ``S100``) matches; embedded NULs
  are significant.  ``verbatim=True`` compares the raw fixed-width
  buffers instead (mismatched widths then never match).
- ``is_null``/``is_not_null`` (`accelerators.pyx:278-332`): exact
  ``is None`` test on object arrays; non-object dtypes have no nulls.
- ``array_of_objects`` (`accelerators.pyx:332-357`): every slot holds
  the *same* object reference (`tests/test_accelerators.py` relies on
  aliasing: mutating ``arr[0]`` is visible through ``arr[1]``).
- ``unordered_unique`` (`accelerators.pyx:64-190`): distinct values in
  unspecified order, dtype preserved.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

__all__ = [
    "array_of_objects",
    "in1d_str",
    "is_not_null",
    "is_null",
    "unordered_unique",
]


def _stripped_keys(arr: np.ndarray) -> list[bytes]:
    """Raw fixed-width items with trailing NUL padding removed.

    For ``U`` (UTF-32) arrays the padding unit is the 4-byte code point,
    so we trim whole zero code units from the tail — a plain
    ``rstrip(b"\\x00")`` would corrupt trailing characters whose
    little-endian encoding ends in zero bytes.
    """
    buf = arr.tobytes()
    width = arr.dtype.itemsize
    items = [buf[i * width : (i + 1) * width] for i in range(len(arr))]
    if arr.dtype.kind == "S":
        return [it.rstrip(b"\x00") for it in items]
    out = []
    for it in items:
        end = len(it)
        while end >= 4 and it[end - 4 : end] == b"\x00\x00\x00\x00":
            end -= 4
        out.append(it[:end])
    return out


def _raw_keys(arr: np.ndarray) -> list[bytes]:
    buf = arr.tobytes()
    width = arr.dtype.itemsize
    return [buf[i * width : (i + 1) * width] for i in range(len(arr))]


def in1d_str(
    trial: np.ndarray,
    dictionary: np.ndarray,
    verbatim: bool = False,
    invert: bool = False,
) -> np.ndarray:
    """Membership mask of ``trial`` in ``dictionary`` for S/U arrays."""
    assert trial.ndim == 1
    assert dictionary.ndim == 1
    kind = trial.dtype.kind
    assert kind in ("S", "U")
    assert kind == dictionary.dtype.kind
    extract = _raw_keys if verbatim else _stripped_keys
    table = frozenset(extract(dictionary))
    mask = np.fromiter(
        (k in table for k in extract(trial)), dtype=bool, count=len(trial)
    )
    return ~mask if invert else mask


def is_null(arr: np.ndarray) -> np.ndarray:
    """True where an object-array element is exactly ``None``."""
    if arr.dtype != object:
        return np.zeros(len(arr), dtype=bool)
    assert arr.ndim == 1
    return np.fromiter((x is None for x in arr), dtype=bool, count=len(arr))


def is_not_null(arr: np.ndarray) -> np.ndarray:
    """Inverse of :func:`is_null`."""
    if arr.dtype != object:
        return np.ones(len(arr), dtype=bool)
    assert arr.ndim == 1
    return np.fromiter((x is not None for x in arr), dtype=bool, count=len(arr))


def array_of_objects(length: int, fill_value) -> np.ndarray:
    """Object ndarray whose every slot aliases the same ``fill_value``."""
    arr = np.empty(length, dtype=object)
    arr[:] = [fill_value] * length  # one reference, length aliases
    return arr


def unordered_unique(arr: np.ndarray) -> np.ndarray:
    """Distinct values, order unspecified, dtype preserved."""
    assert arr.ndim == 1
    if arr.dtype == object:
        return pd.unique(arr)
    uniq = pd.unique(arr)
    return np.asarray(uniq, dtype=arr.dtype)


# Dtype kinds merge_to_str accepts, matching the reference contract
# (/root/reference/medvedi/merge_to_str.py:3).
MERGEABLE_DTYPE_KINDS = frozenset(("i", "u", "m", "M", "S"))


def merge_to_str(*arrs: np.ndarray) -> np.ndarray:
    """Pack parallel key arrays into one fixed-width bytes column
    (reference `medvedi/merge_to_str.py:6-38`): numeric/datetime columns
    are laid out big-endian so equal tuples collide to equal byte
    strings, bytes columns copy verbatim, and a trailing ``b";"`` pad is
    appended unless the LAST array is already bytes (numpy's char ops
    drop trailing NULs, so the sentinel keeps width stable).

    Driver-side compat mirror: the engine itself never packs keys — a
    multi-column groupBy/join key is Tungsten's UnsafeRow job (SURVEY
    §4.2) — but reference callers use this to build composite key
    columns, so the function exists with identical semantics.
    """
    assert arrs, "merge_to_str needs at least one array"
    n = len(arrs[0])
    pad = arrs[-1].dtype.kind != "S"
    width = sum(a.dtype.itemsize for a in arrs) + pad
    out = np.zeros((n, width), dtype=np.uint8)
    if pad:
        out[:, -1] = ord(";")
    pos = 0
    for a in arrs:
        kind = a.dtype.kind
        if kind not in MERGEABLE_DTYPE_KINDS:
            raise ValueError(
                f"array's dtype.kind {a.dtype} must be one of "
                f"{', '.join(sorted(MERGEABLE_DTYPE_KINDS))}"
            )
        if len(a) != n:
            raise ValueError(f"all arrays must have the same length: {len(a)} != {n}")
        w = a.dtype.itemsize
        if kind == "S" or w == 1:
            col = a
        else:
            col = a.astype(a.dtype.newbyteorder(">"), copy=False)
        out[:, pos : pos + w] = col.view(np.uint8).reshape(n, w)
        pos += w
    return out.reshape(-1).view(f"S{width}")
