"""Serialization module — the reference's ``medvedi.io`` import surface
(`/root/reference/medvedi/io.pyx`: ``serialize_df``/``deserialize_df``/
``json_dumps``), re-expressed on Arrow.

The reference ships a custom mimalloc-arena binary wire format; SURVEY
§3.3 rules that format OUT (parquet/Arrow are the storage formats here —
splittable, columnar, pushdown-able), so ``serialize_df`` emits an Arrow
IPC stream with the index recorded in schema metadata: the same
round-trip contract (lossless including the index), a standard wire
layout instead of a bespoke one.
"""

from __future__ import annotations

import json as _json

from medvedi_spark.frame import MDF

__all__ = ["serialize_df", "deserialize_df", "json_dumps"]


def serialize_df(df: MDF, alloc_capsule=None) -> bytes:  # noqa: ARG001 — reference arity
    """Arrow IPC stream bytes (reference `io.pyx:94`; the alloc_capsule
    parameter is the reference's arena allocator — meaningless here,
    accepted for call-site compatibility)."""
    return df.serialize_unsafe()


def deserialize_df(buffer: bytes) -> MDF:
    """Inverse of :func:`serialize_df` (reference `io.pyx:633`)."""
    return MDF.deserialize_unsafe(buffer)


def json_dumps(obj) -> bytes:
    """Compact UTF-8 JSON bytes (reference `io.pyx:616` — a custom C
    writer; the contract is compact separators and raw UTF-8)."""
    return _json.dumps(obj, separators=(",", ":"), ensure_ascii=False).encode("utf-8")
