"""Multimodal column support: opaque binary payloads + typed metadata.

Convention (SURVEY §2.10): media travels as a ``binary`` column plus typed
metadata columns; all per-item work happens in Arrow-batched python
(``mapInPandas``), never row-at-a-time UDFs. The decode step itself is
stubbed — codec libraries (PIL/ffmpeg/torchaudio) are not in this
environment — but the batch plumbing (schema, batching, partition
independence) is real and oracle-tested via m1_multimodal_meta.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

CHUNK_BYTES = 256


def binary_metadata_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Per-batch byte-level metadata over a binary ``payload`` column.

    Pure per-row computation → embarrassingly parallel across partitions;
    output row count == input row count (safe under AQE re-partitioning).
    """
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": payload.map(len).astype("int64"),
                "first_byte": payload.map(lambda b: b[0] if len(b) else None).astype("int64"),
                "last_byte": payload.map(lambda b: b[-1] if len(b) else None).astype("int64"),
                "n_chunks": payload.map(lambda b: (len(b) + CHUNK_BYTES - 1) // CHUNK_BYTES).astype("int64"),
            }
        )


def fake_decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Deterministic stand-in for the codec stage of a media pipeline.

    Real deployments swap this for PIL/ffmpeg decode; the Spark-side
    contract stays identical: binary ``payload`` in, typed media
    metadata out, Arrow batches both ways, no cross-row state. The fake
    derives (height, width, n_frames) from the payload's md5 so the
    whole downstream pipeline (resize, frame sampling) is exercised
    end-to-end and oracle-checkable.
    """
    import hashlib

    for pdf in batches:
        digests = pdf["payload"].map(lambda b: hashlib.md5(b).hexdigest())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "byte_len": pdf["payload"].map(len).astype("int64"),
                "height": digests.map(lambda d: 1 + int(d[0:3], 16) % 512).astype("int64"),
                "width": digests.map(lambda d: 1 + int(d[3:6], 16) % 512).astype("int64"),
                "n_frames": digests.map(lambda d: 1 + int(d[6:8], 16) % 120).astype("int64"),
            }
        )


def resize_dims(height: int, width: int, target: int = 224) -> tuple[int, int]:
    """Integer aspect-preserving resize (long side → ``target``)."""
    long_side = max(height, width)
    return height * target // long_side, width * target // long_side


def decode_image(payload: bytes) -> "object":
    """Decode an image payload to HxWxC uint8. STUB: no codec libs here."""
    raise NotImplementedError(
        "image decode requires a codec library not present in this "
        "environment; the Spark-side plumbing is binary_metadata_batches"
    )


def decode_audio(payload: bytes, sample_rate: int = 16_000) -> "object":
    """Decode audio to mono float32 PCM. STUB: no codec libs here."""
    raise NotImplementedError("audio decode stub — see decode_image")


def sample_video_frames(payload: bytes, every_n: int = 30) -> "object":
    """Sample every Nth frame of a video payload. STUB: no codec libs."""
    raise NotImplementedError("video decode stub — see decode_image")
