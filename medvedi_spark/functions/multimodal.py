"""Multimodal column support: opaque binary payloads + typed metadata.

Convention (SURVEY §2.10): media travels as a ``binary`` column plus typed
metadata columns; all per-item work happens in Arrow-batched python
(``mapInPandas``), never row-at-a-time UDFs. The codecs here are real,
pure-python implementations of formats simple enough to decode exactly
without external libraries (BMP, RIFF/WAVE PCM16, concatenated-BMP video);
PIL/ffmpeg would slot into the same batch loop for compressed formats.
Oracle-tested end-to-end via m1_multimodal_meta / m2_media_pipeline /
m3_audio_pipeline.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
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


def resize_dims(height: int, width: int, target: int = 224) -> tuple[int, int]:
    """Integer aspect-preserving resize (long side → ``target``)."""
    long_side = max(height, width)
    return height * target // long_side, width * target // long_side


# --------------------------------------------------------------------------
# Real pure-python codecs. No external codec libraries exist in this
# environment, so the media formats chosen are ones a few hundred lines of
# stdlib+numpy decode exactly: BMP (24-bit uncompressed, BITMAPINFOHEADER)
# for images, RIFF/WAVE PCM16 mono for audio, and a concatenated-BMP
# container for video (each frame is a self-delimiting BMP blob — the
# header's file-size field is the frame boundary). These run for real
# inside the Arrow batch loop; swapping in PIL/ffmpeg changes only the
# per-payload decode call, not the Spark plumbing.
# --------------------------------------------------------------------------

_BMP_HEADER_SIZE = 54  # 14-byte file header + 40-byte BITMAPINFOHEADER


def encode_bmp(pixels: "np.ndarray") -> bytes:
    """Encode an HxWx3 uint8 RGB array as a 24-bit uncompressed BMP."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError(f"expected HxWx3 RGB, got shape {arr.shape}")
    h, w = arr.shape[:2]
    row_pad = (4 - (3 * w) % 4) % 4
    img_size = h * (3 * w + row_pad)
    total = _BMP_HEADER_SIZE + img_size
    head = struct.pack("<2sIHHI", b"BM", total, 0, 0, _BMP_HEADER_SIZE)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, img_size, 2835, 2835, 0, 0)
    # pixel rows are stored bottom-up, channels as BGR, rows padded to 4
    padded = np.zeros((h, 3 * w + row_pad), dtype=np.uint8)
    padded[:, : 3 * w] = arr[::-1, :, ::-1].reshape(h, 3 * w)
    return head + info + padded.tobytes()


def decode_bmp(payload: bytes) -> "np.ndarray":
    """Decode a 24-bit uncompressed BMP to an HxWx3 uint8 RGB array."""
    magic, total, _, _, offset = struct.unpack_from("<2sIHHI", payload, 0)
    if magic != b"BM" or total > len(payload):
        raise ValueError("not a BMP payload")
    hdr_sz, w, h, _planes, bpp, compression = struct.unpack_from("<Iii HHI".replace(" ", ""), payload, 14)
    if hdr_sz < 40 or bpp != 24 or compression != 0 or h <= 0 or w <= 0:
        raise ValueError(f"unsupported BMP variant (bpp={bpp}, compression={compression})")
    row_pad = (4 - (3 * w) % 4) % 4
    stride = 3 * w + row_pad
    rows = np.frombuffer(payload, dtype=np.uint8, count=h * stride, offset=offset).reshape(h, stride)
    return rows[:, : 3 * w].reshape(h, w, 3)[::-1, :, ::-1]


def decode_image(payload: bytes) -> "np.ndarray":
    """Decode an image payload to HxWx3 uint8 (BMP built in; other
    formats need codec libraries absent from this environment)."""
    return decode_bmp(payload)


def encode_wav(samples: "np.ndarray", sample_rate: int = 16_000) -> bytes:
    """Encode int16 mono PCM as a RIFF/WAVE file."""
    pcm = np.asarray(samples, dtype="<i2").tobytes()
    hdr = struct.pack(
        "<4sI4s4sIHHIIHH4sI",
        b"RIFF", 36 + len(pcm), b"WAVE",
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16,
        b"data", len(pcm),
    )
    return hdr + pcm


def decode_audio(payload: bytes, sample_rate: int | None = None) -> tuple["np.ndarray", int]:
    """Decode RIFF/WAVE PCM16 mono → (int16 sample array, sample rate)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAVE payload")
    fmt, channels, rate, _byte_rate, _block_align, bits = struct.unpack_from("<HHIIHH", payload, 20)
    if fmt != 1 or channels != 1 or bits != 16:
        raise ValueError(f"unsupported WAVE variant (fmt={fmt}, ch={channels}, bits={bits})")
    (data_len,) = struct.unpack_from("<I", payload, 40)
    samples = np.frombuffer(payload, dtype="<i2", count=data_len // 2, offset=44)
    if sample_rate is not None and rate != sample_rate:
        raise ValueError(f"expected rate {sample_rate}, file says {rate}")
    return samples, rate


def encode_video(frames: "list[np.ndarray]") -> bytes:
    """Concatenated-BMP video container: frames back to back, each
    self-delimiting through its BMP file-size field."""
    return b"".join(encode_bmp(f) for f in frames)


def split_video_frames(payload: bytes) -> list[bytes]:
    """Split a concatenated-BMP container into per-frame BMP blobs."""
    out, pos = [], 0
    while pos < len(payload):
        if payload[pos : pos + 2] != b"BM":
            raise ValueError(f"bad frame boundary at byte {pos}")
        (total,) = struct.unpack_from("<I", payload, pos + 2)
        out.append(payload[pos : pos + total])
        pos += total
    return out


def sample_video_frames(payload: bytes, every_n: int = 30) -> "list[np.ndarray]":
    """Decode every Nth frame of a concatenated-BMP video payload."""
    blobs = split_video_frames(payload)
    return [decode_bmp(b) for b in blobs[::every_n]]


# --------------------------------------------------------------------------
# End-to-end media pipelines over the real codecs. Geometry is seeded from
# the payload's md5 (a deterministic synthetic-media generator the SQL
# oracle can replay); everything downstream of encode is the honest path:
# container split on BMP size fields, real header parse, real pixel /
# sample extraction. A mis-parsed stride or swapped channel order changes
# pixel_sum0/amp_sum and fails the driver's hash gate.
# --------------------------------------------------------------------------

MEDIA_MAX_DIM = 32
MEDIA_MAX_FRAMES = 5
VIDEO_SAMPLE_EVERY = 2
AUDIO_RATE = 16_000


def synth_geometry(md5_hex: str) -> tuple[int, int, int]:
    """(height, width, n_frames) for a synthetic video payload."""
    h = 1 + int(md5_hex[0:3], 16) % MEDIA_MAX_DIM
    w = 1 + int(md5_hex[3:6], 16) % MEDIA_MAX_DIM
    nf = 1 + int(md5_hex[6:8], 16) % MEDIA_MAX_FRAMES
    return h, w, nf


def media_pipeline_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """decode → resize → frame-sample over real encoded bytes."""
    import hashlib

    cols = ("doc_id", "byte_len", "height", "width", "n_frames", "pixel_sum0", "out_h", "out_w", "n_sampled")
    for pdf in batches:
        rows: dict[str, list[int]] = {c: [] for c in cols}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            h, w, nf = synth_geometry(hashlib.md5(payload).hexdigest())
            src = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, dtype=np.uint8)
            npix = h * w * 3
            stream = np.resize(src, nf * npix)  # cycles the payload bytes
            video = encode_video([stream[k * npix : (k + 1) * npix].reshape(h, w, 3) for k in range(nf)])
            # honest decode path from here on
            frames = split_video_frames(video)
            first = decode_bmp(frames[0])
            fh, fw = first.shape[:2]
            oh, ow = resize_dims(fh, fw)
            sampled = sample_video_frames(video, every_n=VIDEO_SAMPLE_EVERY)
            vals = (doc_id, len(video), fh, fw, len(frames), int(first.astype(np.int64).sum()), oh, ow, len(sampled))
            for c, v in zip(cols, vals):
                rows[c].append(v)
        yield pd.DataFrame({c: pd.Series(rows[c], dtype="int64") for c in cols})


def audio_pipeline_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """PCM16 WAV encode → real RIFF parse → sample statistics."""
    cols = ("doc_id", "byte_len", "n_samples", "sample_rate", "duration_ms", "amp_sum", "peak")
    for pdf in batches:
        rows: dict[str, list[int]] = {c: [] for c in cols}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload) or b"\x80"
            src = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
            wav = encode_wav((src * 256 - 32768).astype(np.int16), AUDIO_RATE)
            dec, rate = decode_audio(wav)
            vals = (
                doc_id,
                len(wav),
                len(dec),
                rate,
                len(dec) * 1000 // rate,
                int(dec.astype(np.int64).sum()),
                int(dec.max()),
            )
            for c, v in zip(cols, vals):
                rows[c].append(v)
        yield pd.DataFrame({c: pd.Series(rows[c], dtype="int64") for c in cols})


def ahash_64(arr: "np.ndarray") -> tuple[int, int]:
    """64-bit average-hash (aHash) of an HxWx3 uint8 image, returned as
    (hi, lo) 32-bit halves so both engines stay inside signed int64.

    The 8x8 downsample uses integer cell assignment (r*8//H, c*8//W) and
    the brightness compare is the cross-multiplied INTEGER inequality
    cell_sum * total_cnt > total_sum * cell_cnt — no float means, so the
    bits are exactly reproducible arithmetic on the pixel bytes (which is
    what lets a SQL oracle replay the hash). Cells empty under the
    integer grid (images narrower than 8) hash to 0 bits on both sides.
    """
    h, w = arr.shape[:2]
    s = arr.astype(np.int64).sum(axis=2)
    cell = (np.arange(h)[:, None] * 8 // h) * 8 + (np.arange(w)[None, :] * 8 // w)
    cell_sum = np.bincount(cell.ravel(), weights=s.ravel(), minlength=64).astype(np.int64)
    cell_cnt = np.bincount(cell.ravel(), minlength=64).astype(np.int64)
    tot_sum, tot_cnt = int(s.sum()), h * w
    bits = cell_sum * tot_cnt > tot_sum * cell_cnt
    lo = int(sum(1 << i for i in range(32) if bits[i]))
    hi = int(sum(1 << (i - 32) for i in range(32, 64) if bits[i]))
    return hi, lo


def ahash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batch perceptual-hash kernel: payload bytes → synthetic BMP
    (md5-seeded geometry, bytes cycled as pixels — same construction as
    the m2 video pipeline) → REAL encode/decode round trip → 8x8 aHash.
    """
    import hashlib

    for pdf in batches:
        out = {"doc_id": [], "height": [], "width": [], "ahash_hi": [], "ahash_lo": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            data = bytes(payload)
            height, width, _ = synth_geometry(hashlib.md5(data).hexdigest())
            npx = 3 * height * width
            reps = -(-npx // len(data))
            pix = np.frombuffer(data * reps, dtype=np.uint8)[:npx].reshape(height, width, 3)
            arr = decode_image(encode_bmp(pix))  # honest codec round trip
            hi, lo = ahash_64(arr)
            out["doc_id"].append(doc_id)
            out["height"].append(height)
            out["width"].append(width)
            out["ahash_hi"].append(hi)
            out["ahash_lo"].append(lo)
        yield pd.DataFrame(out)


def audio_fingerprint_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """PCM16 WAV encode → real RIFF parse → 4-frame integer energy
    fingerprint (sum of |sample| per quarter, integer frame boundaries
    j*L//4). Integer-only arithmetic so a SQL oracle can replay the
    fingerprint bit-for-bit from the source bytes."""
    cols = ("doc_id", "n_samples", "e0", "e1", "e2", "e3")
    for pdf in batches:
        rows: dict[str, list] = {c: [] for c in cols}
        fps: list[str] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload) or b"\x80"
            src = np.frombuffer(payload, dtype=np.uint8).astype(np.int32)
            wav = encode_wav((src * 256 - 32768).astype(np.int16), AUDIO_RATE)
            dec, _rate = decode_audio(wav)
            L = len(dec)
            a = np.abs(dec.astype(np.int64))
            es = [int(a[j * L // 4 : (j + 1) * L // 4].sum()) for j in range(4)]
            for c, v in zip(cols, (doc_id, L, *es)):
                rows[c].append(v)
            fps.append(":".join(str(e) for e in es))
        out = pd.DataFrame({c: pd.Series(rows[c], dtype="int64") for c in cols})
        out["fp"] = pd.Series(fps, dtype="object")
        yield out


def video_scene_cuts_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Video temporal analysis over the honest codec path: decode EVERY
    frame of the synthetic container (m2's construction), compute
    per-frame integer brightness sums, and mark scene cuts where the
    frame-to-frame change exceeds 4 levels per channel-pixel. Integer
    arithmetic end-to-end, so a SQL oracle can replay the cut list from
    the source bytes."""
    import hashlib

    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "n_frames": [], "n_cuts": []}
        cuts_col: list[str] = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            payload = bytes(payload)
            h, w, nf = synth_geometry(hashlib.md5(payload).hexdigest())
            src = np.frombuffer(payload, dtype=np.uint8) if payload else np.zeros(1, dtype=np.uint8)
            npix = h * w * 3
            stream = np.resize(src, nf * npix)
            video = encode_video([stream[k * npix : (k + 1) * npix].reshape(h, w, 3) for k in range(nf)])
            sums = [int(decode_bmp(fr).astype(np.int64).sum()) for fr in split_video_frames(video)]
            cuts = [f for f in range(1, len(sums)) if abs(sums[f] - sums[f - 1]) > 4 * npix]
            out["doc_id"].append(doc_id)
            out["n_frames"].append(len(sums))
            out["n_cuts"].append(len(cuts))
            cuts_col.append(";".join(str(c) for c in cuts))
        res = pd.DataFrame({c: pd.Series(v, dtype="int64") for c, v in out.items()})
        res["cuts"] = pd.Series(cuts_col, dtype="object")
        yield res
