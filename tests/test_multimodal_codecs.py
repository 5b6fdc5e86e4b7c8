"""Pure-python codec correctness: BMP, RIFF/WAVE, concatenated-BMP video.

These run without Spark — the codecs are plain numpy/struct code that the
Arrow batch functions (media_pipeline_batches / audio_pipeline_batches)
call per payload. Property: encode→decode is the identity for every
supported geometry, including the BMP row-padding edge cases (width not a
multiple of 4) and degenerate 1x1 frames.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from medvedi_spark.functions import multimodal as mm


def _img(h: int, w: int, seed: int = 0) -> np.ndarray:
    return np.random.default_rng(seed or h * 1000 + w).integers(0, 256, (h, w, 3), dtype=np.uint8)


@pytest.mark.parametrize("h,w", [(1, 1), (1, 4), (3, 5), (2, 2), (31, 17), (32, 32), (7, 2)])
def test_bmp_roundtrip(h, w):
    arr = _img(h, w)
    assert (mm.decode_bmp(mm.encode_bmp(arr)) == arr).all()


def test_bmp_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_bmp(b"\x89PNG not a bmp at all" + b"\x00" * 64)


def test_bmp_rejects_truncated():
    full = mm.encode_bmp(_img(4, 4))
    with pytest.raises(ValueError):
        mm.decode_bmp(full[: len(full) // 2])


def test_bmp_rejects_wrong_shape():
    with pytest.raises(ValueError):
        mm.encode_bmp(np.zeros((4, 4), dtype=np.uint8))


def test_decode_image_is_bmp_decode():
    arr = _img(5, 9)
    assert (mm.decode_image(mm.encode_bmp(arr)) == arr).all()


def test_wav_roundtrip():
    pcm = ((np.arange(1000) % 256) * 256 - 32768).astype(np.int16)
    samples, rate = mm.decode_audio(mm.encode_wav(pcm, 16_000))
    assert rate == 16_000
    assert (samples == pcm).all()


def test_wav_empty():
    samples, rate = mm.decode_audio(mm.encode_wav(np.array([], dtype=np.int16), 8_000))
    assert rate == 8_000 and len(samples) == 0


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        mm.decode_audio(b"OggS" + b"\x00" * 64)


def test_wav_rate_check():
    wav = mm.encode_wav(np.zeros(4, dtype=np.int16), 22_050)
    with pytest.raises(ValueError):
        mm.decode_audio(wav, sample_rate=16_000)


def test_video_container_split_and_sample():
    frames = [_img(6, 6, s) for s in (1, 2, 3, 4, 5)]
    video = mm.encode_video(frames)
    blobs = mm.split_video_frames(video)
    assert len(blobs) == 5
    for blob, orig in zip(blobs, frames):
        assert (mm.decode_bmp(blob) == orig).all()
    sampled = mm.sample_video_frames(video, every_n=2)
    assert len(sampled) == 3
    assert all((s == f).all() for s, f in zip(sampled, frames[::2]))


def test_video_bad_boundary():
    video = mm.encode_video([_img(2, 2)])
    with pytest.raises(ValueError):
        mm.split_video_frames(video + b"XX")


def test_media_pipeline_batches_match_direct_computation():
    """The batch function's outputs equal a from-scratch recomputation of
    the synthetic-video construction + decode for a couple of payloads."""
    import hashlib

    payloads = [b"hello world, this is a document", b"x"]
    pdf = pd.DataFrame({"doc_id": [10, 11], "payload": payloads})
    (out,) = list(mm.media_pipeline_batches(iter([pdf])))
    for i, payload in enumerate(payloads):
        h, w, nf = mm.synth_geometry(hashlib.md5(payload).hexdigest())
        assert out["height"][i] == h and out["width"][i] == w and out["n_frames"][i] == nf
        npix = 3 * h * w
        stream = np.resize(np.frombuffer(payload, np.uint8), npix).astype(np.int64)
        assert out["pixel_sum0"][i] == stream.sum()
        assert out["n_sampled"][i] == (nf + 1) // 2
        row_pad = (4 - (3 * w) % 4) % 4
        assert out["byte_len"][i] == nf * (54 + h * (3 * w + row_pad))


def test_audio_pipeline_batches_match_direct_computation():
    payloads = [b"abcdef", bytes(range(256))]
    pdf = pd.DataFrame({"doc_id": [0, 1], "payload": payloads})
    (out,) = list(mm.audio_pipeline_batches(iter([pdf])))
    for i, payload in enumerate(payloads):
        vals = np.frombuffer(payload, np.uint8).astype(np.int64) * 256 - 32768
        assert out["n_samples"][i] == len(payload)
        assert out["amp_sum"][i] == vals.sum()
        assert out["peak"][i] == vals.max()
        assert out["byte_len"][i] == 44 + 2 * len(payload)
        assert out["sample_rate"][i] == 16_000


def test_ahash_properties():
    import numpy as np
    from medvedi_spark.functions.multimodal import ahash_64, decode_bmp, encode_bmp

    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(20, 30, 3), dtype=np.uint8)
    hi, lo = ahash_64(img)
    # codec round trip must not change the hash (lossless BMP)
    assert ahash_64(decode_bmp(encode_bmp(img))) == (hi, lo)
    # flat image: no cell exceeds the global mean -> all-zero hash
    assert ahash_64(np.full((16, 16, 3), 77, dtype=np.uint8)) == (0, 0)
    # half-bright image: bright half's cells set, dark half's clear
    half = np.zeros((16, 16, 3), dtype=np.uint8)
    half[:8] = 255  # top half bright -> cells 0..31 (rows 0..7 of the grid)
    hi2, lo2 = ahash_64(half)
    assert lo2 == 0xFFFFFFFF and hi2 == 0
    # tiny images (narrower than the 8x8 grid) still hash deterministically
    tiny = rng.integers(0, 256, size=(2, 3, 3), dtype=np.uint8)
    assert ahash_64(tiny) == ahash_64(tiny.copy())
