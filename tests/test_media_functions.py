"""Multimodal binary-column kernels: WAV (real stdlib codec), RAWV
fake video container (frame sampling logic is real), image resize —
including the Spark mapInPandas plumbing."""

import numpy as np
import pytest

from ocular_spark.functions.media import (
    AUDIO_META_SCHEMA,
    IMAGE_META_SCHEMA,
    VIDEO_FRAMES_SCHEMA,
    audio_meta_kernel,
    encode_rawv,
    encode_wav,
    image_meta_kernel,
    rawv_metadata,
    resize_gray,
    sample_frames,
    video_sample_kernel,
    wav_metadata,
    wav_rms_bands,
)


def test_resize_gray():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    out = resize_gray(img, 6, 2)
    assert out.shape == (6, 2)
    assert out[0, 0] == img[0, 0] and out[-1, -1] == img[-1, -1] - 1  # nn picks col 2


def test_wav_roundtrip_metadata_and_features():
    t = np.arange(16000, dtype=np.float64) / 16000.0
    samples = (np.sin(2 * np.pi * 440 * t) * 20000).astype(np.int16)
    blob = encode_wav(samples, 16000)
    assert wav_metadata(blob) == (16000, 1, 2, 16000)
    bands = wav_rms_bands(blob, 4)
    assert bands.shape == (4,)
    # a steady sine has ~equal RMS in all four time slices (~0.43)
    np.testing.assert_allclose(bands, bands[0], rtol=1e-2)
    assert 0.3 < bands[0] < 0.6


def test_rawv_fake_codec_and_sampling():
    frames = [np.full((4, 5), v, dtype=np.uint8) for v in range(10)]
    blob = encode_rawv(frames)
    assert rawv_metadata(blob) == (4, 5, 10)
    picked = sample_frames(blob, 3)
    assert [int(f.mean()) for f in picked] == [0, 3, 6]  # uniform stride
    with pytest.raises(NotImplementedError):
        rawv_metadata(b"MP4\x00 not supported")


def test_image_meta_kernel_stats_are_exact_and_positional():
    """The kernel's integer stats must equal a direct NumPy restatement,
    and the position-weighted sum must distinguish a transposed
    thumbnail with an identical histogram (the failure the plain sum
    cannot see)."""
    import pandas as pd

    from ocular_spark.functions.png import encode_gray_png

    rng = np.random.RandomState(7)
    img = rng.randint(0, 256, size=(17, 25), dtype=np.uint8).astype(np.uint8)
    fn = image_meta_kernel(8, 12)
    [out] = list(fn(iter([pd.DataFrame(
        [("i0", encode_gray_png(img))], columns=["media_ref", "image"])])))
    r = out.iloc[0]
    thumb = resize_gray(img, 8, 12).astype(np.int64)
    weights = np.arange(1, 97, dtype=np.int64).reshape(8, 12)
    assert (r.height, r.width) == (17, 25)
    assert r.px_min == thumb.min() and r.px_max == thumb.max()
    assert r.px_sum == thumb.sum()
    assert r.px_wsum == (thumb * weights).sum()
    # positional sensitivity: a square thumbnail transposed keeps
    # min/max/sum but moves the weighted sum (unless symmetric)
    sq = resize_gray(img, 10, 10).astype(np.int64)
    wsq = np.arange(1, 101, dtype=np.int64).reshape(10, 10)
    assert (sq * wsq).sum() != (sq.T * wsq).sum()


def test_spark_media_kernels(spark):
    import pandas as pd

    t = np.arange(8000, dtype=np.float64)
    wavs = [
        ("a0", encode_wav((np.sin(t * f) * 10000).astype(np.int16), 8000))
        for f in (0.1, 0.4)
    ]
    audio_df = spark.createDataFrame(
        pd.DataFrame(wavs, columns=["media_ref", "audio"]),
    )
    meta = audio_df.mapInPandas(audio_meta_kernel, schema=AUDIO_META_SCHEMA)
    rows = {r.media_ref: r for r in meta.collect()}
    assert rows["a0"].sample_rate == 8000 and rows["a0"].n_frames == 8000

    vids = [
        ("v0", encode_rawv([np.full((6, 8), v, dtype=np.uint8) for v in range(12)])),
        ("v1", encode_rawv([np.full((6, 8), 9, dtype=np.uint8)])),
    ]
    video_df = spark.createDataFrame(pd.DataFrame(vids, columns=["media_ref", "video"]))
    frames = video_df.mapInPandas(video_sample_kernel(4), schema=VIDEO_FRAMES_SCHEMA)
    got = [(r.media_ref, r.frame_idx, r.mean_level) for r in frames.collect()]
    assert (("v0", 0, 0.0) in got) and (("v0", 1, 3.0) in got)
    assert ("v1", 0, 9.0) in got  # fewer frames than k -> all frames
    assert len([g for g in got if g[0] == "v0"]) == 4


def test_dhash_gray_brightness_invariance_and_discrimination():
    from ocular_spark.functions.media import dhash_gray
    from ocular_spark.functions.png import decode_gray_png, encode_gray_png

    rng = np.random.RandomState(7)
    base = (rng.randint(0, 200, size=(16, 24))).astype(np.uint8)
    h0 = dhash_gray(base)
    assert len(h0) == 64 and set(h0) <= {"0", "1"}

    # uniform brightness offset (no wrap): hash is invariant
    brighter = (base.astype(np.int64) + 40).astype(np.uint8)
    assert dhash_gray(brighter) == h0

    # but the PNG bytes differ -> exact dedup could NOT group these
    assert encode_gray_png(base) != encode_gray_png(brighter)

    # a structurally different image hashes differently
    other = base.T[:16, :16].copy()
    assert dhash_gray(other) != h0

    # round-trips through the real codec path unchanged
    assert dhash_gray(decode_gray_png(encode_gray_png(base))) == h0
