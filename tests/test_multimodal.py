"""Multimodal audio/video plumbing (gdal_spark.multimodal).

WAV: RIFF/PCM round trip (16-bit, 8-bit, multi-channel, odd-size word
alignment), feature extraction integer exactness. Video: multi-page
TIFF chained-IFD round trip through the engine's own IFD-chain reader
(functions/tiff.py ifd_offsets / tiff_parse — the same parser that
reads GDAL overview chains), frame sampling, distributed forms.
"""

import numpy as np
import pytest

from gdal_spark.functions.tiff import ifd_offsets, tiff_parse
from gdal_spark.multimodal import (
    audio_features,
    audio_features_tiles,
    frame_sample,
    frame_sample_tiles,
    tiff_encode_seq,
    video_meta,
    wav_decode,
    wav_encode,
)


def test_wav_roundtrip_pcm16():
    rng = np.random.RandomState(7)
    s = rng.randint(-32768, 32767, size=1000).astype(np.int16)
    out, rate = wav_decode(wav_encode(s, rate=22050))
    assert rate == 22050
    assert out.shape == (1000, 1)
    assert np.array_equal(out[:, 0], s)


def test_wav_roundtrip_stereo_and_pcm8():
    s = np.stack(
        [np.arange(100, dtype=np.int16), -np.arange(100, dtype=np.int16)],
        axis=1,
    )
    out, _ = wav_decode(wav_encode(s))
    assert out.shape == (100, 2)
    assert np.array_equal(out, s)
    u8 = np.arange(0, 255, 2, dtype=np.uint8)  # odd count -> word padding
    out8, _ = wav_decode(wav_encode(u8))
    assert np.array_equal(out8[:, 0], u8.astype(np.int16) - 128)


def test_wav_rejects_garbage():
    with pytest.raises(ValueError):
        wav_decode(b"not a riff file at all....")


def test_audio_features_exact():
    s = np.array([1, -1, 2, -2, 3, 3, -3, 0], dtype=np.int16)
    feats = audio_features(s, frame_len=4)
    assert feats[0] == (0, 4, 1 + 1 + 4 + 4, 3)
    # frame 2: [3, 3, -3, 0] -> one sign flip (3,-3); (−3,0) product 0
    assert feats[1] == (1, 4, 9 + 9 + 9 + 0, 1)


def test_tiff_seq_roundtrip():
    frames = [
        (np.arange(256).reshape(16, 16) % (97 + f)).astype(np.uint8)
        for f in range(5)
    ]
    blob = tiff_encode_seq(frames)
    assert len(ifd_offsets(blob)) == 5
    for i, want in enumerate(frames):
        got, _ = tiff_parse(blob, ifd_index=i)
        assert np.array_equal(got[:, :, 0] if got.ndim == 3 else got, want)
    assert video_meta(blob) == (5, 16, 16)


def test_tiff_seq_rgb_and_sampling():
    rng = np.random.RandomState(3)
    frames = [rng.randint(0, 255, (8, 8, 3), dtype=np.uint8) for _ in range(7)]
    blob = tiff_encode_seq(frames)
    picked = dict(frame_sample(blob, every=3))
    assert sorted(picked) == [0, 3, 6]
    for i, arr in picked.items():
        assert np.array_equal(arr, frames[i])
    two = dict(frame_sample(blob, every=2, max_frames=2))
    assert sorted(two) == [0, 2]


def test_distributed_forms(spark):
    s = np.arange(-64, 64, dtype=np.int16) * 100
    adf = spark.createDataFrame(
        [("a0", wav_encode(s))], "audio_id string, bytes binary"
    )
    rows = audio_features_tiles(adf, frame_len=64).collect()
    want = audio_features(s, 64)
    assert [(r.frame, r.n, r.sumsq, r.zcr) for r in rows] == want

    frames = [np.full((4, 4), f * 10, np.uint8) for f in range(4)]
    vdf = spark.createDataFrame(
        [("v0", tiff_encode_seq(frames))], "video_id string, bytes binary"
    )
    out = {r.frame: r.px_sum for r in frame_sample_tiles(vdf, every=2).collect()}
    assert out == {0: 0, 2: 16 * 20}
