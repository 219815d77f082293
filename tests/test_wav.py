"""Pure-python WAV decode (media.decode_wav) — real codec, no ffmpeg."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from sparkcheck.media import decode_audio, decode_wav, encode_wav


def _sine(n=4000, rate=16000, ch=2):
    t = np.arange(n) / rate
    left = (np.sin(2 * np.pi * 440 * t) * 20000).astype("<i2")
    chans = [left] + [(np.sin(2 * np.pi * 220 * t) * 10000).astype("<i2")] * (ch - 1)
    return np.stack(chans, axis=1)


def test_roundtrip_16bit_stereo():
    arr = _sine()
    samples, rate = decode_wav(encode_wav(arr, 16000))
    assert rate == 16000
    assert samples.shape == (4000, 2)
    assert np.allclose(samples, arr.astype(np.float64) / 32768.0)


def test_decode_audio_features():
    arr = _sine(n=8000, rate=8000, ch=1)
    feats = decode_audio(encode_wav(arr, 8000), fake=False)
    assert feats["sample_rate"] == 8000
    assert feats["n_channels"] == 1
    assert feats["n_samples"] == 8000
    assert abs(feats["duration_s"] - 1.0) < 1e-12
    want_rms = float(np.sqrt(((arr.astype(np.float64) / 32768.0) ** 2).mean()))
    assert abs(feats["rms"] - want_rms) < 1e-12


def test_8bit_wav():
    # hand-build an 8-bit unsigned mono WAV
    vals = np.array([0, 64, 128, 192, 255], np.uint8)
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(vals)) + vals.tobytes()
            + b"\x00")  # odd data chunk is word-padded
    buf = b"RIFF" + struct.pack("<I", len(body)) + body
    samples, rate = decode_wav(buf)
    assert rate == 8000
    assert np.allclose(samples[:, 0], (vals.astype(np.float64) - 128) / 128)


def _wav(fmt_fields: bytes, data: bytes) -> bytes:
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt_fields))
            + fmt_fields + b"data" + struct.pack("<I", len(data)) + data
            + (b"\x00" if len(data) & 1 else b""))
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_24_and_32bit_int_wav():
    # 24-bit packed triads, sign-extended: full-scale +, -, mid values
    triads = b"".join(
        int(v & 0xFFFFFF).to_bytes(3, "little")
        for v in [0x7FFFFF, -0x800000, 0, 0x400000, -0x400000]
    )
    fmt = struct.pack("<HHIIHH", 1, 1, 16000, 16000 * 3, 3, 24)
    samples, rate = decode_wav(_wav(fmt, triads))
    assert rate == 16000
    expect = np.array([0x7FFFFF, -0x800000, 0, 0x400000, -0x400000],
                      np.float64) / (1 << 23)
    assert np.allclose(samples[:, 0], expect)
    # 32-bit int stereo
    vals = np.array([[1 << 30, -(1 << 30)], [0, -(1 << 31)]], "<i4")
    fmt = struct.pack("<HHIIHH", 1, 2, 8000, 8000 * 8, 8, 32)
    samples, _ = decode_wav(_wav(fmt, vals.tobytes()))
    assert np.allclose(samples, vals.astype(np.float64) / (1 << 31))


def test_float_and_extensible_wav():
    # IEEE float32 (format 3)
    vals = np.array([0.5, -1.0, 0.25, 0.0], "<f4")
    fmt = struct.pack("<HHIIHH", 3, 1, 44100, 44100 * 4, 4, 32)
    samples, rate = decode_wav(_wav(fmt, vals.tobytes()))
    assert rate == 44100 and np.allclose(samples[:, 0], vals)
    # float64
    vals64 = np.array([0.125, -0.75], "<f8")
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 8000 * 8, 8, 64)
    samples, _ = decode_wav(_wav(fmt, vals64.tobytes()))
    assert np.allclose(samples[:, 0], vals64)
    # WAVE_FORMAT_EXTENSIBLE wrapping integer PCM 16-bit: fmt chunk gains
    # cbSize + valid bits + channel mask + SubFormat GUID (PCM = 1)
    ivals = np.array([1000, -2000, 32767], "<i2")
    guid = (1).to_bytes(2, "little") + b"\x00\x00" + bytes(
        [0x00, 0x00, 0x10, 0x00, 0x80, 0x00, 0x00, 0xAA,
         0x00, 0x38, 0x9B, 0x71]
    )
    fmt = (struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
           + struct.pack("<HHI", 22, 16, 0x4) + guid)
    samples, _ = decode_wav(_wav(fmt, ivals.tobytes()))
    assert np.allclose(samples[:, 0], ivals.astype(np.float64) / 32768.0)


def test_rejects_unsupported():
    with pytest.raises(ValueError, match="not a RIFF"):
        decode_wav(b"OggS....")
    # ADPCM (format 2) still refuses
    fmt = struct.pack("<HHIIHH", 2, 1, 8000, 4000, 1, 4)
    with pytest.raises(ValueError, match="integer/float PCM"):
        decode_wav(_wav(fmt, b"\x00" * 4))
    # float at a depth float PCM doesn't define
    fmt = struct.pack("<HHIIHH", 3, 1, 8000, 16000, 2, 16)
    with pytest.raises(ValueError, match="float PCM unsupported"):
        decode_wav(_wav(fmt, b"\x00" * 4))
    with pytest.raises(NotImplementedError):
        decode_audio(b"ID3\x04mp3-ish-bytes", fake=False)


def test_audio_features_distributed(spark):
    from pyspark.sql import functions as F

    from sparkcheck.media import audio_features

    rows = []
    for i in range(6):
        arr = (_sine(n=1000 + 100 * i, rate=8000, ch=1) // (i + 1)).astype("<i2")
        rows.append((f"wav{i}", "audio", bytearray(encode_wav(arr, 8000))))
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, media_bytes binary"
    ).withColumn("content_type", F.lit("audio/wav")).withColumn(
        "n_bytes", F.length("media_bytes").cast("long")
    )
    got = {r.media_ref: r for r in audio_features(media, fake=False).collect()}
    assert len(got) == 6
    for i in range(6):
        assert got[f"wav{i}"].n_samples == 1000 + 100 * i
        assert got[f"wav{i}"].sample_rate == 8000


# --- property-based round-trips (no Spark) ---------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    n=st.integers(min_value=1, max_value=2000),
    ch=st.integers(min_value=1, max_value=4),
    rate=st.sampled_from([8000, 16000, 44100]),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_wav_roundtrip_property(n, ch, rate, seed):
    arr = np.random.RandomState(seed).randint(-32768, 32768, (n, ch)).astype("<i2")
    samples, got_rate = decode_wav(encode_wav(arr, rate))
    assert got_rate == rate
    assert samples.shape == (n, ch)
    assert np.allclose(samples, arr.astype(np.float64) / 32768.0)
