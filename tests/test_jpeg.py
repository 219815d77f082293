"""Pure-python baseline JPEG codec (sparkcheck.jpeg) — real DCT path,
no PIL/libjpeg. Lossy, so round-trips assert error BOUNDS (exact for
per-block-flat images at high quality, small for smooth gradients,
dimension-exact always), plus structural properties: JFIF marker layout,
restart-interval resync, 4:2:0 MCU interleave, rejection of non-JPEG and
progressive payloads."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcheck.jpeg import decode_jpeg, encode_jpeg
from sparkcheck.media import decode_image


def _gradient(h, w, seed=0):
    """Smooth low-frequency image (fixed ABSOLUTE spatial frequency, so
    per-pixel change is gentle at any size): quantization error stays
    small for 4:4:4 and chroma averaging loses little for 4:2:0."""
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    phase = rng.uniform(0, np.pi, size=3)
    chans = [
        127.5 + 110 * np.sin(2 * np.pi * (xx + yy) / 64 + p)
        for p in phase
    ]
    return np.clip(np.round(np.stack(chans, axis=2)), 0, 255).astype(np.uint8)


def test_flat_blocks_near_exact():
    # constant 8x8 blocks: only the DC coefficient is nonzero, and at
    # quality 95 the DC quant step is small -> error <= 1 count
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 30, 100, 170, 240
    arr, w, h = decode_jpeg(encode_jpeg(img, quality=95))
    assert (w, h) == (16, 16) and arr.shape == (16, 16, 1)
    assert np.abs(arr[:, :, 0].astype(int) - img.astype(int)).max() <= 1


def test_rgb_gradient_bounded_error():
    img = _gradient(32, 48)
    arr, w, h = decode_jpeg(encode_jpeg(img, quality=92))
    assert (w, h) == (48, 32) and arr.shape == img.shape
    err = np.abs(arr.astype(float) - img.astype(float))
    assert err.mean() < 2.0 and err.max() <= 12


def test_subsampled_420_bounded_error():
    img = _gradient(32, 48, seed=1)
    arr, w, h = decode_jpeg(encode_jpeg(img, quality=92, subsample=True))
    assert (w, h) == (48, 32) and arr.shape == img.shape
    assert np.abs(arr.astype(float) - img.astype(float)).mean() < 4.0


def test_restart_markers_roundtrip():
    img = _gradient(24, 40, seed=2)
    base = decode_jpeg(encode_jpeg(img, quality=90))[0]
    for ri in (1, 2, 5):
        buf = encode_jpeg(img, quality=90, restart_interval=ri)
        assert b"\xff\xdd" in buf  # DRI segment present
        arr, w, h = decode_jpeg(buf)
        # restart markers change framing, not content
        assert np.array_equal(arr, base)


def test_decode_image_dispatches_jpeg():
    img = _gradient(16, 16, seed=3)
    feats = decode_image(encode_jpeg(img, quality=92), fake=False)
    assert feats["width"] == 16 and feats["height"] == 16
    luma = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ).mean() / 255.0
    assert abs(feats["mean_luma"] - luma) < 0.02


def test_rejects_non_jpeg_and_progressive():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    buf = bytearray(encode_jpeg(_gradient(8, 8), quality=90))
    sof = buf.find(b"\xff\xc0")
    buf[sof + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
    with pytest.raises(ValueError, match="non-baseline"):
        decode_jpeg(bytes(buf))


def test_marker_layout():
    buf = encode_jpeg(_gradient(8, 8), quality=90, subsample=True)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    for marker in (b"\xff\xe0", b"\xff\xdb", b"\xff\xc0", b"\xff\xc4",
                   b"\xff\xda"):
        assert marker in buf


# --- property-based bounds ---------------------------------------------------


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    gray=st.booleans(),
    subsample=st.booleans(),
    ri=st.integers(min_value=0, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_jpeg_dims_and_bound_property(h, w, gray, subsample, ri, seed):
    """Any size (incl. non-multiples of 8/16), any mode: dimensions exact,
    decoded pixels within the quantization envelope of the smooth input."""
    img = _gradient(h, w, seed=seed)
    if gray:
        img = img[:, :, :1]
    if gray and subsample:
        subsample = False  # 4:2:0 is chroma-only; gray has none
    buf = encode_jpeg(img, quality=92, subsample=subsample,
                      restart_interval=ri)
    arr, ww, hh = decode_jpeg(buf)
    assert (ww, hh) == (w, h)
    assert arr.shape == (h, w, 1 if gray else 3)
    err = np.abs(arr.astype(float) - img.astype(float))
    assert err.mean() < (5.0 if subsample else 3.0)


@settings(max_examples=15, deadline=None)
@given(
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    quality=st.integers(min_value=50, max_value=98),
)
def test_jpeg_noise_monotone_quality(seed, quality):
    """Even on iid noise (worst case for DCT coding) the decode is valid
    uint8 of the right shape and error is bounded by the quant tables."""
    img = np.random.RandomState(seed).randint(0, 256, (16, 24, 3), np.uint8)
    arr, w, h = decode_jpeg(encode_jpeg(img, quality=quality))
    assert (w, h) == (24, 16) and arr.dtype == np.uint8
    assert np.abs(arr.astype(float) - img.astype(float)).mean() < 40
