"""Pure-python JPEG codec (sparkcheck.jpeg) — real DCT path, no
PIL/libjpeg. Lossy, so round-trips assert error BOUNDS (exact for
per-block-flat images at high quality, small for smooth gradients,
dimension-exact always), plus structural properties: JFIF marker layout,
restart-interval resync, 4:2:0 MCU interleave, rejection of non-JPEG and
out-of-envelope payloads. Progressive (SOF2) coverage is DIFFERENTIAL:
both encoders share the quantized-coefficient front half, so a
progressive stream and its baseline twin must decode to bit-identical
pixels — the strongest possible oracle for the Annex-G scan machinery."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcheck.jpeg import decode_jpeg, encode_jpeg, encode_jpeg_progressive
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


def test_rejects_non_jpeg_and_unsupported_modes():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"\x89PNG\r\n\x1a\n")
    for sof in (0xC3, 0xC9, 0xCB):  # lossless, arithmetic, arith-lossless
        buf = bytearray(encode_jpeg(_gradient(8, 8), quality=90))
        buf[buf.find(b"\xff\xc0") + 1] = sof
        with pytest.raises(ValueError, match="unsupported"):
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
    # 4:2:0 on sub-MCU images is dominated by edge-padding in the 2x2
    # chroma mean (hypothesis found 1x2 px at 5.5); full blocks sit ~<4
    assert err.mean() < (6.0 if subsample else 3.0)


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


# --- progressive (SOF2) ------------------------------------------------------


def test_progressive_marker_layout():
    buf = encode_jpeg_progressive(_gradient(16, 24), quality=90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert b"\xff\xc2" in buf and b"\xff\xc0" not in buf
    # the default color script is 10 scans -> 10 SOS markers
    assert buf.count(b"\xff\xda") == 10


def test_progressive_equals_baseline_exact():
    """Both encoders quantize identical coefficients, so the progressive
    decode must be BIT-IDENTICAL to the baseline decode — this exercises
    every scan kind: interleaved+single-comp DC first/refine, AC first
    with EOB runs, and the AC refinement correction-bit walk."""
    for img, sub in [
        (_gradient(24, 33), False),
        (_gradient(37, 29, seed=4), True),
        (_gradient(16, 16)[:, :, :1], False),
        (np.random.RandomState(9).randint(0, 256, (21, 35, 3), np.uint8),
         True),
    ]:
        for q in (25, 90):
            base = decode_jpeg(encode_jpeg(img, quality=q, subsample=sub))
            prog = decode_jpeg(
                encode_jpeg_progressive(img, quality=q, subsample=sub)
            )
            assert base[1:] == prog[1:]
            assert np.array_equal(base[0], prog[0])


def test_progressive_custom_scan_script():
    """A minimal legal script (full-precision DC then one full AC band
    per component, no successive approximation) decodes identically."""
    img = _gradient(20, 28, seed=5)
    script = [
        ([0, 1, 2], 0, 0, 0, 0),
        ([0], 1, 63, 0, 0),
        ([1], 1, 63, 0, 0),
        ([2], 1, 63, 0, 0),
    ]
    base = decode_jpeg(encode_jpeg(img, quality=88))[0]
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=88, scans=script)
    )[0]
    assert np.array_equal(base, prog)
    with pytest.raises(ValueError, match="single-component"):
        encode_jpeg_progressive(
            img, scans=[([0, 1, 2], 0, 0, 0, 0), ([0, 1], 1, 63, 0, 0)]
        )


def test_progressive_truncated_stream_is_a_preview():
    """Cutting the stream after an early scan and appending EOI still
    decodes (never-transmitted coefficients are zero) with exact
    dimensions and a recognizably-similar image — the defining feature
    of progressive rendering."""
    img = _gradient(32, 48, seed=6)
    buf = encode_jpeg_progressive(img, quality=90)
    # keep the first 4 of 10 scans: truncate at the 5th SOS marker
    pos = 0
    for _ in range(5):
        pos = buf.find(b"\xff\xda", pos + 1)
    partial = buf[:pos] + b"\xff\xd9"
    arr, w, h = decode_jpeg(partial)
    assert (w, h) == (48, 32) and arr.shape == img.shape
    full = decode_jpeg(buf)[0]
    err_partial = np.abs(arr.astype(float) - img.astype(float)).mean()
    err_full = np.abs(full.astype(float) - img.astype(float)).mean()
    assert err_full <= err_partial  # refinement scans only improve it
    assert err_partial < 30  # coarse but recognizable


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=40),
    w=st.integers(min_value=1, max_value=40),
    gray=st.booleans(),
    subsample=st.booleans(),
    quality=st.integers(min_value=30, max_value=95),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_progressive_baseline_equivalence_property(
    h, w, gray, subsample, quality, seed
):
    """Any size/mode/quality: progressive decode == baseline decode,
    bit for bit (the two streams carry the same quantized coefficients)."""
    img = _gradient(h, w, seed=seed)
    if gray:
        img = img[:, :, :1]
        subsample = False
    base = decode_jpeg(encode_jpeg(img, quality=quality, subsample=subsample))
    prog = decode_jpeg(
        encode_jpeg_progressive(img, quality=quality, subsample=subsample)
    )
    assert base[1:] == prog[1:]
    assert np.array_equal(base[0], prog[0])


def test_decode_image_dispatches_progressive():
    img = _gradient(16, 16, seed=8)
    feats = decode_image(encode_jpeg_progressive(img, quality=92), fake=False)
    assert feats["width"] == 16 and feats["height"] == 16
