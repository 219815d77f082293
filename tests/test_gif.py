"""Pure-python GIF codec (sparkcheck.gif). GIF is lossless over indexed
color, so round-trips assert EXACT pixel equality — including the LZW
table-reset path (>4096 entries), width bumps, animation with per-frame
delays, and the 256-color ceiling. Decoder-only paths (interlace,
transparency, disposal methods, local color tables) are exercised with
hand-built streams, anchored by a byte-level hand-verified 1x1 fixture
that validates the LZW bit order independently of our encoder."""

from __future__ import annotations

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcheck.gif import decode_gif, encode_gif
from sparkcheck.gif import _lzw_encode  # noqa: PLC2701 — stream builder for decoder-only paths

# 1x1 white pixel, LZW bits hand-checked (clear=4, pixel 0, EOI=5 packed
# LSB-first into 0x44 0x01), GCT = [white, black]
FIX_1PX = (
    b"GIF89a\x01\x00\x01\x00\x80\x00\x00"
    b"\xff\xff\xff\x00\x00\x00"
    b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    b"\x2c\x00\x00\x00\x00\x01\x00\x01\x00\x00"
    b"\x02\x02\x44\x01\x00\x3b"
)


def _subblocks(data: bytes) -> bytes:
    out = bytearray()
    for off in range(0, len(data), 255):
        chunk = data[off : off + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def test_hand_verified_fixture():
    frames, w, h, delays = decode_gif(FIX_1PX)
    assert (w, h) == (1, 1) and delays == [0]
    assert frames[0][0, 0].tolist() == [255, 255, 255]


def test_still_roundtrip_exact():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 4, size=(13, 17), dtype=np.uint8) * 80
    frames, w, h, delays = decode_gif(encode_gif(img))
    assert (w, h) == (17, 13) and delays == [0]
    assert np.array_equal(frames[0], np.stack([img] * 3, axis=2))


def test_256_color_and_table_reset_roundtrip():
    """Noisy 256-color image large enough that the LZW table passes 4096
    entries repeatedly: width bumps 9->12 and mid-stream clears both
    round-trip exactly."""
    rng = np.random.default_rng(5)
    pal = np.unique(rng.integers(0, 256, size=(300, 3), dtype=np.uint8), axis=0)[:256]
    img = pal[rng.integers(0, len(pal), size=(300, 400))]
    frames, w, h, _ = decode_gif(encode_gif(img))
    assert (w, h) == (400, 300)
    assert np.array_equal(frames[0], img)


def test_animated_roundtrip_with_delays():
    rng = np.random.default_rng(7)
    pal = np.unique(rng.integers(0, 256, size=(64, 3), dtype=np.uint8), axis=0)
    idx = rng.integers(0, len(pal), size=(40, 50))
    anim = [pal[(idx + i) % len(pal)] for i in range(5)]
    buf = encode_gif(anim, delays_cs=[7, 8, 9, 10, 11])
    assert b"NETSCAPE2.0" in buf  # loop extension on animations
    frames, w, h, delays = decode_gif(buf)
    assert len(frames) == 5 and delays == [7, 8, 9, 10, 11]
    for a, b in zip(anim, frames):
        assert np.array_equal(a, b)


def test_rejects_non_gif_and_too_many_colors():
    with pytest.raises(ValueError, match="signature"):
        decode_gif(b"\x89PNG\r\n\x1a\n")
    with pytest.raises(ValueError, match="truncated"):
        decode_gif(FIX_1PX[:20])
    arr = np.zeros((20, 20, 3), np.uint8)
    arr[..., 0] = np.arange(400).reshape(20, 20) % 256
    arr[..., 1] = np.arange(400).reshape(20, 20) // 256 * 37
    with pytest.raises(ValueError, match="256"):
        encode_gif(arr)


def test_interlaced_decode():
    """Hand-build an interlaced stream: rows stored in 4-pass order with
    the interlace flag set must decode back to natural row order."""
    rng = np.random.default_rng(9)
    idx = rng.integers(0, 4, size=(16, 8)).astype(np.uint8)
    pal = np.array([[0, 0, 0], [255, 0, 0], [0, 255, 0], [0, 0, 255]], np.uint8)
    pass_rows = [r for s, p in ((0, 8), (4, 8), (2, 4), (1, 2)) for r in range(s, 16, p)]
    stored = idx[pass_rows]
    out = bytearray(b"GIF89a" + (8).to_bytes(2, "little") + (16).to_bytes(2, "little"))
    out.append(0x80 | 0x01)  # GCT, 4 entries
    out += b"\x00\x00" + pal.tobytes()
    out += b"\x2c\x00\x00\x00\x00" + (8).to_bytes(2, "little") + (16).to_bytes(2, "little")
    out.append(0x40)  # interlaced, no LCT
    out.append(2)  # LZW min code size
    out += _subblocks(_lzw_encode(2, stored.reshape(-1).astype(np.int64)))
    out.append(0x3B)
    frames, w, h, _ = decode_gif(bytes(out))
    assert (w, h) == (8, 16)
    assert np.array_equal(frames[0], pal[idx])


def test_transparency_and_disposal_compositing():
    """Two frames: frame 2 is a 2x2 sub-rectangle with a transparent
    index and a local color table; disposal=2 then restores the patch to
    the background color for a third frame's canvas. Checks the full
    composite pipeline (GCE state, LCT, transparency mask, disposal)."""
    gpal = np.array([[10, 20, 30], [200, 0, 0]], np.uint8)
    lpal = np.array([[0, 0, 99], [0, 99, 0]], np.uint8)
    f1 = np.ones((4, 4), np.uint8)  # all global color 1
    out = bytearray(b"GIF89a" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little"))
    out.append(0x80)  # GCT, 2 entries
    out += b"\x00\x00" + gpal.tobytes()
    # frame 1: full canvas, no GCE
    out += b"\x2c\x00\x00\x00\x00" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
    out += b"\x00\x02" + _subblocks(_lzw_encode(2, f1.reshape(-1).astype(np.int64)))
    # frame 2: GCE disposal=2, transparent index 1, delay 5; 2x2 at (1,1)
    # with LCT; pixels [[0, 1], [1, 0]] -> index-1 cells keep frame 1
    out += b"\x21\xf9\x04" + bytes([(2 << 2) | 1]) + (5).to_bytes(2, "little") + b"\x01\x00"
    out += b"\x2c" + (1).to_bytes(2, "little") + (1).to_bytes(2, "little")
    out += (2).to_bytes(2, "little") + (2).to_bytes(2, "little")
    out.append(0x80)  # LCT, 2 entries
    out += lpal.tobytes()
    out += b"\x02" + _subblocks(_lzw_encode(2, np.array([0, 1, 1, 0], np.int64)))
    # frame 3: full canvas again so the post-disposal canvas is observable
    out += b"\x2c\x00\x00\x00\x00" + (4).to_bytes(2, "little") + (4).to_bytes(2, "little")
    out += b"\x00\x02" + _subblocks(_lzw_encode(2, np.zeros(16, np.int64)))
    out.append(0x3B)

    frames, w, h, delays = decode_gif(bytes(out))
    assert len(frames) == 3 and delays == [0, 5, 0]
    assert np.array_equal(frames[0], gpal[f1])
    exp2 = gpal[f1].copy()
    exp2[1, 1] = lpal[0]  # opaque local-palette pixel
    exp2[2, 2] = lpal[0]
    # (1,2) and (2,1) were transparent index 1 -> frame 1 shows through
    assert np.array_equal(frames[1], exp2)
    assert np.array_equal(frames[2], np.broadcast_to(gpal[0], (4, 4, 3)))


def test_decode_image_and_sample_frames_dispatch():
    from sparkcheck.media import decode_image

    rng = np.random.default_rng(11)
    img = rng.integers(0, 3, size=(12, 15), dtype=np.uint8) * 100
    feats = decode_image(encode_gif(img), fake=False)
    assert feats["width"] == 15 and feats["height"] == 12
    expected_luma = float(np.mean(img)) / 255.0  # gray: R=G=B
    assert abs(feats["mean_luma"] - expected_luma) < 1e-9


def test_sample_frames_real_gif(spark):
    """sample_frames(fake=False) over animated-GIF video rows: fan-out
    one row per sampled frame, digests are sha256 of REAL composited
    pixels (twin stills re-derive them), other containers refuse."""
    import hashlib

    from pyspark.sql import types as T

    from sparkcheck.media import sample_frames

    rng = np.random.default_rng(13)
    pal = np.unique(rng.integers(0, 256, size=(16, 3), dtype=np.uint8), axis=0)
    rows, expected = [], {}
    for r in range(3):
        frames = [
            pal[rng.integers(0, len(pal), size=(10, 12))] for _ in range(6)
        ]
        rows.append((f"v{r}", "video", bytearray(encode_gif(frames))))
        expected[f"v{r}"] = {
            i: hashlib.sha256(frames[i].tobytes()).hexdigest()
            for i in range(0, 6, 2)
        }
    schema = T.StructType([
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),
        T.StructField("media_bytes", T.BinaryType()),
    ])
    media = spark.createDataFrame(rows, schema)
    got = sample_frames(media, every_n=2, fake=False).collect()
    assert len(got) == 9  # 3 rows x frames {0, 2, 4}
    for row in got:
        assert expected[row.media_ref][row.frame_index] == row.frame_digest

    bad = spark.createDataFrame(
        [("x", "video", bytearray(b"\x00\x00\x00 ftypmp42"))], schema
    )
    with pytest.raises(Exception, match="ffmpeg"):
        sample_frames(bad, fake=False).collect()


@settings(max_examples=20, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    ncolors=st.integers(min_value=1, max_value=256),
    nframes=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_gif_roundtrip_property(h, w, ncolors, nframes, seed):
    """Any size, palette size, frame count: encode->decode is the
    identity on pixels, dims, and frame count."""
    rng = np.random.default_rng(seed)
    pal = np.unique(
        rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8), axis=0
    )
    frames_in = [pal[rng.integers(0, len(pal), size=(h, w))] for _ in range(nframes)]
    frames, ww, hh, _ = decode_gif(encode_gif(frames_in))
    assert (ww, hh) == (w, h) and len(frames) == nframes
    for a, b in zip(frames_in, frames):
        assert np.array_equal(a, b)
