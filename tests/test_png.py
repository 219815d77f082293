"""Pure-python PNG decode (media.decode_png) — real codec, no PIL."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from sparkcheck.media import PNG_SIG, decode_image, decode_png, encode_png


def _rng_img(h, w, c, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(h, w, c), dtype=np.uint8)


@pytest.mark.parametrize("c", [1, 2, 3, 4])
def test_roundtrip_all_channel_counts(c):
    img = _rng_img(13, 17, c)
    arr, w, h = decode_png(encode_png(img))
    assert (w, h) == (17, 13)
    assert np.array_equal(arr, img)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data)) + typ + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Assemble a PNG whose scanline y uses filters[y], applying the
    FORWARD filter here so decode must invert it."""
    h, w, c = img.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    flat = img.reshape(h, w * c).astype(np.int16)
    stride = w * c
    raw = b""
    prev = np.zeros(stride, np.int16)
    for y in range(h):
        cur = flat[y]
        f = filters[y]
        out = np.zeros(stride, np.int16)
        for x in range(stride):
            a = int(cur[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) // 2
            else:
                q = a + b - cc
                pa, pb, pc = abs(q - a), abs(q - b), abs(q - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out[x] = (int(cur[x]) - pred) % 256
        raw += bytes([f]) + out.astype(np.uint8).tobytes()
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        PNG_SIG + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )


def test_all_five_filters_invert():
    img = _rng_img(10, 9, 3, seed=42)
    buf = _png_with_filters(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0])
    arr, w, h = decode_png(buf)
    assert np.array_equal(arr, img)


def test_palette_expansion():
    h, w = 6, 5
    idx = _rng_img(h, w, 1, seed=3) % 4
    palette = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], np.uint8
    )
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(h))
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 3, 0, 0, 0)
    buf = (
        PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"PLTE", palette.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw)) + _chunk(b"IEND", b"")
    )
    arr, _, _ = decode_png(buf)
    assert np.array_equal(arr, palette[idx[:, :, 0]])


def test_rejects_unsupported():
    img = _rng_img(4, 4, 3)
    buf = bytearray(encode_png(img))
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"JUNK" + bytes(buf))
    # a lying depth byte (16 on an 8-bit stream) breaks the stream
    # layout loudly; an illegal depth value is rejected at the header
    bad = bytearray(buf)
    bad[24] = 16
    with pytest.raises(ValueError, match="IDAT length mismatch"):
        decode_png(bytes(bad))
    bad = bytearray(buf)
    bad[24] = 3
    with pytest.raises(ValueError, match="illegal PNG depth"):
        decode_png(bytes(bad))
    # flipping the interlace byte alone lies about the stream layout: the
    # seven-pass walk misreads pixel bytes as filter bytes or runs out of
    # IDAT — either way a loud ValueError, never silent garbage
    bad = bytearray(buf)
    bad[28] = 1
    with pytest.raises(ValueError, match="filter byte|IDAT length mismatch"):
        decode_png(bytes(bad))
    # unknown interlace method
    bad = bytearray(buf)
    bad[28] = 2
    with pytest.raises(ValueError, match="interlace method"):
        decode_png(bytes(bad))


def test_adam7_interlace_roundtrip():
    """Adam7 PNGs decode bit-exactly: every color type, odd dims (empty
    late-pass rows/cols), and sub-8px images where most passes are empty."""
    import numpy as np

    rng = np.random.default_rng(11)
    for shape in [(16, 16, 3), (7, 5, 1), (33, 17, 4), (1, 1, 3),
                  (8, 64, 2), (9, 9, 3), (2, 3, 1), (5, 1, 3)]:
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        buf = encode_png(img, interlace=True)
        assert bytes(buf)[28 + 0:29] != b"\x00"  # IHDR interlace byte set
        arr, w, h = decode_png(buf)
        assert (w, h) == (shape[1], shape[0])
        assert np.array_equal(arr, img), shape


def _build_png(w, h, bitd, color, scanlines, plte=None, filters=None):
    """Hand-built PNG stream (arbitrary depth/filters) — validates the
    decoder independently of our own encoder."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bitd, color, 0, 0, 0)
    raw = b"".join(
        bytes([filters[y] if filters else 0]) + scanlines[y] for y in range(h)
    )
    out = b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
    if plte is not None:
        out += chunk(b"PLTE", plte)
    return out + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b"")


def test_png_16bit_and_subbyte_depths():
    """Every legal depth decodes: 16-bit keeps the high byte, sub-byte
    gray scales to full range, sub-byte palette indexes the PLTE, and the
    filter bpp distance is the 16-bit pixel width (byte-wise filters)."""
    # 16-bit gray 2x2
    arr, w, h = decode_png(_build_png(
        2, 2, 16, 0, [b"\x01\x02\xff\x00", b"\x80\x81\x00\x01"]))
    assert (w, h) == (2, 2) and arr[:, :, 0].tolist() == [[1, 255], [128, 0]]
    # 16-bit RGB with filter 1: deltas are taken 6 bytes back (bpp=6)
    row = bytes([0x11, 0, 0x22, 0, 0x33, 0, 0x10, 0, 0x20, 0, 0x30, 0])
    deltas = row[:6] + bytes((row[6 + i] - row[i]) & 0xFF for i in range(6))
    arr, _, _ = decode_png(_build_png(2, 1, 16, 2, [deltas], filters=[1]))
    assert arr[0, 0].tolist() == [0x11, 0x22, 0x33]
    assert arr[0, 1].tolist() == [0x10, 0x20, 0x30]
    # 1-bit gray 10x2 (scanline padding bits ignored)
    arr, _, _ = decode_png(_build_png(
        10, 2, 1, 0,
        [bytes([0b10101010, 0b10000000]), bytes([0b11111000, 0b00000000])]))
    assert arr[0, :, 0].tolist() == [255, 0] * 5
    assert arr[1, :, 0].tolist() == [255] * 5 + [0] * 5
    # 2-bit gray scales 0..3 -> 0,85,170,255
    arr, _, _ = decode_png(_build_png(5, 1, 2, 0, [bytes([0b00011011, 0])]))
    assert arr[0, :, 0].tolist() == [0, 85, 170, 255, 0]
    # 4-bit palette
    plte = bytes([10, 20, 30, 40, 50, 60, 70, 80, 90])
    arr, _, _ = decode_png(_build_png(3, 1, 4, 3, [b"\x20\x10"], plte=plte))
    assert arr[0].tolist() == [[70, 80, 90], [10, 20, 30], [40, 50, 60]]
    # illegal depth/type combination refuses loudly
    with pytest.raises(ValueError, match="illegal PNG depth"):
        decode_png(_build_png(2, 1, 2, 2, [b"\x00"]))


def test_png_palette_trns_alpha():
    """tRNS on a palette PNG expands to RGBA: per-entry alpha from the
    chunk, 255 for entries past its end."""
    import struct
    import zlib

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    plte = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255])
    trns = bytes([0, 128])  # entry0 transparent, entry1 half, entry2 -> 255
    raw = b"\x00" + bytes([0, 1, 2])  # one row, indices 0,1,2 (8-bit)
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 3, 1, 8, 3, 0, 0, 0))
        + chunk(b"PLTE", plte)
        + chunk(b"tRNS", trns)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )
    arr, w, h = decode_png(buf)
    assert arr.shape == (1, 3, 4)
    assert arr[0].tolist() == [
        [255, 0, 0, 0], [0, 255, 0, 128], [0, 0, 255, 255]
    ]


def test_decode_image_real_png_path():
    img = _rng_img(8, 8, 3, seed=1)
    feats = decode_image(encode_png(img), fake=False)
    assert (feats["width"], feats["height"]) == (8, 8)
    expect = (
        0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
    ).mean() / 255.0
    assert abs(feats["mean_luma"] - expect) < 1e-9


def test_image_features_over_real_pngs(spark):
    from pyspark.sql import functions as F

    from sparkcheck.media import image_features

    rows = [
        (f"png{i}", "image", bytearray(encode_png(_rng_img(6, 6, 3, seed=i))))
        for i in range(12)
    ]
    media = spark.createDataFrame(
        rows, "media_ref string, kind string, media_bytes binary"
    ).withColumn("content_type", F.lit("image/png")).withColumn(
        "n_bytes", F.length("media_bytes").cast("long")
    )
    out = image_features(media, fake=False)
    got = {r.media_ref: r for r in out.collect()}
    assert len(got) == 12
    for i in range(12):
        img = _rng_img(6, 6, 3, seed=i)
        expect = (
            0.299 * img[:, :, 0] + 0.587 * img[:, :, 1] + 0.114 * img[:, :, 2]
        ).mean() / 255.0
        assert abs(got[f"png{i}"].mean_luma - expect) < 1e-9


# --- property-based round-trips (no Spark) ---------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=1, max_value=24),
    w=st.integers(min_value=1, max_value=24),
    c=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
)
def test_png_roundtrip_property(h, w, c, seed):
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), np.uint8)
    arr, ww, hh = decode_png(encode_png(img))
    assert (ww, hh) == (w, h)
    assert np.array_equal(arr, img)


@settings(max_examples=30, deadline=None)
@given(
    h=st.integers(min_value=2, max_value=12),
    w=st.integers(min_value=2, max_value=12),
    c=st.integers(min_value=1, max_value=4),
    seed=st.integers(min_value=0, max_value=2**31 - 1),
    data=st.data(),
)
def test_png_arbitrary_filters_property(h, w, c, seed, data):
    filters = data.draw(
        st.lists(st.integers(0, 4), min_size=h, max_size=h)
    )
    img = np.random.RandomState(seed).randint(0, 256, (h, w, c), np.uint8)
    arr, _, _ = decode_png(_png_with_filters(img, filters))
    assert np.array_equal(arr, img)
