"""Pure-python video containers (sparkcheck.video): Y4M and AVI.

Round-trip strategy mirrors test_jpeg/test_gif: lossless paths (Y4M
Cmono, gray-through-C444, AVI raw DIB) assert EXACT equality; lossy
paths (MJPEG at quality 95 over flat 8x8 blocks, C420 chroma
decimation over flat color) assert the +-1 DC envelope. Decoder-only
paths (C422, frame params, dropped frames, bottom-up vs top-down DIB)
are exercised with hand-built streams, anchored by a byte-level
hand-written 1x1 Y4M fixture that validates header/frame parsing
independently of our encoder."""

from __future__ import annotations

import struct

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from sparkcheck.video import decode_avi, decode_y4m, encode_avi, encode_y4m

# two 1x1 mono frames, header and FRAME markers hand-written
FIX_Y4M_1PX = b"YUV4MPEG2 W1 H1 F25:1 Ip A1:1 Cmono\nFRAME\n\x7fFRAME\n\xff"


def test_hand_written_y4m_fixture():
    frames, w, h, fps = decode_y4m(FIX_Y4M_1PX)
    assert (w, h, fps) == (1, 1, (25, 1))
    assert [f[0, 0, 0] for f in frames] == [0x7F, 0xFF]
    assert all(np.array_equal(f[:, :, 0], f[:, :, 1]) for f in frames)


# ---------------------------------------------------------------------------
# Y4M
# ---------------------------------------------------------------------------


@settings(deadline=None, max_examples=25)
@given(
    st.integers(1, 24),
    st.integers(1, 24),
    st.integers(1, 4),
    st.integers(0, 2**32 - 1),
)
def test_y4m_mono_roundtrip_exact(w, h, n_frames, seed):
    rng = np.random.default_rng(seed)
    grays = [rng.integers(0, 256, size=(h, w), dtype=np.uint8) for _ in range(n_frames)]
    frames, ww, hh, fps = decode_y4m(encode_y4m(grays, fps=(30, 1), colorspace="mono"))
    assert (ww, hh, fps) == (w, h, (30, 1)) and len(frames) == n_frames
    for f, g in zip(frames, grays):
        assert np.array_equal(f, np.stack([g] * 3, axis=2))


def test_y4m_444_color_within_rounding():
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(15, 17, 3), dtype=np.uint8)
    frames, w, h, _ = decode_y4m(encode_y4m(img, colorspace="444"))
    assert (w, h) == (17, 15)
    assert np.abs(frames[0].astype(int) - img.astype(int)).max() <= 2


def test_y4m_gray_through_444_exact():
    """R=G=B pixels put Cb=Cr exactly at 128 and Y exactly at the gray
    level, so full-range C444 is lossless on grayscale content — the
    invariant the oracle query pins."""
    rng = np.random.default_rng(12)
    g = rng.integers(0, 256, size=(9, 7), dtype=np.uint8)
    img = np.stack([g] * 3, axis=2)
    frames, *_ = decode_y4m(encode_y4m(img, colorspace="444"))
    assert np.array_equal(frames[0], img)


def test_y4m_420jpeg_flat_color_roundtrip():
    img = np.zeros((8, 12, 3), dtype=np.uint8)
    img[:, :6] = (200, 30, 90)
    img[:, 6:] = (10, 180, 250)
    frames, *_ = decode_y4m(encode_y4m([img, img], colorspace="420jpeg"))
    # flat 2x2 blocks survive chroma averaging; only the block straddling
    # the color boundary may move, and our boundary is block-aligned
    assert np.abs(frames[1].astype(int) - img.astype(int)).max() <= 2


def test_y4m_422_decoder_only():
    """Hand-build a C422 stream (encoder doesn't emit it): flat color so
    horizontal chroma halving is exact."""
    w, h = 6, 4
    y = np.full((h, w), 120, dtype=np.uint8)
    cb = np.full((h, w // 2), 77, dtype=np.uint8)
    cr = np.full((h, w // 2), 200, dtype=np.uint8)
    buf = (
        b"YUV4MPEG2 W6 H4 F10:1 C422\nFRAME\n"
        + y.tobytes() + cb.tobytes() + cr.tobytes()
    )
    frames, ww, hh, fps = decode_y4m(buf)
    assert (ww, hh, fps) == (6, 4, (10, 1))
    rgb = [
        120 + 1.402 * (200 - 128.0),
        120 - 0.344136 * (77 - 128.0) - 0.714136 * (200 - 128.0),
        120 + 1.772 * (77 - 128.0),
    ]
    expected = np.clip(np.round(np.array(rgb)), 0, 255).astype(np.uint8)
    assert np.array_equal(frames[0], np.broadcast_to(expected, (h, w, 3)))


def test_y4m_frame_params_tolerated():
    buf = FIX_Y4M_1PX.replace(b"FRAME\n\x7f", b"FRAME Xtag\n\x7f")
    frames, *_ = decode_y4m(buf)
    assert frames[0][0, 0, 0] == 0x7F


def test_y4m_long_frame_params_tolerated():
    """Frame parameter lines are unbounded by spec — a 300-byte X-param
    must not be mistaken for lost sync."""
    tag = b"FRAME X" + b"p" * 300 + b"\n\x7f"
    buf = FIX_Y4M_1PX.replace(b"FRAME\n\x7f", tag)
    frames, *_ = decode_y4m(buf)
    assert frames[0][0, 0, 0] == 0x7F


def test_y4m_default_colorspace_is_420():
    """Spec default when C is absent is 420jpeg — plane size must follow."""
    y = np.full((2, 2), 50, dtype=np.uint8)
    buf = b"YUV4MPEG2 W2 H2 F1:1\nFRAME\n" + y.tobytes() + b"\x80\x80"
    frames, *_ = decode_y4m(buf)
    assert np.array_equal(frames[0], np.full((2, 2, 3), 50, dtype=np.uint8))


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"YUV4MPEG3 W1 H1\nFRAME\n\x00",
        b"YUV4MPEG2 W1 H1 Cmono\nFRAMX\n\x00",  # lost sync
        b"YUV4MPEG2 W1 H1 Cmono\nFRAME\n",  # truncated plane
        b"YUV4MPEG2 W0 H1 Cmono\nFRAME\n\x00",  # bad dims
        b"YUV4MPEG2 W1 H1 Cmono\n",  # zero frames
        b"YUV4MPEG2 W1 H1 C411\nFRAME\n\x00\x00",  # colorspace outside envelope
        b"YUV4MPEG2 W3 H3 C420\nFRAME\n" + b"\x00" * 12,  # odd dims under 420
        b"YUV4MPEG2 W1 H1 FQ:1 Cmono\nFRAME\n\x00",  # bad token
    ],
)
def test_y4m_refusals(bad):
    with pytest.raises(ValueError):
        decode_y4m(bad)


def test_y4m_encode_refusals():
    color = np.zeros((2, 2, 3), dtype=np.uint8)
    color[0, 0] = (1, 2, 3)
    with pytest.raises(ValueError, match="grayscale"):
        encode_y4m(color, colorspace="mono")
    with pytest.raises(ValueError, match="even"):
        encode_y4m(np.zeros((3, 3, 3), dtype=np.uint8), colorspace="420jpeg")
    with pytest.raises(ValueError, match="colorspaces"):
        encode_y4m(color, colorspace="422")
    with pytest.raises(ValueError, match="positive"):
        encode_y4m(color, fps=0)


# ---------------------------------------------------------------------------
# AVI
# ---------------------------------------------------------------------------


@settings(deadline=None, max_examples=20)
@given(
    st.integers(1, 16),
    st.integers(1, 16),
    st.integers(1, 4),
    st.integers(0, 2**32 - 1),
)
def test_avi_dib_roundtrip_exact(w, h, n_frames, seed):
    """Raw DIB is lossless, including odd widths where rows pad to a
    4-byte stride."""
    rng = np.random.default_rng(seed)
    frames_in = [
        rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8) for _ in range(n_frames)
    ]
    frames, ww, hh, fps = decode_avi(encode_avi(frames_in, fps=12, codec="dib"))
    assert (ww, hh, fps) == (w, h, (12, 1)) and len(frames) == n_frames
    for a, b in zip(frames, frames_in):
        assert np.array_equal(a, b)


def test_avi_mjpeg_flat_blocks_and_rational_fps():
    img = np.zeros((16, 16), dtype=np.uint8)
    img[:8, :8], img[:8, 8:], img[8:, :8], img[8:, 8:] = 40, 90, 160, 230
    buf = encode_avi([img, img, img], fps=(30000, 1001), quality=95)
    frames, w, h, fps = decode_avi(buf)
    assert (w, h, fps) == (16, 16, (30000, 1001)) and len(frames) == 3
    for f in frames:
        assert np.abs(f[:, :, 0].astype(int) - img.astype(int)).max() <= 1
        assert np.array_equal(f[:, :, 0], f[:, :, 1])


def test_avi_dropped_frames_skipped():
    """Zero-length 00dc chunks (dropped frames) don't break the walk."""
    img = np.full((4, 4, 3), 99, dtype=np.uint8)
    buf = bytearray(encode_avi([img, img], codec="dib"))
    movi_at = bytes(buf).find(b"movi")
    insert = b"00dc" + struct.pack("<I", 0)
    buf[movi_at + 4 : movi_at + 4] = insert
    # grow the movi LIST and RIFF sizes to cover the injected chunk
    for off in (movi_at - 4, 4):
        size = struct.unpack_from("<I", buf, off)[0]
        struct.pack_into("<I", buf, off, size + len(insert))
    frames, *_ = decode_avi(bytes(buf))
    assert len(frames) == 2 and np.array_equal(frames[0], img)


def test_avi_rec_list_grouping():
    """Interleaved AVIs wrap frame chunks in LIST 'rec ' groups — the
    collector recurses into them."""
    img = np.full((2, 2, 3), 7, dtype=np.uint8)
    plain = encode_avi(img, codec="dib")
    movi_at = plain.find(b"movi")
    movi_size = struct.unpack_from("<I", plain, movi_at - 4)[0]
    inner = plain[movi_at + 4 : movi_at + 4 + (movi_size - 4)]
    wrapped = b"LIST" + struct.pack("<I", 4 + len(inner)) + b"rec " + inner
    head = plain[:movi_at - 8]
    rebuilt_movi = b"LIST" + struct.pack("<I", 4 + len(wrapped)) + b"movi" + wrapped
    body = head[12:] + rebuilt_movi
    buf = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"AVI " + body
    frames, *_ = decode_avi(buf)
    assert len(frames) == 1 and np.array_equal(frames[0], img)


def test_avi_zeroed_strf_dims_fall_back_to_avih():
    """Some muxers zero BITMAPINFOHEADER dims; the avih main header is
    the fallback."""
    img = np.arange(3 * 4 * 3, dtype=np.uint8).reshape(3, 4, 3)
    buf = bytearray(encode_avi(img, codec="dib"))
    strf_at = bytes(buf).find(b"strf")
    struct.pack_into("<ii", buf, strf_at + 8 + 4, 0, 0)  # biWidth=biHeight=0
    frames, w, h, _ = decode_avi(bytes(buf))
    assert (w, h) == (4, 3)
    assert np.array_equal(frames[0], img)


def test_avi_top_down_dib():
    """Negative biHeight means top-down rows; hand-flip a bottom-up file."""
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    buf = bytearray(encode_avi(img, codec="dib"))
    strf_at = bytes(buf).find(b"strf")
    h_off = strf_at + 8 + 8  # strf fourcc+size, then biSize+biWidth
    (h_val,) = struct.unpack_from("<i", buf, h_off)
    struct.pack_into("<i", buf, h_off, -h_val)
    frames, *_ = decode_avi(bytes(buf))
    # same bytes now interpreted top-down = vertical flip of the original
    assert np.array_equal(frames[0], img[::-1])


def test_avi_skips_non_video_streams():
    """Real AVIs interleave an audio stream; the decoder must key frame
    chunks on the VIDEO stream's index (01dc when auds comes first) and
    ignore the audio stream's 00wb chunks."""
    img = np.full((2, 2, 3), 5, dtype=np.uint8)
    plain = bytearray(encode_avi(img, codec="dib"))
    # an auds strl: 56-byte strh (fccType='auds') + 16-byte WAVEFORMAT strf
    auds_strh = b"auds" + b"\x00" * 52
    auds_strl = (
        b"LIST"
        + struct.pack("<I", 4 + 8 + len(auds_strh) + 8 + 16)
        + b"strl"
        + b"strh" + struct.pack("<I", len(auds_strh)) + auds_strh
        + b"strf" + struct.pack("<I", 16) + b"\x00" * 16
    )
    # layout: RIFF(12) LIST-hdrl(8+4) avih(8+56) [insert here] strl...
    insert_at = 12 + 12 + 8 + 56
    buf = bytearray(bytes(plain).replace(b"00dc", b"01dc"))
    buf[insert_at:insert_at] = auds_strl
    # also drop an audio data chunk into movi, before the video frame
    movi_at = bytes(buf).find(b"movi")
    audio_chunk = b"00wb" + struct.pack("<I", 4) + b"\xaa\xbb\xcc\xdd"
    buf[movi_at + 4 : movi_at + 4] = audio_chunk
    # grow hdrl, movi, and RIFF sizes
    struct.pack_into(
        "<I", buf, 16, struct.unpack_from("<I", buf, 16)[0] + len(auds_strl)
    )
    new_movi_at = bytes(buf).find(b"movi")
    struct.pack_into(
        "<I", buf, new_movi_at - 4,
        struct.unpack_from("<I", buf, new_movi_at - 4)[0] + len(audio_chunk),
    )
    struct.pack_into(
        "<I", buf, 4,
        struct.unpack_from("<I", buf, 4)[0] + len(auds_strl) + len(audio_chunk),
    )
    frames, w, h, _ = decode_avi(bytes(buf))
    assert (w, h) == (2, 2) and len(frames) == 1
    assert np.array_equal(frames[0], img)


@pytest.mark.parametrize(
    "bad",
    [
        b"",
        b"RIFF\x08\x00\x00\x00WAVEfmt ",
        b"RIFF\x04\x00\x00\x00AVI ",  # no streams
    ],
)
def test_avi_refusals(bad):
    with pytest.raises(ValueError):
        decode_avi(bad)


def test_avi_foreign_fourcc_refused():
    img = np.zeros((4, 4), dtype=np.uint8)
    buf = encode_avi(img, codec="mjpg").replace(b"MJPG", b"H264")
    with pytest.raises(ValueError, match="outside envelope"):
        decode_avi(buf)


def test_avi_truncation_refused():
    img = np.zeros((8, 8), dtype=np.uint8)
    buf = encode_avi([img] * 3, codec="dib")
    movi_at = buf.find(b"movi")
    with pytest.raises(ValueError, match="truncated"):
        decode_avi(buf[: movi_at + 40])


def test_avi_encode_refusals():
    with pytest.raises(ValueError, match="codecs"):
        encode_avi(np.zeros((2, 2, 3), dtype=np.uint8), codec="h264")
    with pytest.raises(ValueError, match="one shape"):
        encode_avi(
            [np.zeros((2, 2, 3), dtype=np.uint8), np.zeros((3, 2, 3), dtype=np.uint8)]
        )
    with pytest.raises(ValueError, match="at least one"):
        encode_avi([])


# ---------------------------------------------------------------------------
# Cross-container agreement + media integration
# ---------------------------------------------------------------------------


def test_containers_agree_on_gray_frames():
    """The same gray frames through AVI/DIB, AVI/MJPEG(q95, flat), Y4M
    mono, and Y4M C444 decode to identical pixels (+-1 for MJPEG DC)."""
    levels = [17, 130, 244]
    frames_in = [np.full((8, 8), lv, dtype=np.uint8) for lv in levels]
    via_dib, *_ = decode_avi(encode_avi(frames_in, codec="dib"))
    via_mjpg, *_ = decode_avi(encode_avi(frames_in, codec="mjpg", quality=95))
    via_mono, *_ = decode_y4m(encode_y4m(frames_in, colorspace="mono"))
    via_444, *_ = decode_y4m(encode_y4m(frames_in, colorspace="444"))
    for lv, d, m, mo, c4 in zip(levels, via_dib, via_mjpg, via_mono, via_444):
        assert np.all(d == lv) and np.all(mo == lv) and np.all(c4 == lv)
        assert np.abs(m.astype(int) - lv).max() <= 1


def test_sniff_and_try_decode_cover_video():
    from sparkcheck.media import sniff_media, try_decode

    img = np.full((6, 6), 42, dtype=np.uint8)
    avi = encode_avi(img, codec="mjpg")
    y4m = encode_y4m(img, colorspace="mono")
    assert sniff_media(avi) == "avi" and try_decode(avi) == "avi"
    assert sniff_media(y4m) == "y4m" and try_decode(y4m) == "y4m"
    # format restriction still honored
    assert try_decode(avi, formats=["y4m"]) is None
    # corrupt-past-header: sniff accepts, full decode refuses
    chopped = avi[: len(avi) // 2]
    assert sniff_media(chopped, formats=["avi"]) == "avi"
    assert try_decode(chopped, formats=["avi"]) is None


def test_sample_frames_real_across_containers(spark):
    """media.sample_frames(fake=False) dispatches GIF / AVI / Y4M by
    magic and hashes composited RGB pixels identically: the same frames
    shipped as AVI/DIB and as Y4M mono yield identical digests."""
    import hashlib

    from sparkcheck.gif import encode_gif
    from sparkcheck.media import sample_frames

    frames_in = [np.full((4, 4), lv, dtype=np.uint8) for lv in (10, 20, 30, 40, 50)]
    avi = encode_avi(frames_in, codec="dib")
    y4m = encode_y4m(frames_in, colorspace="mono")
    gif = encode_gif([np.stack([f] * 3, axis=2) for f in frames_in])
    rows = [
        ("v_avi", "video", bytearray(avi)),
        ("v_y4m", "video", bytearray(y4m)),
        ("v_gif", "video", bytearray(gif)),
        ("img", "image", bytearray(b"\x00")),  # pruned by kind filter
    ]
    df = spark.createDataFrame(rows, "media_ref string, kind string, media_bytes binary")
    out = sample_frames(df, every_n=2, fake=False).toPandas()
    got = {
        ref: g.sort_values("frame_index")["frame_digest"].tolist()
        for ref, g in out.groupby("media_ref")
    }
    expected = [
        hashlib.sha256(np.stack([frames_in[i]] * 3, axis=2).tobytes()).hexdigest()
        for i in (0, 2, 4)
    ]
    assert got["v_avi"] == expected
    assert got["v_y4m"] == expected
    assert got["v_gif"] == expected
    assert set(got) == {"v_avi", "v_y4m", "v_gif"}


# ---------------------------------------------------------------------------
# Sniff-only formats (mp4, mp3): structural header walks with NO decoder
# ---------------------------------------------------------------------------


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + typ + payload


def _tkhd(w: int, h: int, version: int = 0) -> bytes:
    if version == 0:
        body = bytes([0, 0, 0, 7]) + b"\x00" * 72
    else:
        body = bytes([1, 0, 0, 7]) + b"\x00" * 84
    return _box(b"tkhd", body + struct.pack(">II", w << 16, h << 16))


FTYP = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")


def test_mp4_sniff_faststart_and_trailer_layouts():
    from sparkcheck.media import sniff_media

    moov = _box(b"moov", _box(b"trak", _tkhd(640, 360)))
    mdat = _box(b"mdat", b"\x00" * 32)
    assert sniff_media(FTYP + moov + mdat) == "mp4"  # faststart
    assert sniff_media(FTYP + mdat + moov) == "mp4"  # moov at EOF
    # size=0 box (runs to EOF) before a trailing moov
    eof_mdat = struct.pack(">I", 0) + b"mdat" + b"\x00" * 8
    assert sniff_media(FTYP + moov + eof_mdat) == "mp4"


def test_mp4_sniff_skips_audio_track_and_reads_v1():
    from sparkcheck.media import _sniff_mp4  # noqa: PLC2701

    moov = _box(
        b"moov",
        _box(b"trak", _tkhd(0, 0))  # audio track: 0x0 dims
        + _box(b"trak", _tkhd(1920, 1080, version=1)),
    )
    assert _sniff_mp4(FTYP + moov + _box(b"mdat", b"")) == (1920, 1080)


def test_mp4_sniff_refusals():
    from sparkcheck.media import _sniff_mp4  # noqa: PLC2701

    moov = _box(b"moov", _box(b"trak", _tkhd(64, 48)))
    for bad in (
        b"",
        b"\x00" * 16,  # no ftyp
        FTYP,  # no moov
        FTYP + _box(b"moov", _box(b"trak", _tkhd(0, 0))),  # no video track
        (FTYP + moov)[:-6],  # truncated box
    ):
        with pytest.raises(ValueError):
            _sniff_mp4(bad)


def _mp3_frame(pad: bytes = b"") -> bytes:
    # MPEG1 layer III, 128 kbps, 44100 Hz, stereo: frame length 417
    hdr = bytes([0xFF, 0xFB, 0x90, 0x00])
    return hdr + b"\x00" * (417 - 4) + pad


def test_mp3_sniff_plain_and_id3():
    from sparkcheck.media import _sniff_mp3, sniff_media  # noqa: PLC2701

    two = _mp3_frame(_mp3_frame())
    assert _sniff_mp3(two) == (44100, 2)
    assert sniff_media(two) == "mp3"
    id3 = b"ID3\x04\x00\x00\x00\x00\x00\x0a" + b"\x00" * 10 + two
    assert _sniff_mp3(id3) == (44100, 2)
    # ID3v2.4 footer flag adds 10 trailing bytes to skip
    id3f = b"ID3\x04\x00\x10\x00\x00\x00\x0a" + b"\x00" * 20 + two
    assert _sniff_mp3(id3f) == (44100, 2)
    # short buffer that can't reach the second frame still sniffs
    assert _sniff_mp3(_mp3_frame()[:100]) == (44100, 2)


def test_mp3_sniff_refusals():
    from sparkcheck.media import _sniff_mp3  # noqa: PLC2701

    for bad in (
        b"",
        b"\xff\xfb",  # truncated header
        b"\xff\xeb\x90\x00" + b"\x00" * 100,  # reserved version
        b"\xff\xfd\x90\x00" + b"\x00" * 100,  # layer II, not III
        b"\xff\xfb\xf0\x00" + b"\x00" * 100,  # bad bitrate index
        b"\xff\xfb\x9c\x00" + b"\x00" * 100,  # reserved sample rate
        _mp3_frame(b"\x00\x00\x00\x00"),  # second sync missing
        b"ID3\x04\x00\x00\x00\x00\x00",  # truncated ID3 tag
    ):
        with pytest.raises(ValueError):
            _sniff_mp3(bad)


def test_sniff_only_formats_rejected_for_full_decode():
    from sparkcheck.media import try_decode

    moov = _box(b"moov", _box(b"trak", _tkhd(2, 2)))
    mp4 = FTYP + moov
    # unrestricted full decode: mp4 simply isn't decodable
    assert try_decode(mp4) is None
    with pytest.raises(ValueError, match="sniff-only"):
        try_decode(mp4, formats=["mp4"])
    with pytest.raises(ValueError, match="sniff-only"):
        try_decode(b"\x00", formats=["png", "mp3"])


def test_media_decodable_header_mode_accepts_sniff_only(spark):
    """check="header" with formats=["mp4"] really sniffs: a structurally
    valid mp4 passes, garbage fails. (Full mode's loud sniff-only
    rejection is asserted in test_coverage_ops.)"""
    from sparkcheck import (
        ExpectationConfiguration,
        ExpectationSuite,
        validate_df,
    )

    moov = _box(b"moov", _box(b"trak", _tkhd(320, 240)))
    df = spark.createDataFrame(
        [("ok", bytearray(FTYP + moov)), ("bad", bytearray(b"not a video"))],
        "ref string, payload binary",
    )
    suite = ExpectationSuite(
        "t",
        [
            ExpectationConfiguration.from_dict(
                {
                    "expectation_type": (
                        "expect_column_values_to_be_media_decodable"
                    ),
                    "kwargs": {
                        "column": "payload",
                        "formats": ["mp4"],
                        "check": "header",
                    },
                }
            )
        ],
    )
    r = validate_df(df, suite)["results"][0]
    assert not r["success"]
    assert r["result"]["unexpected_count"] == 1


def test_video_features_logic_cross_container():
    """_video_features_one really decodes all three containers; frames
    with identical pixels produce identical sha256 digests regardless
    of container, and luma/fps/duration follow the container math."""
    from sparkcheck.gif import encode_gif
    from sparkcheck.media import _video_features_one  # noqa: PLC2701

    frames = [np.full((4, 4), v, dtype=np.uint8) for v in (0, 128, 255)]
    avi = _video_features_one(
        encode_avi(frames, fps=(30, 1), codec="dib"), fake=False
    )
    assert avi["container"] == "avi" and avi["n_frames"] == 3
    assert (avi["width"], avi["height"]) == (4, 4)
    assert abs(avi["fps"] - 30.0) < 1e-12
    assert abs(avi["duration_s"] - 0.1) < 1e-12
    assert abs(avi["mean_luma"] - (0 + 128 + 255) / 3 / 255.0) < 1e-12
    y4m = _video_features_one(
        encode_y4m(frames, fps=(30, 1), colorspace="mono"), fake=False
    )
    gif = _video_features_one(
        encode_gif([np.stack([f] * 3, axis=2) for f in frames],
                   delays_cs=[10, 10, 10]),
        fake=False,
    )
    assert y4m["digest"] == avi["digest"] == gif["digest"]
    assert gif["container"] == "gif"
    assert abs(gif["duration_s"] - 0.3) < 1e-12 and abs(gif["fps"] - 10.0) < 1e-12
    # fake path stays deterministic and decode-free
    fk = _video_features_one(b"\x00" * 64, fake=True)
    assert fk["container"] == "fake" and fk["n_frames"] == 2


def test_video_features_stage(spark):
    """The mapInPandas stage: kind pruning, real decode, feature rows."""
    from sparkcheck.media import video_features

    frames = [np.full((4, 4), v, dtype=np.uint8) for v in (10, 20)]
    df = spark.createDataFrame(
        [
            ("v1", "video", bytearray(encode_avi(frames, fps=5, codec="dib"))),
            ("v2", "video", bytearray(encode_y4m(frames, colorspace="mono"))),
            ("i1", "image", bytearray(b"\x00")),  # pruned by kind
        ],
        "media_ref string, kind string, media_bytes binary",
    )
    out = {r["media_ref"]: r.asDict() for r in video_features(df, fake=False).collect()}
    assert set(out) == {"v1", "v2"}
    assert out["v1"]["container"] == "avi" and out["v1"]["fps"] == 5.0
    assert out["v2"]["container"] == "y4m"
    assert out["v1"]["digest"] == out["v2"]["digest"]
    assert abs(out["v1"]["mean_luma"] - 15 / 255.0) < 1e-12
