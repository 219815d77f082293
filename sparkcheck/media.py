"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns plus typed metadata — the
engine never interprets bytes on the JVM side. Decode / feature-extract /
resize / frame-sample run as Arrow-batched ``mapInPandas`` stages: bytes
cross to Python once per Arrow batch (not per row), are processed
vectorized, and only the (small) features come back.

Real pure-python codecs (no PIL/ffmpeg in this container): PPM/PGM,
8-bit PNG, baseline + progressive JPEG, and GIF images
(``decode_ppm``/``decode_png``/``jpeg.decode_jpeg``/``gif.decode_gif``
— animated GIF composites real frames, so ``sample_frames`` has a real
path too), integer-PCM RIFF/WAVE audio (``decode_wav``). For every
OTHER format ``decode_image``/
``decode_audio`` raise NotImplementedError unless ``fake=True``, in which
case a deterministic fake decoder (derived from the byte content) stands
in so the Spark-side plumbing — schema, batch shape, partitioning — is
real and testable end-to-end.

Scale notes: media rows are huge (media_bytes dominates); the stages
therefore (a) select only the columns they need before the Python hop
(column pruning keeps the Arrow transfer minimal), (b) repartition by a
byte-size budget rather than row count when batches would blow the Arrow
limit, and (c) never collect payloads to the driver.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("media_bytes", T.BinaryType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("digest", T.StringType()),  # sha256 of the payload
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame_digest", T.StringType()),
    ]
)


def _fake_image_decode(buf: bytes) -> dict[str, Any]:
    """Deterministic fake decoder: dimensions/luma derived from the sha256
    digest of the bytes (sha256, not sha1, so the DuckDB oracle can
    recompute the same features in SQL). Replace with PIL in production —
    same signature, same downstream schema."""
    d = hashlib.sha256(buf).digest()
    return {
        "width": 64 + d[0] % 192,
        "height": 64 + d[1] % 192,
        "mean_luma": d[2] / 255.0,
        "digest": hashlib.sha256(buf).hexdigest(),
    }


def decode_ppm(buf: bytes):
    """REAL decode for binary PPM (P6) / PGM (P5) images — pure
    numpy, no codec library. Returns (array[h, w, c], width, height).
    Raises ValueError for other formats."""
    import numpy as np  # noqa: PLC0415

    if not buf.startswith((b"P6", b"P5")):
        raise ValueError("not a binary PPM/PGM payload")
    channels = 3 if buf.startswith(b"P6") else 1
    # header: magic, width, height, maxval — whitespace/comment separated
    tokens, i = [], 2
    while len(tokens) < 3:
        while i < len(buf) and buf[i : i + 1].isspace():
            i += 1
        if buf[i : i + 1] == b"#":  # comment line
            while i < len(buf) and buf[i : i + 1] != b"\n":
                i += 1
            continue
        j = i
        while j < len(buf) and not buf[j : j + 1].isspace():
            j += 1
        tokens.append(int(buf[i:j]))
        i = j
    i += 1  # single whitespace after maxval
    width, height, maxval = tokens
    if maxval > 255:
        raise ValueError("16-bit PPM unsupported")
    n = width * height * channels
    arr = np.frombuffer(buf, dtype=np.uint8, count=n, offset=i)
    return arr.reshape(height, width, channels), width, height


PNG_SIG = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}  # color type -> raw channels


#: Adam7 pass grid: (x0, y0, dx, dy) per pass, PNG spec 8.2 — passes 4
#: and 6 start at y=0 (they fill the odd COLUMNS of already-started rows)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def _png_unfilter(raw: bytes, p: int, stride: int, h: int, bpp: int):
    """Unfilter one filtered sub-image of ``h`` scanlines × ``stride``
    BYTES starting at offset ``p`` in the decompressed stream. ``bpp`` is
    the filter unit in bytes (max(1, bit_depth * channels // 8) per
    spec — filters are byte-wise at every depth, with the 'left
    neighbor' ``bpp`` bytes back). Returns ((h, stride) array, offset
    after the sub-image)."""
    import numpy as np  # noqa: PLC0415

    if len(raw) - p < h * (stride + 1):
        raise ValueError("PNG IDAT length mismatch")
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f = raw[p]
        cur = np.frombuffer(raw, np.uint8, stride, p + 1).copy()
        p += 1 + stride
        if f == 0:
            pass
        elif f == 2:  # Up: uint8 addition wraps mod 256, as the spec wants
            cur += prev
        elif f in (1, 3, 4):
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                if f == 1:
                    cur[x] = (int(cur[x]) + a) & 0xFF
                elif f == 3:
                    cur[x] = (int(cur[x]) + (a + int(prev[x])) // 2) & 0xFF
                else:
                    b = int(prev[x])
                    c = int(prev[x - bpp]) if x >= bpp else 0
                    q = a + b - c
                    pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    cur[x] = (int(cur[x]) + pred) & 0xFF
        else:
            raise ValueError(f"bad PNG filter byte {f}")
        out[y] = cur
        prev = cur
    return out, p


def _png_expand_scanlines(
    out, w: int, channels: int, bitd: int, is_palette: bool
):
    """(h, stride_bytes) unfiltered scanlines -> (h, w, channels) uint8.
    16-bit samples keep their high byte (8-bit output contract); 1/2/4-bit
    samples unpack MSB-first and gray scales by 255/(2^d - 1) while
    palette indices stay raw for the PLTE lookup."""
    import numpy as np  # noqa: PLC0415

    h = out.shape[0]
    if bitd == 8:
        return out[:, : w * channels].reshape(h, w, channels)
    if bitd == 16:
        pairs = out[:, : w * channels * 2].reshape(h, w * channels, 2)
        return pairs[:, :, 0].reshape(h, w, channels)  # high byte
    # sub-byte depths: gray (type 0) or palette (type 3), one channel
    bits = np.unpackbits(out, axis=1)
    per = bits[:, : w * bitd].reshape(h, w, bitd)
    vals = np.zeros((h, w), np.uint8)
    for b in range(bitd):
        vals = (vals << 1) | per[:, :, b]
    if not is_palette:
        vals = (vals.astype(np.uint16) * 255 // ((1 << bitd) - 1)).astype(
            np.uint8
        )
    return vals.reshape(h, w, 1)


def decode_png(buf: bytes):
    """REAL decode for PNG at EVERY legal bit depth — stdlib zlib +
    numpy, no codec library. Color types 0 (gray: 1/2/4/8/16-bit),
    2 (RGB: 8/16), 3 (palette: 1/2/4/8), 4 (gray+alpha: 8/16),
    6 (RGBA: 8/16); all five scanline filters (byte-wise with the
    spec's bpp left-neighbor distance); BOTH interlace methods (none
    and Adam7 — each of the seven passes unfilters as its own
    sub-image, then scatters onto the x0::dx / y0::dy grid). Returns
    (array[h, w, c] uint8, width, height): 16-bit samples keep the high
    byte, sub-byte gray scales to full range, palette images come back
    expanded to RGB. Raises ValueError on a non-PNG payload or an
    illegal depth/type combination.

    Filters 1/3/4 (Sub/Average/Paeth) are defined recursively on the left
    neighbor, so their unfilter loop is sequential per scanline (pure
    Python); filters 0/2 vectorize. This is a correctness-first decoder
    for modest images — at bulk-decode scale swap in PIL/opencv inside the
    same mapInPandas stage; the Spark-side plumbing is identical.
    """
    import struct
    import zlib

    import numpy as np  # noqa: PLC0415

    if buf[:8] != PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, plte, trns = 8, [], None, None
    w = h = color = None
    interlace = 0
    while pos + 8 <= len(buf):
        ln = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + ln]
        pos += 12 + ln
        if typ == b"IHDR":
            w, h, bitd, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            legal = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
                     4: (8, 16), 6: (8, 16)}
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unknown PNG color type {color}")
            if bitd not in legal[color]:
                raise ValueError(
                    f"illegal PNG depth {bitd} for color type {color}"
                )
            if interlace not in (0, 1):
                raise ValueError(f"unknown PNG interlace method {interlace}")
        elif typ == b"PLTE":
            plte = np.frombuffer(data, np.uint8).reshape(-1, 3)
        elif typ == b"tRNS":
            trns = np.frombuffer(data, np.uint8)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    channels = _PNG_CHANNELS[color]
    raw = zlib.decompress(b"".join(idat))
    bpp = max(1, bitd * channels // 8)

    def scan_bytes(width: int) -> int:
        return -(-(width * bitd * channels) // 8)

    if interlace:
        grid = np.zeros((h, w, channels), np.uint8)
        p = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = -(-(w - x0) // dx) if w > x0 else 0
            ph = -(-(h - y0) // dy) if h > y0 else 0
            if pw == 0 or ph == 0:
                continue
            sub, p = _png_unfilter(raw, p, scan_bytes(pw), ph, bpp)
            grid[y0::dy, x0::dx] = _png_expand_scanlines(
                sub, pw, channels, bitd, color == 3
            )
        if p != len(raw):
            raise ValueError("PNG IDAT length mismatch")
        arr = grid
    else:
        out, p = _png_unfilter(raw, 0, scan_bytes(w), h, bpp)
        if p != len(raw):
            raise ValueError("PNG IDAT length mismatch")
        arr = _png_expand_scanlines(out, w, channels, bitd, color == 3)
    if color == 3:
        if plte is None:
            raise ValueError("palette PNG missing PLTE")
        idxs = arr[:, :, 0]
        if trns is not None:
            # palette transparency: per-entry alpha, 255 past tRNS's end
            alpha_lut = np.full(len(plte), 255, np.uint8)
            alpha_lut[: min(len(trns), len(plte))] = trns[: len(plte)]
            arr = np.concatenate(
                [plte[idxs], alpha_lut[idxs][:, :, None]], axis=2
            )
        else:
            arr = plte[idxs]
    return arr, w, h


def encode_png(arr, interlace: bool = False) -> bytes:
    """Minimal PNG encoder (filter 0 scanlines, one IDAT) for uint8 arrays
    shaped [h, w, c] with c in {1, 2, 3, 4} — the synthesis counterpart of
    ``decode_png`` so tests can round-trip real PNG bytes without PIL.
    ``interlace=True`` writes Adam7 (seven filter-0 sub-images in pass
    order), exercising the decoder's scatter path."""
    import struct
    import zlib

    import numpy as np  # noqa: PLC0415

    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    h, w, c = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[c]

    def chunk(typ: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, int(interlace))
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            if sub.shape[0] == 0 or sub.shape[1] == 0:
                continue
            parts.extend(
                b"\x00" + sub[y].tobytes() for y in range(sub.shape[0])
            )
        raw = b"".join(parts)
    else:
        raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    return (
        PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _luma_of(arr) -> float:
    if arr.shape[2] >= 3:  # RGB / RGBA: alpha ignored
        return float(
            (
                0.299 * arr[:, :, 0]
                + 0.587 * arr[:, :, 1]
                + 0.114 * arr[:, :, 2]
            ).mean()
            / 255.0
        )
    return float(arr[:, :, 0].mean()) / 255.0  # gray / gray+alpha


def decode_image(buf: bytes, fake: bool = False) -> dict[str, Any]:
    """Image features. PPM/PGM, 8-bit PNG, JPEG (baseline + progressive),
    and GIF decodes are REAL (stdlib zlib + numpy — see jpeg.py / gif.py
    for the envelopes; a multi-frame GIF reports its first composited
    frame); other formats need PIL/opencv (not in this container) unless
    fake=True."""
    if not fake:
        try:
            arr, width, height = decode_ppm(buf)
        except ValueError:
            try:
                arr, width, height = decode_png(buf)
            except ValueError:
                try:
                    from .jpeg import decode_jpeg

                    arr, width, height = decode_jpeg(buf)
                except ValueError:
                    try:
                        from .gif import decode_gif

                        frames, width, height, _ = decode_gif(buf)
                        arr = frames[0]
                    except ValueError as e:
                        raise NotImplementedError(
                            "non-PPM/PNG/JPEG/GIF decode requires "
                            "PIL/opencv — not installed; pass fake=True "
                            "for the deterministic stand-in"
                        ) from e
        return {
            "width": width,
            "height": height,
            "mean_luma": _luma_of(arr),
            "digest": hashlib.sha256(buf).hexdigest(),
        }
    return _fake_image_decode(buf)


#: real codecs available to try_decode, in sniff order; each entry is
#: (format name, decode callable) — decode raises ValueError on bytes
#: outside its envelope
def _decoders():
    from .gif import decode_gif  # noqa: PLC0415
    from .jpeg import decode_jpeg  # noqa: PLC0415
    from .video import decode_avi, decode_y4m  # noqa: PLC0415

    return {
        "ppm": decode_ppm,
        "png": decode_png,
        "jpeg": decode_jpeg,
        "gif": decode_gif,
        "wav": decode_wav,
        "avi": decode_avi,
        "y4m": decode_y4m,
    }


def _sniff_ppm(buf: bytes):
    if buf[:2] not in (b"P5", b"P6"):
        raise ValueError("not PPM/PGM")
    # header: magic, whitespace/comments, width, height, maxval
    toks, i, n = [], 2, len(buf)
    while len(toks) < 3 and i < n:
        c = buf[i : i + 1]
        if c == b"#":
            while i < n and buf[i] not in (10, 13):
                i += 1
        elif c.isspace():
            i += 1
        else:
            j = i
            while j < n and not buf[j : j + 1].isspace():
                j += 1
            toks.append(buf[i:j])
            i = j
    if len(toks) < 3:
        raise ValueError("truncated PPM header")
    w, h, maxval = (int(t) for t in toks)
    if not (0 < w and 0 < h and 0 < maxval < 65536):
        raise ValueError("bad PPM header values")
    return w, h


def _sniff_png(buf: bytes):
    if buf[:8] != b"\x89PNG\r\n\x1a\n":
        raise ValueError("not PNG")
    if len(buf) < 33 or buf[12:16] != b"IHDR":
        raise ValueError("PNG missing IHDR")
    w = int.from_bytes(buf[16:20], "big")
    h = int.from_bytes(buf[20:24], "big")
    if not (0 < w < 2**31 and 0 < h < 2**31):
        raise ValueError("bad PNG dimensions")
    return w, h


def _sniff_jpeg(buf: bytes):
    # marker walk to any SOF without touching entropy data
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not JPEG")
    pos, n = 2, len(buf)
    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("JPEG marker sync lost")
        marker = buf[pos + 1]
        if marker in (0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
            pos += 2
            continue
        seglen = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        if seglen < 2 or pos + 2 + seglen > n:
            raise ValueError("truncated JPEG segment")
        if marker in (0xC0, 0xC1, 0xC2):  # baseline/extended/progressive
            body = buf[pos + 4 : pos + 2 + seglen]
            if len(body) < 5 or body[0] != 8:
                raise ValueError("unsupported JPEG precision")
            h = int.from_bytes(body[1:3], "big")
            w = int.from_bytes(body[3:5], "big")
            if w == 0 or h == 0:
                raise ValueError("bad JPEG dimensions")
            return w, h
        if marker == 0xDA:
            break  # SOS before SOF
        pos += 2 + seglen
    raise ValueError("no JPEG SOF marker")


def _sniff_gif(buf: bytes):
    if len(buf) < 13 or buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        raise ValueError("not GIF")
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    if w == 0 or h == 0:
        raise ValueError("bad GIF dimensions")
    return w, h


def _sniff_wav(buf: bytes):
    if len(buf) < 44 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not WAV")
    if buf[12:16] != b"fmt ":
        raise ValueError("WAV missing fmt chunk")
    rate = int.from_bytes(buf[24:28], "little")
    if rate == 0:
        raise ValueError("bad WAV sample rate")
    return rate, int.from_bytes(buf[22:24], "little")


def _sniff_avi(buf: bytes):
    # RIFF walk to the avih main header without touching frame data
    if len(buf) < 24 or buf[:4] != b"RIFF" or buf[8:12] != b"AVI ":
        raise ValueError("not AVI")
    pos, n = 12, len(buf)
    while pos + 8 <= n:
        fourcc = buf[pos : pos + 4]
        size = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        if fourcc == b"LIST" and buf[pos + 8 : pos + 12] == b"hdrl":
            body = buf[pos + 12 : pos + 8 + size]
            if body[:4] != b"avih" or len(body) < 48:
                raise ValueError("AVI missing avih")
            w = int.from_bytes(body[40:44], "little")
            h = int.from_bytes(body[44:48], "little")
            if w == 0 or h == 0:
                raise ValueError("bad AVI dimensions")
            return w, h
        pos += 8 + size + (size & 1)
    raise ValueError("AVI missing hdrl")


def _sniff_y4m(buf: bytes):
    if not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not Y4M")
    eol = buf.find(b"\n", 0, 2048)
    if eol < 0:
        raise ValueError("truncated Y4M header")
    w = h = 0
    for tok in buf[9:eol].split():
        if tok[:1] == b"W":
            w = int(tok[1:])
        elif tok[:1] == b"H":
            h = int(tok[1:])
    if w <= 0 or h <= 0:
        raise ValueError("Y4M header missing W/H")
    return w, h


def _mp4_find_tkhd(buf: bytes, pos: int, end: int):
    """Walk moov's children for trak/tkhd; return the first nonzero
    (width, height) — audio tracks carry 0x0 and are skipped."""
    while pos + 8 <= end:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > end:
                break
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        if size < hdr or pos + size > end:
            raise ValueError("truncated MP4 box")
        if typ == b"trak":
            got = _mp4_find_tkhd(buf, pos + hdr, pos + size)
            if got is not None:
                return got
        elif typ == b"tkhd":
            body = buf[pos + hdr : pos + size]
            if not body:
                raise ValueError("empty tkhd")
            off = 88 if body[0] == 1 else 76  # version 1 widens 3 times
            if len(body) < off + 8:
                raise ValueError("short tkhd")
            w = int.from_bytes(body[off : off + 4], "big") >> 16
            h = int.from_bytes(body[off + 4 : off + 8], "big") >> 16
            if w and h:
                return w, h
            return None  # 0x0: audio/other track
        pos += size
    return None


def _sniff_mp4(buf: bytes):
    """SNIFF-ONLY (no decoder): ISO-BMFF box walk — ftyp first, then
    moov -> trak -> tkhd for the video track's 16.16 fixed-point
    dimensions. moov commonly sits at the END of the file; payload
    columns hold whole files, so both faststart and trailer layouts
    parse."""
    if len(buf) < 12 or buf[4:8] != b"ftyp":
        raise ValueError("not MP4 (no ftyp)")
    pos, n = 0, len(buf)
    while pos + 8 <= n:
        size = int.from_bytes(buf[pos : pos + 4], "big")
        typ = buf[pos + 4 : pos + 8]
        hdr = 8
        if size == 1:
            if pos + 16 > n:
                raise ValueError("truncated MP4 box")
            size = int.from_bytes(buf[pos + 8 : pos + 16], "big")
            hdr = 16
        elif size == 0:  # box runs to EOF
            size = n - pos
        if size < hdr or pos + size > n:
            raise ValueError("truncated MP4 box")
        if typ == b"moov":
            dims = _mp4_find_tkhd(buf, pos + hdr, pos + size)
            if dims is not None:
                return dims
        pos += size
    raise ValueError("MP4 missing moov/tkhd video dimensions")


# MPEG audio bitrate (kbps) and sample-rate tables, MPEG1/2 layer III
_MP3_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
_MP3_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
_MP3_RATES = {3: (44100, 48000, 32000), 2: (22050, 24000, 16000), 0: (11025, 12000, 8000)}


def _sniff_mp3(buf: bytes):
    """SNIFF-ONLY (no decoder): skip an ID3v2 tag (syncsafe size), then
    validate an MPEG-1/2/2.5 layer-III frame header — sync bits, legal
    version/layer/bitrate/samplerate — and require a SECOND frame sync
    at the computed frame length (when the buffer reaches it), which
    kills the false-positive rate of bare 0xFFE syncs in random bytes.
    Returns (sample_rate, channels)."""
    pos, n = 0, len(buf)
    if buf[:3] == b"ID3":
        if n < 10:
            raise ValueError("truncated ID3 tag")
        tag = (buf[6] << 21) | (buf[7] << 14) | (buf[8] << 7) | buf[9]
        pos = 10 + tag + (10 if buf[5] & 0x10 else 0)  # footer flag

    def frame_at(p: int):
        if p + 4 > n:
            raise ValueError("truncated MP3 frame header")
        b1, b2, b3, b4 = buf[p : p + 4]
        if b1 != 0xFF or (b2 & 0xE0) != 0xE0:
            raise ValueError("no MP3 frame sync")
        version = (b2 >> 3) & 3  # 3=MPEG1, 2=MPEG2, 0=MPEG2.5, 1=reserved
        layer = (b2 >> 1) & 3  # 1 = layer III
        if version == 1 or layer != 1:
            raise ValueError("not a layer-III frame")
        br_idx = b3 >> 4
        sr_idx = (b3 >> 2) & 3
        if br_idx in (0, 15) or sr_idx == 3:
            raise ValueError("free-form/bad MP3 bitrate or sample rate")
        table = _MP3_BITRATES_V1 if version == 3 else _MP3_BITRATES_V2
        bitrate = table[br_idx] * 1000
        rate = _MP3_RATES[version][sr_idx]
        padding = (b3 >> 1) & 1
        per_frame = 144 if version == 3 else 72  # samples/8 per frame
        flen = per_frame * bitrate // rate + padding
        channels = 1 if (b4 >> 6) & 3 == 3 else 2
        return rate, channels, flen

    rate, channels, flen = frame_at(pos)
    nxt = pos + flen
    if nxt + 2 <= n and not (
        buf[nxt] == 0xFF and (buf[nxt + 1] & 0xE0) == 0xE0
    ):
        raise ValueError("MP3 second frame sync missing")
    return rate, channels


_SNIFFERS = {
    "ppm": _sniff_ppm,
    "png": _sniff_png,
    "jpeg": _sniff_jpeg,
    "gif": _sniff_gif,
    "wav": _sniff_wav,
    "avi": _sniff_avi,
    "y4m": _sniff_y4m,
    "mp4": _sniff_mp4,
    "mp3": _sniff_mp3,
}

#: formats with a structural header sniff but NO pure-python decoder
#: (h264/aac entropy decode needs ffmpeg): valid for check="header",
#: rejected loudly for check="full" rather than silently failing rows
SNIFF_ONLY_FORMATS = frozenset({"mp4", "mp3"})


def validate_media_formats(formats: list[str] | None) -> list[str] | None:
    """Driver-side validation of a ``formats`` kwarg — one place for the
    accepted-format set and the error message, shared by try_decode,
    sniff_media, and the media_decodable expectation."""
    if formats is None:
        return None
    formats = list(formats)
    unknown = [f for f in formats if f not in _SNIFFERS]
    if unknown:
        raise ValueError(
            f"unknown media formats {unknown}; known: {sorted(_SNIFFERS)}"
        )
    return formats


def _probe(buf: bytes, formats: list[str] | None, registry) -> str | None:
    """Try each format's probe callable until one accepts the payload;
    ANY exception means "not this format" — truncated/corrupt payloads
    can raise whatever the codec's guts hit first (zlib.error,
    struct.error, Index/KeyError past a lying header)."""
    if buf is None:
        return None
    names = validate_media_formats(formats) or list(registry)
    b = bytes(buf)
    for name in names:
        try:
            registry[name](b)
            return name
        except Exception:  # noqa: BLE001 — every failure means the same thing
            continue
    return None


def sniff_media(buf: bytes, formats: list[str] | None = None) -> str | None:
    """Header-only media check: magic bytes + a structural header walk
    (PNG IHDR, JPEG marker walk to SOF, GIF logical screen, PPM token
    scan, RIFF/WAVE fmt, RIFF/AVI walk to avih, Y4M header parse) with
    NO entropy/pixel decode — O(header) per
    payload instead of O(bytes). The 100 TB fast path: catches wrong
    format, lying magics, and nonsense dimensions; misses corruption
    past the header (that's ``try_decode``'s job). Returns the format
    name or None."""
    return _probe(buf, formats, _SNIFFERS)


def try_decode(buf: bytes, formats: list[str] | None = None) -> str | None:
    """Attempt a REAL decode of ``buf`` against the pure-python codecs
    (ppm/pgm, png, jpeg incl. progressive, gif incl. animated, wav,
    avi with MJPG/DIB video, y4m); returns the format name that
    decoded, or None. ``formats`` restricts
    which codecs count (e.g. ["png", "jpeg"] for an image-only column).
    This is a full decode, not a magic-byte sniff — truncated or corrupt
    payloads with intact headers return None. Sniff-only formats
    (mp4, mp3 — no pure-python decoder exists) are rejected eagerly
    with ValueError rather than silently failing every payload; use
    sniff_media for those."""
    reject_sniff_only(validate_media_formats(formats))
    return _probe(buf, formats, _decoders())


def reject_sniff_only(formats: list[str] | None) -> None:
    """Raise if ``formats`` asks a FULL decode for a sniff-only format —
    one driver-callable guard shared by try_decode and the
    media_decodable expectation, so the loud-failure contract (never
    silently mark every mp4/mp3 row unexpected) lives in one place."""
    if not formats:
        return
    sniff_only = sorted(set(formats) & SNIFF_ONLY_FORMATS)
    if sniff_only:
        raise ValueError(
            f"formats {sniff_only} are sniff-only (no pure-python "
            "decoder exists); run them with check='header' / sniff_media"
        )


def resize_image(buf: bytes, out_w: int, out_h: int) -> bytes:
    """Nearest-neighbor resize of a PPM/PGM payload — numpy-only, the real
    transform for the one codec-free format; interpolating resizes belong
    to the PIL-backed production decoder."""
    import numpy as np  # noqa: PLC0415

    arr, w, h = decode_ppm(buf)
    ys = (np.arange(out_h) * h // out_h).astype(np.int64)
    xs = (np.arange(out_w) * w // out_w).astype(np.int64)
    out = arr[ys][:, xs]
    magic = b"P6" if arr.shape[2] == 3 else b"P5"
    header = b"%s\n%d %d\n255\n" % (magic, out_w, out_h)
    return header + out.tobytes()


def image_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched image feature extraction via mapInPandas: one Python
    hop per batch; input pruned to (media_ref, media_bytes) before the hop."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_image(b, fake=fake) for b in pdf["media_bytes"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_ref", pdf["media_ref"].values)
            yield out

    pruned = media.where(F.col("kind") == "image").select("media_ref", "media_bytes")
    return pruned.mapInPandas(extract, schema=IMAGE_FEATURES_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10, fake: bool = True) -> DataFrame:
    """Frame sampling for video rows: emits 0..k rows per input row (the
    mapInPandas contract allows fan-out). With ``fake=False``, payloads
    REALLY decode — animated GIF (gif.py: LZW + disposal compositing),
    AVI with MJPG/DIB codecs (video.py: RIFF walk + per-frame JPEG), and
    Y4M (video.py: planar YCbCr) — and each sampled row's digest is the
    sha256 of that frame's composited RGB pixels; other containers
    (mp4/webm/...) need ffmpeg and raise. The fake path derives a
    deterministic frame count from the payload size so non-decodable
    plumbing stays testable end-to-end."""

    def _decode_frames(buf: bytes):
        # dispatch on magic so each codec sees only its own container
        b = bytes(buf)
        if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
            from .video import decode_avi

            return decode_avi(b)[0]
        if b[:9] == b"YUV4MPEG2":
            from .video import decode_y4m

            return decode_y4m(b)[0]
        from .gif import decode_gif

        return decode_gif(b)[0]

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            refs, idxs, hashes = [], [], []
            for ref, buf in zip(pdf["media_ref"], pdf["media_bytes"]):
                if not fake:
                    try:
                        frames = _decode_frames(buf)
                    except ValueError as e:
                        raise NotImplementedError(
                            "real frame sampling covers animated GIF, "
                            "AVI (MJPG/DIB), and Y4M; other containers "
                            "require ffmpeg"
                        ) from e
                    for i in range(0, len(frames), every_n):
                        refs.append(ref)
                        idxs.append(i)
                        hashes.append(
                            hashlib.sha256(frames[i].tobytes()).hexdigest()
                        )
                    continue
                n_frames = max(1, len(buf) // 32)
                for i in range(0, n_frames, every_n):
                    refs.append(ref)
                    idxs.append(i)
                    hashes.append(
                        hashlib.sha256(buf + i.to_bytes(4, "big")).hexdigest()
                    )
            yield pd.DataFrame(
                {"media_ref": refs, "frame_index": idxs, "frame_digest": hashes}
            )

    pruned = media.where(F.col("kind") == "video").select("media_ref", "media_bytes")
    return pruned.mapInPandas(sample, schema=FRAME_SAMPLE_SCHEMA)


def media_integrity_violations(media: DataFrame) -> DataFrame:
    """Native (JVM-only) integrity checks on the media table — no Python:
    byte length mismatch, unknown kind, empty payload. Returns violation
    rows (media_ref, expectation, observed_value)."""
    checks = [
        (
            "expect_media_bytes_length_to_match_meta",
            (F.length(F.col("media_bytes")) != F.col("n_bytes")),
            F.length(F.col("media_bytes")).cast("string"),
        ),
        (
            "expect_media_kind_known",
            ~F.col("kind").isin("image", "audio", "video"),
            F.col("kind"),
        ),
        (
            "expect_media_payload_nonempty",
            F.col("media_bytes").isNull() | (F.length("media_bytes") == 0),
            F.lit("empty"),
        ),
    ]
    parts = [
        media.where(cond).select(
            "media_ref",
            F.lit(name).alias("expectation"),
            obs.alias("observed_value"),
        )
        for name, cond, obs in checks
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def synth_ppm_media(spark, n_rows: int = 64) -> DataFrame:
    """Deterministic REAL P6 (PPM) image table — valid payloads the
    codec-free decode path can actually parse. Built distributed via
    mapInPandas (numpy per Arrow batch, pixels derived from the row id)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np  # noqa: PLC0415

        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                w, h = 8 + int(i) % 24, 8 + (int(i) // 3) % 24
                rng_base = np.arange(w * h * 3, dtype=np.int64)
                pix = ((rng_base * (int(i) * 2654435761 % 255 + 1)) % 256).astype(
                    "uint8"
                )
                buf = b"P6\n%d %d\n255\n" % (w, h) + pix.tobytes()
                rows.append((f"ppm://{int(i):08d}", "image", buf,
                             "image/x-portable-pixmap", len(buf)))
            yield pd.DataFrame(
                rows,
                columns=["media_ref", "kind", "media_bytes", "content_type",
                         "n_bytes"],
            )

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_META_SCHEMA)


def synth_media(docs_or_spark, n_rows: int = 256) -> DataFrame:
    """Deterministic fake media table for tests: bytes derived from
    sha2(media_ref) repeated to a pseudo-random length (pure Column ops).
    Kind/length branching is md5(ref)-nibble-derived (not xxhash64) so the
    DuckDB oracle regenerates the identical table from range(n_rows)."""
    spark = docs_or_spark if not isinstance(docs_or_spark, DataFrame) else docs_or_spark.sparkSession
    base = spark.range(n_rows)
    ref = F.format_string("media://b%d/%016x", F.pmod("id", F.lit(4)), F.col("id"))
    h = F.md5(ref)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.conv(F.substring(h, 1, 1), 16, 10).cast("int") % 3) + 1,
    )
    # payload: sha2 hex repeated r times -> deterministic pseudo-bytes
    reps = (F.conv(F.substring(h, 2, 1), 16, 10).cast("int") % 8) + 1
    payload = F.encode(F.repeat(F.sha2(ref.cast("binary"), 256), reps), "utf-8")
    return base.select(
        ref.alias("media_ref"),
        kind.alias("kind"),
        payload.alias("media_bytes"),
        F.concat(F.lit("application/x-fake-"), kind).alias("content_type"),
        F.length(payload).cast("long").alias("n_bytes"),
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),  # of [-1,1]-normalized signal
        T.StructField("digest", T.StringType()),
    ]
)


def decode_wav(buf: bytes):
    """REAL decode for RIFF/WAVE PCM audio — stdlib struct + numpy, no
    codec library. Integer PCM at 8 (unsigned), 16, 24 (packed triads),
    and 32 bits, IEEE-float PCM at 32 and 64 bits (format 3), and the
    WAVE_FORMAT_EXTENSIBLE wrapper (format 0xFFFE, resolved by its
    SubFormat GUID). Returns (samples[n, channels] as float64 in
    [-1, 1], sample_rate). Raises ValueError on non-WAV payloads or
    compressed encodings (ADPCM, MP3-in-WAV...)."""
    import struct

    import numpy as np  # noqa: PLC0415

    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, fmt, fmt_body, data = 12, None, b"", None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        ln = int.from_bytes(buf[pos + 4 : pos + 8], "little")
        body = buf[pos + 8 : pos + 8 + ln]
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", body[:16])
            fmt_body = body
        elif cid == b"data":
            data = body
    if fmt is None or data is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, n_ch, rate, _byte_rate, _block, bits = fmt
    if audio_format == 0xFFFE:  # WAVE_FORMAT_EXTENSIBLE: first 2 GUID
        # bytes of SubFormat carry the real format code
        if len(fmt_body) < 26:
            raise ValueError("extensible WAV missing SubFormat")
        audio_format = int.from_bytes(fmt_body[24:26], "little")
    if audio_format == 3:  # IEEE float
        if bits == 32:
            norm = np.frombuffer(data, dtype="<f4").astype(np.float64)
        elif bits == 64:
            norm = np.frombuffer(data, dtype="<f8").astype(np.float64)
        else:
            raise ValueError(f"{bits}-bit float PCM unsupported")
    elif audio_format == 1:
        if bits == 16:
            raw = np.frombuffer(data, dtype="<i2")
            norm = raw.astype(np.float64) / 32768.0
        elif bits == 8:  # 8-bit WAV is unsigned, midpoint 128
            raw = np.frombuffer(data, dtype=np.uint8)
            norm = (raw.astype(np.float64) - 128.0) / 128.0
        elif bits == 24:  # packed little-endian triads, sign-extended
            n3 = (len(data) // 3) * 3
            b3 = np.frombuffer(data[:n3], dtype=np.uint8).reshape(-1, 3)
            raw = (
                b3[:, 0].astype(np.int64)
                | (b3[:, 1].astype(np.int64) << 8)
                | (b3[:, 2].astype(np.int64) << 16)
            )
            raw = np.where(raw >= 1 << 23, raw - (1 << 24), raw)
            norm = raw.astype(np.float64) / float(1 << 23)
        elif bits == 32:
            raw = np.frombuffer(data, dtype="<i4")
            norm = raw.astype(np.float64) / float(1 << 31)
        else:
            raise ValueError(f"{bits}-bit PCM unsupported")
    else:
        raise ValueError(
            f"only integer/float PCM WAV supported (format {audio_format})"
        )
    n = (len(norm) // n_ch) * n_ch
    return norm[:n].reshape(-1, n_ch), rate


def encode_wav(samples, sample_rate: int) -> bytes:
    """Minimal 16-bit PCM WAV writer for int16 arrays shaped [n, ch] —
    the synthesis counterpart of ``decode_wav`` for tests."""
    import struct

    import numpy as np  # noqa: PLC0415

    arr = np.ascontiguousarray(samples, dtype="<i2")
    n, ch = arr.shape
    data = arr.tobytes()
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, sample_rate * ch * 2, ch * 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(data)) + data
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _fake_audio_decode(buf: bytes) -> dict[str, Any]:
    """Deterministic stand-in (sha256-derived), same schema as the real
    path — the audio analog of _fake_image_decode."""
    d = hashlib.sha256(buf).digest()
    rate = 8000 * (1 + d[0] % 6)
    n = 1000 + int.from_bytes(d[1:3], "big")
    return {
        "sample_rate": rate,
        "n_channels": 1 + d[3] % 2,
        "n_samples": n,
        "duration_s": n / rate,
        "rms": d[4] / 255.0,
        "digest": hashlib.sha256(buf).hexdigest(),
    }


def decode_audio(buf: bytes, fake: bool = False) -> dict[str, Any]:
    """Audio features. RIFF/WAVE integer-PCM decode is REAL (stdlib
    struct + numpy); other codecs need ffmpeg/soundfile (not in this
    container) unless fake=True."""
    import numpy as np  # noqa: PLC0415

    if not fake:
        try:
            samples, rate = decode_wav(buf)
        except ValueError as e:
            raise NotImplementedError(
                "non-WAV decode requires ffmpeg/soundfile — not installed; "
                "pass fake=True for the deterministic stand-in"
            ) from e
        n = samples.shape[0]
        return {
            "sample_rate": int(rate),
            "n_channels": int(samples.shape[1]),
            "n_samples": int(n),
            "duration_s": n / rate,
            "rms": float(np.sqrt((samples**2).mean())) if n else 0.0,
            "digest": hashlib.sha256(buf).hexdigest(),
        }
    return _fake_audio_decode(buf)


def audio_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched audio feature extraction via mapInPandas — the audio
    analog of image_features: input pruned to (media_ref, media_bytes)
    before the Python hop, only small features come back."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode_audio(b, fake=fake) for b in pdf["media_bytes"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_ref", pdf["media_ref"].values)
            yield out

    pruned = media.where(F.col("kind") == "audio").select("media_ref", "media_bytes")
    return pruned.mapInPandas(extract, schema=AUDIO_FEATURES_SCHEMA)


VIDEO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_ref", T.StringType()),
        T.StructField("container", T.StringType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("fps", T.DoubleType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("mean_luma", T.DoubleType()),  # of [0,1] RGB means
        T.StructField("digest", T.StringType()),  # sha256 over frame pixels
    ]
)


def _video_features_one(buf: bytes, fake: bool) -> dict[str, Any]:
    import numpy as np  # noqa: PLC0415

    b = bytes(buf)
    if fake:
        d = hashlib.sha256(b).hexdigest()
        return {
            "container": "fake",
            "n_frames": max(1, len(b) // 32),
            "width": 0,
            "height": 0,
            "fps": 0.0,
            "duration_s": 0.0,
            "mean_luma": int(d[:2], 16) / 255.0,
            "digest": d,
        }
    if b[:4] == b"RIFF" and b[8:12] == b"AVI ":
        from .video import decode_avi  # noqa: PLC0415

        frames, w, h, (num, den) = decode_avi(b)
        container, fps = "avi", num / den
        duration = len(frames) * den / num
    elif b[:9] == b"YUV4MPEG2":
        from .video import decode_y4m  # noqa: PLC0415

        frames, w, h, (num, den) = decode_y4m(b)
        container, fps = "y4m", num / den
        duration = len(frames) * den / num
    else:
        from .gif import decode_gif  # noqa: PLC0415

        frames, w, h, delays_cs = decode_gif(b)
        container = "gif"
        duration = sum(delays_cs) / 100.0
        fps = len(frames) / duration if duration > 0 else 0.0
    h256 = hashlib.sha256()
    total = 0.0
    for f in frames:
        h256.update(f.tobytes())
        total += float(np.mean(f))
    return {
        "container": container,
        "n_frames": len(frames),
        "width": int(w),
        "height": int(h),
        "fps": float(fps),
        "duration_s": float(duration),
        "mean_luma": total / len(frames) / 255.0,
        "digest": h256.hexdigest(),
    }


def video_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched video feature extraction via mapInPandas — the
    motion analog of image_features/audio_features, completing the
    trio. With ``fake=False`` the payload REALLY decodes (GIF / AVI
    MJPG+DIB / Y4M, dispatched on magic bytes) and the features are
    container, frame count, dimensions, frame rate, duration, mean
    luma across frames, and a sha256 over the composited RGB pixels
    of every frame; payload bytes never leave the executors. Other
    containers raise NotImplementedError (ffmpeg territory), mirroring
    sample_frames."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for b in pdf["media_bytes"]:
                try:
                    feats.append(_video_features_one(b, fake))
                except ValueError as e:
                    raise NotImplementedError(
                        "real video features cover animated GIF, AVI "
                        "(MJPG/DIB), and Y4M; other containers require "
                        "ffmpeg"
                    ) from e
            out = pd.DataFrame(feats)
            out.insert(0, "media_ref", pdf["media_ref"].values)
            yield out

    pruned = media.where(F.col("kind") == "video").select("media_ref", "media_bytes")
    return pruned.mapInPandas(extract, schema=VIDEO_FEATURES_SCHEMA)
