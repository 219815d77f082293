"""Pure-python GIF codec (GIF87a/GIF89a) — stdlib + numpy only.

Real LZW: variable-width codes (LSB-first across sub-blocks), clear/EOI
handling, the KwKwK self-reference case, 12-bit dictionary cap with
mid-stream clears; interlaced images (the 4-pass row order); local and
global color tables; GIF89a graphic-control extensions (transparency +
frame delay) and disposal methods 0-3 (leave / restore-background /
restore-previous) composited onto the logical-screen canvas, so an
animated GIF decodes to full frames, not raw sub-rectangles.

``encode_gif`` writes a real LZW-compressed stream (single- or
multi-frame with per-frame delays) from a shared <=256-color palette;
round-trips are exact because GIF is lossless over indexed color.

This is the one *motion* format decodable without ffmpeg/PIL, which lets
``media.sample_frames(fake=False)`` emit digests of REAL pixels; see
media.py for the honesty table. The reference
(willfeltman/great_expectations) ships no media decode path to cite —
spark_dataframe handles binaries as opaque columns only.

Out of envelope (raise ValueError): plain-text rendering (the extension
is skipped, as every real decoder does) and truncated streams.
"""

from __future__ import annotations

import numpy as np

__all__ = ["decode_gif", "encode_gif"]

# interlace pass structure: (first row, step)
_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))
_MAX_CODE_WIDTH = 12


# ---------------------------------------------------------------------------
# LZW
# ---------------------------------------------------------------------------


class _LSBReader:
    """LSB-first bit reader over concatenated data sub-blocks."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self.acc = 0
        self.nbits = 0

    def read(self, n: int) -> int:
        while self.nbits < n:
            if self.pos >= len(self.data):
                raise ValueError("truncated GIF LZW stream")
            self.acc |= self.data[self.pos] << self.nbits
            self.nbits += 8
            self.pos += 1
        v = self.acc & ((1 << n) - 1)
        self.acc >>= n
        self.nbits -= n
        return v


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    """Decode a GIF LZW stream into exactly ``n_pixels`` palette indices.
    Dictionary entries are stored as (prefix_code, last_index) pairs and
    materialized by walking prefixes — no per-entry list copies, so a
    4096-entry table costs O(1) per added code."""
    if not 2 <= min_code_size <= 11:
        raise ValueError(f"bad LZW minimum code size {min_code_size}")
    clear = 1 << min_code_size
    eoi = clear + 1
    reader = _LSBReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = 0

    prefix = np.zeros(1 << _MAX_CODE_WIDTH, dtype=np.int32)
    suffix = np.zeros(1 << _MAX_CODE_WIDTH, dtype=np.uint8)
    first = np.zeros(1 << _MAX_CODE_WIDTH, dtype=np.uint8)
    for i in range(clear):
        prefix[i] = -1
        suffix[i] = i
        first[i] = i

    def reset():
        return eoi + 1, min_code_size + 1, -1

    next_code, width, prev = reset()
    stack = np.empty(1 << _MAX_CODE_WIDTH, dtype=np.uint8)
    while n_out < n_pixels:
        code = reader.read(width)
        if code == clear:
            next_code, width, prev = reset()
            continue
        if code == eoi:
            break
        if prev < 0:
            if code >= clear:
                raise ValueError("LZW stream starts with an undefined code")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            cur = code
        elif code == next_code:
            cur = -1  # KwKwK: prev + first(prev)
        else:
            raise ValueError("LZW code out of range")
        # materialize the sequence for `cur` (or prev+first(prev))
        depth = 0
        c = prev if cur < 0 else cur
        while c >= 0:
            stack[depth] = suffix[c]
            depth += 1
            c = prefix[c]
        seq_first = stack[depth - 1]
        seq = stack[depth - 1 :: -1]  # root-first order, length == depth
        take = min(depth, n_pixels - n_out)  # data may overrun the grid
        out[n_out : n_out + take] = seq[:take]
        n_out += take
        if cur < 0:
            if n_out < n_pixels:
                out[n_out] = seq_first
                n_out += 1
        if next_code < (1 << _MAX_CODE_WIDTH):
            prefix[next_code] = prev
            suffix[next_code] = seq_first if cur < 0 else first[cur]
            first[next_code] = first[prev]
            next_code += 1
            if next_code == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        prev = next_code - 1 if cur < 0 else cur
    if n_out < n_pixels:
        raise ValueError("GIF image data ended before the pixel grid filled")
    return out


class _LSBWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, width: int) -> None:
        self.acc |= code << self.nbits
        self.nbits += width
        while self.nbits >= 8:
            self.out.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def flush(self) -> bytes:
        if self.nbits:
            self.out.append(self.acc & 0xFF)
            self.acc = 0
            self.nbits = 0
        return bytes(self.out)


def _lzw_encode(min_code_size: int, indices: np.ndarray) -> bytes:
    """Real LZW compression of palette indices (GIF variant: leading
    clear code, dictionary keyed on (prefix_code, symbol), width bump
    when the next code to assign would not fit, table reset at 4096)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    writer = _LSBWriter()

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    writer.write(clear, width)
    prev = -1
    for sym in indices.tolist():
        if prev < 0:
            prev = sym
            continue
        hit = table.get((prev, sym))
        if hit is not None:
            prev = hit
            continue
        writer.write(prev, width)
        if next_code < (1 << _MAX_CODE_WIDTH):
            table[(prev, sym)] = next_code
            next_code += 1
            # the decoder materializes each entry one code LATER than we
            # assign it, so its width bump (next_code == 1<<width after
            # the lagged add) lands when OUR just-assigned code equals
            # 1<<width — bump here and the streams stay in step
            if next_code - 1 == (1 << width) and width < _MAX_CODE_WIDTH:
                width += 1
        else:
            writer.write(clear, width)
            table.clear()
            next_code = eoi + 1
            width = min_code_size + 1
        prev = sym
    if prev >= 0:
        writer.write(prev, width)
    writer.write(eoi, width)
    return writer.flush()


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def _read_color_table(buf: bytes, pos: int, size_field: int):
    n = 2 << size_field  # 2^(field+1) entries
    end = pos + 3 * n
    if end > len(buf):
        raise ValueError("truncated GIF color table")
    table = np.frombuffer(buf[pos:end], dtype=np.uint8).reshape(n, 3)
    return table, end


def _read_subblocks(buf: bytes, pos: int) -> tuple[bytes, int]:
    chunks = []
    n = len(buf)
    while True:
        if pos >= n:
            raise ValueError("truncated GIF sub-block chain")
        size = buf[pos]
        pos += 1
        if size == 0:
            return b"".join(chunks), pos
        chunks.append(buf[pos : pos + size])
        if pos + size > n:
            raise ValueError("truncated GIF sub-block")
        pos += size


def decode_gif(buf: bytes):
    """Decode a GIF payload -> (frames, w, h, delays_cs): ``frames`` is a
    list of (H, W, 3) uint8 RGB arrays composited on the logical-screen
    canvas, ``delays_cs`` the per-frame delays in centiseconds (0 for
    still images). Raises ValueError on non-GIF bytes."""
    if len(buf) < 13 or buf[:4] != b"GIF8" or buf[4:6] not in (b"7a", b"9a"):
        raise ValueError("not a GIF payload (no GIF87a/89a signature)")
    w = int.from_bytes(buf[6:8], "little")
    h = int.from_bytes(buf[8:10], "little")
    packed = buf[10]
    bg_index = buf[11]
    pos = 13
    gct = None
    if packed & 0x80:
        gct, pos = _read_color_table(buf, pos, packed & 0x07)

    if gct is not None and bg_index < len(gct):
        bg_rgb = gct[bg_index]
    else:
        bg_rgb = np.zeros(3, dtype=np.uint8)
    canvas = np.empty((h, w, 3), dtype=np.uint8)
    canvas[:] = bg_rgb

    frames: list[np.ndarray] = []
    delays: list[int] = []
    # pending graphic-control state for the NEXT image block
    transparent = -1
    delay_cs = 0
    disposal = 0
    n = len(buf)

    while pos < n:
        block = buf[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= n:
                raise ValueError("truncated GIF extension")
            label = buf[pos]
            pos += 1
            data, pos = _read_subblocks(buf, pos)
            if label == 0xF9 and len(data) >= 4:  # graphic control
                flags = data[0]
                disposal = (flags >> 2) & 0x07
                delay_cs = int.from_bytes(data[1:3], "little")
                transparent = data[3] if flags & 0x01 else -1
            # 0xFF application (NETSCAPE loop etc.), 0xFE comment,
            # 0x01 plain text: metadata — skipped like every real decoder
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x}")

        # image descriptor
        if pos + 9 > n:
            raise ValueError("truncated GIF image descriptor")
        ix = int.from_bytes(buf[pos : pos + 2], "little")
        iy = int.from_bytes(buf[pos + 2 : pos + 4], "little")
        iw = int.from_bytes(buf[pos + 4 : pos + 6], "little")
        ih = int.from_bytes(buf[pos + 6 : pos + 8], "little")
        ipacked = buf[pos + 8]
        pos += 9
        if ix + iw > w or iy + ih > h:
            raise ValueError("GIF image rectangle outside logical screen")
        table = gct
        if ipacked & 0x80:
            table, pos = _read_color_table(buf, pos, ipacked & 0x07)
        if table is None:
            raise ValueError("GIF image with no color table")
        if pos >= n:
            raise ValueError("truncated GIF before LZW data")
        min_code_size = buf[pos]
        pos += 1
        data, pos = _read_subblocks(buf, pos)
        idx = _lzw_decode(min_code_size, data, iw * ih).reshape(ih, iw)
        if (ipacked & 0x40) and ih > 1:  # interlaced: reorder rows
            de = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                rows = range(start, ih, step)
                k = len(rows)
                de[start::step] = idx[src : src + k]
                src += k
        else:
            de = idx
        if int(de.max(initial=0)) >= len(table):
            raise ValueError("GIF pixel index outside color table")

        prior = canvas.copy() if disposal == 3 else None
        region = canvas[iy : iy + ih, ix : ix + iw]
        rgb = table[de]
        if transparent >= 0:
            mask = de != transparent
            region[mask] = rgb[mask]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        delays.append(delay_cs)

        if disposal == 2:  # restore the rectangle to the background color
            canvas[iy : iy + ih, ix : ix + iw] = bg_rgb
        elif disposal == 3 and prior is not None:  # restore previous
            canvas = prior
        transparent, delay_cs, disposal = -1, 0, 0

    if not frames:
        raise ValueError("GIF with no image data")
    return frames, w, h, delays


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def encode_gif(
    frames,
    delays_cs=None,
    loop: bool = True,
) -> bytes:
    """Encode one (H, W, 3)/(H, W) uint8 array or a list of same-shape
    arrays as a GIF89a (animated when multi-frame; ``delays_cs`` per
    frame, default 10). All frames share one global palette built from
    the distinct colors — >256 distinct colors raises ValueError (GIF is
    indexed color; quantization belongs to a real image library).
    Lossless: decode_gif returns the input arrays exactly."""
    if isinstance(frames, np.ndarray):
        frames = [frames]
    if not frames:
        raise ValueError("encode_gif needs at least one frame")
    norm = []
    for f in frames:
        f = np.asarray(f, dtype=np.uint8)
        if f.ndim == 2:
            f = np.stack([f] * 3, axis=2)
        if f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("frames must be (H, W) or (H, W, 3) uint8")
        norm.append(f)
    h, w = norm[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in norm):
        raise ValueError("all frames must share one shape")

    flat = np.concatenate([f.reshape(-1, 3) for f in norm])
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(
            f"{len(palette)} distinct colors; GIF holds 256 — quantize first"
        )
    size_field = max(1, (len(palette) - 1).bit_length()) - 1  # 2<<f entries
    n_slots = 2 << size_field
    min_code_size = max(2, size_field + 1)

    if delays_cs is None:
        delays_cs = [10] * len(norm)
    if len(delays_cs) != len(norm):
        raise ValueError("delays_cs must match the frame count")

    out = bytearray(b"GIF89a")
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out.append(0x80 | size_field)  # GCT present, size field
    out += b"\x00\x00"  # bg index 0, no aspect ratio
    pal = np.zeros((n_slots, 3), dtype=np.uint8)
    pal[: len(palette)] = palette
    out += pal.tobytes()
    if len(norm) > 1 and loop:
        out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"

    inverse = inverse.reshape(len(norm), h * w)
    for fi, f in enumerate(norm):
        if len(norm) > 1:
            out += b"\x21\xf9\x04"
            out.append(0x04)  # disposal=1 (leave), no transparency
            out += int(delays_cs[fi]).to_bytes(2, "little")
            out += b"\x00\x00"  # transparent index, terminator
        out.append(0x2C)
        out += b"\x00\x00\x00\x00"  # full-canvas frame at (0, 0)
        out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
        out.append(0x00)  # no LCT, not interlaced
        out.append(min_code_size)
        data = _lzw_encode(min_code_size, inverse[fi].astype(np.int64))
        for off in range(0, len(data), 255):
            chunk = data[off : off + 255]
            out.append(len(chunk))
            out += chunk
        out.append(0x00)
    out.append(0x3B)
    return bytes(out)
