"""Baseline JFIF (JPEG) codec — pure Python + numpy, no PIL/libjpeg.

REAL encode + decode for baseline sequential DCT JPEG (SOF0, 8-bit,
Huffman): marker parse, DQT/DHT/SOF0/SOS/DRI, bit-unstuffed entropy
decode, dequantize + IDCT, chroma upsampling, YCbCr->RGB. The encoder
emits grayscale or RGB at 4:4:4 or 4:2:0 with the Annex-K quantization
tables scaled by the libjpeg quality formula and standard Huffman tables;
the decoder is GENERAL over baseline streams (any h/v sampling factors
1..2, restart intervals, 1 or 3 components, tables read from the stream
— not assumed).

This is a correctness-first decoder for modest images, the same envelope
as media.decode_png: block DCTs are one numpy matmul per image (all
blocks batched), but the Huffman entropy loop is per-symbol Python — at
bulk-decode scale swap in PIL/libjpeg-turbo inside the same mapInPandas
stage. Reference parity target: the reference validates media columns as
opaque binaries (it never decodes); this codec exists so sparkcheck's
image expectations run on REAL pixels for one more ubiquitous format
(reference: great_expectations has no media decode path to cite).

Progressive (SOF2), arithmetic coding, 12-bit precision, and hierarchical
modes raise ValueError — baseline-only by design.
"""

from __future__ import annotations

import numpy as np

# ---------------------------------------------------------------------------
# Tables
# ---------------------------------------------------------------------------

#: zigzag scan: position k in the scan -> row-major index in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# Annex K base quantization tables (row-major)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex K Huffman specs: (bits[1..16] counts, symbol values). The DECODER
# never uses these (it reads DHT from the stream); the encoder writes them
# into its own DHT segments, so encode/decode stay consistent by
# construction even against table typos.
DC_LUMA_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHROMA_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUMA_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHROMA_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)

# 8x8 DCT-II basis: D = C @ block @ C.T, inverse block = C.T @ D @ C
_k = np.arange(8, dtype=np.float64)
_DCT_C = np.cos((2 * _k[None, :] + 1) * _k[:, None] * np.pi / 16) * np.sqrt(
    2.0 / 8.0
)
_DCT_C[0, :] = 1.0 / np.sqrt(8.0)


def _quality_scale(base: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg quality mapping: 50 = Annex K verbatim, 95 ~= tables / 10."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


def _build_huffman(bits, values):
    """Canonical Huffman (ITU T.81 C.2): -> {symbol: (code, length)}."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _build_decode_map(bits, values):
    """Canonical Huffman -> {(length, code): symbol} for bitwise decode."""
    out = {}
    code = 0
    idx = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = values[idx]
            code += 1
            idx += 1
        code <<= 1
    return out


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------

class _BitWriter:
    """MSB-first bit accumulator with 0xFF byte stuffing (T.81 F.1.2.3)."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            byte = (self.acc >> (self.nbits - 8)) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
            self.nbits -= 8
        self.acc &= (1 << self.nbits) - 1

    def pad_align(self) -> None:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1-bits

    def emit_marker(self, marker: int) -> None:
        self.pad_align()
        self.buf += bytes([0xFF, marker])

    def flush(self) -> bytes:
        self.pad_align()
        return bytes(self.buf)


def _magnitude(v: int) -> tuple[int, int]:
    """T.81 F.1.2.1: value -> (category, extra bits)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    s = a.bit_length()
    bits = v if v > 0 else v + (1 << s) - 1
    return s, bits


def _fdct_blocks(plane: np.ndarray) -> np.ndarray:
    """plane (H, W) float, H/W multiples of 8 -> (n_blocks, 64) DCT coefs,
    blocks raster-ordered. One einsum over every block — no Python loop."""
    h, w = plane.shape
    blocks = (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
        .reshape(-1, 8, 8)
    )
    coefs = np.einsum("ij,njk,lk->nil", _DCT_C, blocks, _DCT_C)
    return coefs.reshape(-1, 64)


def _encode_component_blocks(
    writer: _BitWriter, block_zz: np.ndarray, pred: int, dc_tab, ac_tab
) -> int:
    """Entropy-encode one quantized zigzag block; returns new DC predictor."""
    dc = int(block_zz[0])
    s, bits = _magnitude(dc - pred)
    code, length = dc_tab[s]
    writer.write(code, length)
    if s:
        writer.write(bits, s)
    run = 0
    nz = np.nonzero(block_zz[1:])[0]
    last = nz[-1] + 1 if len(nz) else 0
    for k in range(1, last + 1):
        v = int(block_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        s, bits = _magnitude(v)
        code, length = ac_tab[(run << 4) | s]
        writer.write(code, length)
        writer.write(bits, s)
        run = 0
    if last < 63:
        code, length = ac_tab[0x00]  # EOB
        writer.write(code, length)
    return dc


def _pad_to(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def encode_jpeg(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode a uint8 array (H, W), (H, W, 1) gray or (H, W, 3) RGB as a
    baseline JFIF JPEG. ``subsample=True`` emits 4:2:0 (chroma averaged
    2x2); default is 4:4:4. ``restart_interval`` > 0 emits a DRI segment
    and RSTn markers every that many MCUs (predictor reset + byte align) —
    the resync structure real encoders use so one corrupt run cannot sink
    a whole scan. Lossy: round-trip error shrinks with quality (flat
    blocks at quality>=90 are near-exact)."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    if arr.ndim != 3 or arr.shape[2] not in (1, 3):
        raise ValueError("expected (H, W[, 1|3]) uint8 array")
    h, w = arr.shape[:2]
    gray = arr.shape[2] == 1

    f = arr.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
        samp = [(1, 1)]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            # 2x2 mean over the full-res plane padded to even dims
            def down(p):
                p = _pad_to(p, 2)
                return (
                    p.reshape(p.shape[0] // 2, 2, p.shape[1] // 2, 2)
                    .mean(axis=(1, 3))
                )

            planes = [y, down(cb), down(cr)]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y, cb, cr]
            samp = [(1, 1), (1, 1), (1, 1)]

    qluma = _quality_scale(QUANT_LUMA, quality)
    qchroma = _quality_scale(QUANT_CHROMA, quality)
    qtabs = [qluma] if gray else [qluma, qchroma]

    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)
    # pad each plane so the MCU grid tiles exactly
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    comp_coefs = []
    for ci, (p, (sh, sv)) in enumerate(zip(planes, samp)):
        tw, th = mcus_x * 8 * sh, mcus_y * 8 * sv
        p = np.pad(
            p,
            ((0, th - p.shape[0]), (0, tw - p.shape[1])),
            mode="edge",
        )
        q = qtabs[min(ci, len(qtabs) - 1)]
        coefs = _fdct_blocks(p - 128.0)
        zz = np.round(coefs[:, ZIGZAG] / q[ZIGZAG]).astype(np.int64)
        comp_coefs.append((zz, tw // 8))

    dc_specs = [DC_LUMA_SPEC] if gray else [DC_LUMA_SPEC, DC_CHROMA_SPEC]
    ac_specs = [AC_LUMA_SPEC] if gray else [AC_LUMA_SPEC, AC_CHROMA_SPEC]
    dc_tabs = [_build_huffman(*s) for s in dc_specs]
    ac_tabs = [_build_huffman(*s) for s in ac_specs]

    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_count = 0
    rst_n = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and (
                mcu_count % restart_interval == 0
            ):
                writer.emit_marker(0xD0 + (rst_n & 7))
                rst_n += 1
                preds = [0] * len(planes)
            mcu_count += 1
            for ci, (sh, sv) in enumerate(samp):
                zz, bw = comp_coefs[ci]
                ti = min(ci, 1)
                for v in range(sv):
                    for hh in range(sh):
                        bi = (my * sv + v) * bw + (mx * sh + hh)
                        preds[ci] = _encode_component_blocks(
                            writer, zz[bi], preds[ci], dc_tabs[ti], ac_tabs[ti]
                        )
    scan = writer.flush()

    # --- markers ---
    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    )
    for ti, q in enumerate(qtabs):
        out += seg(0xDB, bytes([ti]) + bytes(int(x) for x in q[ZIGZAG]))
    ncomp = len(planes)
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    out += seg(0xC0, bytes(sof))
    for ti, spec in enumerate(dc_specs):
        out += seg(
            0xC4, bytes([ti]) + bytes(spec[0]) + bytes(spec[1])
        )
    for ti, spec in enumerate(ac_specs):
        out += seg(
            0xC4, bytes([0x10 | ti]) + bytes(spec[0]) + bytes(spec[1])
        )
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytearray([ncomp])
    for ci in range(ncomp):
        ti = min(ci, 1)
        sos += bytes([ci + 1, (ti << 4) | ti])
    sos += b"\x00\x3f\x00"
    out += seg(0xDA, bytes(sos))
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------

class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops (raises StopIteration via _need) at any real marker."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG scan")
        byte = d[self.pos]
        if byte == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("hit marker inside entropy segment")
        else:
            self.pos += 1
        # mask to live bits so acc stays a small int over long scans
        self.acc = ((self.acc & ((1 << self.nbits) - 1)) << 8) | byte
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def align_restart(self) -> None:
        """Byte-align and consume one RSTn marker."""
        self.acc = 0
        self.nbits = 0
        d = self.data
        while self.pos + 1 < len(d):
            if d[self.pos] == 0xFF and 0xD0 <= d[self.pos + 1] <= 0xD7:
                self.pos += 2
                return
            self.pos += 1
        raise ValueError("missing restart marker")


def _decode_symbol(reader: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | reader.read_bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code in scan")


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(reader, dc_tab, ac_tab, pred: int):
    zz = np.zeros(64, dtype=np.int64)
    s = _decode_symbol(reader, dc_tab)
    diff = _extend(reader.read_bits(s), s) if s else 0
    pred += diff
    zz[0] = pred
    k = 1
    while k < 64:
        rs = _decode_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += r
        if k > 63:
            raise ValueError("AC run past block end")
        zz[k] = _extend(reader.read_bits(s), s)
        k += 1
    return zz, pred


def decode_jpeg(buf: bytes):
    """Decode a baseline JFIF payload -> (array (H, W, C) uint8, W, H)
    with C = 1 (grayscale) or 3 (RGB). Raises ValueError on non-JPEG bytes
    or non-baseline modes (progressive/arithmetic/12-bit)."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    n = len(buf)

    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            break
        seglen = int.from_bytes(buf[pos + 2 : pos + 4], "big")
        body = buf[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen

        if marker == 0xDB:  # DQT
            b = 0
            while b < len(body):
                prec, tid = body[b] >> 4, body[b] & 0x0F
                b += 1
                if prec:
                    vals = np.frombuffer(
                        body[b : b + 128], dtype=">u2"
                    ).astype(np.int64)
                    b += 128
                else:
                    vals = np.frombuffer(
                        body[b : b + 64], dtype=np.uint8
                    ).astype(np.int64)
                    b += 64
                q = np.zeros(64, dtype=np.int64)
                q[ZIGZAG] = vals  # stored zigzag -> row-major
                qtables[tid] = q
        elif marker == 0xC4:  # DHT
            b = 0
            while b < len(body):
                cls, tid = body[b] >> 4, body[b] & 0x0F
                bits = list(body[b + 1 : b + 17])
                cnt = sum(bits)
                vals = list(body[b + 17 : b + 17 + cnt])
                htables[(cls, tid)] = _build_decode_map(bits, vals)
                b += 17 + cnt
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if body[0] != 8:
                raise ValueError("only 8-bit baseline JPEG supported")
            fh = int.from_bytes(body[1:3], "big")
            fw = int.from_bytes(body[3:5], "big")
            ncomp = body[5]
            comps = []
            for ci in range(ncomp):
                o = 6 + ci * 3
                comps.append(
                    {
                        "id": body[o],
                        "h": body[o + 1] >> 4,
                        "v": body[o + 1] & 0x0F,
                        "tq": body[o + 2],
                    }
                )
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError("non-baseline JPEG mode unsupported")
        elif marker == 0xDD:  # DRI
            restart = int.from_bytes(body[0:2], "big")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            nscan = body[0]
            scan_comps = []
            for si in range(nscan):
                cid, tt = body[1 + si * 2], body[2 + si * 2]
                comp = next(c for c in frame["comps"] if c["id"] == cid)
                scan_comps.append((comp, tt >> 4, tt & 0x0F))
            return _decode_scan(
                buf, pos, frame, scan_comps, qtables, htables, restart
            )
        # APPn / COM / others: skipped
    raise ValueError("no SOS marker found")


def _decode_scan(buf, pos, frame, scan_comps, qtables, htables, restart):
    h, w = frame["h"], frame["w"]
    comps = [c for c, _, _ in scan_comps]
    max_h = max(c["h"] for c in comps)
    max_v = max(c["v"] for c in comps)
    interleaved = len(comps) > 1
    if interleaved:
        mcus_x = -(-w // (8 * max_h))
        mcus_y = -(-h // (8 * max_v))
    else:
        c = comps[0]
        cw = -(-(w * c["h"]) // max_h)
        ch = -(-(h * c["v"]) // max_v)
        mcus_x = -(-cw // 8)
        mcus_y = -(-ch // 8)

    # per-component zigzag coefficient stores (blocks raster in plane)
    stores = []
    for c, _, _ in scan_comps:
        bw = mcus_x * (c["h"] if interleaved else 1)
        bh = mcus_y * (c["v"] if interleaved else 1)
        stores.append(np.zeros((bh * bw, 64), dtype=np.int64))

    reader = _BitReader(buf, pos)
    preds = [0] * len(scan_comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.align_restart()
                preds = [0] * len(scan_comps)
            for ci, (c, dct, act) in enumerate(scan_comps):
                dc_tab = htables[(0, dct)]
                ac_tab = htables[(1, act)]
                sh = c["h"] if interleaved else 1
                sv = c["v"] if interleaved else 1
                bw = mcus_x * sh
                for v in range(sv):
                    for hh in range(sh):
                        zz, preds[ci] = _decode_block(
                            reader, dc_tab, ac_tab, preds[ci]
                        )
                        bi = (my * sv + v) * bw + (mx * sh + hh)
                        stores[ci][bi] = zz
            mcu_count += 1

    # dequantize + IDCT, all blocks of a component in one einsum
    planes = []
    for ci, (c, _, _) in enumerate(scan_comps):
        q = qtables[c["tq"]]
        coefs = np.zeros_like(stores[ci], dtype=np.float64)
        coefs[:, ZIGZAG] = stores[ci][:, :]  # dezigzag
        coefs *= q  # row-major dequantize
        blocks = coefs.reshape(-1, 8, 8)
        pix = np.einsum("ji,njk,kl->nil", _DCT_C, blocks, _DCT_C) + 128.0
        sh = c["h"] if interleaved else 1
        sv = c["v"] if interleaved else 1
        bw = mcus_x * sh
        bh = mcus_y * sv
        plane = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3)
            .reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution by pixel repetition
        fy = max_v // c["v"] if interleaved else 1
        fx = max_h // c["h"] if interleaved else 1
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])

    if len(planes) == 1:
        out = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)[:, :, None]
        return out, w, h
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    out = np.clip(np.round(np.stack([r, g, b], axis=2)), 0, 255).astype(
        np.uint8
    )
    return out, w, h
