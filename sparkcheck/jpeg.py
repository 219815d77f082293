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

Progressive DCT (SOF2, Huffman) is ALSO decoded — T.81 Annex G spectral
selection + successive approximation: DC first/refine scans (interleaved
or single-component), AC first scans with EOB-run accumulation, and the
AC refinement correction-bit walk (the libjpeg decode_mcu_AC_refine
algorithm), with restart-marker resync inside any scan. Coefficients
accumulate across scans into per-component stores; the final dequantize +
IDCT is the same batched einsum as baseline, so a fully-transmitted
progressive stream decodes bit-identically to its baseline twin (the
property suite asserts exactly that). ``encode_jpeg_progressive`` emits
spectral-selection + successive-approximation streams (EOB runs capped
at 1 so the Annex-K Huffman tables suffice) for round-trip testing.

Arithmetic coding, 12-bit precision, hierarchical and lossless modes
still raise ValueError — honestly out of envelope.
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


def _prepare_components(
    arr: np.ndarray, quality: int, subsample: bool
) -> tuple:
    """Shared front half of both encoders: color convert, subsample, pad
    to the MCU grid, forward DCT, quantize. Returns
    (h, w, gray, samp, qtabs, comp_coefs) with comp_coefs a list of
    (zigzag int64 blocks raster-ordered, blocks_wide) per component."""
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
    return h, w, gray, samp, qtabs, comp_coefs


def _header_segments(
    h: int, w: int, gray: bool, samp, qtabs, dc_specs, ac_specs,
    sof_marker: int,
) -> bytearray:
    """SOI + APP0 + DQT + SOF + DHT segments shared by both encoders."""

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    ncomp = 1 if gray else 3
    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + b"\x00\x01\x00\x01" + b"\x00\x00"
    )
    for ti, q in enumerate(qtabs):
        out += seg(0xDB, bytes([ti]) + bytes(int(x) for x in q[ZIGZAG]))
    sof = bytearray([8]) + h.to_bytes(2, "big") + w.to_bytes(2, "big")
    sof.append(ncomp)
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, min(ci, 1)])
    out += seg(sof_marker, bytes(sof))
    for ti, spec in enumerate(dc_specs):
        out += seg(0xC4, bytes([ti]) + bytes(spec[0]) + bytes(spec[1]))
    for ti, spec in enumerate(ac_specs):
        out += seg(0xC4, bytes([0x10 | ti]) + bytes(spec[0]) + bytes(spec[1]))
    return out


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
    h, w, gray, samp, qtabs, comp_coefs = _prepare_components(
        arr, quality, subsample
    )
    mcus_x = comp_coefs[0][1] // samp[0][0]
    mcus_y = (len(comp_coefs[0][0]) // comp_coefs[0][1]) // samp[0][1]
    planes = comp_coefs  # one entry per component

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

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = _header_segments(h, w, gray, samp, qtabs, dc_specs, ac_specs, 0xC0)
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    ncomp = len(planes)
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
# Progressive encoder (T.81 Annex G: spectral selection + successive
# approximation, Huffman). EOB runs are capped at 1 so the Annex-K tables
# cover every emitted symbol; the decoder handles general EOB runs.
# ---------------------------------------------------------------------------

#: default scan script (the libjpeg "simple progression" shape): DC first
#: at Al=1, low then high AC spectral bands at Al reductions, refinements
#: down to Al=0, DC refinement last. (comp_indices, Ss, Se, Ah, Al)
_GRAY_SCANS = [
    ([0], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0], 0, 0, 1, 0),
    ([0], 1, 63, 1, 0),
]
_COLOR_SCANS = [
    ([0, 1, 2], 0, 0, 0, 1),
    ([0], 1, 5, 0, 2),
    ([2], 1, 63, 0, 1),
    ([1], 1, 63, 0, 1),
    ([0], 6, 63, 0, 2),
    ([0], 1, 63, 2, 1),
    ([0, 1, 2], 0, 0, 1, 0),
    ([2], 1, 63, 1, 0),
    ([1], 1, 63, 1, 0),
    ([0], 1, 63, 1, 0),
]


def _emit_ac_first(writer, zz_band, ss, se, al, ac_tab) -> None:
    """One block's AC first scan for band [ss..se] at point transform al.
    Magnitude point transform (sign * (|v| >> al)); plain EOB per block."""
    run = 0
    emitted = False
    for k in range(ss, se + 1):
        v = int(zz_band[k])
        t = (abs(v) >> al)
        if t == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_tab[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        tv = t if v > 0 else -t
        s, bits = _magnitude(tv)
        code, length = ac_tab[(run << 4) | s]
        writer.write(code, length)
        writer.write(bits, s)
        run = 0
        emitted = True
    if run > 0 or not emitted:
        # trailing zeros (or an all-zero band): EOB with run length 1
        code, length = ac_tab[0x00]
        writer.write(code, length)


def _emit_ac_refine(writer, zz_band, ss, se, al, ac_tab) -> None:
    """One block's AC refinement scan (libjpeg encode_mcu_AC_refine with
    EOBRUN capped at 1): newly-significant coefficients emit (r<<4)|1 +
    sign, previously-significant ones queue correction bits that flush
    after each symbol; a trailing EOB carries the leftover bits."""
    run = 0
    pending: list[int] = []
    for k in range(ss, se + 1):
        v = int(zz_band[k])
        t = abs(v) >> al
        if t == 0:
            run += 1
            continue
        # flush ZRLs BEFORE buffering this coef's bit: every pending
        # correction bit must belong to a coefficient preceded by <=15
        # zeros, or the decoder's 16-zero ZRL walk consumes the stream
        # out of order (libjpeg jcphuff.c places this loop identically)
        while run > 15:
            code, length = ac_tab[0xF0]
            writer.write(code, length)
            for b in pending:
                writer.write(b, 1)
            pending = []
            run -= 16
        if t > 1:
            pending.append(t & 1)  # correction bit for an already-significant coef
            continue
        # newly significant at this precision
        code, length = ac_tab[(run << 4) | 1]
        writer.write(code, length)
        writer.write(1 if v > 0 else 0, 1)
        for b in pending:
            writer.write(b, 1)
        pending = []
        run = 0
    if run > 0 or pending:
        code, length = ac_tab[0x00]  # EOB (run length 1)
        writer.write(code, length)
        for b in pending:
            writer.write(b, 1)


def encode_jpeg_progressive(
    arr: np.ndarray,
    quality: int = 90,
    subsample: bool = False,
    scans: list[tuple[list[int], int, int, int, int]] | None = None,
) -> bytes:
    """Encode as a progressive JFIF JPEG (SOF2). Same color/subsample/
    quantization pipeline as ``encode_jpeg``, so a progressive stream and
    its baseline twin carry IDENTICAL quantized coefficients — decoding
    both must give bit-identical pixels (the differential property the
    tests assert). ``scans`` overrides the default libjpeg-style scan
    script; each entry is (component_indices, Ss, Se, Ah, Al) and must
    follow T.81's progression rules (DC before that component's AC,
    refinements stepping Al down by one)."""
    h, w, gray, samp, qtabs, comp_coefs = _prepare_components(
        arr, quality, subsample
    )
    script = scans if scans is not None else (
        _GRAY_SCANS if gray else _COLOR_SCANS
    )
    mcus_x = comp_coefs[0][1] // samp[0][0]
    mcus_y = (len(comp_coefs[0][0]) // comp_coefs[0][1]) // samp[0][1]
    max_h = max(s[0] for s in samp)
    max_v = max(s[1] for s in samp)

    dc_specs = [DC_LUMA_SPEC] if gray else [DC_LUMA_SPEC, DC_CHROMA_SPEC]
    ac_specs = [AC_LUMA_SPEC] if gray else [AC_LUMA_SPEC, AC_CHROMA_SPEC]
    dc_tabs = [_build_huffman(*s) for s in dc_specs]
    ac_tabs = [_build_huffman(*s) for s in ac_specs]

    def seg(marker: int, payload: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(payload) + 2).to_bytes(2, "big") + payload

    out = _header_segments(h, w, gray, samp, qtabs, dc_specs, ac_specs, 0xC2)

    for comp_idx, ss, se, ah, al in script:
        if ss == 0 and se != 0:
            raise ValueError("a DC scan must have Ss=Se=0")
        if ss > 0 and len(comp_idx) != 1:
            raise ValueError("AC scans must be single-component")
        sos = bytearray([len(comp_idx)])
        for ci in comp_idx:
            ti = min(ci, 1)
            sos += bytes([ci + 1, (ti << 4) | ti])
        sos += bytes([ss, se, (ah << 4) | al])
        out += seg(0xDA, bytes(sos))

        def _ni_grid(ci: int) -> tuple[int, int, int]:
            """(blocks_wide, blocks_high, row_stride) of one component's
            non-interleaved block grid inside its padded store."""
            zz, bw_full = comp_coefs[ci]
            cw = -(-(w * samp[ci][0]) // max_h)
            ch = -(-(h * samp[ci][1]) // max_v)
            return -(-cw // 8), -(-ch // 8), bw_full

        def _dc_blocks():
            """Yield (scan_comp_index, block_index) in the scan's block
            order: interleaved MCU order for multi-component scans, the
            component's own raster grid for single-component scans."""
            if len(comp_idx) > 1:
                for my in range(mcus_y):
                    for mx in range(mcus_x):
                        for pi, ci in enumerate(comp_idx):
                            sh, sv = samp[ci]
                            bw = comp_coefs[ci][1]
                            for v in range(sv):
                                for hh in range(sh):
                                    yield pi, ci, (my * sv + v) * bw + (mx * sh + hh)
            else:
                ci = comp_idx[0]
                bw_ni, bh_ni, stride = _ni_grid(ci)
                for by in range(bh_ni):
                    for bx in range(bw_ni):
                        yield 0, ci, by * stride + bx

        writer = _BitWriter()
        if ss == 0 and ah == 0:
            # DC first scan: baseline-style diff coding of dc >> Al
            preds = [0] * len(comp_idx)
            for pi, ci, bi in _dc_blocks():
                dc = int(comp_coefs[ci][0][bi][0]) >> al
                s, bits = _magnitude(dc - preds[pi])
                code, length = dc_tabs[min(ci, 1)][s]
                writer.write(code, length)
                if s:
                    writer.write(bits, s)
                preds[pi] = dc
        elif ss == 0 and ah > 0:
            # DC refinement: one raw bit per block in scan block order
            for _pi, ci, bi in _dc_blocks():
                writer.write((int(comp_coefs[ci][0][bi][0]) >> al) & 1, 1)
        else:
            ci = comp_idx[0]
            zz, bw_full = comp_coefs[ci]
            cw = -(-(w * samp[ci][0]) // max_h)
            ch = -(-(h * samp[ci][1]) // max_v)
            bw_ni, bh_ni = -(-cw // 8), -(-ch // 8)
            emit = _emit_ac_first if ah == 0 else _emit_ac_refine
            tab = ac_tabs[min(ci, 1)]
            for by in range(bh_ni):
                for bx in range(bw_ni):
                    emit(writer, zz[by * bw_full + bx], ss, se, al, tab)
        out += writer.flush()

    out += b"\xff\xd9"
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
    """Decode a baseline (SOF0/1) or progressive (SOF2, Huffman) JFIF
    payload -> (array (H, W, C) uint8, W, H) with C = 1 (grayscale) or
    3 (RGB). Raises ValueError on non-JPEG bytes or modes outside the
    envelope (arithmetic coding, 12-bit, hierarchical, lossless)."""
    if len(buf) < 4 or buf[0] != 0xFF or buf[1] != 0xD8:
        raise ValueError("not a JPEG payload (no SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict] = {}
    frame = None
    restart = 0
    n = len(buf)
    prog_stores: list[np.ndarray] | None = None

    while pos + 4 <= n:
        if buf[pos] != 0xFF:
            raise ValueError("marker sync lost")
        marker = buf[pos + 1]
        if marker == 0xD9:  # EOI
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            if body[0] != 8:
                raise ValueError("only 8-bit JPEG precision supported")
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
            frame = {
                "h": fh, "w": fw, "comps": comps,
                "progressive": marker == 0xC2,
            }
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB,
                        0xCD, 0xCE, 0xCF):
            raise ValueError(
                "JPEG mode unsupported (arithmetic/hierarchical/lossless)"
            )
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
            if not frame.get("progressive"):
                return _decode_scan(
                    buf, pos, frame, scan_comps, qtables, htables, restart
                )
            if prog_stores is None:
                prog_stores = _alloc_progressive_stores(frame)
            o = 1 + nscan * 2
            ss, se = body[o], body[o + 1]
            ah, al = body[o + 2] >> 4, body[o + 2] & 0x0F
            pos = _decode_progressive_scan(
                buf, pos, frame, scan_comps, htables, restart,
                prog_stores, ss, se, ah, al,
            )
        # APPn / COM / others: skipped

    if frame is not None and frame.get("progressive"):
        if prog_stores is None:
            raise ValueError("progressive JPEG with no scans")
        return _reconstruct_progressive(frame, prog_stores, qtables)
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
        sh = c["h"] if interleaved else 1
        sv = c["v"] if interleaved else 1
        plane = _idct_plane(
            stores[ci], qtables[c["tq"]], mcus_x * sh, mcus_y * sv
        )
        # upsample to full resolution by pixel repetition
        fy = max_v // c["v"] if interleaved else 1
        fx = max_h // c["h"] if interleaved else 1
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    return _planes_to_image(planes, w, h)


def _idct_plane(zz_store: np.ndarray, q: np.ndarray, bw: int, bh: int) -> np.ndarray:
    """Dequantize + inverse DCT one component's zigzag coefficient store
    ((bh*bw, 64) raster blocks) into a (bh*8, bw*8) pixel plane — all
    blocks in one batched einsum."""
    coefs = np.zeros_like(zz_store, dtype=np.float64)
    coefs[:, ZIGZAG] = zz_store[:, :]  # dezigzag
    coefs *= q  # row-major dequantize
    blocks = coefs.reshape(-1, 8, 8)
    pix = np.einsum("ji,njk,kl->nil", _DCT_C, blocks, _DCT_C) + 128.0
    return (
        pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
    )


def _planes_to_image(planes: list[np.ndarray], w: int, h: int):
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


# ---------------------------------------------------------------------------
# Progressive decoder (T.81 Annex G). Coefficients accumulate across scans
# into per-component zigzag stores sized on the frame's MCU grid; the
# reconstruction tail (dequantize + batched-einsum IDCT + upsample) is the
# same code path the baseline decoder uses.
# ---------------------------------------------------------------------------


def _frame_grid(frame) -> tuple[int, int, int, int]:
    """(mcus_x, mcus_y, max_h, max_v) of the frame's MCU grid."""
    max_h = max(c["h"] for c in frame["comps"])
    max_v = max(c["v"] for c in frame["comps"])
    mcus_x = -(-frame["w"] // (8 * max_h))
    mcus_y = -(-frame["h"] // (8 * max_v))
    return mcus_x, mcus_y, max_h, max_v


def _alloc_progressive_stores(frame) -> list[np.ndarray]:
    """One zigzag coefficient store per frame component, sized to the
    MCU-padded block grid (stride = mcus_x * h_i), zero-initialized so
    never-transmitted bands decode as zero coefficients."""
    mcus_x, mcus_y, _, _ = _frame_grid(frame)
    return [
        np.zeros((mcus_y * c["v"] * mcus_x * c["h"], 64), dtype=np.int64)
        for c in frame["comps"]
    ]


def _ni_block_grid(frame, c) -> tuple[int, int, int]:
    """(blocks_wide, blocks_high, row_stride) of one component's
    non-interleaved block grid inside its MCU-padded store — T.81 G.1:
    single-component scans cover ceil(comp_dim/8), not the padded grid."""
    mcus_x, _, max_h, max_v = _frame_grid(frame)
    cw = -(-(frame["w"] * c["h"]) // max_h)
    ch = -(-(frame["h"] * c["v"]) // max_v)
    return -(-cw // 8), -(-ch // 8), mcus_x * c["h"]


def _refine_ac_block(reader, zz, ss, se, al, ac_tab, eobrun) -> int:
    """AC successive-approximation refinement for one block's band
    (libjpeg jdphuff.c decode_mcu_AC_refine): newly-significant coefs
    arrive as (r<<4)|1 + sign bit, already-significant coefs consume one
    correction bit each as the run walk passes them; inside an EOB run
    only correction bits remain. Returns the updated EOB run counter."""
    p1 = 1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _decode_symbol(reader, ac_tab)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.read_bits(r)
                    break
                # ZRL: advance past 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad successive-approx magnitude")
                val = p1 if reader.read_bit() else -p1
            while k <= se:
                cur = int(zz[k])
                if cur != 0:
                    if reader.read_bit() and not (abs(cur) & p1):
                        zz[k] = cur + (p1 if cur > 0 else -p1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if val and k <= se:
                zz[k] = val
            k += 1
    if eobrun > 0:
        # EOB region: correction bits only, for the rest of this block
        while k <= se:
            cur = int(zz[k])
            if cur != 0 and reader.read_bit() and not (abs(cur) & p1):
                zz[k] = cur + (p1 if cur > 0 else -p1)
            k += 1
        eobrun -= 1
    return eobrun


def _first_ac_block(reader, zz, ss, se, al, ac_tab, eobrun) -> int:
    """AC first scan for one block's band: baseline run/size coding of
    the point-transformed coefficients, plus EOBn symbols (s=0, r<15)
    that start a run of 2^r (+appended bits) all-zero bands."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_symbol(reader, ac_tab)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.read_bits(r)
                return eobrun - 1  # this block ends the band now
            k += 16  # ZRL
            continue
        k += r
        if k > se:
            raise ValueError("AC run past spectral band end")
        zz[k] = _extend(reader.read_bits(s), s) << al
        k += 1
    return 0


def _decode_progressive_scan(
    buf, pos, frame, scan_comps, htables, restart, stores, ss, se, ah, al
) -> int:
    """Decode one progressive scan's entropy data into the accumulated
    coefficient stores; returns the buffer offset of the next marker.
    Handles all four scan kinds (DC/AC x first/refine), interleaved and
    single-component block order, and DRI restart resync (predictor +
    EOB-run reset every `restart` MCU units)."""
    mcus_x, mcus_y, _, _ = _frame_grid(frame)
    comp_index = {id(c): i for i, c in enumerate(frame["comps"])}
    reader = _BitReader(buf, pos)
    eobrun = 0
    preds = [0] * len(scan_comps)
    unit = 0  # restart counter: MCUs (interleaved) or blocks (single-comp)

    def maybe_restart():
        nonlocal preds, eobrun
        if restart and unit and unit % restart == 0:
            reader.align_restart()
            preds = [0] * len(scan_comps)
            eobrun = 0

    if ss == 0:
        if len(scan_comps) > 1:
            order = []  # interleaved MCU order over all scan components
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    order.append(
                        [
                            (pi, c, (my * c["v"] + v) * mcus_x * c["h"]
                             + mx * c["h"] + hh)
                            for pi, (c, _, _) in enumerate(scan_comps)
                            for v in range(c["v"])
                            for hh in range(c["h"])
                        ]
                    )
        else:
            c = scan_comps[0][0]
            bw_ni, bh_ni, stride = _ni_block_grid(frame, c)
            order = [
                [(0, c, by * stride + bx)]
                for by in range(bh_ni)
                for bx in range(bw_ni)
            ]
        for mcu in order:
            maybe_restart()
            for pi, c, bi in mcu:
                store = stores[comp_index[id(c)]]
                if ah == 0:
                    dct = scan_comps[pi][1]
                    s = _decode_symbol(reader, htables[(0, dct)])
                    diff = _extend(reader.read_bits(s), s) if s else 0
                    preds[pi] += diff
                    store[bi][0] = preds[pi] << al
                else:
                    if reader.read_bit():
                        store[bi][0] = int(store[bi][0]) | (1 << al)
            unit += 1
    else:
        if len(scan_comps) != 1:
            raise ValueError("progressive AC scans must be single-component")
        c, _, act = scan_comps[0]
        ac_tab = htables[(1, act)]
        store = stores[comp_index[id(c)]]
        bw_ni, bh_ni, stride = _ni_block_grid(frame, c)
        block_fn = _first_ac_block if ah == 0 else _refine_ac_block
        for by in range(bh_ni):
            for bx in range(bw_ni):
                maybe_restart()
                eobrun = block_fn(
                    reader, store[by * stride + bx], ss, se, al, ac_tab,
                    eobrun,
                )
                unit += 1

    # skip to the next real marker (past stuffing and stray RSTn)
    p = reader.pos
    n = len(buf)
    while p + 1 < n:
        if buf[p] == 0xFF and buf[p + 1] != 0x00 and not (
            0xD0 <= buf[p + 1] <= 0xD7
        ):
            return p
        p += 1
    return n


def _reconstruct_progressive(frame, stores, qtables):
    """Final dequantize + IDCT over the accumulated coefficient stores —
    identical math to the baseline tail, so a fully-transmitted
    progressive stream reproduces its baseline twin's pixels exactly."""
    mcus_x, mcus_y, max_h, max_v = _frame_grid(frame)
    h, w = frame["h"], frame["w"]
    planes = []
    for ci, c in enumerate(frame["comps"]):
        plane = _idct_plane(
            stores[ci], qtables[c["tq"]], mcus_x * c["h"], mcus_y * c["v"]
        )
        fy, fx = max_v // c["v"], max_h // c["h"]
        if fy > 1 or fx > 1:
            plane = np.repeat(np.repeat(plane, fy, axis=0), fx, axis=1)
        planes.append(plane[:h, :w])
    return _planes_to_image(planes, w, h)
