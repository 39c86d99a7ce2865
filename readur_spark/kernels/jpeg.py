"""Baseline JPEG codec (grayscale, sequential DCT) in pure numpy.

Closes the A35 thumbnail codec parity gap: the reference encodes
thumbnails as JPEG (src/services/file_service.rs:285-385, via the
`image` crate's JPEG encoder after Lanczos3 resize); earlier rounds
emitted PNG because the container has no JPEG library. This module
implements the ITU-T T.81 baseline process from the public spec —
8x8 FDCT, Annex K.1 luminance quantization scaled by the libjpeg
quality formula, zigzag + DC-differential + run-length coding with
the Annex K.3 "typical" Huffman tables, JFIF container — plus the
matching decoder so the image branch can ingest real .jpg payloads
and the tests can assert a round-trip PSNR bound without any
external codec.

Scope (documented): 8-bit baseline, 1-component grayscale or
3-component YCbCr 4:4:4 (what the reference's `image` crate emits
for thumbnails and placeholders, src/services/file_service.rs:
315-337, 441-466 — RGB in, no chroma subsampling). The decoder
returns None for progressive / subsampled / 12-bit streams, which
the caller treats as undecodable exactly like a corrupt PNG.

Everything here derives from the public T.81 spec and the public
libjpeg quality-scaling convention; no code is taken from any
implementation.
"""

from __future__ import annotations

import struct

import numpy as np

# --- ITU-T T.81 Annex K constants ------------------------------------------

# K.1 luminance quantization table, row-major (natural order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# K.2 chrominance quantization table, row-major (natural order)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int32,
).reshape(8, 8)

# K.3.1 DC luminance: (#codes of length 1..16, symbol values)
DC_BITS = (0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0)
DC_VALS = tuple(range(12))

# K.3.3 DC chrominance
DC_BITS_C = (0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0)
DC_VALS_C = tuple(range(12))

# K.3.2 AC luminance
AC_BITS = (0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D)
AC_VALS = (
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
)

# K.3.4 AC chrominance
AC_BITS_C = (0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77)
AC_VALS_C = (
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
)

# zigzag index i -> natural (row-major) index
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10,
        17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34,
        27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36,
        29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46,
        53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II matrix: T @ B @ T.T is exactly the T.81 FDCT
_T = np.empty((8, 8), dtype=np.float64)
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _T[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)
del _u, _x, _c


def quality_scaled_table(
    quality: int, base: np.ndarray = QUANT_LUMA
) -> np.ndarray:
    """Annex K table scaled by the public libjpeg quality convention:
    scale = 5000/q (q<50) else 200-2q; entries clamped to [1, 255]."""
    quality = max(1, min(100, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    q = (base.astype(np.int64) * scale + 50) // 100
    return np.clip(q, 1, 255).astype(np.int32)


def _canonical_codes(bits, vals) -> dict[int, tuple[int, int]]:
    """symbol -> (code, nbits) per the T.81 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


_DC_CODES = _canonical_codes(DC_BITS, DC_VALS)
_AC_CODES = _canonical_codes(AC_BITS, AC_VALS)
_DC_CODES_C = _canonical_codes(DC_BITS_C, DC_VALS_C)
_AC_CODES_C = _canonical_codes(AC_BITS_C, AC_VALS_C)


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def put(self, code: int, nbits: int) -> None:
        self._acc = (self._acc << nbits) | (code & ((1 << nbits) - 1))
        self._n += nbits
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:
                self.buf.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            pad = 8 - self._n
            self.put((1 << pad) - 1, pad)


def _magnitude(v: int) -> tuple[int, int]:
    """(size category, amplitude bits) per T.81 F.1.2.1/F.1.2.2."""
    if v == 0:
        return 0, 0
    size = int(abs(v)).bit_length()
    if v < 0:
        v = v + (1 << size) - 1
    return size, v & ((1 << size) - 1)


def _blocks_of(img: np.ndarray) -> tuple[np.ndarray, int, int]:
    """Pad to 8-multiples by edge replication, return (N,8,8) float blocks
    in raster MCU order plus the padded block-grid shape."""
    h, w = img.shape
    ph, pw = (-h) % 8, (-w) % 8
    padded = np.pad(img, ((0, ph), (0, pw)), mode="edge").astype(np.float64)
    hb, wb = padded.shape[0] // 8, padded.shape[1] // 8
    blocks = (
        padded.reshape(hb, 8, wb, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )
    return blocks, hb, wb


def _quantized_zz(plane: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Level-shift, FDCT, quantize, zigzag: (H,W) float -> (N,64) int32.
    Vectorized over all blocks at once."""
    blocks, _, _ = _blocks_of(plane)
    shifted = blocks - 128.0
    coefs = np.einsum("ux,nxy,vy->nuv", _T, shifted, _T)
    scaled = coefs / qtab.astype(np.float64)
    quant = (np.sign(scaled) * np.floor(np.abs(scaled) + 0.5)).astype(np.int32)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(
    bw: _BitWriter,
    row: np.ndarray,
    prev_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
    end: int,
) -> int:
    """Entropy-code one zigzag block; returns its DC for the predictor."""
    diff = int(row[0]) - prev_dc
    size, amp = _magnitude(diff)
    code, nbits = dc_codes[size]
    bw.put(code, nbits)
    if size:
        bw.put(amp, size)
    run = 0
    for i in range(1, end + 1):
        v = int(row[i])
        if v == 0:
            run += 1
            continue
        while run >= 16:
            zc, zn = ac_codes[0xF0]  # ZRL
            bw.put(zc, zn)
            run -= 16
        size, amp = _magnitude(v)
        code, nbits = ac_codes[(run << 4) | size]
        bw.put(code, nbits)
        bw.put(amp, size)
        run = 0
    if end < 63:
        code, nbits = ac_codes[0x00]  # EOB
        bw.put(code, nbits)
    return int(row[0])


def _last_nonzero(zz: np.ndarray) -> np.ndarray:
    """Per-block index of the last nonzero AC coefficient (0 = none)."""
    nz = zz[:, 1:] != 0
    return np.where(nz.any(axis=1), 63 - np.argmax(nz[:, ::-1], axis=1), 0)


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">HH", marker, len(payload) + 2) + payload


def _headers(
    h: int, w: int, qtabs: list[np.ndarray], ncomp: int
) -> bytes:
    out = bytearray()
    out += b"\xFF\xD8"  # SOI
    out += _seg(0xFFE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    for tq, qtab in enumerate(qtabs):
        zz_qtab = qtab.reshape(-1)[ZIGZAG].astype(np.uint8).tobytes()
        out += _seg(0xFFDB, bytes([tq]) + zz_qtab)  # Pq=0
    # SOF0: 8-bit; component c -> id c+1, 1x1 sampling, qtable 0 (luma)
    # for the first component, 1 (chroma) for the rest
    comps = b"".join(
        bytes([c + 1, 0x11, 0 if c == 0 else 1]) for c in range(ncomp)
    )
    out += _seg(0xFFC0, struct.pack(">BHHB", 8, h, w, ncomp) + comps)
    out += _seg(0xFFC4, b"\x00" + bytes(DC_BITS) + bytes(DC_VALS))
    out += _seg(0xFFC4, b"\x10" + bytes(AC_BITS) + bytes(AC_VALS))
    if ncomp > 1:
        out += _seg(0xFFC4, b"\x01" + bytes(DC_BITS_C) + bytes(DC_VALS_C))
        out += _seg(0xFFC4, b"\x11" + bytes(AC_BITS_C) + bytes(AC_VALS_C))
    # SOS: component c -> huffman pair 0 (luma) or 1,1 (chroma)
    sos = bytes([ncomp]) + b"".join(
        bytes([c + 1, 0x00 if c == 0 else 0x11]) for c in range(ncomp)
    ) + b"\x00\x3F\x00"
    out += _seg(0xFFDA, sos)
    return bytes(out)


def encode_jpeg_gray(img: np.ndarray, quality: int = 85) -> bytes:
    """Encode a 2-D uint8 array as a baseline JFIF JPEG (1 component).

    The DCT/quantize/zigzag stages are numpy-vectorized over all
    blocks at once; only the entropy coder walks coefficients in
    Python (bounded by the thumbnail box, ~625 blocks at 200x200)."""
    if img.ndim != 2 or img.size == 0:
        raise ValueError("encode_jpeg_gray expects a non-empty 2-D array")
    if img.dtype != np.uint8:
        img = np.clip(img, 0, 255).astype(np.uint8)
    h, w = img.shape
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image too large for baseline JPEG")
    qtab = quality_scaled_table(quality)
    zz = _quantized_zz(img.astype(np.float64), qtab)
    last = _last_nonzero(zz)
    bw = _BitWriter()
    prev_dc = 0
    for b in range(zz.shape[0]):
        prev_dc = _encode_block(
            bw, zz[b], prev_dc, _DC_CODES, _AC_CODES, int(last[b])
        )
    bw.flush()
    return _headers(h, w, [qtab], 1) + bytes(bw.buf) + b"\xFF\xD9"


def rgb_to_ycbcr(rgb: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """JFIF full-range RGB -> (Y, Cb, Cr) float64 planes."""
    r = rgb[..., 0].astype(np.float64)
    g = rgb[..., 1].astype(np.float64)
    b = rgb[..., 2].astype(np.float64)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
    cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
    return y, cb, cr


def encode_jpeg_rgb(rgb: np.ndarray, quality: int = 85) -> bytes:
    """Encode an (H,W,3) uint8 RGB array as baseline YCbCr 4:4:4 JFIF —
    the stream layout the reference's `image` crate writes for
    thumbnails and solid-color placeholders
    (src/services/file_service.rs:315-337, 441-466)."""
    if rgb.ndim != 3 or rgb.shape[2] != 3 or rgb.size == 0:
        raise ValueError("encode_jpeg_rgb expects a non-empty (H,W,3) array")
    if rgb.dtype != np.uint8:
        rgb = np.clip(rgb, 0, 255).astype(np.uint8)
    h, w = rgb.shape[:2]
    if h > 0xFFFF or w > 0xFFFF:
        raise ValueError("image too large for baseline JPEG")
    q_l = quality_scaled_table(quality, QUANT_LUMA)
    q_c = quality_scaled_table(quality, QUANT_CHROMA)
    planes = rgb_to_ycbcr(rgb)
    zzs = [
        _quantized_zz(planes[0], q_l),
        _quantized_zz(planes[1], q_c),
        _quantized_zz(planes[2], q_c),
    ]
    lasts = [_last_nonzero(z) for z in zzs]
    dc_codes = [_DC_CODES, _DC_CODES_C, _DC_CODES_C]
    ac_codes = [_AC_CODES, _AC_CODES_C, _AC_CODES_C]
    bw = _BitWriter()
    prev = [0, 0, 0]
    # 4:4:4 MCU = one block of each component, raster order
    for b in range(zzs[0].shape[0]):
        for c in range(3):
            prev[c] = _encode_block(
                bw, zzs[c][b], prev[c], dc_codes[c], ac_codes[c],
                int(lasts[c][b]),
            )
    bw.flush()
    return _headers(h, w, [q_l, q_c], 3) + bytes(bw.buf) + b"\xFF\xD9"


# --- decoder ----------------------------------------------------------------


class _BitReader:
    """MSB-first reader over de-stuffed entropy data."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise EOFError
            self._acc = self.data[self.pos]
            self.pos += 1
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_tables(bits, vals) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol."""
    out: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return out


def _read_symbol(br: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid Huffman code")


def _extend(amp: int, size: int) -> int:
    """T.81 F.2.2.1 EXTEND: map amplitude bits back to a signed value."""
    if size == 0:
        return 0
    if amp < (1 << (size - 1)):
        return amp - (1 << size) + 1
    return amp


def decode_jpeg_gray(data: bytes) -> np.ndarray | None:
    """Decode a baseline JPEG to grayscale. 1-component streams return
    the single plane; 3-component 4:4:4 streams return the luma plane
    (the engine's kernels are grayscale, matching the reference's own
    pre-OCR grayscale conversion). Returns None for anything outside
    the profile (progressive, subsampled, 12-bit, arithmetic,
    restart-interval streams) or any parse error — the caller treats
    None exactly like a corrupt PNG payload."""
    planes = _decode_planes(data)
    if planes is None:
        return None
    return planes[0]


def decode_jpeg_rgb(data: bytes) -> np.ndarray | None:
    """Decode a 3-component 4:4:4 baseline JPEG to an (H,W,3) uint8 RGB
    array (1-component streams are replicated to 3 channels)."""
    planes = _decode_planes(data)
    if planes is None:
        return None
    if len(planes) == 1:
        return np.repeat(planes[0][..., None], 3, axis=2)
    y = planes[0].astype(np.float64)
    cb = planes[1].astype(np.float64) - 128.0
    cr = planes[2].astype(np.float64) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(
        np.round(np.stack([r, g, b], axis=-1)), 0, 255
    ).astype(np.uint8)


def _decode_planes(data: bytes) -> list[np.ndarray] | None:
    try:
        return _decode_planes_inner(data)
    except Exception:
        return None


def _decode_planes_inner(data: bytes) -> list[np.ndarray] | None:
    if not data.startswith(b"\xFF\xD8"):
        return None
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    htabs: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    h = w = None
    comp_ids: list[int] = []
    comp_q: dict[int, int] = {}
    scan_tabs: dict[int, tuple[int, int]] = {}
    scan_order: list[int] = []
    scan_start = None
    while pos + 4 <= len(data):
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD9:  # EOI before SOS
            return None
        (length,) = struct.unpack(">H", data[pos + 2 : pos + 4])
        payload = data[pos + 4 : pos + 2 + length]
        if marker == 0xDB:  # DQT (possibly several tables per segment)
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    return None  # 16-bit tables: out of profile
                tab = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                nat = np.empty(64, dtype=np.int32)
                nat[ZIGZAG] = tab
                qtabs[tq] = nat.reshape(8, 8)
                p += 65
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(payload):
                tc, th = payload[p] >> 4, payload[p] & 0x0F
                bits = tuple(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = tuple(payload[p + 17 : p + 17 + n])
                htabs[(tc, th)] = _decode_tables(bits, vals)
                p += 17 + n
        elif marker == 0xC0:  # SOF0 baseline
            precision = payload[0]
            h, w = struct.unpack(">HH", payload[1:5])
            ncomp = payload[5]
            if precision != 8 or ncomp not in (1, 3):
                return None
            for c in range(ncomp):
                cid = payload[6 + 3 * c]
                if payload[7 + 3 * c] != 0x11:  # 4:4:4 only
                    return None
                comp_ids.append(cid)
                comp_q[cid] = payload[8 + 3 * c]
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # non-baseline SOF: out of profile
        elif marker == 0xDD:  # DRI: restart intervals unsupported
            if struct.unpack(">H", payload[:2])[0] != 0:
                return None
        elif marker == 0xDA:  # SOS
            ns = payload[0]
            if ns != len(comp_ids):
                return None
            for c in range(ns):
                cid = payload[1 + 2 * c]
                td_ta = payload[2 + 2 * c]
                scan_tabs[cid] = (td_ta >> 4, td_ta & 0x0F)
                scan_order.append(cid)
            scan_start = pos + 2 + length
            break
        pos += 2 + length
    if scan_start is None or h is None or not h or not w:
        return None
    for cid in scan_order:
        if comp_q.get(cid) not in qtabs:
            return None
        td, ta = scan_tabs[cid]
        if (0, td) not in htabs or (1, ta) not in htabs:
            return None

    # de-stuff entropy data up to the next marker
    scan = bytearray()
    p = scan_start
    while p < len(data):
        byte = data[p]
        if byte == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else 0xD9
            if nxt == 0x00:
                scan.append(0xFF)
                p += 2
                continue
            break
        scan.append(byte)
        p += 1

    hb, wb = (h + 7) // 8, (w + 7) // 8
    n_blocks = hb * wb
    ncomp = len(scan_order)
    zz = {cid: np.zeros((n_blocks, 64), dtype=np.int32) for cid in scan_order}
    br = _BitReader(bytes(scan))
    dc = {cid: 0 for cid in scan_order}
    for b in range(n_blocks):
        for cid in scan_order:  # 4:4:4 MCU: one block per component
            td, ta = scan_tabs[cid]
            dc_tab, ac_tab = htabs[(0, td)], htabs[(1, ta)]
            size = _read_symbol(br, dc_tab)
            dc[cid] += _extend(br.bits(size), size) if size else 0
            zz[cid][b, 0] = dc[cid]
            i = 1
            while i < 64:
                sym = _read_symbol(br, ac_tab)
                if sym == 0x00:  # EOB
                    break
                run, size = sym >> 4, sym & 0x0F
                if size == 0:
                    if run != 15:
                        raise ValueError("bad AC symbol")
                    i += 16  # ZRL
                    continue
                i += run
                if i >= 64:
                    raise ValueError("AC index overflow")
                zz[cid][b, i] = _extend(br.bits(size), size)
                i += 1

    planes: list[np.ndarray] = []
    for cid in scan_order:
        qtab = qtabs[comp_q[cid]]
        nat = np.zeros((n_blocks, 64), dtype=np.int32)
        nat[:, ZIGZAG] = zz[cid]
        coefs = (
            nat.reshape(-1, 8, 8).astype(np.float64)
            * qtab.astype(np.float64)
        )
        pixels = np.einsum("xu,nuv,yv->nxy", _T.T, coefs, _T.T) + 128.0
        pixels = np.clip(np.round(pixels), 0, 255).astype(np.uint8)
        img = (
            pixels.reshape(hb, wb, 8, 8).transpose(0, 2, 1, 3)
            .reshape(hb * 8, wb * 8)
        )
        planes.append(img[:h, :w])
    if ncomp == 3:
        return planes
    return planes[:1]
