"""Baseline JPEG (ITU-T T.81) codec — stdlib + numpy only.

Real compressed-image support for the multimodal decode stage
(``ops/multimodal.py``): the container has no PIL/libjpeg, so this module
implements the baseline sequential DCT process from the public spec —
enough to round-trip the JPEGs the encoder here produces and to decode
any 8-bit baseline (SOF0) Huffman JPEG with 4:4:4 / 4:2:2 / 4:2:0
sampling and no restart markers.

Scope (the honest boundary — out-of-scope inputs raise ``ValueError``
with the reason): progressive (SOF2), arithmetic coding, 12-bit
precision, DRI/restart intervals, >4 components.

Encoder: standard Annex K quantization + Huffman tables, libjpeg-style
quality scaling, 4:4:4 or 4:2:0 subsampling. The DCT/quantize path is
vectorized over all blocks (einsum batch DCT); only entropy coding walks
blocks in Python — fine for the payload sizes the media table carries.

Reference parity note: the reference repo has no image pipeline at all
(single-document CTI text tool); this codec exists for the SURVEY's
multimodal-column requirement, so the contract here is the public JPEG
spec, not a reference file.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------------------
# Tables (ITU-T T.81 Annex K — the public example tables every baseline
# codec ships)
# ---------------------------------------------------------------------------

QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int64,
)

QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int64,
)

# zigzag[k] = row-major index of the k-th coefficient in zigzag order
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)
UNZIGZAG = np.argsort(ZIGZAG)

DC_LUMA_BITS = [0, 0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))

AC_LUMA_BITS = [0, 0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

AC_CHROMA_BITS = [0, 0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

# orthonormal 8-point DCT-II matrix; 2D: F = A @ f @ A.T, f = A.T @ F @ A
_A = np.zeros((8, 8))
for _u in range(8):
    _c = np.sqrt(1.0 / 8.0) if _u == 0 else np.sqrt(2.0 / 8.0)
    for _x in range(8):
        _A[_u, _x] = _c * np.cos((2 * _x + 1) * _u * np.pi / 16.0)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """libjpeg-compatible quality scaling of an Annex K table."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in [1, 100]")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) from a (BITS, HUFFVAL) spec (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol map for the bit-walking decoder."""
    return {(ln, code): sym for sym, (code, ln) in _canonical_codes(bits, vals).items()}


def _magnitude(v: int) -> tuple[int, int]:
    """(category, appended-bits) for a DC diff / AC coefficient value."""
    if v == 0:
        return 0, 0
    s = int(abs(v)).bit_length()
    return s, (v if v > 0 else v + (1 << s) - 1)


class _BitWriter:
    """MSB-first bit writer with 0xFF byte stuffing (T.81 B.1.1.5)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            self._n -= 8
            byte = (self._acc >> self._n) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)
        self._acc &= (1 << self._n) - 1

    def flush(self) -> bytes:
        if self._n:
            self.write(0xFF, 8 - self._n)  # pad with 1-bits
        return bytes(self.out)


class _BitReader:
    """MSB-first bit reader over an entropy segment with stuffing removal."""

    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._n = 0

    def read_bit(self) -> int:
        if self._n == 0:
            if self.pos >= len(self.data):
                raise ValueError("JPEG entropy data exhausted mid-block")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("JPEG truncated after 0xFF in scan")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(
                        f"unexpected marker 0xFF{marker:02X} inside scan "
                        "(restart intervals not supported)"
                    )
            self._acc = byte
            self._n = 8
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid JPEG Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map s received bits to a signed value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


# ---------------------------------------------------------------------------
# Encoder
# ---------------------------------------------------------------------------


def _rgb_to_ycbcr(img: np.ndarray) -> np.ndarray:
    """JFIF full-range YCbCr, float64 (h, w, 3)."""
    x = img.astype(np.float64)
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168735892 * r - 0.331264108 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418687589 * g - 0.081312411 * b
    return np.stack([y, cb, cr], axis=-1)


def _ycbcr_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, b], axis=-1).round(), 0, 255).astype(np.uint8)


def _pad_edge(plane: np.ndarray, mult: int) -> np.ndarray:
    h, w = plane.shape
    ph = (-h) % mult
    pw = (-w) % mult
    if ph or pw:
        plane = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    return plane


def _plane_blocks(plane: np.ndarray) -> np.ndarray:
    """(nblocks, 8, 8) row-major block view of a %8-padded plane."""
    h, w = plane.shape
    return (
        plane.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    )


def _fdct_quant(blocks: np.ndarray, qtab: np.ndarray) -> np.ndarray:
    """Batch forward DCT + quantize: (n, 8, 8) int zigzag coefficients."""
    shifted = blocks.astype(np.float64) - 128.0
    coef = np.einsum("ux,nxy,vy->nuv", _A, shifted, _A)
    quant = np.round(coef / qtab.astype(np.float64)).astype(np.int64)
    return quant.reshape(-1, 64)[:, ZIGZAG]


def _encode_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-code one zigzag block; returns the new DC predictor."""
    dc = int(zz[0])
    s, bits = _magnitude(dc - pred)
    code, ln = dc_codes[s]
    writer.write(code, ln)
    if s:
        writer.write(bits, s)
    run = 0
    last_nz = int(np.nonzero(zz[1:])[0][-1]) + 1 if np.any(zz[1:]) else 0
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = ac_codes[0xF0]  # ZRL
            writer.write(code, ln)
            run -= 16
        s, bits = _magnitude(v)
        code, ln = ac_codes[(run << 4) | s]
        writer.write(code, ln)
        writer.write(bits, s)
        run = 0
    if last_nz < 63:
        code, ln = ac_codes[0x00]  # EOB
        writer.write(code, ln)
    return dc


def _dqt_segment(tid: int, table: np.ndarray) -> bytes:
    body = bytes([tid]) + bytes(int(v) for v in table.reshape(-1)[ZIGZAG])
    return b"\xff\xdb" + struct.pack(">H", len(body) + 2) + body


def _dht_segment(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
    body = bytes([(cls << 4) | tid]) + bytes(bits[1:17]) + bytes(vals)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(
    img: np.ndarray, quality: int = 85, subsampling: str = "4:4:4"
) -> bytes:
    """Baseline JFIF JPEG bytes from (h, w, 3) RGB or (h, w) gray uint8.

    ``subsampling``: "4:4:4" (no chroma subsampling) or "4:2:0"
    (chroma halved both axes). Grayscale input emits a 1-component scan.
    """
    if img.ndim == 2:
        planes = [img.astype(np.float64)]
        sampling = [(1, 1)]
    elif img.ndim == 3 and img.shape[2] == 3:
        ycc = _rgb_to_ycbcr(img)
        if subsampling == "4:4:4":
            planes = [ycc[..., 0], ycc[..., 1], ycc[..., 2]]
            sampling = [(1, 1), (1, 1), (1, 1)]
        elif subsampling == "4:2:0":
            y = ycc[..., 0]
            # area-mean 2x2 chroma downsample over an even-padded plane
            def down(p: np.ndarray) -> np.ndarray:
                p = _pad_edge(p, 2)
                return 0.25 * (p[0::2, 0::2] + p[0::2, 1::2] + p[1::2, 0::2] + p[1::2, 1::2])

            planes = [y, down(ycc[..., 1]), down(ycc[..., 2])]
            sampling = [(2, 2), (1, 1), (1, 1)]
        else:
            raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    else:
        raise ValueError("expected (h, w) gray or (h, w, 3) RGB uint8 array")

    h, w = img.shape[:2]
    ncomp = len(planes)
    qluma = _scaled_quant(QUANT_LUMA, quality)
    qchroma = _scaled_quant(QUANT_CHROMA, quality)
    qtabs = [qluma] + [qchroma] * (ncomp - 1)
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)

    # Per-component zigzag coefficient grids, padded to MCU multiples.
    comp_zz = []  # (blocks_y, blocks_x, 64) per component
    for plane, (sh, sv), qt in zip(planes, sampling, qtabs):
        target_h = -(-h * sv // vmax)
        target_w = -(-w * sh // hmax)
        plane = plane[: target_h, : target_w] if plane.shape[0] > target_h else plane
        plane = _pad_edge(plane, 8 * 1)
        # pad so the block grid is a multiple of the MCU block span
        mcus_x = -(-w // (8 * hmax))
        mcus_y = -(-h // (8 * vmax))
        need_w, need_h = mcus_x * sh * 8, mcus_y * sv * 8
        ph, pw = need_h - plane.shape[0], need_w - plane.shape[1]
        if ph > 0 or pw > 0:
            plane = np.pad(plane, ((0, max(ph, 0)), (0, max(pw, 0))), mode="edge")
        zz = _fdct_quant(_plane_blocks(plane), qt)
        comp_zz.append(zz.reshape(plane.shape[0] // 8, plane.shape[1] // 8, 64))

    dc_tables = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)] + [
        _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ] * (ncomp - 1)
    ac_tables = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)] + [
        _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    ] * (ncomp - 1)

    writer = _BitWriter()
    preds = [0] * ncomp
    mcus_x = -(-w // (8 * hmax))
    mcus_y = -(-h // (8 * vmax))
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci in range(ncomp):
                sh, sv = sampling[ci]
                for by in range(sv):
                    for bx in range(sh):
                        zz = comp_zz[ci][my * sv + by, mx * sh + bx]
                        preds[ci] = _encode_block(
                            writer, zz, preds[ci], dc_tables[ci], ac_tables[ci]
                        )
    scan = writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    out += _dqt_segment(0, qluma)
    if ncomp > 1:
        out += _dqt_segment(1, qchroma)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sh, sv = sampling[ci]
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += _dht_segment(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
    out += _dht_segment(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
    if ncomp > 1:
        out += _dht_segment(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        out += _dht_segment(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos
    out += scan
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
# ---------------------------------------------------------------------------


def decode_jpeg(payload: bytes) -> np.ndarray:
    """(h, w, 3) RGB (or (h, w, 1) gray) uint8 from baseline JPEG bytes.

    Supports 8-bit baseline sequential Huffman (SOF0), 1 or 3 components,
    any sampling factors up to 2x2 (covers 4:4:4 / 4:2:2 / 4:2:0).
    Raises ``ValueError`` for progressive / arithmetic / 12-bit / DRI.
    """
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    pos = 2
    qtabs: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    frame = None  # (h, w, [(cid, sh, sv, qid)])
    scan_comps = None
    scan_start = None
    while pos + 4 <= len(payload):
        if payload[pos] != 0xFF:
            raise ValueError(f"bad marker alignment at byte {pos}")
        # T.81 B.1.1.2: any number of 0xFF fill bytes may pad a marker
        while payload[pos + 1] == 0xFF and pos + 2 < len(payload):
            pos += 1
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        if pos + 2 + seglen > len(payload):
            raise ValueError("truncated JPEG segment")
        seg = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT (may hold several tables)
            off = 0
            while off < len(seg):
                pq, tq = seg[off] >> 4, seg[off] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quantization tables not supported")
                tab = np.frombuffer(seg[off + 1 : off + 65], dtype=np.uint8)
                full = np.zeros(64, dtype=np.int64)
                full[ZIGZAG] = tab
                qtabs[tq] = full.reshape(8, 8)
                off += 65
        elif marker == 0xC4:  # DHT (may hold several tables)
            off = 0
            while off < len(seg):
                cls, tid = seg[off] >> 4, seg[off] & 0x0F
                bits = [0] + list(seg[off + 1 : off + 17])
                n = sum(bits)
                vals = list(seg[off + 17 : off + 17 + n])
                huff[(cls, tid)] = _decode_table(bits, vals)
                off += 17 + n
        elif marker == 0xC0 or marker == 0xC1:  # SOF0 / SOF1 (baseline)
            prec, fh, fw, nc = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError(f"only 8-bit precision supported, got {prec}")
            comps = []
            for i in range(nc):
                cid, samp, qid = seg[6 + 3 * i : 9 + 3 * i]
                comps.append((cid, samp >> 4, samp & 0x0F, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                f"unsupported JPEG process (SOF{marker - 0xC0}); "
                "only baseline sequential Huffman (SOF0/SOF1) is supported"
            )
        elif marker == 0xDD:
            raise ValueError("restart intervals (DRI) not supported")
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            if frame is not None and ns != len(frame[2]):
                raise ValueError(
                    "non-interleaved multi-scan baseline JPEG not supported "
                    f"(scan covers {ns} of {len(frame[2])} components)"
                )
            scan_comps = [(seg[1 + 2 * i], seg[2 + 2 * i] >> 4, seg[2 + 2 * i] & 0x0F) for i in range(ns)]
            scan_start = pos
            break
        # APPn / COM / others: skipped
    if frame is None or scan_comps is None:
        raise ValueError("JPEG missing SOF/SOS")
    fh, fw, comps = frame
    if len(comps) not in (1, 3):
        raise ValueError(f"{len(comps)}-component JPEG not supported")

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcus_x = -(-fw // (8 * hmax))
    mcus_y = -(-fh // (8 * vmax))

    reader = _BitReader(payload[scan_start:])
    order = {cid: i for i, (cid, _, _, _) in enumerate(comps)}
    planes = [
        np.zeros((mcus_y * sv * 8, mcus_x * sh * 8), dtype=np.float64)
        for (_, sh, sv, _) in comps
    ]
    preds = [0] * len(comps)
    dcsel = [0] * len(comps)
    acsel = [0] * len(comps)
    for cid, dct, act in scan_comps:
        i = order[cid]
        dcsel[i], acsel[i] = dct, act

    for my in range(mcus_y):
        for mx in range(mcus_x):
            for i, (_cid, sh, sv, qid) in enumerate(comps):
                dc_tab = huff.get((0, dcsel[i]))
                ac_tab = huff.get((1, acsel[i]))
                qt = qtabs.get(qid)
                if dc_tab is None or ac_tab is None or qt is None:
                    raise ValueError("JPEG scan references missing DQT/DHT table")
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int64)
                        s = reader.decode_symbol(dc_tab)
                        diff = _extend(reader.receive(s), s)
                        preds[i] += diff
                        zz[0] = preds[i]
                        k = 1
                        while k < 64:
                            rs = reader.decode_symbol(ac_tab)
                            r, s = rs >> 4, rs & 0x0F
                            if s == 0:
                                if r == 15:
                                    k += 16  # ZRL
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC run overflows block")
                            zz[k] = _extend(reader.receive(s), s)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[ZIGZAG] = zz * qt.reshape(-1)[ZIGZAG]
                        pix = _A.T @ block.reshape(8, 8) @ _A + 128.0
                        y0 = (my * sv + by) * 8
                        x0 = (mx * sh + bx) * 8
                        planes[i][y0 : y0 + 8, x0 : x0 + 8] = pix

    if len(comps) == 1:
        gray = np.clip(planes[0][:fh, :fw].round(), 0, 255).astype(np.uint8)
        return gray[:, :, None]
    # upsample chroma to luma resolution by replication, crop, convert
    full = []
    for plane, (_cid, sh, sv, _qid) in zip(planes, comps):
        if sh < hmax:
            plane = np.repeat(plane, hmax // sh, axis=1)
        if sv < vmax:
            plane = np.repeat(plane, vmax // sv, axis=0)
        full.append(plane[:fh, :fw])
    return _ycbcr_to_rgb(full[0], full[1], full[2])
