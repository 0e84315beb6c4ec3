"""GIF (GIF87a/89a) codec — stdlib + numpy only.

Completes the multimodal stage's real image-codec family
(PPM/PNG/BMP/JPEG in their own modules): variable-width LZW with the
spec's code-size schedule, global/local color tables, interlaced row
ordering, 89a extension blocks skipped. The encoder exists as the
deterministic test-payload generator (and a usable palette-image sink);
the decoder returns the FIRST image frame as (h, w, 3) uint8.

Scope (honest boundary — unsupported inputs raise ``ValueError``):
multi-frame animation composition (only the first frame decodes),
transparency (the transparent index renders as its palette color).
"""

from __future__ import annotations

import struct

import numpy as np

_MAX_CODE_BITS = 12


class _LSBBitWriter:
    """LSB-first bit packer (GIF's bit order — opposite of JPEG)."""

    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, code: int, bits: int) -> None:
        self._acc |= (code & ((1 << bits) - 1)) << self._n
        self._n += bits
        while self._n >= 8:
            self.out.append(self._acc & 0xFF)
            self._acc >>= 8
            self._n -= 8

    def flush(self) -> bytes:
        if self._n:
            self.out.append(self._acc & 0xFF)
            self._acc = 0
            self._n = 0
        return bytes(self.out)


class _LSBBitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0  # bit position

    def read(self, bits: int) -> int:
        end = self.pos + bits
        if end > len(self.data) * 8:
            raise ValueError("GIF LZW stream exhausted mid-code")
        v = 0
        got = 0
        while got < bits:
            byte = self.data[(self.pos + got) // 8]
            bit_off = (self.pos + got) % 8
            take = min(8 - bit_off, bits - got)
            v |= ((byte >> bit_off) & ((1 << take) - 1)) << got
            got += take
        self.pos = end
        return v


def _lzw_encode(min_code_size: int, indices: "np.ndarray") -> bytes:
    """GIF variable-width LZW. Code size grows when the encoder's
    next_code reaches (1 << size) + 1 — one step AFTER the decoder's
    trigger, because the decoder's dictionary lags one entry behind."""
    clear = 1 << min_code_size
    end = clear + 1
    writer = _LSBBitWriter()

    def reset():
        return {(i,): i for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = reset()
    writer.write(clear, code_size)
    w: tuple[int, ...] = ()
    for k in indices:
        k = int(k)
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        writer.write(table[w], code_size)
        table[wk] = next_code
        next_code += 1
        if next_code == (1 << code_size) + 1 and code_size < _MAX_CODE_BITS:
            code_size += 1
        w = (k,)
        if next_code == (1 << _MAX_CODE_BITS):
            # dictionary full: flush pending, clear, start over
            writer.write(table[w], code_size)
            writer.write(clear, code_size)
            table, next_code, code_size = reset()
            w = ()
    if w:
        writer.write(table[w], code_size)
    writer.write(end, code_size)
    return writer.flush()


def _lzw_decode(min_code_size: int, data: bytes, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    end = clear + 1
    reader = _LSBBitReader(data)
    out = np.empty(n_pixels, dtype=np.uint8)
    filled = 0

    def reset():
        return {i: (i,) for i in range(clear)}, end + 1, min_code_size + 1

    table, next_code, code_size = reset()
    prev: tuple[int, ...] | None = None
    while filled < n_pixels:
        code = reader.read(code_size)
        if code == clear:
            table, next_code, code_size = reset()
            prev = None
            continue
        if code == end:
            break
        if code in table:
            entry = table[code]
        elif code == next_code and prev is not None:
            entry = prev + (prev[0],)
        else:
            raise ValueError(f"corrupt GIF LZW stream (code {code})")
        n = len(entry)
        if filled + n > n_pixels:
            entry = entry[: n_pixels - filled]
            n = len(entry)
        out[filled : filled + n] = entry
        filled += n
        if prev is not None and next_code < (1 << _MAX_CODE_BITS):
            table[next_code] = prev + (entry[0],)
            next_code += 1
            if next_code == (1 << code_size) and code_size < _MAX_CODE_BITS:
                code_size += 1
        prev = table[code] if code in table else entry
    if filled < n_pixels:
        raise ValueError(
            f"GIF image data ended early ({filled}/{n_pixels} pixels)"
        )
    return out


def _sub_blocks(data: bytes) -> bytes:
    """Pack bytes into <=255-byte GIF sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    return bytes(out)


def encode_gif(img: np.ndarray, interlace: bool = False) -> bytes:
    """GIF89a bytes from an (h, w, 3) uint8 image with <= 256 distinct
    colors (the format is palette-indexed; richer images must be
    quantized upstream)."""
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError("expected (h, w, 3) uint8 array")
    h, w, _ = img.shape
    flat = img.reshape(-1, 3)
    palette, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError(f"{len(palette)} colors exceed GIF's 256-entry palette")
    # palette size must be a power of two >= 2
    bits = max(1, int(len(palette) - 1).bit_length())
    table = np.zeros((1 << bits, 3), dtype=np.uint8)
    table[: len(palette)] = palette
    indices = inverse.astype(np.uint32).reshape(h, w)
    if interlace:
        order = _interlace_rows(h)
        indices = indices[order]
    min_code_size = max(2, bits)

    out = bytearray(b"GIF89a")
    packed = 0x80 | ((bits - 1) << 4) | (bits - 1)  # GCT flag, res, size
    out += struct.pack("<HHBBB", w, h, packed, 0, 0)
    out += table.tobytes()
    img_packed = 0x40 if interlace else 0x00  # no LCT; interlace flag
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, img_packed)
    out.append(min_code_size)
    out += _sub_blocks(_lzw_encode(min_code_size, indices.reshape(-1)))
    out += b"\x3b"
    return bytes(out)


def _interlace_rows(h: int) -> np.ndarray:
    """GIF interlace pass order: rows 0,8,16.. then 4,12.. then 2,6..
    then 1,3,5.."""
    return np.concatenate(
        [np.arange(0, h, 8), np.arange(4, h, 8), np.arange(2, h, 4), np.arange(1, h, 2)]
    ).astype(np.int64)


def decode_gif(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from the FIRST image frame of a GIF87a/89a
    payload. Extensions are skipped; local color tables and interlacing
    are honored."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    sw, sh, packed, _bg, _aspect = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x07)
        gct = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
        pos += n * 3
    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while pos < len(payload) and payload[pos] != 0:
                pos += 1 + payload[pos]
            if pos >= len(payload):  # contract: corrupt GIFs raise
                raise ValueError("GIF truncated inside extension blocks")
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unknown GIF block 0x{block:02x} at byte {pos - 1}")
        left, top, iw, ih, ipacked = struct.unpack("<HHHHB", payload[pos : pos + 9])
        pos += 9
        ct = gct
        if ipacked & 0x80:  # local color table
            n = 2 << (ipacked & 0x07)
            ct = np.frombuffer(payload, dtype=np.uint8, count=n * 3, offset=pos).reshape(n, 3)
            pos += n * 3
        if ct is None:
            raise ValueError("GIF image has no color table")
        min_code_size = payload[pos]
        pos += 1
        data = bytearray()
        while pos < len(payload) and payload[pos] != 0:
            ln = payload[pos]
            data.extend(payload[pos + 1 : pos + 1 + ln])
            pos += 1 + ln
        if pos >= len(payload):  # contract: corrupt GIFs raise
            raise ValueError("GIF truncated inside image data blocks")
        pos += 1
        idx = _lzw_decode(min_code_size, bytes(data), iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in pass order
            order = _interlace_rows(ih)
            deinterlaced = np.empty_like(idx)
            deinterlaced[order] = idx
            idx = deinterlaced
        if int(idx.max(initial=0)) >= len(ct):
            raise ValueError("GIF pixel index outside the color table")
        return ct[idx]
    raise ValueError("GIF contains no image frame")
