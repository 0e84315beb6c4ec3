"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Image/audio/video payloads are carried as ``binary`` columns with sidecar
metadata columns; decode / feature-extraction / resize / frame-sample run
as actor-pool ``map_batches`` stages with SMALL batch sizes (a batch ×
concurrency of multi-MB payloads must fit the worker heap — SURVEY
"Memory-aware").

The decode libraries (PIL/ffmpeg/librosa) are NOT present in this
container, so the codec boundary is stubbed: ``DecodeImageStage`` raises
``NotImplementedError`` unless ``fake=True``, in which case a
deterministic fake decoder produces stable per-payload features. The Ray
plumbing — schema, actor signature, batch sizing, output layout — is real
and tested; swapping in a real decoder changes one method.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),          # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

FEATURE_DIM = 16


def make_fake_media_table(n: int) -> pa.Table:
    """Deterministic fake media rows (payload = hash-derived bytes)."""
    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        digest = hashlib.blake2b(f"media:{i}".encode(), digest_size=32).digest()
        kind = kinds[i % 3]
        rows.append(
            {
                "media_id": i,
                "kind": kind,
                "payload": digest * 8,  # 256-byte opaque payload
                "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                "width": 64 + (digest[0] % 64) if kind != "audio" else 0,
                "height": 64 + (digest[1] % 64) if kind != "audio" else 0,
                "duration_ms": (digest[2] * 100) if kind != "image" else 0,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeImageStage:
    """TEST FIXTURE ONLY (not reachable from the driver contract): the
    deterministic fake decoder kept for plumbing tests. The real codec
    path is ``DecodeMediaStage`` / ``decode_real_features`` (backing
    multimodal_decode AND multimodal_features)."""

    def __init__(self, fake: bool = False, target_size: tuple[int, int] = (32, 32)):
        self.fake = fake
        self.target_size = target_size
        if not fake:
            raise NotImplementedError(
                "No image codec (PIL/opencv) in this environment; construct "
                "with fake=True for the deterministic fake decoder."
            )

    def _decode(self, payload: bytes) -> np.ndarray:
        """Stubbed decode: deterministic feature vector from payload bytes.
        A real implementation returns the decoded+resized pixel array."""
        digest = hashlib.blake2b(payload, digest_size=FEATURE_DIM * 4).digest()
        return (
            np.frombuffer(digest, dtype=np.uint32).astype(np.float64) / 2**32
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        feats = [self._decode(p or b"") for p in payloads]
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(
                    [f.tolist() for f in feats], type=pa.list_(pa.float64())
                ),
            }
        )


class FrameSampleStage:
    """TEST FIXTURE ONLY (not reachable from the driver contract): fake
    frame-offset plumbing kept for tests. The real path is
    ``FrameOffsetsStage`` / ``sample_frame_offsets`` (backing
    multimodal_frames from the real MP4 sample tables)."""

    def __init__(self, every_ms: int = 1000, fake: bool = False):
        self.every_ms = every_ms
        if not fake:
            raise NotImplementedError(
                "No video codec in this environment; construct with fake=True."
            )

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_off = [], []
        for media_id, kind, duration in zip(
            batch.column("media_id").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            if kind != "video":
                continue
            for off in range(0, int(duration or 0), self.every_ms):
                out_id.append(media_id)
                out_off.append(off)
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_offset_ms": pa.array(out_off, type=pa.int32()),
            }
        )


def decode_features(
    media: ray.data.Dataset, fake: bool = True, batch_size: int = 16
) -> ray.data.Dataset:
    """Feature extraction over a media Dataset. Small batch_size on
    purpose: payloads are large, batch × concurrency must fit in heap."""
    return media.map_batches(
        DecodeImageStage,
        fn_constructor_kwargs={"fake": fake},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


# ---------------------------------------------------------------------------
# REAL decoders for uncompressed container formats (stdlib + numpy only)
# ---------------------------------------------------------------------------
#
# PIL/ffmpeg are absent, but two real container formats need neither: P6
# PPM (raw RGB) and RIFF/WAVE PCM16 (stdlib ``wave``). These give the
# decode -> resize -> feature-extract path REAL payload parsing end to
# end. PNG (zlib inflate + scanline unfilter) and BMP (BI_RGB) are also
# real, stdlib-only codecs below. Baseline JPEG (huffman + DCT) lives in
# ``ops/jpeg.py``; MP4 frame sampling parses the real ISO-BMFF sample
# tables in ``ops/mp4.py``. What remains honestly stubbed in
# ``DecodeImageStage``: progressive JPEG, video codec decode (H.264 etc).


def _encode_ppm(width: int, height: int, seed: int) -> bytes:
    """Deterministic P6 PPM: per-channel affine pattern of (x, y, seed)."""
    x = np.arange(width, dtype=np.int64)[None, :]
    y = np.arange(height, dtype=np.int64)[:, None]
    chans = [
        ((x * (3 + seed % 7) + y * (5 + seed % 11) + seed + c * 37) % 256)
        for c in range(3)
    ]
    img = np.stack(chans, axis=2).astype(np.uint8)
    return f"P6\n{width} {height}\n255\n".encode() + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """(height, width, 3) uint8 from a binary P6 PPM payload."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    parts = payload.split(b"\n", 3)
    width, height = (int(v) for v in parts[1].split())
    maxval = int(parts[2])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    data = np.frombuffer(parts[3], dtype=np.uint8, count=width * height * 3)
    return data.reshape(height, width, 3)


def area_resize_gray(img: np.ndarray, tw: int, th: int) -> np.ndarray:
    """(th, tw) float64 area-mean downsample of an (h, w, 3) image's
    grayscale — two ``np.add.reduceat`` passes, no Python loops."""
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    row_bin = np.arange(h) * th // h
    col_bin = np.arange(w) * tw // w
    row_starts = np.searchsorted(row_bin, np.arange(th))
    col_starts = np.searchsorted(col_bin, np.arange(tw))
    summed = np.add.reduceat(
        np.add.reduceat(gray, row_starts, axis=0), col_starts, axis=1
    )
    row_counts = np.bincount(row_bin, minlength=th).astype(np.float64)
    col_counts = np.bincount(col_bin, minlength=tw).astype(np.float64)
    return summed / np.outer(row_counts, col_counts)


def _encode_wav(freq_hz: float, duration_ms: int, rate: int = 8000) -> bytes:
    """Deterministic RIFF/WAVE PCM16 mono sine."""
    import io
    import wave

    n = rate * duration_ms // 1000
    t = np.arange(n, dtype=np.float64) / rate
    samples = (np.sin(2 * np.pi * freq_hz * t) * 12000).astype(np.int16)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, int16 mono samples) from a RIFF/WAVE PCM16 payload."""
    import io
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        if w.getsampwidth() != 2:
            raise ValueError("only PCM16 supported")
        rate = w.getframerate()
        raw = w.readframes(w.getnframes())
    samples = np.frombuffer(raw, dtype=np.int16)
    if w.getnchannels() == 2:
        samples = samples.reshape(-1, 2).mean(axis=1).astype(np.int16)
    return rate, samples


# ---------------------------------------------------------------------------
# PNG (stdlib zlib + numpy unfilter) and BMP (BI_RGB) — real compressed /
# container codecs with no external deps. Scope: 8-bit gray / RGB / RGBA,
# non-interlaced PNG (the dominant web shapes); palette / 16-bit /
# interlaced raise with a clear message (the honest boundary).
# ---------------------------------------------------------------------------

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(typ: bytes, data: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(data))
        + typ
        + data
        + struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF)
    )


def _paeth_predict(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
    if pa_ <= pb_ and pa_ <= pc_:
        return a
    return b if pb_ <= pc_ else c


def encode_png(img: np.ndarray, row_filters=0) -> bytes:
    """Minimal PNG writer for (h, w) gray or (h, w, 3|4) uint8 arrays.
    ``row_filters`` is a scalar filter type or a per-row list (0 none /
    1 sub / 2 up / 3 average / 4 paeth) — the test suite uses mixed
    filters to exercise every unfilter path in ``decode_png``."""
    import struct
    import zlib

    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    color_type = {1: 0, 3: 2, 4: 6}[c]
    bpp = c
    if isinstance(row_filters, int):
        row_filters = [row_filters] * h
    raw = img.astype(np.int64)
    out = bytearray()
    prev = np.zeros(w * c, dtype=np.int64)
    for y in range(h):
        row = raw[y].reshape(-1)
        f = row_filters[y]
        if f == 0:
            filt = row
        elif f == 1:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            filt = row - left
        elif f == 2:
            filt = row - prev
        elif f == 3:
            left = np.concatenate([np.zeros(bpp, dtype=np.int64), row[:-bpp]])
            filt = row - (left + prev) // 2
        elif f == 4:
            filt = np.empty_like(row)
            for i in range(len(row)):
                a = row[i - bpp] if i >= bpp else 0
                b = prev[i]
                cc = prev[i - bpp] if i >= bpp else 0
                filt[i] = row[i] - _paeth_predict(int(a), int(b), int(cc))
        else:
            raise ValueError(f"unknown filter {f}")
        out.append(f)
        out.extend((filt % 256).astype(np.uint8).tobytes())
        prev = row
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(out)))
        + _png_chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """(h, w, c) uint8 from a PNG payload — stdlib ``zlib`` inflate +
    numpy scanline unfilter. Supports 8-bit grayscale (c=1), RGB (c=3)
    and RGBA (c=4), non-interlaced; raises ValueError on palette /
    16-bit / interlaced images (use a full decoder for those)."""
    import struct
    import zlib

    if not payload.startswith(_PNG_SIG):
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = len(_PNG_SIG), bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        typ = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.extend(data)
        elif typ == b"IEND":
            break
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    w, h, depth, color_type, _comp, _filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"only 8-bit PNG supported, got depth {depth}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    channels = {0: 1, 2: 3, 4: 2, 6: 4}.get(color_type)
    if channels is None:
        raise ValueError(f"palette/unsupported PNG color type {color_type}")
    bpp = channels
    stride = w * channels
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if raw.size != h * (stride + 1):
        raise ValueError("PNG scanline data size mismatch")
    rows = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.int64)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = int(rows[y, 0])
        cur = rows[y, 1:].astype(np.int64)
        if f == 0:
            rec = cur
        elif f == 2:
            rec = (cur + prev) % 256
        elif f == 1:
            # recon[i] = raw[i] + recon[i-bpp]: per-channel prefix sum
            v = cur.reshape(w, bpp)
            rec = (np.cumsum(v, axis=0, dtype=np.int64) % 256).reshape(-1)
        elif f in (3, 4):
            rec = np.empty(stride, dtype=np.int64)
            for i in range(stride):
                a = rec[i - bpp] if i >= bpp else 0
                b = prev[i]
                if f == 3:
                    rec[i] = (cur[i] + (a + b) // 2) % 256
                else:
                    c = prev[i - bpp] if i >= bpp else 0
                    rec[i] = (
                        cur[i] + _paeth_predict(int(a), int(b), int(c))
                    ) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec
        prev = rec
    return out.astype(np.uint8).reshape(h, w, channels)


def encode_bmp(img: np.ndarray) -> bytes:
    """24-bit uncompressed BI_RGB bottom-up BMP from (h, w, 3) uint8."""
    import struct

    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3
    pixel_bytes = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    body = bytearray()
    pad = b"\x00" * (row_size - w * 3)
    for y in range(h - 1, -1, -1):  # bottom-up
        body.extend(img[y, :, ::-1].tobytes())  # BGR
        body.extend(pad)
    return header + info + bytes(body)


def decode_bmp(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 RGB from a 24-bit BI_RGB BMP payload."""
    import struct

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    (offset,) = struct.unpack("<I", payload[10:14])
    header_size, w, h = struct.unpack("<Iii", payload[14:26])
    bits, compression = struct.unpack("<HI", payload[28:34])
    if bits != 24 or compression != 0:
        raise ValueError("only 24-bit BI_RGB BMP supported")
    flip = h > 0
    h = abs(h)
    row_size = (w * 3 + 3) & ~3
    data = np.frombuffer(payload, dtype=np.uint8, count=row_size * h, offset=offset)
    rows = data.reshape(h, row_size)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return rgb[::-1] if flip else rgb


def _to_rgb(img: np.ndarray) -> np.ndarray:
    """Normalize decoded (h, w, c) to (h, w, 3) for the feature stage:
    grayscale replicates, alpha drops, gray+alpha drops alpha."""
    if img.ndim == 2:
        img = img[:, :, None]
    c = img.shape[2]
    if c == 1:
        return np.repeat(img, 3, axis=2)
    if c == 2:
        return np.repeat(img[:, :, :1], 3, axis=2)
    return img[:, :, :3]


def make_real_media_table(n: int) -> pa.Table:
    """Deterministic media rows with REAL decodable payloads: P6 PPM /
    PNG / BMP / baseline JPEG (both 4:4:4 and 4:2:0) images and PCM16
    WAV sines (hash-derived dims / frequency / duration; PNG rows cycle
    the filter types)."""
    rows = []
    for i in range(n):
        digest = hashlib.blake2b(f"realmedia:{i}".encode(), digest_size=8).digest()
        if i % 16 == 8:
            # GIF rows (ops/gif.py): palette-quantized pattern, lossless
            # roundtrip; lands on a PPM image slot so the audio/image
            # rotation is unchanged. Odd ids interlace.
            from ctinexus_ray.ops.gif import encode_gif

            w, h = 8 + digest[0] % 25, 8 + digest[1] % 25
            img = decode_ppm(_encode_ppm(w, h, digest[4] % 8))  # few colors
            rows.append(
                {
                    "media_id": i,
                    "kind": "image",
                    "payload": encode_gif(img, interlace=bool(digest[5] & 1)),
                    "mime": "image/gif",
                    "width": w,
                    "height": h,
                    "duration_ms": 0,
                }
            )
            continue
        if i % 8 in (4, 6):
            # JPEG rows (ops/jpeg.py): 4:2:0 on the i%8==4 slot, 4:4:4 on
            # the i%8==6 slot — and the i%16==14 half of the 4:4:4 slot is
            # PROGRESSIVE (SOF2), exercising the Annex G decode path. All
            # land on "image" slots so the audio/image rotation (audio iff
            # i%4==1) is unchanged.
            from ctinexus_ray.ops.jpeg import encode_jpeg, encode_jpeg_progressive

            w, h = 8 + digest[0] % 25, 8 + digest[1] % 25
            img = decode_ppm(_encode_ppm(w, h, digest[3]))
            sub = "4:2:0" if i % 8 == 4 else "4:4:4"
            enc = encode_jpeg_progressive if i % 16 == 14 else encode_jpeg
            # a third of the JPEG rows carry restart intervals (DRI/RSTn)
            ri = digest[7] % 3 if digest[7] % 3 != 2 else 4
            rows.append(
                {
                    "media_id": i,
                    "kind": "image",
                    "payload": enc(img, quality=90, subsampling=sub,
                                   restart_interval=ri),
                    "mime": "image/jpeg",
                    "width": w,
                    "height": h,
                    "duration_ms": 0,
                }
            )
            continue
        if i % 4 == 2:
            w, h = 8 + digest[0] % 25, 8 + digest[1] % 25
            img = decode_ppm(_encode_ppm(w, h, digest[2]))
            rows.append(
                {
                    "media_id": i,
                    "kind": "image",
                    "payload": encode_png(img, row_filters=[(digest[2] + y) % 5 for y in range(h)]),
                    "mime": "image/png",
                    "width": w,
                    "height": h,
                    "duration_ms": 0,
                }
            )
            continue
        if i % 4 == 3:
            w, h = 8 + digest[0] % 25, 8 + digest[1] % 25
            img = decode_ppm(_encode_ppm(w, h, digest[5]))
            rows.append(
                {
                    "media_id": i,
                    "kind": "image",
                    "payload": encode_bmp(img),
                    "mime": "image/bmp",
                    "width": w,
                    "height": h,
                    "duration_ms": 0,
                }
            )
            continue
        if i % 2 == 0:
            w, h = 16 + digest[0] % 33, 16 + digest[1] % 33
            rows.append(
                {
                    "media_id": i,
                    "kind": "image",
                    "payload": _encode_ppm(w, h, digest[2]),
                    "mime": "image/x-portable-pixmap",
                    "width": w,
                    "height": h,
                    "duration_ms": 0,
                }
            )
        else:
            dur = 100 + digest[3] * 4  # 100..1120 ms
            freq = 200.0 + digest[4] * 7  # 200..1985 Hz
            rows.append(
                {
                    "media_id": i,
                    "kind": "audio",
                    "payload": _encode_wav(freq, dur),
                    "mime": "audio/wav",
                    "width": 0,
                    "height": 0,
                    "duration_ms": dur,
                }
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


_IMAGE_MIMES = (
    "image/x-portable-pixmap",
    "image/png",
    "image/bmp",
    "image/jpeg",
    "image/gif",
)


def decode_image_any(mime: str, payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 pixels from any stdlib-decodable image container
    — the shared dispatch behind DecodeMediaStage and PhashStage."""
    if mime == "image/png":
        return _to_rgb(decode_png(payload))
    if mime == "image/bmp":
        return decode_bmp(payload)
    if mime == "image/jpeg":
        from ctinexus_ray.ops.jpeg import decode_jpeg

        return _to_rgb(decode_jpeg(payload))
    if mime == "image/gif":
        from ctinexus_ray.ops.gif import decode_gif

        return decode_gif(payload)
    if mime == "image/x-portable-pixmap":
        return decode_ppm(payload)
    raise ValueError(f"unsupported image mime {mime!r}; known: {_IMAGE_MIMES}")


# ---------------------------------------------------------------------------
# perceptual hash (pHash) + image near-dup pairs
# ---------------------------------------------------------------------------

_PHASH_N = 32  # DCT input grid
_PHASH_K = 8  # low-frequency block kept
_phash_dct: np.ndarray | None = None


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the JPEG transform, here as one
    matmul): row k, col x = c(k) * cos(pi*(2x+1)*k / (2n))."""
    k = np.arange(n)[:, None].astype(np.float64)
    x = np.arange(n)[None, :].astype(np.float64)
    m = np.cos(np.pi * (2.0 * x + 1.0) * k / (2.0 * n)) * np.sqrt(2.0 / n)
    m[0] /= np.sqrt(2.0)
    return m


def _resize_nearest_gray(img: np.ndarray, n: int) -> np.ndarray:
    """(n, n) float64 grayscale via nearest-neighbor resample — unlike
    ``area_resize_gray`` it also UPSAMPLES (the synthetic corpus has
    images below 32 px), and nearest keeps the map deterministic."""
    gray = img.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ri = (np.arange(n, dtype=np.int64) * h) // n
    ci = (np.arange(n, dtype=np.int64) * w) // n
    return gray[ri][:, ci]


def phash64_image(img: np.ndarray) -> int:
    """63-bit perceptual hash (classic pHash): 32x32 grayscale -> 2D
    DCT-II -> top-left 8x8 low-frequency block -> drop the DC term ->
    bit i set iff coefficient i exceeds the MEDIAN of the 63. Identical
    pixels hash identically regardless of container; small perceptual
    edits (lossy re-encode, light noise) flip few bits. 63 bits keeps
    the value int64-positive, like the simhash signatures."""
    global _phash_dct
    if _phash_dct is None:
        _phash_dct = _dct_matrix(_PHASH_N)
    g = _resize_nearest_gray(img, _PHASH_N)
    coeffs = _phash_dct @ g @ _phash_dct.T
    low = coeffs[:_PHASH_K, :_PHASH_K].ravel()[1:]  # 63, DC dropped
    bits = low > float(np.median(low))
    return int(np.packbits(bits, bitorder="little").view(np.uint64)[0])


class PhashStage:
    """Actor-pool stage: decode each image payload with the real codecs
    and emit its 63-bit perceptual hash. DCT basis built once per actor."""

    def __init__(self):
        global _phash_dct
        if _phash_dct is None:  # once per actor, shared by every batch
            _phash_dct = _dct_matrix(_PHASH_N)

    def _one(self, mime: str, payload: bytes) -> int:
        return phash64_image(decode_image_any(mime, payload))

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = [
            self._one(m, p or b"")
            for m, p in zip(
                batch.column("mime").to_pylist(),
                batch.column("payload").to_pylist(),
            )
        ]
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "phash": pa.array(hashes, type=pa.int64()),
            }
        )


def image_phash_signatures(
    media: "ray.data.Dataset", batch_size: int = 16, concurrency: int = 4
) -> "ray.data.Dataset":
    """(media_id, phash) for every IMAGE row — decode is the expensive
    part, so small batches through an actor pool (binary payloads stay
    off the driver)."""
    import pyarrow.compute as pc

    imgs = media.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "image")),
        batch_format="pyarrow",
    )
    # autoscaling (1, N) pool: a FIXED pool of N pre-reserves every CPU
    # on a small cluster and starves the upstream all-to-all (deadlock
    # observed at num_cpus=4); min=1 keeps the pipeline always runnable
    return imgs.map_batches(
        PhashStage,
        batch_size=batch_size,
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )


def image_phash_dups(
    media: "ray.data.Dataset",
    max_hamming: int = 6,
    chunks: int = 8,
    max_bucket: int = 200,
) -> "ray.data.Dataset":
    """Image near-dup pairs (a, b) by perceptual-hash Hamming distance
    <= ``max_hamming`` — the multimodal sibling of ``simhash_dup_pairs``:
    same pixels in a different container collide exactly; a lossy
    re-encode lands within a few bits. Banding + exact popcount verify
    via the shared ``hamming_dup_pairs`` (pigeonhole needs
    ``max_hamming < chunks``; 8 bands of 8 bits cover distance <= 7)."""
    from ctinexus_ray.ops.dedup import hamming_dup_pairs

    sigs = image_phash_signatures(media).map_batches(
        lambda t: t.rename_columns(["doc_id", "phash"]),
        batch_format="pyarrow",
    )
    return hamming_dup_pairs(
        sigs,
        hash_col="phash",
        max_hamming=max_hamming,
        chunks=chunks,
        max_bucket=max_bucket,
    )


def _wav_from_samples(samples: np.ndarray, rate: int = 8000) -> bytes:
    """RIFF/WAVE PCM16 mono from raw int16 samples (the variant writer
    behind make_audio_dup_corpus — _encode_wav only does sines)."""
    import io
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.astype(np.int16).tobytes())
    return buf.getvalue()


def audio_spectral_hash(samples: np.ndarray, n_t: int = 4, n_f: int = 17) -> int:
    """63-bit audio fingerprint: the clip splits into ``n_t`` equal
    time slices, each slice's spectrum (rFFT, DC dropped) folds into
    ``n_f`` linear band ENERGIES normalized by total energy and
    clamped to a 1e-6 noise floor, and bit (t, f) is the adjacent-band
    comparison ``E[t,f] > E[t,f+1]`` — the Haitsma-Kalker 2002
    fingerprint bit WITHOUT its temporal difference (stationary audio
    makes d/dt ~ 0 everywhere, turning temporal-diff bits into
    numerical coin flips) and with the noise floor making empty-band
    comparisons a stable 0 instead of re-quantization flips.
    Normalization makes the hash amplitude-invariant: a re-levelled
    copy collides exactly up to int16 quantization in the occupied
    bands (pinned in tests); a bit-exact copy collides exactly. Clips
    shorter than ``n_t`` samples (or all-zero) hash to 0."""
    x = samples.astype(np.float64)
    L = len(x) - (len(x) % n_t)
    if L < n_t:
        return 0
    slices = x[:L].reshape(n_t, -1)
    mags = np.abs(np.fft.rfft(slices, axis=1))[:, 1:]
    F = mags.shape[1]
    starts = (np.arange(n_f) * F) // n_f  # linear bands: narrowband
    # content (tones) lands in DIFFERENT bands for different pitches,
    # which log spacing squashes together at the low end
    energies = np.add.reduceat(mags * mags, starts, axis=1)
    total = energies.sum()
    if total <= 0:
        return 0
    # normalize (scale-invariance by construction) and clamp to a noise
    # floor: bands holding only quantization noise (narrowband audio
    # leaves most bands ~empty) clamp to the SAME floor, making their
    # difference bits a stable 0 instead of re-quantization coin flips
    norm = np.maximum(energies / total, 1e-6)
    # per-slice adjacent-band comparison (the HK bit WITHOUT the
    # temporal difference: stationary audio — tones, hums — makes
    # d/dt ~ 0 everywhere, turning temporal-diff bits into numerical
    # coin flips; the spatial comparison stays stable)
    bits = (norm[:, :-1] > norm[:, 1:]).ravel()[:63]  # int64-positive
    padded = np.zeros(64, dtype=bool)
    padded[: bits.size] = bits
    return int(np.packbits(padded, bitorder="little").view(np.uint64)[0])


class AudioHashStage:
    """Actor-pool stage: decode each WAV payload and emit its spectral
    fingerprint."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for mime, payload in zip(
            batch.column("mime").to_pylist(), batch.column("payload").to_pylist()
        ):
            if mime != "audio/wav":
                raise ValueError(f"audio fingerprint needs audio/wav, got {mime!r}")
            _, samples = decode_wav(payload or b"")
            hashes.append(audio_spectral_hash(samples))
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "ahash": pa.array(hashes, type=pa.int64()),
            }
        )


def audio_hash_signatures(
    media: "ray.data.Dataset", batch_size: int = 16, concurrency: int = 4
) -> "ray.data.Dataset":
    """(media_id, ahash) for every AUDIO row — autoscaling (1, N) actor
    pool like PhashStage (a fixed pool starves small clusters)."""
    import pyarrow.compute as pc

    clips = media.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "audio")),
        batch_format="pyarrow",
    )
    return clips.map_batches(
        AudioHashStage,
        batch_size=batch_size,
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )


def audio_hash_dups(
    media: "ray.data.Dataset",
    max_hamming: int = 3,
    chunks: int = 8,
    max_bucket: int = 200,
) -> "ray.data.Dataset":
    """Audio near-dup pairs (a, b) by fingerprint Hamming distance —
    the audio sibling of ``image_phash_dups``: identical clips collide
    exactly, re-levelled clips within the quantization-noise margin;
    banding + popcount verify via the shared ``hamming_dup_pairs``."""
    from ctinexus_ray.ops.dedup import hamming_dup_pairs

    sigs = audio_hash_signatures(media).map_batches(
        lambda t: t.rename_columns(["doc_id", "ahash"]),
        batch_format="pyarrow",
    )
    return hamming_dup_pairs(
        sigs,
        hash_col="ahash",
        max_hamming=max_hamming,
        chunks=chunks,
        max_bucket=max_bucket,
    )


def make_audio_dup_corpus(n_base: int) -> pa.Table:
    """Deterministic audio corpus with PLANTED near-dup triples: base
    tone i appears as the original (3i), a half-amplitude re-level
    (3i+1 — collides under the amplitude-invariant fingerprint) and a
    two-tone DIFFERENT mix (3i+2). ``n_base`` is capped at 10 — beyond
    that the tone grid would wrap past Nyquist into colliding bands."""
    if n_base > 10:
        raise ValueError("make_audio_dup_corpus: n_base is capped at 10")
    rows = []
    for i in range(n_base):
        # one tone per base, spread ~1.5 linear bands apart so distinct
        # contents occupy distinct bands; "different" adds a second
        # tone (Nyquist-guarded) -> extra occupied band, distance >> 3.
        # The full 30-signature pairwise-distance matrix is validated
        # in TestAudioFingerprint (no twin beyond 3, no non-twin within)
        f = 200.0 + i * 350
        f2 = f + 1000.0 if f + 1000.0 < 3800.0 else f - 1700.0
        dur = 300 + 17 * (i % 11)
        _, s1 = decode_wav(_encode_wav(f, dur))
        _, s2 = decode_wav(_encode_wav(f2, dur))
        n = min(len(s1), len(s2))
        base = s1[:n]
        other = (s1[:n] * 0.5 + s2[:n] * 0.5).astype(np.int16)
        for j, samples in enumerate(
            (base, (base * 0.5).astype(np.int16), other)
        ):
            rows.append(
                {
                    "media_id": 3 * i + j,
                    "kind": "audio",
                    "payload": _wav_from_samples(samples),
                    "mime": "audio/wav",
                    "width": 0,
                    "height": 0,
                    "duration_ms": dur,
                }
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def video_grid_signature(payload: bytes, max_frames: int = 32) -> int:
    """60-bit video fingerprint from REAL motion-JPEG decode: every
    sampled frame's 6x6 luma grid contributes adjacent-cell gradient
    SIGN bits (30 horizontal + 30 vertical — the audio fingerprint's
    comparison-bit idea applied spatially; sign bits survive lossy
    re-encoding where pHash's near-median DCT thresholds flip), and the
    video bit is the MAJORITY over frames (ties -> 1), making the
    signature stable under re-encoding and mild frame-set changes.
    Reads at most ``max_frames`` frames, evenly strided — a 2-hour
    video costs the same as a clip. Non-MJPEG codecs raise (the honest
    env boundary, as DecodeVideoStage)."""
    from ctinexus_ray.ops.jpeg import decode_jpeg
    from ctinexus_ray.ops.mp4 import parse_mp4_samples

    info = parse_mp4_samples(payload)
    if info["codec"] != "jpeg":
        raise NotImplementedError(
            f"no {info['codec']!r} bitstream decoder in this environment "
            "(motion-JPEG only)"
        )
    offsets, sizes = info["offsets"], info["sizes"]
    n = len(offsets)
    if n == 0:
        return 0
    idx = np.unique(
        (np.arange(min(n, max_frames)) * n) // min(n, max_frames)
    )
    bits = np.zeros(60, dtype=np.int64)
    for i in idx:
        frame = payload[int(offsets[i]) : int(offsets[i]) + int(sizes[i])]
        g = area_resize_gray(_to_rgb(decode_jpeg(frame)), 6, 6)
        fb = np.concatenate(
            [(g[:, :-1] > g[:, 1:]).ravel(), (g[:-1, :] > g[1:, :]).ravel()]
        )
        bits += fb
    maj = bits * 2 >= len(idx)
    padded = np.zeros(64, dtype=bool)
    padded[:60] = maj
    return int(np.packbits(padded, bitorder="little").view(np.uint64)[0])


class VideoHashStage:
    """Actor-pool stage: fingerprint each MJPEG payload."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        hashes = []
        for mime, payload in zip(
            batch.column("mime").to_pylist(), batch.column("payload").to_pylist()
        ):
            if mime != "video/mp4":
                raise ValueError(f"video fingerprint needs video/mp4, got {mime!r}")
            hashes.append(video_grid_signature(payload or b""))
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "vhash": pa.array(hashes, type=pa.int64()),
            }
        )


def video_hash_signatures(
    media: "ray.data.Dataset", batch_size: int = 8, concurrency: int = 4
) -> "ray.data.Dataset":
    """(media_id, vhash) for every VIDEO row — small batches (a video
    payload is the widest media), autoscaling (1, N) pool."""
    import pyarrow.compute as pc

    vids = media.map_batches(
        lambda t: t.filter(pc.equal(t.column("kind"), "video")),
        batch_format="pyarrow",
    )
    return vids.map_batches(
        VideoHashStage,
        batch_size=batch_size,
        concurrency=(1, concurrency),
        batch_format="pyarrow",
    )


def video_hash_dups(
    media: "ray.data.Dataset",
    max_hamming: int = 6,
    chunks: int = 8,
    max_bucket: int = 200,
) -> "ray.data.Dataset":
    """Video near-dup pairs (a, b) — the third fingerprint family
    beside image pHash and the audio spectral hash: a quality-70
    re-encode of the same frames lands within a few bits (measured
    worst 4 on the planted corpus), different videos ~20+ apart."""
    from ctinexus_ray.ops.dedup import hamming_dup_pairs

    sigs = video_hash_signatures(media).map_batches(
        lambda t: t.rename_columns(["doc_id", "vhash"]),
        batch_format="pyarrow",
    )
    return hamming_dup_pairs(
        sigs,
        hash_col="vhash",
        max_hamming=max_hamming,
        chunks=chunks,
        max_bucket=max_bucket,
    )


def make_video_dup_corpus(n_base: int) -> pa.Table:
    """Deterministic MJPEG corpus with PLANTED near-dup triples: base
    video i (smooth per-seed sinusoid frames — high-frequency sawtooth
    patterns are fingerprint-hostile under lossy re-encode) appears at
    quality 85 (3i), re-encoded at quality 70 (3i+1 — lands within the
    pairing threshold) and as a DIFFERENT seed's video (3i+2)."""
    from ctinexus_ray.ops.jpeg import encode_jpeg
    from ctinexus_ray.ops.mp4 import build_mp4, parse_mp4_samples

    size = 32
    y, x = np.mgrid[0:size, 0:size].astype(np.float64)

    def frames(seed: int, q: int) -> list[bytes]:
        a = 1 + seed % 5
        b = 1 + (2 * seed) % 7
        c = 1 + (3 * seed) % 5
        out = []
        for f in range(5):
            ph = 2 * np.pi * (f * 0.13 + seed * 0.71)
            img = np.stack(
                [
                    128 + 100 * np.sin(2 * np.pi * (a * x + 0.5 * b * y) / size + ph),
                    128 + 100 * np.sin(2 * np.pi * (b * y - 0.3 * a * x) / size - ph + seed),
                    128 + 80 * np.sin(2 * np.pi * (x + y) * c / size + 2 * seed),
                ],
                axis=-1,
            ).clip(0, 255).astype(np.uint8)
            out.append(encode_jpeg(img, quality=q))
        return out

    rows = []
    for i in range(n_base):
        variants = (
            frames(i, 85),
            frames(i, 70),
            frames(i + 1000, 85),
        )
        for j, fr in enumerate(variants):
            payload = build_mp4(
                0,
                timescale=1000,
                frame_delta=200,
                frames=fr,
                codec=b"jpeg",
                width=size,
                height=size,
                frames_per_chunk=2,
                variable_rate=(j == 1),
            )
            dur_ms = int(parse_mp4_samples(payload)["duration_ms"])
            rows.append(
                {
                    "media_id": 3 * i + j,
                    "kind": "video",
                    "payload": payload,
                    "mime": "video/mp4",
                    "width": size,
                    "height": size,
                    "duration_ms": dur_ms,
                }
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


def media_dedup_keep(
    media: "ray.data.Dataset",
    pairs: "ray.data.Dataset",
    id_col: str = "media_id",
) -> "ray.data.Dataset":
    """End-to-end media dedup KEEP path: near-dup (a, b) pairs (from
    ``image_phash_dups`` / ``audio_hash_dups``) collapse to clusters
    via distributed connected components, every non-minimal cluster
    member drops, and the survivors' FULL rows (payload included) come
    back by one anti-join — the ``minhash_dedup_keep`` shape for
    binary media. Returns the surviving media rows."""
    import pyarrow.compute as pc

    from ctinexus_ray.ops.distjoin import connected_components, hash_join

    comps = connected_components(pairs)

    def losers(batch: pa.Table) -> pa.Table:
        keep = pc.not_equal(batch.column("node"), batch.column("label"))
        t = batch.filter(keep)
        return pa.Table.from_pydict(
            {id_col: t.column("node").cast(pa.int64())}
        )

    drop = comps.map_batches(losers, batch_format="pyarrow")
    return hash_join(media, drop, on=[id_col], how="left_anti")


def make_phash_corpus(n_base: int) -> pa.Table:
    """Deterministic image corpus with PLANTED container/near-dup
    triples for the pHash family: base image i appears as PNG (3i),
    BMP (3i+1 — identical pixels, different container) and a lossy
    quality-90 JPEG re-encode (3i+2). The dedup story a 100-TB image
    crawl actually has: exact pixel dups across containers plus lossy
    re-encodes."""
    from ctinexus_ray.ops.jpeg import encode_jpeg

    rows = []
    for i in range(n_base):
        digest = hashlib.blake2b(f"phash:{i}".encode(), digest_size=8).digest()
        w, h = 16 + digest[0] % 17, 16 + digest[1] % 17
        img = decode_ppm(_encode_ppm(w, h, digest[2]))
        for j, (payload, mime) in enumerate(
            (
                (encode_png(img), "image/png"),
                (encode_bmp(img), "image/bmp"),
                (encode_jpeg(img, quality=90), "image/jpeg"),
            )
        ):
            rows.append(
                {
                    "media_id": 3 * i + j,
                    "kind": "image",
                    "payload": payload,
                    "mime": mime,
                    "width": w,
                    "height": h,
                    "duration_ms": 0,
                }
            )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeMediaStage:
    """REAL decode + feature-extract actor stage for the stdlib-decodable
    formats (P6 PPM / PNG / BMP images, PCM16 WAV audio). Per-row output
    feature layout (fixed 8 floats so the column is rectangular):

      image: [width, height, mean_r, mean_g, mean_b, gray2x2...(3 of 4)]
             — 2x2 area-mean grayscale grid, first 3 cells (the 4th is
             redundant with the mean)
      audio: [duration_s, rms, zero_cross_rate, peak, rate, n_samples,
             0, 0]
      video: [duration_s, n_samples, mean_fps, mean_frame_bytes,
             max_frame_bytes, total_frame_bytes, timescale, 0]
             — real ISO-BMFF sample-table parse (``ops/mp4.py``), no
             codec decode

    Compressed mimes raise ``ValueError`` listing the supported set —
    the honest boundary; ``DecodeImageStage`` remains the stub for them.
    """

    SUPPORTED = (
        "image/x-portable-pixmap",
        "image/png",
        "image/bmp",
        "image/jpeg",
        "image/gif",
        "audio/wav",
        "video/mp4",
    )

    def __init__(self, target_size: tuple[int, int] = (2, 2)):
        self.target_size = target_size

    def _features(self, mime: str, payload: bytes) -> list[float]:
        if mime in _IMAGE_MIMES:
            img = decode_image_any(mime, payload)
            grid = area_resize_gray(img, *self.target_size)
            means = img.astype(np.float64).mean(axis=(0, 1))
            return [
                float(img.shape[1]),
                float(img.shape[0]),
                float(means[0]),
                float(means[1]),
                float(means[2]),
                *[float(v) for v in grid.ravel()[:3]],
            ]
        if mime == "video/mp4":
            from ctinexus_ray.ops.mp4 import parse_mp4_samples

            info = parse_mp4_samples(payload)
            sizes = info["sizes"]
            n = len(sizes)
            dur_s = info["duration_ms"] / 1000.0
            return [
                dur_s,
                float(n),
                (n / dur_s) if dur_s else 0.0,  # mean fps
                float(sizes.mean()) if n else 0.0,
                float(sizes.max()) if n else 0.0,
                float(sizes.sum()),
                float(info["timescale"]),
                0.0,
            ]
        if mime == "audio/wav":
            rate, samples = decode_wav(payload)
            x = samples.astype(np.float64)
            n = len(x)
            rms = float(np.sqrt(np.mean(x * x))) if n else 0.0
            zcr = (
                float(np.mean(np.abs(np.diff(np.signbit(x)).astype(np.float64))))
                if n > 1
                else 0.0
            )
            return [
                n / rate,
                rms,
                zcr,
                float(np.abs(x).max()) if n else 0.0,
                float(rate),
                float(n),
                0.0,
                0.0,
            ]
        raise ValueError(
            f"unsupported mime {mime!r}; stdlib-decodable: {self.SUPPORTED}"
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = [
            self._features(m, p or b"")
            for m, p in zip(
                batch.column("mime").to_pylist(),
                batch.column("payload").to_pylist(),
            )
        ]
        return pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id"),
                "kind": batch.column("kind"),
                "features": pa.array(feats, type=pa.list_(pa.float64())),
            }
        )


def decode_real_features(
    media: ray.data.Dataset,
    batch_size: int = 16,
    target_size: tuple[int, int] = (2, 2),
) -> ray.data.Dataset:
    """REAL decode feature extraction (PPM/WAV) as an actor pool — small
    batches on purpose (payload bytes × batch × concurrency must fit the
    worker heap)."""
    return media.map_batches(
        DecodeMediaStage,
        fn_constructor_kwargs={"target_size": target_size},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


class FrameOffsetsStage:
    """REAL frame-offset sampling: walks each MP4 payload's ISO-BMFF
    sample tables (``ops/mp4.py``, no pixel decode) and emits one row
    per ``every_ms`` tick with the covering frame's offset — the cheap
    real-codec probe path between ``probe_media`` (header only) and
    ``DecodeVideoStage`` (pixel decode). Replaces the fake
    ``FrameSampleStage`` in the driver contract; the fake remains a test
    fixture only."""

    def __init__(self, every_ms: int = 1000):
        from ctinexus_ray.ops.mp4 import sample_frames_every

        self._sample = sample_frames_every
        self.every_ms = int(every_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_id, out_off = [], []
        for media_id, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mime != "video/mp4":
                continue
            for f in self._sample(payload or b"", self.every_ms):
                out_id.append(media_id)
                out_off.append(int(f["tick_ms"]))
        return pa.Table.from_pydict(
            {
                "media_id": pa.array(out_id, type=pa.int64()),
                "frame_offset_ms": pa.array(out_off, type=pa.int32()),
            }
        )


def sample_frame_offsets(
    media: ray.data.Dataset, every_ms: int = 1000, batch_size: int = 16
) -> ray.data.Dataset:
    """Real MP4 tick-offset sampling as an actor pool."""
    return media.map_batches(
        FrameOffsetsStage,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


def make_real_video_table(n: int) -> pa.Table:
    """Deterministic video rows with REAL MP4 payloads (``ops/mp4.py``
    builder): hash-derived frame counts / frame rates / chunking, so the
    frame sampler exercises multi-run stts and partial chunks."""
    rows = []
    for i in range(n):
        digest = hashlib.blake2b(f"realvideo:{i}".encode(), digest_size=8).digest()
        from ctinexus_ray.ops.mp4 import build_mp4

        n_frames = 6 + digest[0] % 40
        frame_delta = 1001 if i % 2 == 0 else 1500
        payload = build_mp4(
            n_frames,
            timescale=30000,
            frame_delta=frame_delta,
            seed=digest[1],
            frames_per_chunk=2 + digest[2] % 4,
            variable_rate=(i % 3 != 0),
        )
        from ctinexus_ray.ops.mp4 import parse_mp4_samples

        dur_ms = int(parse_mp4_samples(payload)["duration_ms"])
        rows.append(
            {
                "media_id": i,
                "kind": "video",
                "payload": payload,
                "mime": "video/mp4",
                "width": 64,
                "height": 64,
                "duration_ms": dur_ms,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class Mp4FrameSampleStage:
    """REAL video frame sampling: parses each MP4 payload's ISO-BMFF
    sample tables (``ops/mp4.py``) and emits one row per ``every_ms``
    tick with the covering frame's index, pts, byte offset/size, and the
    raw frame bytes sliced out of ``mdat`` (compressed codec data passed
    through opaque — the layout a GPU-decode stage consumes).

    Non-video rows pass through silently (a mixed media table is fine);
    malformed MP4 payloads raise unless ``skip_bad=True``, in which case
    they are dropped. The per-instance ``parse_errors`` counter is only
    observable when the stage is invoked directly — inside a
    ``map_batches`` actor pool each actor keeps its own count and nothing
    aggregates them, so leave ``skip_bad`` at its default (False, every
    drop raises) when silent data loss would go unnoticed.
    """

    def __init__(self, every_ms: int = 1000, skip_bad: bool = False,
                 include_data: bool = True):
        from ctinexus_ray.ops.mp4 import sample_frames_every

        self._sample = sample_frames_every
        self.every_ms = int(every_ms)
        self.skip_bad = skip_bad
        self.include_data = include_data
        self.parse_errors = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "media_id": [], "tick_ms": [], "frame_index": [],
            "pts_ms": [], "offset": [], "size": [],
        }
        if self.include_data:
            out["data"] = []
        for media_id, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mime != "video/mp4":
                continue
            try:
                frames = self._sample(payload or b"", self.every_ms)
            except ValueError:
                if not self.skip_bad:
                    raise
                self.parse_errors += 1
                continue
            for f in frames:
                out["media_id"].append(media_id)
                out["tick_ms"].append(f["tick_ms"])
                out["frame_index"].append(f["frame_index"])
                out["pts_ms"].append(f["pts_ms"])
                out["offset"].append(f["offset"])
                out["size"].append(f["size"])
                if self.include_data:
                    out["data"].append(f["data"])
        schema_cols = {
            "media_id": pa.int64(), "tick_ms": pa.float64(),
            "frame_index": pa.int64(), "pts_ms": pa.float64(),
            "offset": pa.int64(), "size": pa.int64(),
        }
        arrays = {k: pa.array(out[k], type=t) for k, t in schema_cols.items()}
        if self.include_data:
            arrays["data"] = pa.array(out["data"], type=pa.binary())
        return pa.Table.from_pydict(arrays)


def sample_video_frames(
    media: ray.data.Dataset,
    every_ms: int = 1000,
    batch_size: int = 8,
    include_data: bool = True,
) -> ray.data.Dataset:
    """Real MP4 frame sampling as an actor pool. Small batches: output
    rows carry frame payload bytes, so a batch fans out to (frames per
    tick x batch) binary rows that must fit the worker heap."""
    return media.map_batches(
        Mp4FrameSampleStage,
        fn_constructor_kwargs={"every_ms": every_ms, "include_data": include_data},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )


def make_real_mjpeg_table(n: int) -> pa.Table:
    """Deterministic motion-JPEG videos: every MP4 sample is a REAL
    baseline JPEG (``ops/jpeg.py`` encoder) of a per-frame-shifted
    gradient, written as a QuickTime/ISO ``jpeg`` visual track — so the
    full video path (container sample-table walk AND per-frame pixel
    decode) runs on actual codec bytes, not opaque fakes."""
    from ctinexus_ray.ops.jpeg import encode_jpeg
    from ctinexus_ray.ops.mp4 import build_mp4, parse_mp4_samples

    base_y, base_x = np.mgrid[0:16, 0:16]
    rows = []
    for i in range(n):
        digest = hashlib.blake2b(f"mjpeg:{i}".encode(), digest_size=8).digest()
        n_frames = 3 + digest[0] % 6
        frames = []
        for f in range(n_frames):
            shift = (digest[1] + 11 * f) % 16
            img = np.stack(
                [
                    ((base_x + shift) % 16) * 16,
                    ((base_y + f) % 16) * 16,
                    np.full((16, 16), digest[2], dtype=np.int64),
                ],
                axis=-1,
            ).astype(np.uint8)
            frames.append(encode_jpeg(img, quality=85))
        payload = build_mp4(
            0,
            timescale=1000,
            frame_delta=200 + digest[3] % 4 * 100,
            frames=frames,
            codec=b"jpeg",
            width=16,
            height=16,
            frames_per_chunk=2,
            variable_rate=(i % 2 == 0),
        )
        dur_ms = int(parse_mp4_samples(payload)["duration_ms"])
        rows.append(
            {
                "media_id": i,
                "kind": "video",
                "payload": payload,
                "mime": "video/mp4",
                "width": 16,
                "height": 16,
                "duration_ms": dur_ms,
            }
        )
    return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)


class DecodeVideoStage:
    """REAL video frame decode: walks each MP4 payload's sample tables,
    slices the frame covering every ``every_ms`` tick, and — when the
    track's ``stsd`` fourcc is ``jpeg`` (motion-JPEG) — pixel-decodes the
    frame with the pure-numpy baseline JPEG codec (``ops/jpeg.py``).
    Emits one row per sampled frame with decoded dimensions and luma
    statistics (Rec.601 weights), the shape a frame-embedding stage
    consumes.

    Honest boundary: inter-frame codecs (H.264/H.265/VP9/AV1 fourccs like
    ``avc1``) raise ``NotImplementedError`` naming the codec — their
    bitstream decoders aren't in this environment. Motion-JPEG is a real,
    publicly-specified video codec (every sample an independent T.81
    baseline JPEG), so the decode here is genuine end-to-end video work.
    """

    def __init__(self, every_ms: int = 500, batch_format_cols: bool = True):
        from ctinexus_ray.ops.jpeg import decode_jpeg
        from ctinexus_ray.ops.mp4 import parse_mp4_samples, sample_frames_every

        self._decode = decode_jpeg
        self._parse = parse_mp4_samples
        self._sample = sample_frames_every
        self.every_ms = int(every_ms)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out: dict[str, list] = {
            "media_id": [], "tick_ms": [], "frame_index": [], "pts_ms": [],
            "width": [], "height": [], "mean_luma": [], "luma_std": [],
        }
        for media_id, mime, payload in zip(
            batch.column("media_id").to_pylist(),
            batch.column("mime").to_pylist(),
            batch.column("payload").to_pylist(),
        ):
            if mime != "video/mp4":
                continue
            payload = payload or b""
            codec = self._parse(payload)["codec"]
            if codec != "jpeg":
                raise NotImplementedError(
                    f"video codec {codec!r} not decodable here — only "
                    "motion-JPEG ('jpeg' fourcc) has an in-environment "
                    "bitstream decoder; inter-frame codecs need a GPU/"
                    "library decode stage"
                )
            for f in self._sample(payload, self.every_ms):
                img = self._decode(f["data"])
                if img.shape[2] == 1:
                    luma = img[..., 0].astype(np.float64)
                else:
                    luma = (
                        0.299 * img[..., 0]
                        + 0.587 * img[..., 1]
                        + 0.114 * img[..., 2]
                    )
                out["media_id"].append(media_id)
                out["tick_ms"].append(f["tick_ms"])
                out["frame_index"].append(f["frame_index"])
                out["pts_ms"].append(f["pts_ms"])
                out["width"].append(img.shape[1])
                out["height"].append(img.shape[0])
                out["mean_luma"].append(float(luma.mean()))
                out["luma_std"].append(float(luma.std()))
        types = {
            "media_id": pa.int64(), "tick_ms": pa.float64(),
            "frame_index": pa.int64(), "pts_ms": pa.float64(),
            "width": pa.int64(), "height": pa.int64(),
            "mean_luma": pa.float64(), "luma_std": pa.float64(),
        }
        return pa.Table.from_pydict(
            {k: pa.array(out[k], type=t) for k, t in types.items()}
        )


def decode_video_frames(
    media: ray.data.Dataset, every_ms: int = 500, batch_size: int = 4
) -> ray.data.Dataset:
    """Motion-JPEG frame decode as an actor pool. Small batches: each
    input row fans out to (ticks × decoded frames) and JPEG decode is
    the compute-heavy stage, so batch × concurrency sizes the heap."""
    return media.map_batches(
        DecodeVideoStage,
        fn_constructor_kwargs={"every_ms": every_ms},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 8),
    )


def probe_media_bytes(payload: bytes) -> dict:
    """Header-only media probe: container format + dimensions (images)
    or channels/sample-rate/frames (WAV audio) WITHOUT decoding pixel
    or sample data — the 100-TB filter pattern (drop tiny/huge images,
    wrong-format payloads, mono audio...) that reads a few hundred
    bytes per payload instead of decompressing it. Formats: PNG (IHDR),
    GIF (logical screen), BMP (BITMAPINFOHEADER), P6 PPM (text header),
    baseline/progressive JPEG (marker walk to SOFn), RIFF/WAVE (fmt +
    data chunks). Unknown/truncated payloads return fmt='unknown' with
    null metrics — a probe never raises on data."""
    import struct

    out = {
        "fmt": "unknown",
        "width": None,
        "height": None,
        "channels": None,
        "sample_rate": None,
        "n_frames": None,
    }
    try:
        if payload[:8] == b"\x89PNG\r\n\x1a\n" and len(payload) >= 24:
            w, h = struct.unpack(">II", payload[16:24])
            out.update(fmt="png", width=w, height=h)
        elif payload[:4] in (b"GIF8",) and len(payload) >= 10:
            w, h = struct.unpack("<HH", payload[6:10])
            out.update(fmt="gif", width=w, height=h)
        elif payload[:2] == b"BM" and len(payload) >= 26:
            w, h = struct.unpack("<ii", payload[18:26])
            out.update(fmt="bmp", width=w, height=abs(h))
        elif payload[:2] == b"P6":
            fields: list[int] = []
            pos = 2
            while len(fields) < 3 and pos < min(len(payload), 64):
                while pos < len(payload) and payload[pos : pos + 1].isspace():
                    pos += 1
                start = pos
                while pos < len(payload) and not payload[pos : pos + 1].isspace():
                    pos += 1
                fields.append(int(payload[start:pos]))
            out.update(fmt="ppm", width=fields[0], height=fields[1])
        elif payload[:2] == b"\xff\xd8":
            pos = 2
            while pos + 4 <= len(payload):
                if payload[pos] != 0xFF:
                    break
                # spec-valid 0xFF fill bytes may pad before any marker
                while pos + 4 <= len(payload) and payload[pos + 1] == 0xFF:
                    pos += 1
                marker = payload[pos + 1]
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2
                    continue
                seg_len = struct.unpack(">H", payload[pos + 2 : pos + 4])[0]
                if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                    h, w = struct.unpack(
                        ">HH", payload[pos + 5 : pos + 9]
                    )
                    nc = payload[pos + 9]
                    out.update(fmt="jpeg", width=w, height=h, channels=nc)
                    break
                pos += 2 + seg_len
        elif payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
            pos = 12
            ch = sr = bits = nbytes = None
            while pos + 8 <= len(payload):
                cid = payload[pos : pos + 4]
                sz = struct.unpack("<I", payload[pos + 4 : pos + 8])[0]
                if cid == b"fmt " and sz >= 16:
                    ch, sr = struct.unpack(
                        "<HI", payload[pos + 10 : pos + 16]
                    )
                    bits = struct.unpack(
                        "<H", payload[pos + 22 : pos + 24]
                    )[0]
                elif cid == b"data":
                    nbytes = sz
                pos += 8 + sz + (sz & 1)
            if ch and sr:
                out.update(fmt="wav", channels=ch, sample_rate=sr)
                # sub-byte sample widths (ADPCM etc.) have no whole-byte
                # frame size — report no frame count rather than divide
                # by zero
                if nbytes is not None and bits and bits >= 8:
                    out["n_frames"] = nbytes // (ch * (bits // 8))
    except (ValueError, IndexError, struct.error):
        out = {
            "fmt": "unknown",
            "width": None,
            "height": None,
            "channels": None,
            "sample_rate": None,
            "n_frames": None,
        }
    return out


def probe_media(media: "ray.data.Dataset") -> "ray.data.Dataset":
    """Header-only probe over a media table (media_id, payload, ...):
    stateless map, reads only container headers — the cheap pre-filter
    stage before any decode actor pool. Output: (media_id, fmt, width,
    height, channels, sample_rate, n_frames)."""

    def probe(batch: pa.Table):
        if batch.num_rows == 0:
            return
        rows = [
            probe_media_bytes(p or b"")
            for p in batch.column("payload").to_pylist()
        ]
        yield pa.Table.from_pydict(
            {
                "media_id": batch.column("media_id").cast(pa.int64()),
                "fmt": pa.array([r["fmt"] for r in rows], type=pa.string()),
                "width": pa.array(
                    [r["width"] for r in rows], type=pa.int64()
                ),
                "height": pa.array(
                    [r["height"] for r in rows], type=pa.int64()
                ),
                "channels": pa.array(
                    [r["channels"] for r in rows], type=pa.int64()
                ),
                "sample_rate": pa.array(
                    [r["sample_rate"] for r in rows], type=pa.int64()
                ),
                "n_frames": pa.array(
                    [r["n_frames"] for r in rows], type=pa.int64()
                ),
            }
        )

    return media.map_batches(probe, batch_format="pyarrow")
