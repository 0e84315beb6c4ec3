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
    """Actor-pool decode + feature-extract stage.

    Real deployment: ``__init__`` loads the codec/model once per actor;
    ``__call__`` decodes a batch of payloads. Here the codec is stubbed.
    """

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
    """Video frame-sampling plumbing: emits one row per sampled frame
    offset (real decoder would attach the frame payload)."""

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
# end; compressed formats (png/jpeg/mp4) remain honestly stubbed in
# ``DecodeImageStage``.


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


def make_real_media_table(n: int) -> pa.Table:
    """Deterministic media rows with REAL decodable payloads: P6 PPM
    images and PCM16 WAV sines (hash-derived dims/frequency/duration)."""
    rows = []
    for i in range(n):
        digest = hashlib.blake2b(f"realmedia:{i}".encode(), digest_size=8).digest()
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


class DecodeMediaStage:
    """REAL decode + feature-extract actor stage for the stdlib-decodable
    formats (P6 PPM images, PCM16 WAV audio). Per-row output feature
    layout (fixed 8 floats so the column is rectangular):

      image: [width, height, mean_r, mean_g, mean_b, gray2x2...(3 of 4)]
             — 2x2 area-mean grayscale grid, first 3 cells (the 4th is
             redundant with the mean)
      audio: [duration_s, rms, zero_cross_rate, peak, rate, n_samples,
             0, 0]

    Compressed mimes raise ``ValueError`` listing the supported set —
    the honest boundary; ``DecodeImageStage`` remains the stub for them.
    """

    SUPPORTED = ("image/x-portable-pixmap", "audio/wav")

    def __init__(self, target_size: tuple[int, int] = (2, 2)):
        self.target_size = target_size

    def _features(self, mime: str, payload: bytes) -> list[float]:
        if mime == "image/x-portable-pixmap":
            img = decode_ppm(payload)
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
    media: ray.data.Dataset, batch_size: int = 16
) -> ray.data.Dataset:
    """REAL decode feature extraction (PPM/WAV) as an actor pool — small
    batches on purpose (payload bytes × batch × concurrency must fit the
    worker heap)."""
    return media.map_batches(
        DecodeMediaStage,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=(1, 4),
    )
