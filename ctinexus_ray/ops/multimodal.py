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
