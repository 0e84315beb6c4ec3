"""Media near-dup scale evidence: the round-4 media_dedup_job was only
driven at 420 rows; this generates a 50k+-item tri-modal corpus (Ray-
parallel, deterministic per id) and runs the real job end-to-end.

Image volume carries the scale: 2 per base — a PNG and a BMP of the
IDENTICAL pixels (the container-dup shape of a real image crawl), so
the EXPECTED image pair count is exactly n_image_bases and the job's
recall is checkable at scale, not just timed. Audio/video ride along at
their generators' deterministic sizes (their tone/pattern grids cap the
number of spectrally distinct bases — scaling them would create one
giant near-dup class, a different benchmark).

Run: python BENCH/media_bench.py [--image-bases 25000]
Prints one JSON line for BASELINE.md; rerun reports the job skipped.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)
_JOBS = os.path.join(_REPO, "jobs")
if _JOBS not in sys.path:
    sys.path.insert(0, _JOBS)


def generate(corpus_dir: str, image_bases: int) -> None:
    import pyarrow as pa
    import ray
    import ray.data

    from ctinexus_ray.ops.multimodal import (
        MEDIA_SCHEMA,
        make_audio_dup_corpus,
        make_video_dup_corpus,
    )

    os.makedirs(corpus_dir, exist_ok=True)

    def render(batch: pa.Table) -> pa.Table:
        import hashlib

        import numpy as np

        from ctinexus_ray.ops.multimodal import encode_bmp, encode_png

        rows = []
        for i in batch.column("id").to_pylist():
            digest = hashlib.blake2b(
                f"mediabench:{i}".encode(), digest_size=8
            ).digest()
            w, h = 16 + digest[0] % 17, 16 + digest[1] % 17
            # per-id NOISE content: the synthetic gradient generator has
            # only ~77 distinct slopes, so unrelated gradients collide
            # under pHash; iid noise gives each base an independent
            # signature (accidental <=6-bit pairs ~0 at 50k items)
            rng = np.random.default_rng(int.from_bytes(digest, "little"))
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for j, (payload, mime) in enumerate(
                ((encode_png(img), "image/png"), (encode_bmp(img), "image/bmp"))
            ):
                rows.append(
                    {
                        "media_id": 1_000_000 + 2 * i + j,
                        "kind": "image",
                        "payload": payload,
                        "mime": mime,
                        "width": w,
                        "height": h,
                        "duration_ms": 0,
                    }
                )
        return pa.Table.from_pylist(rows, schema=MEDIA_SCHEMA)

    (
        ray.data.range(image_bases)
        .repartition(64)
        .map_batches(render, batch_format="pyarrow")
        .write_parquet(corpus_dir)
    )
    import pyarrow.parquet as pq

    def with_id_offset(tbl: pa.Table, offset: int) -> pa.Table:
        import pyarrow.compute as pc

        # the small generators both number from 0 — disjoint id ranges
        # or the job's unique-media_id guard refuses (correctly)
        return tbl.set_column(
            tbl.schema.get_field_index("media_id"),
            "media_id",
            pc.add(tbl.column("media_id"), offset),
        )

    pq.write_table(
        with_id_offset(make_audio_dup_corpus(10), 5_000_000),
        os.path.join(corpus_dir, "audio.parquet"),
    )
    pq.write_table(
        with_id_offset(make_video_dup_corpus(10), 7_000_000),
        os.path.join(corpus_dir, "video.parquet"),
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image-bases", type=int, default=25000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--workdir", default="/tmp/media_bench")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)
    from jobs.media_dedup_job import run_media_dedup

    corpus = os.path.join(args.workdir, "corpus")
    if not os.path.isdir(corpus) or not os.listdir(corpus):
        t0 = time.time()
        generate(corpus, args.image_bases)
        gen_sec = time.time() - t0
    else:
        gen_sec = 0.0
    out = os.path.join(args.workdir, "dedup")
    shutil.rmtree(out, ignore_errors=True)
    t0 = time.time()
    stats = run_media_dedup(corpus, out)
    job_sec = time.time() - t0
    t0 = time.time()
    rerun = run_media_dedup(corpus, out)
    rerun_sec = time.time() - t0

    n_items = 2 * args.image_bases + 60
    print(json.dumps({
        "metric": "media_dedup_scale",
        "num_cpus": args.cpus,
        "n_items": n_items,
        "image_bases": args.image_bases,
        "gen_sec": round(gen_sec, 2),
        "job_sec": round(job_sec, 2),
        "rerun_sec": round(rerun_sec, 2),
        "rerun_skipped": bool(rerun.get("skipped")),
        "expected_image_pairs": args.image_bases,
        "job_stats": {
            k: v for k, v in stats.items()
            if isinstance(v, (int, float, bool))
        },
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
