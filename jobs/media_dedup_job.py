"""``ray job submit`` entrypoint for MEDIA near-duplicate removal — the
multimodal sibling of dedup_job: one pass computes a per-kind
fingerprint for every payload through the REAL codecs (image pHash,
audio spectral hash, video luma-grid signature), near-dup pairs come
from the shared Hamming banding+verify core, clusters collapse via
distributed connected components, and survivors' full rows (payload
included) write back as partitioned parquet.

    ray job submit --working-dir . -- \
        python jobs/media_dedup_job.py --input s3://bucket/media/ --output s3://bucket/clean/

All-or-nothing phase resume (the dedup_job marker pattern): a completed
output is skipped wholesale; a crashed partial output is rebuilt (ray
write_parquet appends, so resuming into a partial dir would double
rows). Per-kind Hamming thresholds are flags; kinds without a
fingerprint (no codec) pass through untouched and are counted.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time
from pathlib import Path

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def run_media_dedup(
    input_dir: str,
    output_dir: str,
    image_hamming: int = 6,
    audio_hamming: int = 3,
    video_hamming: int = 6,
) -> dict:
    import pyarrow.compute as pc
    import ray
    import ray.data

    from ctinexus_ray.ops.multimodal import (
        audio_hash_dups,
        image_phash_dups,
        media_dedup_keep,
        video_hash_dups,
    )

    marker = Path(output_dir) / "_MEDIA_DEDUP_SUCCESS.json"
    if marker.exists():
        stats = json.loads(marker.read_text())
        stats["skipped"] = True
        return stats
    shutil.rmtree(output_dir, ignore_errors=True)
    start = time.perf_counter()

    media = ray.data.read_parquet(input_dir)
    n_in = media.count()
    # pairs only form within one kind's signature set, so unioning the
    # per-kind pair sets is safe ONLY under unique media_id across the
    # whole table — enforce it loudly (an id shared between an image
    # and an audio row would weld unrelated clusters)
    from ctinexus_ray.ops.groupagg import partitioned_agg

    n_ids = partitioned_agg(
        media.select_columns(["media_id"]),
        keys=["media_id"],
        named_aggs={"n": ("media_id", "size")},
    ).count()
    if n_ids != n_in:
        raise ValueError(
            f"media_dedup: media_id is not unique ({n_in} rows, "
            f"{n_ids} distinct ids) — fingerprint clusters would weld "
            "across unrelated rows"
        )

    def kind_count(kind: str) -> int:
        return media.map_batches(
            lambda t, k=kind: t.filter(pc.equal(t.column("kind"), k)),
            batch_format="pyarrow",
        ).count()

    counts = {k: kind_count(k) for k in ("image", "audio", "video")}
    # each pair set MATERIALIZES before the union: pairs are tiny
    # (near-dup-count-sized), and unioning three live actor-pool DAGs
    # into one streaming execution starves them of CPUs on small
    # clusters (observed livelock at num_cpus=4)
    pair_sets = []
    if counts["image"]:
        pair_sets.append(
            image_phash_dups(media, max_hamming=image_hamming).materialize()
        )
    if counts["audio"]:
        pair_sets.append(
            audio_hash_dups(media, max_hamming=audio_hamming).materialize()
        )
    if counts["video"]:
        pair_sets.append(
            video_hash_dups(media, max_hamming=video_hamming).materialize()
        )
    if not pair_sets:
        raise ValueError(
            "media_dedup: no image/audio/video rows in the input — "
            "nothing a fingerprint applies to"
        )
    pairs = pair_sets[0]
    for p in pair_sets[1:]:
        pairs = pairs.union(p)
    n_pairs = pairs.count()

    kept = media_dedup_keep(media, pairs)
    kept.write_parquet(output_dir)
    n_out = ray.data.read_parquet(output_dir).count()

    stats = {
        "input_rows": n_in,
        "by_kind": counts,
        "near_dup_pairs": n_pairs,
        "surviving_rows": n_out,
        "dropped": n_in - n_out,
        "sec": round(time.perf_counter() - start, 2),
        "output": output_dir,
        "skipped": False,
    }
    tmp = str(marker) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, marker)
    return stats


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="media parquet dir")
    parser.add_argument("--output", required=True)
    parser.add_argument("--image-hamming", type=int, default=6)
    parser.add_argument("--audio-hamming", type=int, default=3)
    parser.add_argument("--video-hamming", type=int, default=6)
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    stats = run_media_dedup(
        args.input, args.output,
        image_hamming=args.image_hamming,
        audio_hamming=args.audio_hamming,
        video_hamming=args.video_hamming,
    )
    print(json.dumps(stats, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
