"""Zipfian-skew bench for KG canonicalization (SURVEY §7.3's claim):
synthesize a corpus where ONE mention ("Microsoft"-shaped) appears in
EVERY document plus a Zipfian tail, run the canonicalization shuffle at
400-800k docs, and measure (a) how many shuffle rows the head key ships
(the map-side combine should collapse per-doc mentions to ~one row per
batch), (b) the per-partition reduce input distribution (the head key
must not blow up one partition), (c) wall time and driver RSS.

Standalone: ``python BENCH/skew_bench.py --docs 400000 [--cpus 32]``.
Results are recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import resource
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def make_kg_batch(start: int, count: int, tail_entities: int) -> "pa.Table":
    """Per-doc kg rows: every doc mentions the head entity 3x (with case
    variants, exercising the normalization key) + 4 Zipfian-tail
    entities; ~1/8 of docs link the head to a tail entity."""
    import json as _json

    import numpy as np
    import pyarrow as pa

    rng = np.random.default_rng(start)  # deterministic per shard
    # Zipf over the tail vocabulary (s ~ 1.2, clipped)
    tail = (rng.zipf(1.2, size=(count, 4)) % tail_entities).astype(np.int64)
    urls, aligned, links = [], [], []
    head_variants = ("Microsoft", "microsoft", "MICROSOFT")
    for i in range(count):
        doc_id = start + i
        urls.append(f"https://corp.example.com/{doc_id:09d}")
        head = head_variants[doc_id % 3]
        t0, t1, t2, t3 = (f"entity_{int(v)}" for v in tail[i])
        triples = [
            {
                "relation": "uses",
                "subject": {"mention_text": head, "mention_class": "Organization",
                            "entity_id": 0, "entity_text": head},
                "object": {"mention_text": t0, "mention_class": "Malware",
                           "entity_id": 1, "entity_text": t0},
            },
            {
                "relation": "targets",
                "subject": {"mention_text": head, "mention_class": "Organization",
                            "entity_id": 0, "entity_text": head},
                "object": {"mention_text": t1, "mention_class": "Location",
                           "entity_id": 2, "entity_text": t1},
            },
            {
                "relation": "related",
                "subject": {"mention_text": t2, "mention_class": "Tool",
                            "entity_id": 3, "entity_text": t2},
                "object": {"mention_text": t3, "mention_class": "Indicator",
                           "entity_id": 4, "entity_text": t3},
            },
        ]
        link = (
            [{
                "relation": "linked",
                "subject": {"mention_text": head, "mention_class": "Organization",
                            "entity_id": 0, "entity_text": head},
                "object": {"mention_text": t0, "mention_class": "Malware",
                           "entity_id": 1, "entity_text": t0},
            }]
            if doc_id % 8 == 0
            else []
        )
        aligned.append(_json.dumps(triples))
        links.append(_json.dumps(link))
    return pa.Table.from_pydict(
        {
            "url": pa.array(urls, type=pa.string()),
            "kg_aligned_json": pa.array(aligned, type=pa.string()),
            "kg_links_json": pa.array(links, type=pa.string()),
        }
    )


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--docs", type=int, default=400_000)
    parser.add_argument("--tail-entities", type=int, default=200_000)
    parser.add_argument("--cpus", type=int,
                        default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    parser.add_argument("--shard-rows", type=int, default=25_000)
    args = parser.parse_args()

    import ray
    import ray.data

    ray.init(address="local", num_cpus=args.cpus, include_dashboard=False)
    import pyarrow as pa  # noqa: F401
    import pyarrow.compute as pc

    from ctinexus_ray.config import PipelineConfig
    from ctinexus_ray.pipelines.kg import canonicalize_nodes
    from ctinexus_ray.stages.triples import entity_key, entity_partials_batch

    rss0 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    shards = [
        (s, min(args.shard_rows, args.docs - s))
        for s in range(0, args.docs, args.shard_rows)
    ]

    @ray.remote
    def gen(start: int, count: int):
        return make_kg_batch(start, count, args.tail_entities)

    refs = [gen.remote(s, c) for s, c in shards]
    docs_kg = ray.data.from_arrow_refs(refs).materialize()

    head_key = entity_key("Microsoft")
    config = PipelineConfig()

    # --- measured run: the canonicalization shuffle ---------------------
    t0 = time.perf_counter()
    nodes = canonicalize_nodes(docs_kg, config).materialize()
    wall = time.perf_counter() - t0
    n_entities = nodes.count()
    head = [
        r for r in nodes.filter(
            expr=f"entity_key == {head_key}"
        ).take_all()
    ]

    # --- shuffle-shape evidence -----------------------------------------
    # partials = exactly what the wide groupby shuffles; count the head
    # key's rows and the per-partition totals
    partials = docs_kg.map_batches(
        entity_partials_batch, batch_format="pyarrow",
        batch_size=config.cpu_batch_size,
    )
    num_partitions = config.canon_num_partitions or 64

    def shape_partial(batch):
        pk = pc.bit_wise_and(batch.column("entity_key"), num_partitions - 1)
        counts = pc.value_counts(pk)
        yield pa.Table.from_pydict(
            {
                "pkey": counts.field("values"),
                "n": counts.field("counts").cast(pa.int64()),
            }
        )

    import collections

    per_part: collections.Counter = collections.Counter()
    for b in (
        partials.map_batches(shape_partial, batch_format="pyarrow")
        .iter_batches(batch_format="pyarrow")
    ):
        for pk, n in zip(b.column("pkey").to_pylist(), b.column("n").to_pylist()):
            per_part[pk] += n
    head_shuffle_rows = partials.filter(
        expr=f"entity_key == {head_key}"
    ).count()

    sizes = sorted(per_part.values())
    rss1 = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    report = {
        "docs": args.docs,
        "cpus": args.cpus,
        "canon_wall_sec": round(wall, 2),
        "docs_per_sec": round(args.docs / wall),
        "n_entities": n_entities,
        "head_doc_count": head[0]["doc_count"] if head else 0,
        "head_mention_count": head[0]["mention_count"] if head else 0,
        "head_shuffle_rows": head_shuffle_rows,
        "head_collapse_factor": (
            round(head[0]["mention_count"] / head_shuffle_rows)
            if head and head_shuffle_rows
            else None
        ),
        "reduce_partition_rows": {
            "min": sizes[0] if sizes else 0,
            "median": sizes[len(sizes) // 2] if sizes else 0,
            "max": sizes[-1] if sizes else 0,
            "max_over_median": (
                round(sizes[-1] / max(sizes[len(sizes) // 2], 1), 2)
                if sizes
                else None
            ),
        },
        "driver_rss_mb": {"start": rss0, "peak": rss1},
    }
    print(json.dumps(report))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
