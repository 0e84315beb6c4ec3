"""JSONL (newline-delimited JSON) corpus source — the other common
wire format for crawl-derived text corpora beside parquet and WARC
(e.g. jsonl.gz shard dumps). The reference ingests single documents
(reference ctinexus/app.py CLI); this module exists for the
corpus-scale ingestion path.

Scale shape: one Ray task per shard writes its own .jsonl.gz (no two
tasks share a file — the resumable-output rule), and reads go through
``ray.data.read_json`` so decompression and parsing stream block by
block; nothing corpus-sized touches the driver in either direction."""

from __future__ import annotations

import gzip
import json
import os

import ray
import ray.data


@ray.remote
def _write_shard(
    parquet_path: str, out_path: str, shard: int, n_shards: int
) -> int:
    """Write one deterministic shard: rows with doc_id % n_shards ==
    shard, ordered by doc_id, one JSON object per line, gzip -9 (fixed
    level + mtime=0 so shard bytes are run-independent)."""
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["doc_id", "text"])
    mask = pc.equal(
        pc.bit_wise_and(t.column("doc_id"), n_shards - 1)
        if (n_shards & (n_shards - 1)) == 0
        else pc.mod(t.column("doc_id"), n_shards),
        shard,
    )
    t = t.filter(mask).sort_by("doc_id")
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as raw:
        with gzip.GzipFile(fileobj=raw, mode="wb", compresslevel=9, mtime=0) as f:
            for doc_id, text in zip(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist()
            ):
                line = json.dumps(
                    {"doc_id": doc_id, "text": text}, ensure_ascii=False
                )
                f.write(line.encode("utf-8") + b"\n")
    os.replace(tmp, out_path)
    return t.num_rows


def write_jsonl_corpus(
    parquet_path: str, out_dir: str, n_shards: int = 4
) -> list[str]:
    """Shard a (doc_id, text) parquet corpus into deterministic
    .jsonl.gz files — one Ray task per shard, atomic rename commit."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"part-{s:05d}.jsonl.gz")
        for s in range(n_shards)
    ]
    ray.get(
        [
            _write_shard.remote(parquet_path, p, s, n_shards)
            for s, p in enumerate(paths)
        ]
    )
    return paths


def read_jsonl(paths: list[str] | str) -> ray.data.Dataset:
    """Streaming JSONL reader (.gz transparent) — one block per file
    group, Arrow-native parse, no driver materialization."""
    return ray.data.read_json(
        paths, arrow_open_stream_args={"compression": "gzip"}
    )
