"""Flat-file corpus sources: JSONL (newline-delimited JSON) and CSV — the other common
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
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(ids % n_shards == shard)).sort_by("doc_id")
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
    """Streaming JSONL reader — one block per file group, Arrow-native
    parse, no driver materialization. Gzip is detected from the .gz
    suffix (all-or-nothing per call: split mixed path lists)."""
    plist = [paths] if isinstance(paths, str) else list(paths)
    gz = [p.endswith(".gz") for p in plist]
    if any(gz) and not all(gz):
        raise ValueError("mix of .gz and plain JSONL — split the read")
    kwargs = (
        {"arrow_open_stream_args": {"compression": "gzip"}} if all(gz) else {}
    )
    return ray.data.read_json(plist, **kwargs)


@ray.remote
def _write_csv_shard(
    parquet_path: str, out_path: str, shard: int, n_shards: int
) -> int:
    """CSV sibling of ``_write_shard``: arrow csv writer, QUOTE_ALL
    strings so empty string and embedded delimiters survive; NULL
    renders as an UNQUOTED empty field (arrow convention), so
    NULL != '' round-trips when read back with the same convention."""
    import pyarrow as pa
    import pyarrow.csv as pacsv
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(ids % n_shards == shard)).sort_by("doc_id")
    tmp = out_path + ".tmp"
    pacsv.write_csv(
        t,
        tmp,
        write_options=pacsv.WriteOptions(quoting_style="all_valid"),
    )
    os.replace(tmp, out_path)
    return t.num_rows


def write_csv_corpus(
    parquet_path: str, out_dir: str, n_shards: int = 4
) -> list[str]:
    """Shard a (doc_id, text) parquet corpus into deterministic .csv
    files — one Ray task per shard, atomic rename commit."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"part-{s:05d}.csv") for s in range(n_shards)
    ]
    ray.get(
        [
            _write_csv_shard.remote(parquet_path, p, s, n_shards)
            for s, p in enumerate(paths)
        ]
    )
    return paths


def read_csv_corpus(paths: list[str] | str) -> ray.data.Dataset:
    """Streaming CSV reader matching ``write_csv_corpus``'s dialect:
    quoted strings are data (even empty), unquoted empty is NULL.
    ``newlines_in_values`` is load-bearing: crawl text contains
    newlines, and without it a quoted multi-line value desynchronizes
    arrow's block chunker as soon as a shard spans read blocks."""
    from pyarrow import csv as pacsv

    return ray.data.read_csv(
        paths,
        parse_options=pacsv.ParseOptions(newlines_in_values=True),
        convert_options=pacsv.ConvertOptions(
            strings_can_be_null=True, quoted_strings_can_be_null=False
        ),
    )


def read_corpus_auto(path: str) -> ray.data.Dataset:
    """Point-a-job-at-whatever-the-crawl-dumped adapter: a directory of
    .jsonl/.jsonl.gz shards (or a single such file) streams through
    ``read_jsonl``, .csv shards through ``read_csv_corpus``; anything
    else is read as parquet. Used by the dedup/prepare job entrypoints
    so corpora need no conversion pass."""
    import glob as _glob

    base = path.rstrip("/")
    jl = sorted(
        _glob.glob(f"{base}/*.jsonl") + _glob.glob(f"{base}/*.jsonl.gz")
    )
    if jl or base.endswith((".jsonl", ".jsonl.gz")):
        jl = jl or [base]
        plain = [p for p in jl if not p.endswith(".gz")]
        gz = [p for p in jl if p.endswith(".gz")]
        if plain and gz:  # partially recompressed dump: split + union
            return read_jsonl(plain).union(read_jsonl(gz))
        return read_jsonl(jl)
    cs = sorted(_glob.glob(f"{base}/*.csv"))
    if cs or base.endswith(".csv"):
        return read_csv_corpus(cs or [base])
    av = sorted(_glob.glob(f"{base}/*.avro"))
    if av or base.endswith(".avro"):
        from ctinexus_ray.sources.avro import read_avro

        return read_avro(av or [base])
    return ray.data.read_parquet(path)
