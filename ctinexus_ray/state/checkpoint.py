"""Resumable partitioned Parquet output with per-partition lineage sidecars
(SURVEY §7.1 step 9; north_star "per-partition lineage and metrics
checkpoints enabling resume").

Layout per output root:

    out/
      part-<pid>.parquet          one file per input partition
      _SUCCESS.<pid>.json         lineage sidecar: input files, row counts,
                                  stage metrics, wall time

Partition ids are DETERMINISTIC — derived from the input parquet file list
— so a restarted job computes the same ids, filters out the ones whose
sidecar already exists, and only processes the remainder. Ray Data handles
intra-run task retries (lineage re-execution); this layer handles
cross-run resume, which Ray does not provide.
"""

from __future__ import annotations

import hashlib
import json
import time
from pathlib import Path
from typing import Callable

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def partition_id(input_file: str) -> str:
    """Deterministic partition id for one input file."""
    return hashlib.blake2b(input_file.encode("utf-8"), digest_size=8).hexdigest()


def list_input_partitions(input_files: list[str]) -> list[tuple[str, str]]:
    """[(partition_id, input_file)] sorted by file path."""
    return [(partition_id(f), f) for f in sorted(input_files)]


def completed_partitions(out_dir: str | Path) -> set[str]:
    """Partition ids whose _SUCCESS sidecar exists."""
    out = Path(out_dir)
    if not out.exists():
        return set()
    return {
        p.name[len("_SUCCESS.") : -len(".json")]
        for p in out.glob("_SUCCESS.*.json")
    }


def pending_partitions(
    input_files: list[str], out_dir: str | Path
) -> list[tuple[str, str]]:
    """Partitions still to process (resume filter)."""
    done = completed_partitions(out_dir)
    return [(pid, f) for pid, f in list_input_partitions(input_files) if pid not in done]


def write_partition(
    out_dir: str | Path,
    pid: str,
    table: pa.Table,
    lineage: dict,
) -> None:
    """Write one partition atomically: data first, sidecar last (the
    sidecar is the commit record — a crash between the two writes leaves a
    re-doable partition, never a half-committed one)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    data_path = out / f"part-{pid}.parquet"
    tmp_path = out / f".part-{pid}.parquet.tmp"
    pq.write_table(table, tmp_path)
    tmp_path.rename(data_path)
    sidecar = {
        "partition_id": pid,
        "rows": table.num_rows,
        "columns": table.column_names,
        **lineage,
    }
    sidecar_path = out / f"_SUCCESS.{pid}.json"
    tmp_sidecar = out / f"._SUCCESS.{pid}.json.tmp"
    tmp_sidecar.write_text(json.dumps(sidecar, indent=2))
    tmp_sidecar.rename(sidecar_path)


def run_resumable(
    input_files: list[str],
    out_dir: str | Path,
    pipeline: Callable[[ray.data.Dataset], ray.data.Dataset],
    reader: Callable[[str], ray.data.Dataset] | None = None,
    lineage_fn: Callable[[pa.Table], dict] | None = None,
) -> dict:
    """Run ``pipeline`` per input partition, skipping completed ones.

    Each partition runs as its own small streaming Dataset execution and
    commits independently — a failed run resumes at the first partition
    without a sidecar. Returns a summary {"processed", "skipped", "rows"}.

    Scale note: per-partition executions trade a little scheduling overhead
    for exact resume granularity; input files for a 10^12-doc corpus are
    row-group-sized shards, so each execution still saturates the cluster
    via Ray Data's internal parallelism over row groups.
    """
    reader = reader or (lambda f: ray.data.read_parquet(f))
    pending = pending_partitions(input_files, out_dir)
    done = len(input_files) - len(pending)
    rows_total = 0
    for pid, input_file in pending:
        start = time.time()
        ds = pipeline(reader(input_file))
        batches = list(ds.iter_batches(batch_format="pyarrow"))
        if batches:
            table = pa.concat_tables(batches)
        else:
            # a partition whose pipeline output is legitimately empty
            # (e.g. every doc failed a quality filter) still commits —
            # otherwise the shard can never gain a sidecar and every
            # rerun crashes on it
            try:
                from ctinexus_ray.ops.distjoin import _arrow_type

                schema = ds.schema()
                table = pa.schema(
                    [
                        (n, _arrow_type(t))
                        for n, t in zip(schema.names, schema.types)
                    ]
                ).empty_table()
            except Exception:  # noqa: BLE001 — schema unknown on empty
                table = pa.table({})
        rows_total += table.num_rows
        lineage = {
            "input_file": input_file,
            "wall_time_s": round(time.time() - start, 3),
        }
        if lineage_fn is not None:
            lineage.update(lineage_fn(table))
        write_partition(out_dir, pid, table, lineage)
    return {"processed": len(pending), "skipped": done, "rows": rows_total}


def read_lineage(out_dir: str | Path) -> list[dict]:
    """All sidecars (the per-partition metrics/lineage record)."""
    return [
        json.loads(p.read_text()) for p in sorted(Path(out_dir).glob("_SUCCESS.*.json"))
    ]
