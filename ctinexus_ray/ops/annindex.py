"""Persisted IVF index over the versioned table format.

``ops/simsearch.py ivf_topk`` trains and probes in one job — right for
a one-off query batch, wasteful when the corpus is long-lived and
queries arrive forever. This module makes the index a TABLE:

  * ``ivf_index_build`` — train deterministic k-means centroids on a
    bounded sample, assign every vector to its cell, write ONE parquet
    file per cell, and commit as a ``state/tableformat`` version with
    the centroids stored in the manifest's ``extra`` (atomic with the
    data: a reader can never see cells without their centroids).
  * ``ivf_index_append`` — assign NEW vectors under the EXISTING
    centroids and append-commit. The incremental-ingestion shape:
    centroids are frozen at build time (the standard IVF contract —
    retrain by rebuilding), appends cost one assignment pass, and
    crash-safety/time-travel come from the table format for free.
  * ``ivf_index_search`` — probe ``n_probe`` cells per query and scan
    ONLY matching rows via a ``cell IN (...)`` filter pushed into the
    parquet read; per-cell files make that a file-level skip. The
    scan itself is the shared ``brute_force_topk`` partial/merge.

Scale notes: nothing corpus-sized touches the driver (the training
sample and the centroid table are bounded); cell files append per
commit so a 10^12-vector index is many small per-cell files per
ingest tick — run ``compact_table`` periodically (correctness is
filter-based, so compaction only trades file-skip sharpness, never
results). The reference has no ANN index at all; this is the
corpus-scale sibling of its per-call embedding cache
(`/root/reference/ctinexus/llm_processor.py` embeds one report at a
time).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pyarrow as pa
import ray
import ray.data

from ctinexus_ray.ops.dedup import list_col_to_matrix
from ctinexus_ray.ops.simsearch import (
    _deterministic_kmeans,
    _normalize,
    brute_force_topk,
)
from ctinexus_ray.state.tableformat import (
    commit_version,
    read_version,
    version_extra,
)


def _assign_and_write(
    embeddings: ray.data.Dataset, centroids: np.ndarray, table_dir: str
) -> list[str]:
    """Assign each vector to its nearest centroid and write one parquet
    file per cell (inside the cell's own reduce task)."""
    cent_ref = ray.put(centroids)
    data_dir = os.path.join(table_dir, f"cells-{uuid.uuid4().hex[:12]}")
    os.makedirs(data_dir, exist_ok=True)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cent_ref)
        mat = _normalize(list_col_to_matrix(batch.column("embedding")))
        cells = (
            np.argmax(mat @ cents.T, axis=1)
            if mat.shape[0]
            else np.zeros(0, dtype=np.int64)
        )
        return pa.Table.from_pydict(
            {
                "cell": pa.array(cells.astype(np.int64), type=pa.int64()),
                "vec_id": batch.column("vec_id"),
                "embedding": batch.column("embedding"),
            }
        )

    def write_cell(g):
        import pandas as pd  # noqa: F401 — map_groups hands a DataFrame
        import pyarrow.parquet as pq

        cell = int(g["cell"].iloc[0])
        mat = np.stack([np.asarray(e, dtype=np.float64) for e in g["embedding"]])
        emb = pa.FixedSizeListArray.from_arrays(
            pa.array(mat.reshape(-1), type=pa.float64()), mat.shape[1]
        )
        t = pa.Table.from_pydict(
            {
                "cell": pa.array(g["cell"].to_numpy(), type=pa.int64()),
                "vec_id": pa.array(g["vec_id"].to_numpy(), type=pa.int64()),
                "embedding": emb,
            }
        )
        path = os.path.join(data_dir, f"cell-{cell:05d}.parquet")
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pa.Table.from_pydict({"path": pa.array([path])}).to_pandas()

    written = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(assign, batch_format="pyarrow")
        .groupby("cell")
        .map_groups(write_cell, batch_format="pandas")
        .take_all()
    )
    return sorted(r["path"] for r in written)


def ivf_index_build(
    embeddings: ray.data.Dataset,
    table_dir: str,
    n_centroids: int = 16,
    train_sample: int = 2048,
) -> int:
    """Build (or rebuild) the index; returns the committed version.

    The k-means training sample is the ``train_sample`` rows with the
    smallest mixed hash of ``vec_id`` — content-addressed, so sparse or
    offset id spaces (post-dedup tables, appended ranges) sample
    uniformly instead of biasing toward whatever happens to live below
    ``train_sample``; each batch cuts locally to its smallest-hash rows
    before the driver merges, so driver work is O(batches x sample)."""

    def local_sample(batch: pa.Table) -> pa.Table:
        ids = batch.column("vec_id").to_numpy().astype(np.uint64)
        # splitmix64 finalizer — deterministic, uniform over any id space
        h = (ids + np.uint64(0x9E3779B97F4A7C15)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        h ^= h >> np.uint64(30)
        h = (h * np.uint64(0xBF58476D1CE4E5B9)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        h ^= h >> np.uint64(27)
        h = (h * np.uint64(0x94D049BB133111EB)) & np.uint64(0xFFFFFFFFFFFFFFFF)
        h ^= h >> np.uint64(31)
        keep = np.argsort(h, kind="stable")[:train_sample]
        t = batch.append_column("__h", pa.array(h, type=pa.uint64()))
        return t.take(pa.array(np.sort(keep)))

    sample_rows = (
        embeddings.select_columns(["vec_id", "embedding"])
        .map_batches(local_sample, batch_format="pyarrow")
        .take_all()
    )
    if not sample_rows:
        raise ValueError("ivf_index_build: no vectors to train on")
    sample_rows.sort(key=lambda r: (r["__h"], r["vec_id"]))
    sample_rows = sample_rows[:train_sample]
    sample = np.array([r["embedding"] for r in sample_rows], dtype=np.float64)
    centroids = _deterministic_kmeans(sample, min(n_centroids, len(sample)))
    files = _assign_and_write(embeddings, centroids, table_dir)
    return commit_version(
        table_dir,
        files,
        mode="overwrite",
        extra={
            "ivf": {
                "centroids": [list(map(float, c)) for c in centroids],
                "dim": int(centroids.shape[1]),
            }
        },
    )


def _centroids(table_dir: str) -> np.ndarray:
    extra = version_extra(table_dir)
    if "ivf" not in extra:
        raise FileNotFoundError(
            f"{table_dir} is not an IVF index table (no centroids in manifest)"
        )
    return np.array(extra["ivf"]["centroids"], dtype=np.float64)


def ivf_index_append(embeddings: ray.data.Dataset, table_dir: str) -> int:
    """Assign new vectors under the frozen centroids, append-commit."""
    centroids = _centroids(table_dir)
    files = _assign_and_write(embeddings, centroids, table_dir)
    # extra=None inherits the parent's centroids atomically
    return commit_version(table_dir, files, mode="append")


def ivf_index_search(
    table_dir: str,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    n_probe: int = 4,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Top-k over the persisted index: probe each query's ``n_probe``
    nearest cells, scan only rows whose ``cell`` matches (filter pushed
    into the parquet read — per-cell files skip wholesale), brute-force
    the survivors. Returns (query_id, rank, neighbor_id, sim)."""
    import pyarrow.dataset as pads

    centroids = _centroids(table_dir)
    q_mat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    order = np.argsort(-(q_mat @ centroids.T), axis=1, kind="stable")
    probes = order[:, : min(n_probe, centroids.shape[0])]
    cells = sorted({int(c) for row in probes for c in row})
    ds = read_version(table_dir, filter=pads.field("cell").isin(cells))
    return brute_force_topk(
        ds, list(query_ids), q_mat, k=k, exclude_self=exclude_self
    )


def ivf_index_delete(
    table_dir: str,
    vec_ids,
    max_broadcast_ids: int = 4_000_000,
) -> int:
    """Retire vectors from the index — the delete half of the IVF
    lifecycle (embedding tables shed rows when their documents are
    deduped or erased), the ANN sibling of
    ``ops/textindex.py text_index_delete`` — both ride the SHARED
    ``state/tableformat.cow_delete_rows`` (one ``np.isin`` rewrite task
    per cell file, untouched cells by reference, collision-proof output
    names: a cell touched by both a build and an append commit has two
    files with the SAME basename, which a basename-keyed rewrite would
    silently weld). Centroids stay frozen (the standard IVF contract —
    they are a quantizer, not statistics of the live rows; retrain by
    rebuilding). Pruned search over the survivors equals a brute-force
    scan of the surviving vectors restricted to the probed cells —
    deleting absent ids is a no-op. Dataset drop sets are materialized
    once. Returns the committed version."""
    from ctinexus_ray.state.tableformat import (
        collect_delete_ids,
        cow_delete_rows,
        latest_version,
        version_files,
    )

    _centroids(table_dir)  # loud refusal on a non-index table
    ids = collect_delete_ids(vec_ids, "vec_id", max_broadcast_ids)
    snapshot_v = latest_version(table_dir)
    files = version_files(table_dir, snapshot_v)
    data_dir = os.path.join(table_dir, f"cells-{uuid.uuid4().hex[:12]}")
    os.makedirs(data_dir, exist_ok=True)
    new_files, _ = cow_delete_rows(files, "vec_id", ids, data_dir)
    if set(new_files) == set(files):
        # nothing matched: don't grow version history for a no-change
        # tick (the IVF path has no batch ledger to record)
        os.rmdir(data_dir)
        return latest_version(table_dir)
    # extra=None inherits the parent's centroids atomically
    return commit_version(
        table_dir, new_files, mode="overwrite", expected_parent=snapshot_v
    )
