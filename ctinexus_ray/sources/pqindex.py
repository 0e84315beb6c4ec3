"""Parquet row-group min/max index: build once, prune every later scan.

At 10^12 rows the fastest scan is the one that never happens: a
secondary index of per-row-group column statistics (read from parquet
FOOTERS only — no data pages) lets point/range queries open only the
files and row groups whose [min, max] intersects the predicate. This is
the payoff side of ``ops.shards.zorder_layout``: after a layout sort,
each row group covers a tight key rectangle and the index prunes almost
everything.

Shape: footer reads are distributed as a Dataset-of-paths
``map_batches`` (one task per path batch — the driver never opens a
file); the resulting index is a small table (#row-groups rows) you keep
in memory or write next to the data as ``_index.parquet``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def build_minmax_index(
    paths: list[str], columns: list[str]
) -> pa.Table:
    """Read footer statistics for ``columns`` from every parquet file.
    Returns (path, row_group, n_rows, col, vmin, vmax) with min/max
    carried as strings (type-erased so one index covers mixed columns;
    numeric callers cast back). Columns without stats emit NULL bounds
    (never prunable — a false negative is a correctness bug, an
    unprunable row group is only a missed optimization)."""

    def read_footers(batch: pa.Table):
        import pyarrow.parquet as pq

        rows: dict[str, list] = {
            "path": [],
            "row_group": [],
            "n_rows": [],
            "col": [],
            "vmin": [],
            "vmax": [],
        }
        for path in batch.column("path").to_pylist():
            meta = pq.ParquetFile(path).metadata
            name_to_idx = {
                meta.schema.column(i).name: i
                for i in range(meta.num_columns)
            }
            for rg in range(meta.num_row_groups):
                group = meta.row_group(rg)
                for col in columns:
                    idx = name_to_idx.get(col)
                    stats = (
                        group.column(idx).statistics
                        if idx is not None
                        else None
                    )
                    has = stats is not None and stats.has_min_max
                    rows["path"].append(path)
                    rows["row_group"].append(rg)
                    rows["n_rows"].append(group.num_rows)
                    rows["col"].append(col)
                    rows["vmin"].append(str(stats.min) if has else None)
                    rows["vmax"].append(str(stats.max) if has else None)
        yield pa.Table.from_pydict(
            {
                "path": pa.array(rows["path"], type=pa.string()),
                "row_group": pa.array(rows["row_group"], type=pa.int32()),
                "n_rows": pa.array(rows["n_rows"], type=pa.int64()),
                "col": pa.array(rows["col"], type=pa.string()),
                "vmin": pa.array(rows["vmin"], type=pa.string()),
                "vmax": pa.array(rows["vmax"], type=pa.string()),
            }
        )

    ds = ray.data.from_arrow(
        pa.Table.from_pydict({"path": pa.array(sorted(paths))})
    )
    tables = list(
        ds.map_batches(
            read_footers, batch_format="pyarrow", batch_size=64
        ).iter_batches(batch_format="pyarrow")
    )
    if not tables:
        return pa.Table.from_pydict(
            {
                "path": pa.array([], type=pa.string()),
                "row_group": pa.array([], type=pa.int32()),
                "n_rows": pa.array([], type=pa.int64()),
                "col": pa.array([], type=pa.string()),
                "vmin": pa.array([], type=pa.string()),
                "vmax": pa.array([], type=pa.string()),
            }
        )
    return pa.concat_tables(tables)


def prune_row_groups(
    index: pa.Table, col: str, lo, hi
) -> list[tuple[str, int]]:
    """Return the (path, row_group) pairs whose [vmin, vmax] for ``col``
    may intersect [lo, hi] (numeric comparison; both bounds inclusive).
    Row groups with NULL bounds are always kept — pruning must never
    produce false negatives."""
    sub = index.filter(pc.equal(index.column("col"), col))
    keep: list[tuple[str, int]] = []
    for r in sub.to_pylist():
        if r["vmin"] is None or r["vmax"] is None:
            keep.append((r["path"], r["row_group"]))
            continue
        vmin, vmax = float(r["vmin"]), float(r["vmax"])
        if vmax >= lo and vmin <= hi:
            keep.append((r["path"], r["row_group"]))
    return keep


def read_pruned(
    pairs: list[tuple[str, int]], columns: list[str] | None = None
) -> ray.data.Dataset:
    """Read only the surviving row groups, one Ray task per (path,
    row_group) batch — the scan the index makes possible."""

    def read(batch: pa.Table):
        import pyarrow.parquet as pq

        for path, rg in zip(
            batch.column("path").to_pylist(),
            batch.column("row_group").to_pylist(),
        ):
            yield pq.ParquetFile(path).read_row_group(
                rg, columns=columns
            )

    listing = pa.Table.from_pydict(
        {
            "path": pa.array([p for p, _ in pairs], type=pa.string()),
            "row_group": pa.array([g for _, g in pairs], type=pa.int32()),
        }
    )
    return ray.data.from_arrow(listing).map_batches(
        read, batch_format="pyarrow", batch_size=16
    )


def build_bloom_index(
    paths: list[str],
    column: str,
    m_bits: int = 1 << 17,
    k: int = 4,
) -> pa.Table:
    """Per-row-group BLOOM index over a string key column — the
    equality-predicate sibling of the min/max zone map. Min/max prunes
    RANGE predicates and needs a clustered layout (zorder) to bite;
    hash-distributed keys make every [min, max] span the full domain,
    and that is exactly where a Bloom filter still prunes: a point
    lookup opens only row groups whose filter admits the probe key, at
    a false-POSITIVE rate set by m_bits (never false negatives — a
    filter miss proves absence).

    Build cost is one column-pruned read of the key column per row
    group (data pages, unlike the footer-only min/max build) —
    build once, skip every later scan. Distributed: one task per path
    batch, the driver never opens a file. Output: (path, row_group,
    n_rows, bits: binary[m_bits/8]).
    """

    def read_groups(batch: pa.Table):
        import numpy as np
        import pyarrow.parquet as pq

        from ctinexus_ray.ops.sketch import _bloom_positions

        n_bytes = m_bits // 8
        out: dict[str, list] = {
            "path": [], "row_group": [], "n_rows": [], "bits": [],
        }
        for path in batch.column("path").to_pylist():
            pf = pq.ParquetFile(path)
            for rg in range(pf.metadata.num_row_groups):
                tbl = pf.read_row_group(rg, columns=[column])
                pos = _bloom_positions(
                    tbl.column(column).cast(pa.string()), m_bits, k
                ).ravel()
                bits = np.zeros(n_bytes, dtype=np.uint8)
                np.bitwise_or.at(
                    bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8)
                )
                out["path"].append(path)
                out["row_group"].append(rg)
                out["n_rows"].append(tbl.num_rows)
                out["bits"].append(bits.tobytes())
        yield pa.Table.from_pydict(
            {
                "path": pa.array(out["path"], type=pa.string()),
                "row_group": pa.array(out["row_group"], type=pa.int32()),
                "n_rows": pa.array(out["n_rows"], type=pa.int64()),
                "bits": pa.array(out["bits"], type=pa.binary()),
            }
        )

    listing = pa.Table.from_pydict({"path": pa.array(paths, type=pa.string())})
    parts = (
        ray.data.from_arrow(listing)
        .map_batches(read_groups, batch_format="pyarrow", batch_size=4)
        .take_all()
    )
    return pa.Table.from_pylist(
        sorted(parts, key=lambda r: (r["path"], r["row_group"]))
    )


def prune_bloom(
    index: pa.Table, values: list[str], m_bits: int = 1 << 17, k: int = 4
) -> list[tuple[str, int]]:
    """(path, row_group) pairs whose Bloom filter admits AT LEAST ONE
    probe value. Bloom property: a dropped row group provably contains
    none of the probes (false negatives impossible); survivors may
    still be false positives at the configured rate."""
    import numpy as np

    from ctinexus_ray.ops.sketch import _bloom_positions

    pos = _bloom_positions(values, m_bits, k)  # (n_probe, k)
    keep: list[tuple[str, int]] = []
    for r in index.to_pylist():
        bits = np.frombuffer(r["bits"], dtype=np.uint8)
        byte_idx = pos >> 3
        mask = np.uint8(1) << (pos & 7).astype(np.uint8)
        hit = ((bits[byte_idx] & mask) != 0).all(axis=1).any()
        if hit:
            keep.append((r["path"], r["row_group"]))
    return keep
