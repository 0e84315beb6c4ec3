"""Relational / temporal operators: broadcast join, tumbling-window
aggregate, gap sessionization.

The reference has no relational joins (SURVEY §2.4) — these are the
corpus-scale patterns the engine adds:

  * broadcast join — small side shipped ONCE via ``ray.put``, looked up
    inside ``map_batches`` (no shuffle of the big side)
  * tumbling window — vectorized epoch-bucket derivation + groupby
  * sessionization — ``groupby(user).map_groups`` with in-group time sort
    (the partitioning assumption: one user's events fit in one group)
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

MICROS_PER_HOUR = 3_600_000_000


def hourly_event_counts(events: ray.data.Dataset) -> ray.data.Dataset:
    """Tumbling 1-hour window: (hour_ts, event_type, n_events).
    ``hour_ts`` = epoch seconds of the window start (int64, vectorized
    from the timestamp column — no Python datetime objects in the loop)."""

    def add_hour(batch: pa.Table) -> pa.Table:
        micros = batch.column("ts").cast(pa.int64())
        hours = pc.multiply(
            pc.divide(micros, MICROS_PER_HOUR), 3600
        )  # integer division: timestamps are non-negative
        return pa.Table.from_pydict(
            {
                "hour_ts": hours.cast(pa.int64()),
                "event_type": batch.column("event_type"),
            }
        )

    bucketed = events.select_columns(["ts", "event_type"]).map_batches(
        add_hour, batch_format="pyarrow"
    )
    agg = bucketed.groupby(["hour_ts", "event_type"]).aggregate(Count())

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            ["n_events" if c == "count()" else c for c in batch.column_names]
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def sessionize(events: ray.data.Dataset, gap_seconds: int = 1800) -> ray.data.Dataset:
    """Per-user session counts with a ``gap_seconds`` inactivity gap:
    (user_id, n_sessions, n_events).

    One shuffle on hash(user_id); each hash partition holds MANY whole
    users and computes all their session counts in vectorized pandas
    (sort by (user, ts, event_id), per-user shift/diff for gaps) — no
    per-user Python, so millions of users cost O(P) group overhead.
    Scale note: a single user's events must fit in a partition;
    pathological users would need day-salting (documented partitioning
    assumption).
    """
    import pyarrow.compute as pc

    num_partitions = 64

    def add_pkey(batch: pa.Table) -> pa.Table:
        uid = batch.column("user_id").cast(pa.int64())
        mix = pc.bit_wise_xor(pc.shift_left(uid, 13), uid)
        return batch.append_column(
            "pkey", pc.bit_wise_and(mix, num_partitions - 1)
        )

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts", "event_id"], kind="mergesort")
        prev = g.groupby("user_id", sort=False)["ts"].shift(1)
        gaps = (g["ts"] - prev).dt.total_seconds()
        new_session = gaps.isna() | (gaps > gap_seconds)
        out = (
            g.assign(_ns=new_session)
            .groupby("user_id", sort=False)
            .agg(n_sessions=("_ns", "sum"), n_events=("_ns", "size"))
            .reset_index()
        )
        return pd.DataFrame(
            {
                "user_id": out["user_id"].astype("int64").values,
                "n_sessions": out["n_sessions"].astype("int64").values,
                "n_events": out["n_events"].astype("int64").values,
            }
        )

    return (
        events.select_columns(["event_id", "ts", "user_id"])
        .map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(reduce_partition, batch_format="pandas")
    )


def broadcast_enrich(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    big_key: str,
    small_key: str,
    attach: list[str],
) -> ray.data.Dataset:
    """Row-level broadcast (map-side) join: every ``big`` row gains the
    ``attach`` columns of its matching ``small`` row. The small side is
    collected once on the driver, shipped once via ``ray.put``, and read
    per task — the big side never shuffles. Unmatched keys get nulls
    (left-join semantics — NOTE: this diverges from an inner-join SQL
    oracle on data with referential gaps; filter the nulls out downstream
    if inner-join semantics are required). Chain calls to walk a
    dimension snowflake (e.g. customer -> nation -> region)."""
    lookup, types = _collect_small_side(small, small_key, attach)
    lookup_ref = ray.put(lookup)
    miss = (None,) * len(attach)

    def enrich(batch: pa.Table) -> pa.Table:
        table = ray.get(lookup_ref)
        keys = batch.column(big_key).to_pylist()
        for i, name in enumerate(attach):
            batch = batch.append_column(
                name, pa.array([table.get(k, miss)[i] for k in keys], type=types[i])
            )
        return batch

    return big.map_batches(enrich, batch_format="pyarrow")


def minmax_count_by_key(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    out_min: str = "min_v",
    out_max: str = "max_v",
    out_n: str = "n",
) -> ray.data.Dataset:
    """Grouped Min/Max/Count with built-in vectorized aggregates (one
    shuffle, map-side combined by Ray). Suitable for BOUNDED key
    cardinality (event types, statuses); for corpus-cardinality keys use
    ``ops.groupagg.partitioned_agg`` — built-in aggregates pay per-group
    overhead linear in distinct keys."""
    from ray.data.aggregate import Max, Min

    agg = ds.groupby(key).aggregate(Min(value_col), Max(value_col), Count())

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {
            f"min({value_col})": out_min,
            f"max({value_col})": out_max,
            "count()": out_n,
        }
        return batch.rename_columns(
            [mapping.get(c, c) for c in batch.column_names]
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def broadcast_join_count(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    big_key: str,
    small_key: str,
    attach: list[str],
) -> ray.data.Dataset:
    """Count rows of ``big`` per key, attaching ``attach`` columns from the
    ``small`` side via a driver-built broadcast dict (``ray.put`` once,
    ``ray.get`` per task — never reshipped per batch).

    Returns (key, *attach, n). The small side must fit in one object —
    dimension tables do; for two large sides use a key-partitioned
    groupby co-shuffle instead.
    """
    from ctinexus_ray.ops.groupagg import partitioned_agg

    lookup, types = _collect_small_side(small, small_key, attach)
    lookup_ref = ray.put(lookup)
    miss = (None,) * len(attach)

    # distinct big-side keys grow with the table -> hash-partitioned
    # vectorized count (see groupagg module)
    counted = partitioned_agg(
        big.select_columns([big_key]),
        keys=[big_key],
        named_aggs={"n": (big_key, "size")},
    )

    def attach_cols(batch: pa.Table) -> pa.Table:
        table = ray.get(lookup_ref)
        keys = batch.column(big_key).to_pylist()
        cols: dict = {"key": batch.column(big_key)}
        for i, name in enumerate(attach):
            cols[name] = pa.array(
                [table.get(k, miss)[i] for k in keys], type=types[i]
            )
        cols["n"] = batch.column("n")
        return pa.Table.from_pydict(cols)

    return counted.map_batches(attach_cols, batch_format="pyarrow")


def _collect_small_side(
    small: ray.data.Dataset, small_key: str, attach: list[str]
) -> tuple[dict, list]:
    """Collect the dimension table on the driver as Arrow (types
    preserved) -> ({key: attach tuple}, [attach pyarrow types]). Typed
    output arrays keep block schemas identical even when a batch has only
    unmatched keys (an untyped pa.array of Nones would yield a null-typed
    column and schema-divergent blocks)."""
    tables = ray.get(small.select_columns([small_key, *attach]).to_arrow_refs())
    table = pa.concat_tables([t for t in tables if t.num_rows] or tables)
    keys = table.column(small_key).to_pylist()
    cols = [table.column(c).to_pylist() for c in attach]
    lookup = {k: tuple(col[i] for col in cols) for i, k in enumerate(keys)}
    types = [table.schema.field(c).type for c in attach]
    return lookup, types
