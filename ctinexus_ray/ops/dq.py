"""Data-quality rule engine: one-pass violation counting over a corpus.

The gate a 100-TB ingest runs BEFORE spending compute downstream: a set
of named row predicates ("value non-negative", "timestamp in range",
"key not null", "type in enum") evaluated vectorized in a single
``map_batches`` pass. Each batch emits ONE fixed-size partial row
(n_rows + one violation count per rule), so the merged report is
O(#batches) driver work and the corpus never shuffles.

Rules are callables ``pa.Table -> pa.BooleanArray`` returning True where
the row PASSES; nulls count as violations (SQL ``NOT coalesce(pred,
false)`` semantics — an unknown is not a pass).
"""

from __future__ import annotations

from collections.abc import Callable

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

Rule = Callable[[pa.Table], "pa.BooleanArray | pa.ChunkedArray"]


def data_quality_report(
    ds: ray.data.Dataset,
    rules: dict[str, Rule],
) -> pa.Table:
    """Evaluate every rule over every row in ONE streaming pass; return
    one row per rule: (rule, n_rows, n_violations, violation_rate).
    Rule order in the output follows the dict order."""
    names = list(rules)

    def partial(batch: pa.Table):
        if batch.num_rows == 0:  # pc.sum of an empty mask is null —
            return  # `n_rows - None` would TypeError the whole report
        cols: dict[str, list[int]] = {"n_rows": [batch.num_rows]}
        for name in names:
            passed = pc.fill_null(rules[name](batch), False)
            if isinstance(passed, pa.ChunkedArray):
                passed = passed.combine_chunks()
            cols[name] = [batch.num_rows - (pc.sum(passed).as_py() or 0)]
        yield pa.Table.from_pydict(
            {k: pa.array(v, type=pa.int64()) for k, v in cols.items()}
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_rows = sum(p["n_rows"] for p in parts)
    out_rules, out_viol = [], []
    for name in names:
        out_rules.append(name)
        out_viol.append(sum(p[name] for p in parts))
    return pa.Table.from_pydict(
        {
            "rule": pa.array(out_rules, type=pa.string()),
            "n_rows": pa.array([n_rows] * len(names), type=pa.int64()),
            "n_violations": pa.array(out_viol, type=pa.int64()),
            "violation_rate": pa.array(
                [v / n_rows if n_rows else 0.0 for v in out_viol],
                type=pa.float64(),
            ),
        }
    )


def table_checksum(
    ds: ray.data.Dataset,
    cols: list[str],
    sep: str = "|",
) -> pa.Table:
    """Order-independent corpus checksum: XOR of a content-addressed
    60-bit hash (md5 prefix) of every row's ``sep``-joined column
    values, plus the row count — the cheap way to verify a 100-TB copy,
    migration, or replica WITHOUT moving or sorting the data (XOR is
    commutative/associative, so block order, partitioning, and cluster
    size cannot change the result; pair it with n_rows because XOR
    alone cannot see a row duplicated an even number of times).

    One streaming pass; each batch emits a fixed-size (xor, n) partial;
    the driver folds O(#batches) partials. Row rendering is
    INJECTIVE: each value is length-prefixed ("<len>:<value>", SQL
    CAST(x AS VARCHAR) for non-strings) and NULL renders as the bare
    marker "N" — so a separator character INSIDE a value cannot make
    two different rows render identically ('x|y'+'z' vs 'x'+'y|z'),
    and NULL stays distinct from every string including ''. 60 bits
    keeps the result in a positive BIGINT on both sides (DuckDB
    bit_xor over UBIGINT)."""
    import hashlib

    def partial(batch: pa.Table):
        if batch.num_rows == 0:
            return
        rendered = []
        for c in cols:
            col = batch.column(c)
            if not (
                pa.types.is_string(col.type)
                or pa.types.is_large_string(col.type)
            ):
                col = col.cast(pa.string())
            rendered.append(col.to_pylist())
        acc = 0
        for parts in zip(*rendered):
            key = sep.join(
                "N" if p is None else f"{len(p)}:{p}" for p in parts
            )
            acc ^= int(
                hashlib.md5(key.encode("utf-8")).hexdigest()[:15], 16
            )
        yield pa.Table.from_pydict(
            {
                "x": pa.array([acc], type=pa.int64()),
                "n": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow").take_all()
    acc, n = 0, 0
    for p in parts:  # O(#batches) driver rows
        acc ^= p["x"]
        n += p["n"]
    return pa.Table.from_pydict(
        {
            "checksum": pa.array([acc], type=pa.int64()),
            "n_rows": pa.array([n], type=pa.int64()),
        }
    )
