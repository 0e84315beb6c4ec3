"""Semi-structured (JSON) column operators.

Web-crawl and event tables carry JSON side-channel columns (WARC
metadata, event properties). These ops extract typed scalars from such
columns as stateless ``map_batches`` stages — no shuffle, composable
with every downstream relational op. The reference system has no
semi-structured processing (its per-document JSON envelope is the
OUTPUT shape, reference ctinexus/llm_processor.py:1119-1138); this
exists for the corpus-scale event/metadata analysis shapes.

Parse semantics match SQL ``json_extract`` + ``TRY_CAST`` (DuckDB
``TRY_CAST(col ->> '$.key' AS ...)``): a missing key, non-object
document, malformed JSON, NULL input, nested (object/array) value, or
a value that does not convert to the target type all yield NULL —
extraction is TOTAL, it never raises on data. Parsing is per-row
(stdlib ``json`` — JSON grammar is inherently sequential); the loop is
confined to the one extraction pass and the result is a typed Arrow
column, so everything downstream stays vectorized.
"""

from __future__ import annotations

import json

import pyarrow as pa
import ray.data


def _coerce(v, t: pa.DataType):
    """TRY_CAST-style conversion of one decoded JSON value to the target
    Arrow type; anything unconvertible (incl. nested values) -> None."""
    if v is None or isinstance(v, (dict, list)):
        return None
    try:
        if pa.types.is_integer(t):
            if isinstance(v, bool):
                return int(v)
            if isinstance(v, int):
                return v
            if isinstance(v, float):
                return int(v) if v.is_integer() else None
            return int(str(v))
        if pa.types.is_floating(t):
            if isinstance(v, bool):
                return float(v)
            return float(v)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            if isinstance(v, str):
                return v
            # numbers/booleans render as their JSON text, like ->>
            return json.dumps(v)
        return v
    except (ValueError, TypeError):
        return None


def json_scalar(
    ds: ray.data.Dataset,
    col: str,
    key: str,
    out: str | None = None,
    arrow_type: pa.DataType | None = None,
    keep: list[str] | None = None,
) -> ray.data.Dataset:
    """Append scalar field ``key`` extracted from JSON-string column
    ``col`` as column ``out`` (default ``key``), cast to ``arrow_type``
    (default int64). ``keep`` projects the output to those columns plus
    ``out`` (default: all input columns). NULL-safe per the module
    contract: per-value coercion (never whole-column inference), so one
    type-mixed row NULLs out instead of killing the task."""
    out = out or key
    arrow_type = arrow_type or pa.int64()

    def extract(batch: pa.Table):
        if batch.num_rows == 0:
            return
        vals = []
        for s in batch.column(col).to_pylist():
            v = None
            if s is not None:
                try:
                    doc = json.loads(s)
                    if isinstance(doc, dict):
                        v = _coerce(doc.get(key), arrow_type)
                except (ValueError, TypeError):
                    v = None
            vals.append(v)
        arr = pa.array(vals, type=arrow_type)
        t = batch.select(keep) if keep is not None else batch
        yield t.append_column(out, arr)

    return ds.map_batches(extract, batch_format="pyarrow")
