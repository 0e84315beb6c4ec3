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


def regex_extract_all(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    pattern: str,
) -> ray.data.Dataset:
    """All non-overlapping matches of ``pattern`` per row, exploded to
    (id, idx, match) with a 1-based per-row match index — the generic
    "pull every <entity> out of the text" primitive behind the IOC
    detector (``functions/ioc.py`` is its domain-specific sibling with
    16 pinned patterns; this is the ad-hoc-analysis form).

    Match semantics are leftmost non-overlapping like both Python
    ``re`` and RE2 — stick to the RE2-compatible subset (no lookaround,
    no backreferences) so a DuckDB ``regexp_extract_all`` twin computes
    the identical match list and the op is oracle-verifiable. Rows with
    NULL text or zero matches contribute nothing (SQL unnest
    semantics). The pattern must not match the empty string (raises:
    Python and RE2 disagree on empty-match advancement).

    Scale shape: stateless map — the regex compiles ONCE per task, the
    per-batch loop is one findall per row (regex scanning is inherently
    sequential per string); output is explode-sized, no shuffle.
    """
    import re

    rx = re.compile(pattern)
    if rx.match("") and rx.match("").group(0) == "":
        raise ValueError(
            "regex_extract_all: pattern matches the empty string — "
            "empty-match advancement is not portable across engines"
        )

    def explode(batch: pa.Table) -> pa.Table:
        ids_in = batch.column(id_col).to_pylist()
        texts = batch.column(text_col).to_pylist()
        ids, idxs, matches = [], [], []
        for i, t in zip(ids_in, texts):
            if t is None:
                continue
            # finditer + group(0): whole-match extraction even when the
            # pattern contains groups (findall would return the groups,
            # diverging from SQL regexp_extract_all's group-0 default)
            for j, m in enumerate(rx.finditer(t), start=1):
                ids.append(i)
                idxs.append(j)
                matches.append(m.group(0))
        return pa.Table.from_pydict(
            {
                id_col: pa.array(ids, type=batch.schema.field(id_col).type),
                "idx": pa.array(idxs, type=pa.int64()),
                "match": pa.array(matches, type=pa.string()),
            }
        )

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow"
    )
