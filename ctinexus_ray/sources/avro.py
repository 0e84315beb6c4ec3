"""Avro Object Container File (OCF) corpus source — the remaining
classic big-data wire format beside parquet/ORC/WARC/JSONL/CSV. Pure
stdlib: zigzag varints, JSON schema header, 16-byte sync markers, and
raw-deflate block compression via ``zlib`` (the ``deflate`` codec is
RFC 1951, i.e. zlib with a -15 window).

The reference ingests single documents (reference ctinexus/app.py);
this exists for the corpus-scale ingestion path, mirroring
``sources/flatfiles.py``: one Ray task per shard on write (atomic
rename, deterministic bytes), one parse task per FILE on read — OCF
blocks are only locatable by scanning sync markers, so whole-file
tasks are the format's natural split unit (same as WARC; writers cap
shard size for exactly this reason).

Scope (honest boundary): record schemas of primitive fields — null,
boolean, int, long, float, double, bytes, string — and 2-branch
``["null", X]`` unions of those; codecs ``null`` and ``deflate``.
Arrays, maps, enums, fixed, nested records and other codecs raise
``ValueError`` with the offending schema node.
"""

from __future__ import annotations

import hashlib
import json
import os
import struct
import zlib

import pyarrow as pa
import ray
import ray.data

MAGIC = b"Obj\x01"

_PRIMITIVE_ARROW = {
    "boolean": pa.bool_(),
    "int": pa.int32(),
    "long": pa.int64(),
    "float": pa.float32(),
    "double": pa.float64(),
    "bytes": pa.binary(),
    "string": pa.string(),
    "null": pa.null(),
}


# ---------------------------------------------------------------------------
# primitive encode/decode
# ---------------------------------------------------------------------------


def _encode_long(n: int) -> bytes:
    """Avro long: zigzag then little-endian base-128 varint."""
    z = (n << 1) ^ (n >> 63)
    out = bytearray()
    while True:
        b = z & 0x7F
        z >>= 7
        if z:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _encode_bytes(b: bytes) -> bytes:
    return _encode_long(len(b)) + b


def _encode_string(s: str) -> bytes:
    return _encode_bytes(s.encode("utf-8"))


class _Cursor:
    """Byte cursor over one decompressed block (or the file header)."""

    __slots__ = ("data", "pos")

    def __init__(self, data: bytes, pos: int = 0):
        self.data = data
        self.pos = pos

    def read_long(self) -> int:
        z = 0
        shift = 0
        data = self.data
        pos = self.pos
        while True:
            try:
                b = data[pos]
            except IndexError:
                raise ValueError("avro: truncated varint") from None
            pos += 1
            z |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
            if shift > 63:
                raise ValueError("avro: varint longer than 64 bits")
        self.pos = pos
        return (z >> 1) ^ -(z & 1)

    def read_exact(self, n: int) -> bytes:
        if self.pos + n > len(self.data):
            raise ValueError("avro: truncated value")
        out = self.data[self.pos : self.pos + n]
        self.pos += n
        return out

    def read_bytes(self) -> bytes:
        n = self.read_long()
        if n < 0:
            raise ValueError("avro: negative bytes length")
        return self.read_exact(n)

    def decode(self, typ: str):
        if typ == "long" or typ == "int":
            return self.read_long()
        if typ == "string":
            return self.read_bytes().decode("utf-8")
        if typ == "bytes":
            return self.read_bytes()
        if typ == "boolean":
            return self.read_exact(1) != b"\x00"
        if typ == "double":
            return struct.unpack("<d", self.read_exact(8))[0]
        if typ == "float":
            return struct.unpack("<f", self.read_exact(4))[0]
        if typ == "null":
            return None
        raise ValueError(f"avro: unsupported type {typ!r}")


# ---------------------------------------------------------------------------
# schema handling
# ---------------------------------------------------------------------------


def _field_plan(schema: dict) -> list[tuple[str, str | None, str]]:
    """Flatten a record schema into (name, union_null_branch, type)
    decode steps. ``union_null_branch`` is 'null-first'/'null-second'
    for ``["null", X]`` / ``[X, "null"]`` unions, else None."""
    if schema.get("type") != "record":
        raise ValueError(f"avro: top-level schema must be a record, got {schema}")
    plan: list[tuple[str, str | None, str]] = []
    for field in schema["fields"]:
        name, typ = field["name"], field["type"]
        if (
            isinstance(typ, dict)
            and isinstance(typ.get("type"), str)
            and typ["type"] in _PRIMITIVE_ARROW
        ):
            # annotated primitive ({"type": "long", "logicalType":
            # "timestamp-micros"}): decode as the base primitive —
            # logical types are metadata over the same wire encoding
            typ = typ["type"]
        if isinstance(typ, list):
            if len(typ) != 2 or "null" not in typ:
                raise ValueError(f"avro: only [null, X] unions supported: {typ}")
            other = typ[0] if typ[1] == "null" else typ[1]
            if (
                isinstance(other, dict)
                and isinstance(other.get("type"), str)
                and other["type"] in _PRIMITIVE_ARROW
            ):
                other = other["type"]  # annotated primitive in a union
            if not isinstance(other, str) or other not in _PRIMITIVE_ARROW:
                raise ValueError(f"avro: unsupported union branch {other!r}")
            where = "null-first" if typ[0] == "null" else "null-second"
            plan.append((name, where, other))
        elif isinstance(typ, str) and typ in _PRIMITIVE_ARROW:
            plan.append((name, None, typ))
        else:
            raise ValueError(f"avro: unsupported field type {typ!r}")
    return plan


def _arrow_schema(plan: list[tuple[str, str | None, str]]) -> pa.Schema:
    return pa.schema(
        [(name, _PRIMITIVE_ARROW[typ]) for name, _, typ in plan]
    )


# ---------------------------------------------------------------------------
# file parse
# ---------------------------------------------------------------------------


def parse_avro_file(data: bytes) -> pa.Table:
    """Decode one OCF byte string into an Arrow table (columns = record
    fields in schema order)."""
    if data[:4] != MAGIC:
        raise ValueError("avro: bad magic (not an Object Container File)")
    cur = _Cursor(data, 4)
    meta: dict[str, bytes] = {}
    while True:
        count = cur.read_long()
        if count == 0:
            break
        if count < 0:  # negative block count: size prefix follows
            cur.read_long()
            count = -count
        for _ in range(count):
            key = cur.read_bytes().decode("utf-8")
            meta[key] = cur.read_bytes()
    schema = json.loads(meta["avro.schema"])
    codec = meta.get("avro.codec", b"null").decode("ascii")
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    plan = _field_plan(schema)
    sync = cur.read_exact(16)

    cols: dict[str, list] = {name: [] for name, _, _ in plan}
    while cur.pos < len(data):
        n_objects = cur.read_long()
        n_bytes = cur.read_long()
        payload = cur.read_exact(n_bytes)
        if codec == "deflate":
            payload = zlib.decompress(payload, wbits=-15)
        block = _Cursor(payload)
        for _ in range(n_objects):
            for name, union, typ in plan:
                if union is None:
                    cols[name].append(block.decode(typ))
                else:
                    idx = block.read_long()
                    null_idx = 0 if union == "null-first" else 1
                    if idx == null_idx:
                        cols[name].append(None)
                    elif idx == 1 - null_idx:
                        cols[name].append(block.decode(typ))
                    else:
                        raise ValueError(f"avro: union index {idx} out of range")
        if block.pos != len(payload):
            raise ValueError("avro: block decoded short of its size")
        if cur.read_exact(16) != sync:
            raise ValueError("avro: sync marker mismatch (corrupt block)")
    arrow = _arrow_schema(plan)
    return pa.Table.from_pydict(
        {name: pa.array(vals, type=arrow.field(name).type) for name, vals in cols.items()},
        schema=arrow,
    )


def read_avro(paths: str | list[str]) -> ray.data.Dataset:
    """Streaming Avro OCF reader — one parse task per file (blocks are
    sync-marker-delimited, not offset-indexed, so the file is the
    format's split unit; writers shard accordingly)."""

    def parse(batch: pa.Table):
        for data in batch.column("bytes").to_pylist():
            table = parse_avro_file(data)
            if table.num_rows:
                yield table

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


# ---------------------------------------------------------------------------
# writer — deterministic corpus sharder (and a usable archival sink)
# ---------------------------------------------------------------------------

CORPUS_SCHEMA = {
    "type": "record",
    "name": "Doc",
    "fields": [
        {"name": "doc_id", "type": "long"},
        {"name": "text", "type": ["null", "string"]},
    ],
}


def build_avro(
    rows: list[dict],
    schema: dict,
    *,
    codec: str = "deflate",
    sync: bytes | None = None,
    block_rows: int = 1000,
) -> bytes:
    """Serialize ``rows`` (dicts keyed by field name) as one OCF byte
    string. Deterministic for fixed inputs: pass ``sync`` to pin the
    marker (default derives it from the schema+codec)."""
    if codec not in ("null", "deflate"):
        raise ValueError(f"avro: unsupported codec {codec!r}")
    plan = _field_plan(schema)
    if sync is None:
        sync = hashlib.md5(
            b"ctinexus-avro|" + json.dumps(schema, sort_keys=True).encode() + b"|" + codec.encode()
        ).digest()
    if len(sync) != 16:
        raise ValueError("avro: sync marker must be 16 bytes")

    out = bytearray(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema, separators=(",", ":")).encode(),
        "avro.codec": codec.encode(),
    }
    out += _encode_long(len(meta))
    for k in sorted(meta):
        out += _encode_string(k) + _encode_bytes(meta[k])
    out += _encode_long(0)
    out += sync

    def encode_value(typ: str, v) -> bytes:
        if typ in ("long", "int"):
            return _encode_long(int(v))
        if typ == "string":
            return _encode_string(v)
        if typ == "bytes":
            return _encode_bytes(v)
        if typ == "boolean":
            return b"\x01" if v else b"\x00"
        if typ == "double":
            return struct.pack("<d", float(v))
        if typ == "float":
            return struct.pack("<f", float(v))
        raise ValueError(f"avro: unsupported type {typ!r}")

    for start in range(0, len(rows), block_rows):
        chunk = rows[start : start + block_rows]
        body = bytearray()
        for row in chunk:
            for name, union, typ in plan:
                v = row.get(name)
                if union is None:
                    if v is None:
                        raise ValueError(f"avro: NULL in non-nullable field {name}")
                    body += encode_value(typ, v)
                else:
                    null_idx = 0 if union == "null-first" else 1
                    if v is None:
                        body += _encode_long(null_idx)
                    else:
                        body += _encode_long(1 - null_idx)
                        body += encode_value(typ, v)
        payload = bytes(body)
        if codec == "deflate":
            c = zlib.compressobj(9, zlib.DEFLATED, -15)
            payload = c.compress(payload) + c.flush()
        out += _encode_long(len(chunk))
        out += _encode_long(len(payload))
        out += payload
        out += sync
    return bytes(out)


@ray.remote
def _write_avro_shard(
    parquet_path: str, out_path: str, shard: int, n_shards: int, codec: str
) -> int:
    """One deterministic shard: rows with doc_id % n_shards == shard,
    ordered by doc_id, fixed sync marker, atomic rename commit."""
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=["doc_id", "text"])
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(np.asarray(ids) % n_shards == shard)).sort_by("doc_id")
    rows = [
        {"doc_id": d, "text": x}
        for d, x in zip(t.column("doc_id").to_pylist(), t.column("text").to_pylist())
    ]
    sync = hashlib.md5(f"ctinexus-avro-shard-{shard}".encode()).digest()
    data = build_avro(rows, CORPUS_SCHEMA, codec=codec, sync=sync)
    tmp = out_path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out_path)
    return t.num_rows


def write_avro_corpus(
    parquet_path: str, out_dir: str, n_shards: int = 4, codec: str = "deflate"
) -> list[str]:
    """Shard a (doc_id, text) parquet corpus into deterministic .avro
    files — one Ray task per shard, atomic rename commit."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"part-{s:05d}.avro") for s in range(n_shards)
    ]
    ray.get(
        [
            _write_avro_shard.remote(parquet_path, p, s, n_shards, codec)
            for s, p in enumerate(paths)
        ]
    )
    return paths


_ARROW_TO_AVRO = {
    pa.bool_(): "boolean",
    pa.int32(): "int",
    pa.int64(): "long",
    pa.float32(): "float",
    pa.float64(): "double",
    pa.binary(): "bytes",
    pa.string(): "string",
    pa.large_string(): "string",
}


def avro_schema_for(arrow_schema: pa.Schema, name: str = "Row") -> dict:
    """Derive a nullable-union Avro record schema from an Arrow schema.
    Every field becomes ``["null", X]`` (Arrow nullability is
    per-value, not declared, so the union is the faithful mapping);
    timestamps map to long with ``logicalType: timestamp-micros``.
    Unsupported arrow types raise."""
    fields = []
    for f in arrow_schema:
        t = f.type
        if pa.types.is_timestamp(t):
            avro_t: object = {"type": "long", "logicalType": "timestamp-micros"}
        elif t in _ARROW_TO_AVRO:
            avro_t = _ARROW_TO_AVRO[t]
        else:
            raise ValueError(f"avro sink: unsupported arrow type {t}")
        fields.append({"name": f.name, "type": ["null", avro_t]})
    return {"type": "record", "name": name, "fields": fields}


def dataset_to_avro(
    ds: ray.data.Dataset, out_dir: str, codec: str = "deflate"
) -> list[str]:
    """EXPORT an arbitrary Dataset as Avro OCF shards — the sink twin of
    ``read_avro`` (Ray ships json/csv/parquet sinks natively; Avro it
    does not). One file per input block, written INSIDE the block's own
    task (atomic rename; nothing corpus-sized moves anywhere), file
    list + row counts returned from O(#blocks) driver metadata.
    Timestamps are encoded as timestamp-micros longs; every field is a
    nullable union (see ``avro_schema_for``)."""
    import uuid

    os.makedirs(out_dir, exist_ok=True)
    schema = avro_schema_for(ds.schema().base_schema)
    ts_cols = [
        f.name
        for f in ds.schema().base_schema
        if pa.types.is_timestamp(f.type)
    ]

    def write_block(batch: pa.Table) -> pa.Table:
        for c in ts_cols:
            i = batch.schema.names.index(c)
            batch = batch.set_column(i, c, batch.column(c).cast(pa.int64()))
        path = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:16]}.avro")
        data = build_avro(batch.to_pylist(), schema, codec=codec)
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.Table.from_pydict(
            {
                "path": pa.array([path], type=pa.string()),
                "n_rows": pa.array([batch.num_rows], type=pa.int64()),
            }
        )

    manifest = ds.map_batches(
        write_block, batch_format="pyarrow", batch_size=None
    ).take_all()
    return sorted(r["path"] for r in manifest)
