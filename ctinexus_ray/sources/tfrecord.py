"""TFRecord source + sink — the ML-native training-data wire format.

A 100-TB training corpus ultimately feeds a trainer, and the dominant
sharded-example format there is TFRecord: a flat stream of
length-framed protobuf ``tf.train.Example`` records, each frame
integrity-checked by MASKED CRC32C:

    uint64  length            (little-endian)
    uint32  masked_crc32c(length bytes)
    bytes   data[length]      (serialized Example)
    uint32  masked_crc32c(data)

    mask(crc) = ((crc >> 15) | (crc << 17)) + 0xa282ead8   (mod 2^32)

Both layers are implemented from the public specs with the stdlib
only: CRC32C (Castagnoli, reflected poly 0x82F63B78; slice-by-8
table-driven — zlib has no CRC32C) and a minimal protobuf wire
encoder/decoder for the Example message tree

    Example { Features features = 1; }
    Features { map<string, Feature> feature = 1; }
    Feature { oneof { BytesList=1 FloatList=2 Int64List=3 } }

Column mapping (documented, frozen): int64 -> Int64List, string ->
BytesList (UTF-8). NULL values OMIT the feature (tf.Example has no
null; an absent feature reads back as null) — the standard convention.
float64 columns are REFUSED loudly: FloatList is float32 and the
round trip would silently lose precision (quantize upstream instead).
FloatList is still PARSED on read (as float32 -> float64) for foreign
files.

Scale shape mirrors ``sources/avro.py``: TFRecord has no sync markers,
so the FILE is the format's split unit — one Ray task per file on
read, one file per shard/block on write (atomic rename commit).
CRC32C runs as a slice-by-8 Python loop (8 bytes per iteration); at
real scale you'd swap a hardware-accelerated crc32c in — the framing
layer is the contract here, and the loop is per-file inside its own
Ray task, so it parallelizes across the corpus.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np
import pyarrow as pa
import ray
import ray.data

# ---------------------------------------------------------------------------
# CRC32C (Castagnoli) — slice-by-8
# ---------------------------------------------------------------------------


def _crc32c_tables() -> np.ndarray:
    poly = np.uint32(0x82F63B78)
    t = np.empty((8, 256), dtype=np.uint32)
    for i in range(256):
        c = np.uint32(i)
        for _ in range(8):
            c = (c >> np.uint32(1)) ^ (poly if c & np.uint32(1) else np.uint32(0))
        t[0, i] = c
    for k in range(1, 8):
        for i in range(256):
            prev = t[k - 1, i]
            t[k, i] = t[0, prev & 0xFF] ^ (prev >> np.uint32(8))
    return t


_T = _crc32c_tables()
_Tl = [[int(x) for x in row] for row in _T]  # plain ints: no numpy overhead


def crc32c(data: bytes) -> int:
    """CRC32C of ``data`` (Castagnoli; crc32c(b"123456789") == 0xE3069283)."""
    t0, t1, t2, t3, t4, t5, t6, t7 = _Tl
    crc = 0xFFFFFFFF
    n = len(data)
    i = 0
    # slice-by-8 main loop
    while n - i >= 8:
        w = crc ^ int.from_bytes(data[i : i + 4], "little")
        crc = (
            t7[w & 0xFF]
            ^ t6[(w >> 8) & 0xFF]
            ^ t5[(w >> 16) & 0xFF]
            ^ t4[(w >> 24) & 0xFF]
            ^ t3[data[i + 4]]
            ^ t2[data[i + 5]]
            ^ t1[data[i + 6]]
            ^ t0[data[i + 7]]
        )
        i += 8
    while i < n:
        crc = t0[(crc ^ data[i]) & 0xFF] ^ (crc >> 8)
        i += 1
    return crc ^ 0xFFFFFFFF


_MASK_DELTA = 0xA282EAD8


def masked_crc32c(data: bytes) -> int:
    c = crc32c(data)
    return (((c >> 15) | (c << 17)) + _MASK_DELTA) & 0xFFFFFFFF


# ---------------------------------------------------------------------------
# minimal protobuf wire codec for tf.train.Example
# ---------------------------------------------------------------------------


def _varint(n: int) -> bytes:
    n &= 0xFFFFFFFFFFFFFFFF  # int64 two's complement (proto int64, not sint64)
    out = bytearray()
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _read_varint(data: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        b = data[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            break
        shift += 7
        if shift > 70:
            raise ValueError("tfrecord: varint overflow")
    return result, pos


def _to_i64(u: int) -> int:
    return u - (1 << 64) if u >= (1 << 63) else u


def _ld(field: int, payload: bytes) -> bytes:
    """Length-delimited field (wire type 2)."""
    return _varint(field << 3 | 2) + _varint(len(payload)) + payload


def encode_example(features: dict[str, object]) -> bytes:
    """Serialize one tf.train.Example. Values: int -> Int64List,
    str/bytes -> BytesList, list of those -> multi-valued feature;
    None omits the feature. Features emit in sorted-name order so the
    bytes are deterministic."""
    entries = bytearray()
    for name in sorted(features):
        v = features[name]
        if v is None:
            continue
        vals = v if isinstance(v, list) else [v]
        if not vals:
            continue
        if all(isinstance(x, (int, np.integer)) for x in vals):
            packed = b"".join(_varint(int(x)) for x in vals)
            feat = _ld(3, _ld(1, packed))  # Int64List, packed value=1
        elif all(isinstance(x, (str, bytes)) for x in vals):
            body = b"".join(
                _ld(1, x.encode("utf-8") if isinstance(x, str) else x)
                for x in vals
            )
            feat = _ld(1, body)  # BytesList
        else:
            raise TypeError(
                f"tfrecord: unsupported feature value for {name!r}: "
                f"{type(vals[0]).__name__} (int64/bytes only; float64 is "
                "refused — FloatList is float32 and would lose precision)"
            )
        entries += _ld(1, _ld(1, name.encode("utf-8")) + _ld(2, feat))
    return _ld(1, bytes(entries))  # Example.features


def decode_example(data: bytes) -> dict[str, list]:
    """Parse one serialized Example back to {name: [values]} — ints for
    Int64List, bytes for BytesList, floats for FloatList (float32
    widened). Accepts packed and unpacked numeric lists."""

    def fields(buf: bytes):
        pos = 0
        while pos < len(buf):
            tag, pos = _read_varint(buf, pos)
            fno, wt = tag >> 3, tag & 7
            if wt == 2:
                ln, pos = _read_varint(buf, pos)
                yield fno, wt, buf[pos : pos + ln]
                pos += ln
            elif wt == 0:
                v, pos = _read_varint(buf, pos)
                yield fno, wt, v
            elif wt == 5:
                yield fno, wt, buf[pos : pos + 4]
                pos += 4
            elif wt == 1:
                yield fno, wt, buf[pos : pos + 8]
                pos += 8
            else:
                raise ValueError(f"tfrecord: unsupported wire type {wt}")

    out: dict[str, list] = {}
    for fno, _wt, featmsg in fields(data):
        if fno != 1:
            continue
        for eno, _ewt, entry in fields(featmsg):
            if eno != 1:
                continue
            name, feat = None, None
            for kno, _kwt, kv in fields(entry):
                if kno == 1:
                    name = kv.decode("utf-8")
                elif kno == 2:
                    feat = kv
            if name is None or feat is None:
                continue
            vals: list = []
            for lno, _lwt, lbody in fields(feat):
                if lno == 1:  # BytesList
                    for vno, _vwt, vb in fields(lbody):
                        if vno == 1:
                            vals.append(vb)
                elif lno == 3:  # Int64List
                    for vno, vwt, vb in fields(lbody):
                        if vno != 1:
                            continue
                        if vwt == 0:
                            vals.append(_to_i64(vb))
                        else:  # packed
                            p = 0
                            while p < len(vb):
                                u, p = _read_varint(vb, p)
                                vals.append(_to_i64(u))
                elif lno == 2:  # FloatList
                    for vno, _vwt, vb in fields(lbody):
                        if vno != 1:
                            continue
                        # packed (wt 2, many floats) and unpacked (wt 5,
                        # one float) both arrive as a 4n-byte buffer
                        for (f,) in struct.iter_unpack("<f", vb):
                            vals.append(float(f))
            out[name] = vals
    return out


# ---------------------------------------------------------------------------
# record framing
# ---------------------------------------------------------------------------


def frame_record(data: bytes) -> bytes:
    ln = struct.pack("<Q", len(data))
    return (
        ln
        + struct.pack("<I", masked_crc32c(ln))
        + data
        + struct.pack("<I", masked_crc32c(data))
    )


def iter_records(buf: bytes):
    """Yield record payloads, verifying BOTH masked CRCs — corruption
    is loud, never a silently skipped record."""
    pos, n = 0, len(buf)
    while pos < n:
        if n - pos < 12:
            raise ValueError("tfrecord: truncated length frame")
        ln_bytes = buf[pos : pos + 8]
        (want_len_crc,) = struct.unpack("<I", buf[pos + 8 : pos + 12])
        if masked_crc32c(ln_bytes) != want_len_crc:
            raise ValueError("tfrecord: length CRC mismatch")
        (ln,) = struct.unpack("<Q", ln_bytes)
        pos += 12
        if n - pos < ln + 4:
            raise ValueError("tfrecord: truncated record data")
        data = buf[pos : pos + ln]
        (want_crc,) = struct.unpack("<I", buf[pos + ln : pos + ln + 4])
        if masked_crc32c(data) != want_crc:
            raise ValueError("tfrecord: data CRC mismatch")
        pos += ln + 4
        yield data


# ---------------------------------------------------------------------------
# table <-> tfrecord file
# ---------------------------------------------------------------------------


def build_tfrecord(table: pa.Table) -> bytes:
    """One Example per row. int64/string/binary columns only (see
    module contract); NULLs omit the feature."""
    cols = {}
    for name in table.column_names:
        typ = table.schema.field(name).type
        if not (
            pa.types.is_integer(typ)
            or pa.types.is_string(typ)
            or pa.types.is_large_string(typ)
            or pa.types.is_binary(typ)
        ):
            raise TypeError(
                f"tfrecord: column {name!r} has type {typ} — int64/"
                "string/binary only (float64 would silently become "
                "float32; quantize or cast upstream)"
            )
        if pa.types.is_unsigned_integer(typ) and typ.bit_width > 32:
            # Int64List is SIGNED: values >= 2^63 would round-trip as
            # negative int64 — refuse instead of silently corrupting
            raise TypeError(
                f"tfrecord: column {name!r} has type {typ} — unsigned "
                "integers wider than 32 bits don't fit Int64List; cast "
                "to int64 upstream if the range allows"
            )
        cols[name] = table.column(name).to_pylist()
    out = bytearray()
    for i in range(table.num_rows):
        ex = encode_example({k: v[i] for k, v in cols.items()})
        out += frame_record(ex)
    return bytes(out)


def parse_tfrecord(
    data: bytes,
    binary_cols: frozenset[str] = frozenset(),
    list_cols: frozenset[str] = frozenset(),
) -> pa.Table:
    """Parse one TFRecord file to a table. Columns come out in
    sorted-name order (the union of feature names across records);
    features absent in a record are null. BytesList decodes to string
    (UTF-8) unless the name is in ``binary_cols``; single-valued
    Int64List to int64. A feature carrying MORE than one value raises
    (a foreign file's multi-valued feature must not silently lose
    values) unless its name is in ``list_cols``, which emits the full
    value list as a list<int64|float64|binary|string> column."""
    rows = [decode_example(rec) for rec in iter_records(data)]
    names = sorted({k for r in rows for k in r})
    arrays, out_names = [], []
    for name in names:
        vals = [r.get(name) for r in rows]
        first = next((v[0] for v in vals if v), None)
        as_list = name in list_cols
        if not as_list:
            bad = next((v for v in vals if v is not None and len(v) > 1), None)
            if bad is not None:
                raise ValueError(
                    f"tfrecord: feature {name!r} carries {len(bad)} values "
                    "in one Example — taking the first would silently drop "
                    f"data; pass list_cols={{'{name}'}} to read it as a "
                    "list column"
                )
        if isinstance(first, bytes) and name not in binary_cols:
            if as_list:
                col = [
                    None if v is None else [x.decode("utf-8") for x in v]
                    for v in vals
                ]
                arrays.append(pa.array(col, type=pa.list_(pa.string())))
            else:
                col = [
                    None if v is None or not v else v[0].decode("utf-8")
                    for v in vals
                ]
                arrays.append(pa.array(col, type=pa.string()))
        elif isinstance(first, bytes):
            if as_list:
                arrays.append(pa.array(vals, type=pa.list_(pa.binary())))
            else:
                col = [None if v is None or not v else v[0] for v in vals]
                arrays.append(pa.array(col, type=pa.binary()))
        elif isinstance(first, float):
            if as_list:
                arrays.append(pa.array(vals, type=pa.list_(pa.float64())))
            else:
                col = [None if v is None or not v else v[0] for v in vals]
                arrays.append(pa.array(col, type=pa.float64()))
        else:
            if as_list:
                arrays.append(pa.array(vals, type=pa.list_(pa.int64())))
            else:
                col = [None if v is None or not v else v[0] for v in vals]
                arrays.append(pa.array(col, type=pa.int64()))
        out_names.append(name)
    return pa.Table.from_arrays(arrays, names=out_names)


# ---------------------------------------------------------------------------
# Ray surfaces
# ---------------------------------------------------------------------------


def read_tfrecord(
    paths: str | list[str],
    binary_cols: frozenset[str] = frozenset(),
    list_cols: frozenset[str] = frozenset(),
) -> ray.data.Dataset:
    """Streaming TFRecord reader — one parse task per file (no sync
    markers, so the file is the split unit; writers shard accordingly)."""

    def parse(batch: pa.Table):
        for data in batch.column("bytes").to_pylist():
            t = parse_tfrecord(data, binary_cols, list_cols)
            if t.num_rows:
                yield t

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


@ray.remote
def _write_tfrecord_shard(
    parquet_path: str, out_path: str, shard: int, n_shards: int, columns
) -> int:
    """One deterministic shard: rows with doc_id % n_shards == shard,
    ordered by doc_id, atomic rename commit."""
    import pyarrow.parquet as pq

    t = pq.read_table(parquet_path, columns=columns)
    ids = t.column("doc_id").to_numpy(zero_copy_only=False)
    t = t.filter(pa.array(np.asarray(ids) % n_shards == shard)).sort_by("doc_id")
    data = build_tfrecord(t)
    tmp = out_path + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, out_path)
    return t.num_rows


def write_tfrecord_corpus(
    parquet_path: str,
    out_dir: str,
    n_shards: int = 4,
    columns: list[str] | None = None,
) -> list[str]:
    """Shard a parquet corpus into deterministic .tfrecord files — one
    Ray task per shard, atomic rename commit."""
    os.makedirs(out_dir, exist_ok=True)
    paths = [
        os.path.join(out_dir, f"part-{s:05d}.tfrecord") for s in range(n_shards)
    ]
    ray.get(
        [
            _write_tfrecord_shard.remote(parquet_path, p, s, n_shards, columns)
            for s, p in enumerate(paths)
        ]
    )
    return paths


def dataset_to_tfrecord(ds: ray.data.Dataset, out_dir: str) -> list[str]:
    """Export sink: one .tfrecord file per block, written inside the
    block's own task (atomic rename; nothing corpus-sized moves
    anywhere). File names are content-addressed so reruns overwrite
    identical bytes instead of duplicating."""
    os.makedirs(out_dir, exist_ok=True)

    def write_block(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.Table.from_pydict({"path": pa.array([], type=pa.string())})
        data = build_tfrecord(batch)
        name = hashlib.md5(data).hexdigest()[:16]
        path = os.path.join(out_dir, f"part-{name}.tfrecord")
        tmp = path + f".tmp.{os.getpid()}"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        return pa.Table.from_pydict({"path": pa.array([path], type=pa.string())})

    return sorted(
        r["path"] for r in ds.map_batches(write_block, batch_format="pyarrow").take_all()
    )
