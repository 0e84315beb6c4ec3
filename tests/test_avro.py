"""Avro OCF source (sources/avro.py): golden wire bytes, round trips,
corpus shard write -> Ray read, and malformed-input errors."""

import json

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ctinexus_ray.sources.avro import (
    CORPUS_SCHEMA,
    build_avro,
    parse_avro_file,
    read_avro,
    write_avro_corpus,
)


def _hand_built_file() -> bytes:
    """A minimal OCF assembled from EXPLICIT byte literals (no encoder
    reuse) — pins the wire format independently of build_avro: one
    long field, null codec, one block of two records (1 and -3)."""
    schema = json.dumps(
        {"type": "record", "name": "R", "fields": [{"name": "x", "type": "long"}]},
        separators=(",", ":"),
    ).encode()
    assert len(schema) == 66  # zigzag 132 -> varint 0x84 0x01
    out = bytearray(b"Obj\x01")
    out += b"\x04"  # map count 2 (zigzag)
    out += b"\x14" + b"avro.codec"  # key len 10 (zigzag 20)
    out += b"\x08" + b"null"  # value len 4 (zigzag 8)
    out += b"\x16" + b"avro.schema"  # key len 11 (zigzag 22)
    out += b"\x84\x01" + schema  # value len 66, two-byte varint
    out += b"\x00"  # end of map
    sync = b"0123456789abcdef"
    out += sync
    out += b"\x04"  # block: 2 objects
    out += b"\x04"  # block: 2 payload bytes
    out += b"\x02"  # x = 1  (zigzag 2)
    out += b"\x05"  # x = -3 (zigzag 5)
    out += sync
    return bytes(out)


class TestWireFormat:
    def test_golden_bytes_decode(self):
        t = parse_avro_file(_hand_built_file())
        assert t.schema.names == ["x"]
        assert t.schema.field("x").type == pa.int64()
        assert t.column("x").to_pylist() == [1, -3]

    def test_build_avro_matches_golden_layout(self):
        # build_avro with the same schema/sync/codec reproduces the
        # hand-built bytes exactly
        schema = {
            "type": "record",
            "name": "R",
            "fields": [{"name": "x", "type": "long"}],
        }
        got = build_avro(
            [{"x": 1}, {"x": -3}], schema, codec="null",
            sync=b"0123456789abcdef",
        )
        assert got == _hand_built_file()


ROWS = [
    {"doc_id": 0, "text": "hello world"},
    {"doc_id": 1, "text": None},
    {"doc_id": 2, "text": ""},
    {"doc_id": 3, "text": "naïve – ünïcode ✓ 中文"},
    {"doc_id": -4, "text": "negative id"},
]


class TestRoundTrip:
    @pytest.mark.parametrize("codec", ["null", "deflate"])
    def test_corpus_rows(self, codec):
        data = build_avro(ROWS, CORPUS_SCHEMA, codec=codec)
        t = parse_avro_file(data)
        assert t.to_pylist() == ROWS

    def test_multi_block(self):
        rows = [{"doc_id": i, "text": f"doc {i}"} for i in range(2500)]
        t = parse_avro_file(build_avro(rows, CORPUS_SCHEMA, block_rows=100))
        assert t.to_pylist() == rows

    def test_all_primitive_types(self):
        schema = {
            "type": "record",
            "name": "P",
            "fields": [
                {"name": "b", "type": "boolean"},
                {"name": "i", "type": "int"},
                {"name": "l", "type": "long"},
                {"name": "f", "type": "float"},
                {"name": "d", "type": "double"},
                {"name": "y", "type": "bytes"},
                {"name": "s", "type": "string"},
                {"name": "ns", "type": ["string", "null"]},  # null-second
            ],
        }
        rows = [
            {
                "b": True, "i": -7, "l": 1 << 40, "f": 0.5, "d": 1e-9,
                "y": b"\x00\xff", "s": "s", "ns": None,
            },
            {
                "b": False, "i": 0, "l": -(1 << 40), "f": -2.0, "d": 3.14,
                "y": b"", "s": "", "ns": "there",
            },
        ]
        t = parse_avro_file(build_avro(rows, schema))
        assert t.to_pylist() == rows

    def test_empty_rows(self):
        t = parse_avro_file(build_avro([], CORPUS_SCHEMA))
        assert t.num_rows == 0
        assert t.schema.names == ["doc_id", "text"]


class TestErrors:
    def test_bad_magic(self):
        with pytest.raises(ValueError, match="magic"):
            parse_avro_file(b"PAR1" + b"\x00" * 64)

    def test_corrupt_sync(self):
        data = bytearray(build_avro(ROWS, CORPUS_SCHEMA))
        data[-1] ^= 0xFF  # flip a bit in the trailing sync marker
        with pytest.raises(ValueError, match="sync"):
            parse_avro_file(bytes(data))

    def test_truncated(self):
        data = build_avro(ROWS, CORPUS_SCHEMA)
        with pytest.raises(ValueError, match="truncated"):
            parse_avro_file(data[:-20])

    def test_unsupported_schema_node(self):
        bad = {
            "type": "record",
            "name": "B",
            "fields": [{"name": "a", "type": {"type": "array", "items": "long"}}],
        }
        with pytest.raises(ValueError, match="unsupported field type"):
            build_avro([], bad)

    def test_null_in_non_nullable(self):
        with pytest.raises(ValueError, match="non-nullable"):
            build_avro([{"doc_id": None, "text": "x"}], CORPUS_SCHEMA)

    def test_unsupported_codec(self):
        with pytest.raises(ValueError, match="codec"):
            build_avro([], CORPUS_SCHEMA, codec="snappy")


class TestRayRoundTrip:
    def test_shard_write_then_read(self, ray_session, tmp_path):
        src = tmp_path / "docs.parquet"
        table = pa.table(
            {
                "doc_id": pa.array(range(37), type=pa.int64()),
                "text": pa.array(
                    [None if i % 7 == 3 else f"doc {i} ✓" for i in range(37)],
                    type=pa.string(),
                ),
            }
        )
        pq.write_table(table, src)
        paths = write_avro_corpus(str(src), str(tmp_path / "avro"), n_shards=3)
        assert len(paths) == 3
        got = read_avro(paths).take_all()
        got.sort(key=lambda r: r["doc_id"])
        assert got == table.to_pylist()

    def test_deterministic_bytes(self, ray_session, tmp_path):
        src = tmp_path / "docs.parquet"
        pq.write_table(
            pa.table(
                {
                    "doc_id": pa.array(range(10), type=pa.int64()),
                    "text": pa.array([f"d{i}" for i in range(10)]),
                }
            ),
            src,
        )
        a = write_avro_corpus(str(src), str(tmp_path / "a"), n_shards=2)
        b = write_avro_corpus(str(src), str(tmp_path / "b"), n_shards=2)
        for pa_, pb in zip(a, b):
            assert open(pa_, "rb").read() == open(pb, "rb").read()


class TestDatasetSink:
    def test_export_roundtrip_with_timestamps_and_nulls(
        self, ray_session, tmp_path
    ):
        import datetime

        import ray.data

        from ctinexus_ray.sources.avro import dataset_to_avro, read_avro

        ts = [
            datetime.datetime(2026, 1, 1, tzinfo=datetime.timezone.utc),
            None,
            datetime.datetime(2026, 6, 15, 12, 30, tzinfo=datetime.timezone.utc),
        ]
        table = pa.table(
            {
                "id": pa.array([1, 2, None], type=pa.int64()),
                "name": pa.array(["a", None, "c"], type=pa.string()),
                "w": pa.array([0.5, None, -1.25], type=pa.float64()),
                "ts": pa.array(ts, type=pa.timestamp("us", tz="UTC")),
            }
        )
        paths = dataset_to_avro(
            ray.data.from_arrow(table), str(tmp_path / "out")
        )
        assert paths
        got = sorted(
            read_avro(paths).take_all(),
            key=lambda r: (r["id"] is None, r["id"]),
        )
        epoch = datetime.datetime(1970, 1, 1, tzinfo=datetime.timezone.utc)
        want_ts = [
            None if t is None else int((t - epoch).total_seconds() * 1e6)
            for t in ts
        ]
        assert [r["id"] for r in got] == [1, 2, None]
        assert [r["name"] for r in got] == ["a", None, "c"]
        assert [r["w"] for r in got] == [0.5, None, -1.25]
        assert [r["ts"] for r in got] == want_ts

    def test_unsupported_type_raises(self, ray_session, tmp_path):
        import ray.data

        from ctinexus_ray.sources.avro import dataset_to_avro

        table = pa.table({"v": pa.array([[1, 2]], type=pa.list_(pa.int64()))})
        with pytest.raises(Exception, match="unsupported arrow type"):
            dataset_to_avro(ray.data.from_arrow(table), str(tmp_path / "o"))
