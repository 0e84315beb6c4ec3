"""TFRecord format tests: CRC32C vectors, golden protobuf wire bytes,
framing corruption detection, round trips, Ray read/write surfaces."""

from __future__ import annotations

import struct

import pyarrow as pa
import pytest
import ray.data

from ctinexus_ray.sources.tfrecord import (
    build_tfrecord,
    crc32c,
    dataset_to_tfrecord,
    decode_example,
    encode_example,
    frame_record,
    iter_records,
    masked_crc32c,
    parse_tfrecord,
    read_tfrecord,
    write_tfrecord_corpus,
)


def _crc32c_naive(data: bytes) -> int:
    """Independent bit-by-bit reference (reflected poly 0x82F63B78)."""
    crc = 0xFFFFFFFF
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = (crc >> 1) ^ (0x82F63B78 if crc & 1 else 0)
    return crc ^ 0xFFFFFFFF


class TestCrc32c:
    def test_check_vector(self):
        # the canonical CRC-32C check value
        assert crc32c(b"123456789") == 0xE3069283

    def test_empty(self):
        assert crc32c(b"") == 0

    @pytest.mark.parametrize(
        "data",
        [b"a", b"hello world", bytes(range(256)), b"x" * 1000, b"12345678"],
    )
    def test_matches_naive(self, data):
        assert crc32c(data) == _crc32c_naive(data)

    def test_mask_formula(self):
        c = crc32c(b"123456789")
        want = (((c >> 15) | (c << 17)) + 0xA282EAD8) & 0xFFFFFFFF
        assert masked_crc32c(b"123456789") == want


class TestExampleWire:
    def test_golden_int64_feature(self):
        # hand-derived from the protobuf wire spec:
        # Int64List{value=[5]} packed -> 0a 01 05
        # Feature{int64_list} (field 3) -> 1a 03 0a 01 05
        # map entry key="a" value=Feature -> 0a 01 61 12 05 1a 03 0a 01 05
        # Features.feature (field 1) wraps entry; Example.features wraps it
        entry = b"\x0a\x01a\x12\x05\x1a\x03\x0a\x01\x05"
        features = b"\x0a" + bytes([len(entry)]) + entry
        example = b"\x0a" + bytes([len(features)]) + features
        assert encode_example({"a": 5}) == example

    def test_golden_bytes_feature(self):
        # BytesList{value=[b"hi"]} -> 0a 02 68 69
        # Feature{bytes_list} (field 1) -> 0a 04 0a 02 68 69
        entry = b"\x0a\x01b\x12\x06\x0a\x04\x0a\x02hi"
        features = b"\x0a" + bytes([len(entry)]) + entry
        example = b"\x0a" + bytes([len(features)]) + features
        assert encode_example({"b": "hi"}) == example

    def test_round_trip_types(self):
        ex = encode_example(
            {"i": 42, "neg": -7, "s": "héllo", "b": b"\x00\xff", "multi": [1, 2, 3]}
        )
        got = decode_example(ex)
        assert got["i"] == [42]
        assert got["neg"] == [-7]
        assert got["s"] == ["héllo".encode("utf-8")]
        assert got["b"] == [b"\x00\xff"]
        assert got["multi"] == [1, 2, 3]

    def test_none_omits_feature(self):
        got = decode_example(encode_example({"a": 1, "gone": None}))
        assert "gone" not in got

    def test_unpacked_int64_accepted(self):
        # writers MAY emit unpacked repeated int64 (proto2 style):
        # Feature{int64_list{value: 9}} with value unpacked (tag 08)
        int64_list = b"\x08\x09"
        feat = b"\x1a" + bytes([len(int64_list)]) + int64_list
        entry = b"\x0a\x01a\x12" + bytes([len(feat)]) + feat
        features = b"\x0a" + bytes([len(entry)]) + entry
        example = b"\x0a" + bytes([len(features)]) + features
        assert decode_example(example)["a"] == [9]

    def test_float_list_parsed(self):
        # FloatList (field 2) packed: two float32
        payload = struct.pack("<ff", 1.5, -2.0)
        fl = b"\x0a" + bytes([len(payload)]) + payload
        feat = b"\x12" + bytes([len(fl)]) + fl
        entry = b"\x0a\x01f\x12" + bytes([len(feat)]) + feat
        features = b"\x0a" + bytes([len(entry)]) + entry
        example = b"\x0a" + bytes([len(features)]) + features
        assert decode_example(example)["f"] == [1.5, -2.0]

    def test_float_column_refused_on_write(self):
        t = pa.table({"x": pa.array([1.0], type=pa.float64())})
        with pytest.raises(TypeError, match="float64"):
            build_tfrecord(t)


class TestFraming:
    def test_frame_layout(self):
        data = b"payload"
        f = frame_record(data)
        assert struct.unpack("<Q", f[:8])[0] == len(data)
        assert struct.unpack("<I", f[8:12])[0] == masked_crc32c(f[:8])
        assert f[12:-4] == data
        assert struct.unpack("<I", f[-4:])[0] == masked_crc32c(data)

    def test_iter_records(self):
        buf = frame_record(b"a") + frame_record(b"bc")
        assert list(iter_records(buf)) == [b"a", b"bc"]

    def test_corrupt_data_crc_is_loud(self):
        buf = bytearray(frame_record(b"payload"))
        buf[14] ^= 0xFF
        with pytest.raises(ValueError, match="data CRC"):
            list(iter_records(bytes(buf)))

    def test_corrupt_length_crc_is_loud(self):
        buf = bytearray(frame_record(b"payload"))
        buf[2] ^= 0x01
        with pytest.raises(ValueError, match="length CRC|truncated"):
            list(iter_records(bytes(buf)))

    def test_truncated_is_loud(self):
        buf = frame_record(b"payload")[:-2]
        with pytest.raises(ValueError, match="truncated"):
            list(iter_records(buf))


class TestTableRoundTrip:
    def test_nulls_and_unicode(self):
        t = pa.table(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": pa.array(["héllo wörld", None, ""], type=pa.string()),
            }
        )
        back = parse_tfrecord(build_tfrecord(t))
        # columns come back in sorted-name order
        assert back.column_names == ["doc_id", "text"]
        assert back.column("doc_id").to_pylist() == [1, 2, 3]
        # empty string survives (a BytesList holding one empty value is
        # distinct from an absent feature); only NULL omits the feature
        assert back.column("text").to_pylist() == ["héllo wörld", None, ""]

    def test_binary_col_opt_in(self):
        t = pa.table({"blob": pa.array([b"\x00\x01"], type=pa.binary())})
        back = parse_tfrecord(build_tfrecord(t), binary_cols=frozenset({"blob"}))
        assert back.column("blob").to_pylist() == [b"\x00\x01"]

    def test_uint64_refused(self):
        # Int64List is signed: 2^63 would round-trip negative — loud refusal
        t = pa.table({"x": pa.array([2**63], type=pa.uint64())})
        with pytest.raises(TypeError, match="unsigned"):
            build_tfrecord(t)
        # uint32 always fits int64 — accepted and exact
        t32 = pa.table({"x": pa.array([2**32 - 1], type=pa.uint32())})
        back = parse_tfrecord(build_tfrecord(t32))
        assert back.column("x").to_pylist() == [2**32 - 1]

    def test_multivalue_feature_loud_or_list(self):
        # a foreign file's multi-valued feature must not silently drop
        # values: default raises, list_cols opt-in keeps them all
        rec = encode_example({"ids": [1, 2, 3], "tag": "a"})
        data = bytes(frame_record(rec))
        with pytest.raises(ValueError, match="list_cols"):
            parse_tfrecord(data)
        back = parse_tfrecord(data, list_cols=frozenset({"ids"}))
        assert back.column("ids").to_pylist() == [[1, 2, 3]]
        assert back.column("tag").to_pylist() == ["a"]
        # bytes list mode
        rec2 = encode_example({"toks": ["x", "y"]})
        back2 = parse_tfrecord(
            bytes(frame_record(rec2)), list_cols=frozenset({"toks"})
        )
        assert back2.column("toks").to_pylist() == [["x", "y"]]


class TestRaySurfaces:
    def test_corpus_shard_read(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        t = pa.table(
            {
                "doc_id": pa.array(range(10), type=pa.int64()),
                "text": [f"doc {i}" if i % 4 else None for i in range(10)],
            }
        )
        src = str(tmp_path / "in.parquet")
        pq.write_table(t, src)
        out = str(tmp_path / "tfr")
        paths = write_tfrecord_corpus(src, out, n_shards=3)
        assert len(paths) == 3
        ds = read_tfrecord(paths)
        rows = sorted(ds.take_all(), key=lambda r: r["doc_id"])
        assert [r["doc_id"] for r in rows] == list(range(10))
        assert rows[1]["text"] == "doc 1" and rows[4]["text"] is None

    def test_dataset_sink(self, ray_session, tmp_path):
        ds = ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([7, 8], type=pa.int64()),
                    "lang": ["en", "de"],
                }
            )
        )
        paths = dataset_to_tfrecord(ds, str(tmp_path / "sink"))
        back = sorted(
            read_tfrecord(paths).take_all(), key=lambda r: r["doc_id"]
        )
        assert [(r["doc_id"], r["lang"]) for r in back] == [(7, "en"), (8, "de")]
