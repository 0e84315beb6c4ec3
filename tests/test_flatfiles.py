"""JSONL corpus source: deterministic sharded write + streaming read
(sources/jsonl.py)."""

import gzip
import json

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data


def _corpus(tmp_path, rows):
    p = str(tmp_path / "docs.parquet")
    pq.write_table(
        pa.Table.from_pydict(
            {
                "doc_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "text": [r[1] for r in rows],
            }
        ),
        p,
    )
    return p


class TestJsonlSource:
    def test_round_trip_exact(self, ray_session, tmp_path):
        from ctinexus_ray.sources.flatfiles import read_jsonl, write_jsonl_corpus

        rows = [(i, f"döc {i} with ünïcode \"quotes\" and \\ slashes") for i in range(23)]
        rows.append((23, None))  # NULL text survives the round trip
        src = _corpus(tmp_path, rows)
        paths = write_jsonl_corpus(src, str(tmp_path / "out"), n_shards=4)
        got = sorted(
            (r["doc_id"], r["text"]) for r in read_jsonl(paths).take_all()
        )
        assert got == sorted(rows)

    def test_deterministic_shard_bytes(self, ray_session, tmp_path):
        from ctinexus_ray.sources.flatfiles import write_jsonl_corpus

        rows = [(i, f"t{i}") for i in range(17)]
        src = _corpus(tmp_path, rows)
        a = write_jsonl_corpus(src, str(tmp_path / "a"), n_shards=4)
        b = write_jsonl_corpus(src, str(tmp_path / "b"), n_shards=4)
        for pa_, pb_ in zip(a, b):
            assert open(pa_, "rb").read() == open(pb_, "rb").read()

    def test_shard_assignment_and_order(self, ray_session, tmp_path):
        from ctinexus_ray.sources.flatfiles import write_jsonl_corpus

        rows = [(i, "x") for i in range(40)]
        src = _corpus(tmp_path, rows)
        paths = write_jsonl_corpus(src, str(tmp_path / "out"), n_shards=4)
        for s, p in enumerate(paths):
            ids = [
                json.loads(line)["doc_id"]
                for line in gzip.open(p, "rt", encoding="utf-8")
            ]
            assert ids == sorted(ids)
            assert all(i % 4 == s for i in ids)


class TestCsvSource:
    def test_round_trip_hostile_values(self, ray_session, tmp_path):
        from ctinexus_ray.sources.flatfiles import read_csv_corpus, write_csv_corpus

        rows = [
            (0, 'comma, quote " and\tencoded'),
            (1, ""),            # empty string stays ''
            (2, None),          # NULL stays NULL (unquoted empty)
            (3, "plain"),
            (4, "ünïcode"),
        ]
        src = _corpus(tmp_path, rows)
        paths = write_csv_corpus(src, str(tmp_path / "out"), n_shards=2)
        got = sorted(
            (r["doc_id"], r["text"]) for r in read_csv_corpus(paths).take_all()
        )
        assert got == sorted(rows)

    def test_deterministic_bytes(self, ray_session, tmp_path):
        from ctinexus_ray.sources.flatfiles import write_csv_corpus

        rows = [(i, f"t{i}") for i in range(9)]
        src = _corpus(tmp_path, rows)
        a = write_csv_corpus(src, str(tmp_path / "a"), n_shards=3)
        b = write_csv_corpus(src, str(tmp_path / "b"), n_shards=3)
        for pa_, pb_ in zip(a, b):
            assert open(pa_, "rb").read() == open(pb_, "rb").read()

    def test_mixed_compression_dir(self, ray_session, tmp_path):
        """read_corpus_auto handles a partially recompressed dump
        (.jsonl and .jsonl.gz side by side) by splitting the read."""
        import gzip
        import json
        import os

        from ctinexus_ray.sources.flatfiles import read_corpus_auto

        d = tmp_path / "mix"
        os.makedirs(d)
        with open(d / "part-0.jsonl", "w") as f:
            f.write(json.dumps({"doc_id": 1, "text": "a"}) + "\n")
        with gzip.open(d / "part-1.jsonl.gz", "wt") as f:
            f.write(json.dumps({"doc_id": 2, "text": "b"}) + "\n")
        got = sorted(
            (r["doc_id"], r["text"])
            for r in read_corpus_auto(str(d)).take_all()
        )
        assert got == [(1, "a"), (2, "b")]

    def test_csv_multiline_text(self, ray_session, tmp_path):
        """Quoted newlines in text survive the CSV round trip (the
        newlines_in_values parse option is load-bearing)."""
        from ctinexus_ray.sources.flatfiles import read_csv_corpus, write_csv_corpus

        rows = [(i, f"line one {i}\nline two {i}\r\nline three") for i in range(12)]
        src = _corpus(tmp_path, rows)
        paths = write_csv_corpus(src, str(tmp_path / "out"), n_shards=2)
        got = sorted(
            (r["doc_id"], r["text"]) for r in read_csv_corpus(paths).take_all()
        )
        assert got == sorted(rows)
import gzip

import pyarrow as pa
import pytest
import ray.data


class TestSitemapSource:
    ROWS = [
        {"url": "http://h.example.com/a", "lastmod": "2024-01-02",
         "changefreq": "daily", "priority": 0.5},
        {"url": "http://h.example.com/b?x=1&y=2", "lastmod": None,
         "changefreq": None, "priority": None},
        {"url": "http://h.example.com/c", "lastmod": "2024-02-03",
         "changefreq": "weekly", "priority": 1.0},
    ]

    def test_round_trip_plain_and_gz(self, ray_session, tmp_path):
        from ctinexus_ray.sources.sitemap import read_sitemaps, write_sitemap_corpus

        for gz in (False, True):
            d = str(tmp_path / ("gz" if gz else "plain"))
            index = write_sitemap_corpus(d, self.ROWS, urls_per_file=2, gz=gz)
            got = sorted(
                read_sitemaps(index).take_all(), key=lambda r: r["url"]
            )
            assert [r["url"] for r in got] == [r["url"] for r in self.ROWS]
            assert got[0]["priority"] == 0.5
            assert got[1]["lastmod"] is None
            assert got[1]["changefreq"] is None
            # two files of 2 + 1 rows
            assert {r["sitemap_file"] for r in got} == {
                f"sitemap-00000.xml{'.gz' if gz else ''}",
                f"sitemap-00001.xml{'.gz' if gz else ''}",
            }

    def test_empty_corpus(self, ray_session, tmp_path):
        from ctinexus_ray.sources.sitemap import read_sitemaps, write_sitemap_corpus

        index = write_sitemap_corpus(str(tmp_path / "e"), [], urls_per_file=2)
        assert read_sitemaps(index).count() == 0

    def test_malformed_loud(self, ray_session, tmp_path):
        from ctinexus_ray.sources.sitemap import parse_sitemapindex, parse_urlset

        with pytest.raises(ValueError, match="urlset"):
            parse_urlset(
                b'<?xml version="1.0"?><sitemapindex xmlns='
                b'"http://www.sitemaps.org/schemas/sitemap/0.9"/>'
            )
        with pytest.raises(ValueError, match="sitemapindex"):
            parse_sitemapindex(
                b'<?xml version="1.0"?><urlset xmlns='
                b'"http://www.sitemaps.org/schemas/sitemap/0.9"/>'
            )
        with pytest.raises(Exception):
            parse_urlset(b"this is not xml at all")
