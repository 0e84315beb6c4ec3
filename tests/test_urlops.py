"""URL canonicalization + keep-latest-capture dedup tests."""

from __future__ import annotations

import pyarrow as pa
import pytest

from ctinexus_ray.ops.urlops import (
    canonicalize_url,
    canonicalize_url_batch,
    keep_latest_by_key,
)


class TestCanonicalizeUrl:
    @pytest.mark.parametrize(
        "raw,canon",
        [
            # scheme + host lowercased, path case preserved
            ("HTTPS://WWW.Ex.COM/Path/X", "https://www.ex.com/Path/X"),
            # default ports stripped per scheme
            ("https://ex.com:443/a", "https://ex.com/a"),
            ("http://ex.com:80/a", "http://ex.com/a"),
            # non-default port kept
            ("https://ex.com:8443/a", "https://ex.com:8443/a"),
            # http on 443 is NOT default — kept
            ("http://ex.com:443/a", "http://ex.com:443/a"),
            # fragment dropped
            ("https://ex.com/a#sec", "https://ex.com/a"),
            # tracking params dropped, remainder sorted
            (
                "https://ex.com/a?utm_source=f&b=2&a=1&fbclid=xyz",
                "https://ex.com/a?a=1&b=2",
            ),
            # all params tracking -> bare path
            ("https://ex.com/a?utm_campaign=x", "https://ex.com/a"),
            # empty path becomes /
            ("https://ex.com?a=1", "https://ex.com/?a=1"),
            ("https://ex.com", "https://ex.com/"),
            # params sorted bytewise by full k=v
            ("https://ex.com/a?b=1&a=2&a=10", "https://ex.com/a?a=10&a=2&b=1"),
            # non-hierarchical strings pass through
            ("mailto:x@y.z", "mailto:x@y.z"),
            ("not a url", "not a url"),
        ],
    )
    def test_variants(self, raw, canon):
        assert canonicalize_url(raw) == canon

    def test_idempotent(self):
        urls = [
            "HTTPS://A.B:443/P?utm_a=1&z=2&y=3#f",
            "http://c.d:80",
            "https://e.f/g",
        ]
        once = [canonicalize_url(u) for u in urls]
        assert [canonicalize_url(u) for u in once] == once

    def test_batch_replaces_and_keeps_nulls(self):
        t = pa.Table.from_pydict(
            {"url": ["HTTPS://A.B/x", None], "k": [1, 2]}
        )
        out = canonicalize_url_batch(t)
        assert out.column("url").to_pylist() == ["https://a.b/x", None]
        assert out.column("k").to_pylist() == [1, 2]


class TestKeepLatestByKey:
    def test_latest_wins_and_payload_rides_along(self, ray_session):
        import ray.data

        t = pa.Table.from_pydict(
            {
                "url": ["u1", "u1", "u2", "u1", "u3", "u3"],
                "ts": [3, 9, 1, 5, 2, 2],
                "uid": [0, 1, 2, 3, 4, 5],
                "payload": ["a", "b", "c", "d", "e", "f"],
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        rows = {
            r["url"]: r
            for r in keep_latest_by_key(ds, "url", ["ts", "uid"]).take_all()
        }
        assert rows["u1"]["payload"] == "b" and rows["u1"]["n_dups"] == 3
        assert rows["u2"]["payload"] == "c" and rows["u2"]["n_dups"] == 1
        # ts tie broken by uid descending (greatest tuple wins)
        assert rows["u3"]["payload"] == "f" and rows["u3"]["n_dups"] == 2

    def test_matches_duckdb_window(self, ray_session):
        import duckdb
        import numpy as np
        import ray.data

        rng = np.random.default_rng(11)
        n = 300
        t = pa.Table.from_pydict(
            {
                "url": [f"u{int(x)}" for x in rng.integers(0, 40, n)],
                "ts": rng.integers(0, 10_000, n),
                "uid": list(range(n)),
            }
        )
        ds = ray.data.from_arrow(t).repartition(5)
        got = sorted(
            (r["url"], r["ts"], r["uid"], r["n_dups"])
            for r in keep_latest_by_key(ds, "url", ["ts", "uid"]).take_all()
        )
        want = sorted(
            duckdb.sql(
                "SELECT url, ts, uid, n_dups FROM ("
                "SELECT *, row_number() OVER "
                "(PARTITION BY url ORDER BY ts DESC, uid DESC) AS rn, "
                "CAST(count(*) OVER (PARTITION BY url) AS BIGINT) AS n_dups "
                "FROM t) WHERE rn = 1"
            ).fetchall()
        )
        assert got == want
