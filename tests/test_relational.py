"""Tests for relational/temporal ops vs DuckDB oracles on sf0.001."""

from __future__ import annotations

import duckdb
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in ("events", "orders", "customer"):
        c.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return c


class TestWindow:
    def test_hourly_counts_vs_duckdb(self, ray_session, con):
        from ctinexus_ray.ops.relational import hourly_event_counts

        events = ray.data.read_parquet(f"{SF}/events.parquet")
        got = {
            (r["hour_ts"], r["event_type"], r["n_events"])
            for r in hourly_event_counts(events).take_all()
        }
        want = set(
            con.sql(
                "SELECT CAST(epoch(date_trunc('hour', ts)) AS BIGINT), "
                "event_type, count(*) FROM events GROUP BY 1, 2"
            ).fetchall()
        )
        assert got == want


class TestSessionize:
    def test_vs_duckdb(self, ray_session, con):
        from ctinexus_ray.ops.relational import sessionize

        events = ray.data.read_parquet(f"{SF}/events.parquet")
        got = {
            (r["user_id"], r["n_sessions"], r["n_events"])
            for r in sessionize(events).take_all()
        }
        want = set(
            con.sql(
                "WITH ordered AS (SELECT user_id, ts, lag(ts) OVER ("
                "PARTITION BY user_id ORDER BY ts, event_id) AS prev FROM events) "
                "SELECT user_id, CAST(count(CASE WHEN prev IS NULL "
                "OR epoch(ts) - epoch(prev) > 1800 THEN 1 END) AS BIGINT), "
                "count(*) FROM ordered GROUP BY user_id"
            ).fetchall()
        )
        assert got == want


class TestBroadcastJoin:
    def test_vs_duckdb(self, ray_session, con):
        from ctinexus_ray.ops.relational import broadcast_join_count

        orders = ray.data.read_parquet(f"{SF}/orders.parquet", columns=["o_custkey"])
        customer = ray.data.read_parquet(
            f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
        )
        got = {
            (r["key"], r["c_mktsegment"], r["n"])
            for r in broadcast_join_count(
                orders, customer, "o_custkey", "c_custkey", ["c_mktsegment"]
            ).take_all()
        }
        want = set(
            con.sql(
                "SELECT o_custkey, c_mktsegment, count(*) FROM orders o "
                "JOIN customer c ON c.c_custkey = o.o_custkey GROUP BY 1, 2"
            ).fetchall()
        )
        assert got == want
