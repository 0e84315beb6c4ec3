"""Watermarked tumbling windows (ops/streaming.py): out-of-order
arrival, exactly-once finalization, late-drop accounting, keyed
windows, and parity with a batch recomputation."""

from collections import Counter

import numpy as np
import pyarrow as pa

from ctinexus_ray.ops.streaming import WindowStream

US = 1_000_000


def _batch(ts_list, keys=None):
    cols = {"ts_us": pa.array([t * US for t in ts_list], type=pa.int64())}
    if keys is not None:
        cols["key"] = pa.array(keys, type=pa.string())
    return pa.Table.from_pydict(cols)


def _rows(ds, keyed=False):
    out = []
    for r in ds.take_all():
        if keyed:
            out.append((r["window_start"] // US, r["key"], r["n"]))
        else:
            out.append((r["window_start"] // US, r["n"]))
    return sorted(out)


class TestWindowStream:
    def test_batch_parity_random_order(self, ray_session):
        rng = np.random.RandomState(11)
        ts = rng.randint(0, 1000, 500).tolist()
        stream = WindowStream(window_sec=60, allowed_lateness_sec=1000,
                              num_partitions=3)
        for i in range(0, len(ts), 50):
            stream.feed(_batch(ts[i : i + 50]))
        got = _rows(stream.close())
        want = sorted(Counter((t // 60) * 60 for t in ts).items())
        assert got == [(w, n) for w, n in want]
        assert stream.late_dropped() == 0

    def test_incremental_finalization_and_immutability(self, ray_session):
        stream = WindowStream(window_sec=10, allowed_lateness_sec=0,
                              num_partitions=2)
        stream.feed(_batch([1, 2, 11]))  # watermark 11: window [0,10) final
        first = _rows(stream.results())
        assert first == [(0, 2)]
        # a late row for the finalized window is dropped AND counted
        stream.feed(_batch([3, 12]))
        assert stream.late_dropped() == 1
        got = _rows(stream.close())
        # [0,10) emitted exactly once (still 2: the late 3 is gone);
        # [10,20) holds {11, 12}
        assert got == [(0, 2), (10, 2)]

    def test_lateness_holds_windows_open(self, ray_session):
        stream = WindowStream(window_sec=10, allowed_lateness_sec=30,
                              num_partitions=2)
        stream.feed(_batch([1, 11]))  # watermark = 11-30 < 10: [0,10) open
        assert _rows(stream.results()) == []
        stream.feed(_batch([5, 45]))  # in-lateness catch-up row counts
        assert stream.late_dropped() == 0
        assert _rows(stream.close()) == [(0, 2), (10, 1), (40, 1)]

    def test_keyed_windows(self, ray_session):
        stream = WindowStream(window_sec=10, allowed_lateness_sec=0,
                              key_col="key", num_partitions=2)
        stream.feed(_batch([1, 2, 3, 12], ["a", "b", "a", "a"]))
        got = _rows(stream.close(), keyed=True)
        assert got == [(0, "a", 2), (0, "b", 1), (10, "a", 1)]

    def test_null_event_time_rejected(self, ray_session):
        import pytest

        stream = WindowStream(window_sec=10)
        bad = pa.Table.from_pydict(
            {"ts_us": pa.array([1 * US, None], type=pa.int64())}
        )
        with pytest.raises(ValueError, match="NULL event times"):
            stream.feed(bad)

    def test_feed_after_close_rejected(self, ray_session):
        import pytest

        stream = WindowStream(window_sec=10)
        stream.close()
        with pytest.raises(RuntimeError, match="closed"):
            stream.feed(_batch([1]))


class TestSessionStream:
    @staticmethod
    def _feed(stream, ts_keys):
        from ctinexus_ray.ops.streaming import SessionStream  # noqa: F401

        tbl = pa.Table.from_pydict(
            {
                "ts_us": pa.array([t * US for t, _ in ts_keys], type=pa.int64()),
                "key": pa.array([k for _, k in ts_keys], type=pa.string()),
            }
        )
        stream.feed(tbl)

    @staticmethod
    def _rows(ds):
        return sorted(
            (r["key"], r["session_start"] // US, r["session_last"] // US,
             r["n_events"])
            for r in ds.take_all()
        )

    def test_brute_force_parity(self, ray_session):
        from ctinexus_ray.ops.streaming import SessionStream

        rng = np.random.RandomState(23)
        events = [
            (int(rng.randint(0, 20000)), f"u{rng.randint(0, 8)}")
            for _ in range(400)
        ]
        stream = SessionStream(gap_sec=300, allowed_lateness_sec=10**9,
                               num_partitions=3)
        for i in range(0, len(events), 40):
            self._feed(stream, events[i : i + 40])
        got = self._rows(stream.close())
        # brute force: sort each key's times, chain while gap <= 300
        want = []
        by_key: dict = {}
        for t, k in events:
            by_key.setdefault(k, []).append(t)
        for k, ts in by_key.items():
            ts.sort()
            start, last, n = ts[0], ts[0], 1
            for t in ts[1:]:
                if t - last <= 300:
                    last, n = t, n + 1
                else:
                    want.append((k, start, last, n))
                    start, last, n = t, t, 1
            want.append((k, start, last, n))
        assert got == sorted(want)
        assert stream.late_dropped() == 0

    def test_bridge_merges_open_sessions(self, ray_session):
        from ctinexus_ray.ops.streaming import SessionStream

        stream = SessionStream(gap_sec=1000, allowed_lateness_sec=10**9,
                               num_partitions=2)
        self._feed(stream, [(0, "u"), (4000, "u")])  # two open sessions
        self._feed(stream, [(2000, "u")])  # bridges BOTH (gaps 2000 each?)
        # 0 -> 2000 gap 2000 > 1000: does NOT bridge; 2000 -> 4000 same
        got = self._rows(stream.close())
        assert got == [("u", 0, 0, 1), ("u", 2000, 2000, 1),
                       ("u", 4000, 4000, 1)]

        stream2 = SessionStream(gap_sec=1000, allowed_lateness_sec=10**9,
                                num_partitions=2)
        self._feed(stream2, [(0, "u"), (1800, "u")])
        self._feed(stream2, [(900, "u")])  # within gap of both: ONE session
        assert self._rows(stream2.close()) == [("u", 0, 1800, 3)]

    def test_late_event_dropped_and_counted(self, ray_session):
        from ctinexus_ray.ops.streaming import SessionStream

        stream = SessionStream(gap_sec=10, allowed_lateness_sec=0,
                               num_partitions=2)
        self._feed(stream, [(0, "u"), (100, "u")])  # watermark 100: s1 final
        assert self._rows(stream.results()) == [("u", 0, 0, 1)]
        self._feed(stream, [(1, "u")])  # ts < watermark: late
        assert stream.late_dropped() == 1
        assert self._rows(stream.close()) == [
            ("u", 0, 0, 1), ("u", 100, 100, 1)
        ]

    def test_feed_after_close_rejected(self, ray_session):
        import pytest

        from ctinexus_ray.ops.streaming import SessionStream

        stream = SessionStream(gap_sec=10)
        stream.close()
        with pytest.raises(RuntimeError, match="closed"):
            self._feed(stream, [(1, "u")])


class TestHoppingWindows:
    def test_hopping_matches_batch_fanout(self, ray_session):
        rng = np.random.RandomState(4)
        ts = rng.randint(0, 500, 300).tolist()
        stream = WindowStream(window_sec=60, hop_sec=15,
                              allowed_lateness_sec=10**6, num_partitions=3)
        for i in range(0, len(ts), 30):
            stream.feed(_batch(ts[i : i + 30]))
        got = _rows(stream.close())
        want = Counter()
        for t in ts:
            base = (t // 15) * 15
            for k in range(4):
                want[base - k * 15] += 1
        assert got == sorted(want.items())
        assert stream.late_dropped() == 0

    def test_bad_hop_rejected(self, ray_session):
        import pytest

        with pytest.raises(ValueError, match="divide"):
            WindowStream(window_sec=60, hop_sec=25)


class TestJoinStream:
    @staticmethod
    def _tbl(keys, ts):
        return pa.Table.from_pydict(
            {
                "key": pa.array(keys, type=pa.string()),
                "ts": pa.array(ts, type=pa.int64()),
            }
        )

    @staticmethod
    def _brute(l_rows, r_rows, lo_us, hi_us):
        out = set()
        pairs = []
        for lk, lt in l_rows:
            for rk, rt in r_rows:
                if lk == rk and lt + lo_us <= rt <= lt + hi_us:
                    pairs.append((lk, lt, rt))
        return sorted(pairs)

    def test_full_lateness_equals_batch_join(self, ray_session):
        from ctinexus_ray.ops.streaming import JoinStream

        rng = np.random.RandomState(7)
        US = 1_000_000
        l_rows = [
            (f"k{rng.randint(4)}", int(rng.randint(0, 2000)) * US)
            for _ in range(60)
        ]
        r_rows = [
            (f"k{rng.randint(4)}", int(rng.randint(0, 2000)) * US)
            for _ in range(60)
        ]
        s = JoinStream(
            lower_sec=0, upper_sec=100, allowed_lateness_sec=1 << 30,
            num_partitions=3,
        )
        # shuffled arrival, uneven tick sizes, sides interleaved
        for i in range(0, 60, 7):
            s.feed(
                left=self._tbl(*zip(*l_rows[i : i + 7])),
                right=None if i % 2 else self._tbl(*zip(*r_rows[i : i + 7])),
            )
        for i in range(0, 60, 7):
            if i % 2:
                s.feed(right=self._tbl(*zip(*r_rows[i : i + 7])))
        got = sorted(
            (r["key"], r["l_ts"], r["r_ts"]) for r in s.close().take_all()
        )
        assert got == self._brute(l_rows, r_rows, 0, 100 * US)
        assert s.late_dropped() == 0

    def test_same_tick_pair_once(self, ray_session):
        from ctinexus_ray.ops.streaming import JoinStream

        s = JoinStream(lower_sec=0, upper_sec=10, num_partitions=2)
        s.feed(left=self._tbl(["a"], [5_000_000]),
               right=self._tbl(["a"], [7_000_000]))
        rows = s.close().take_all()
        assert len(rows) == 1
        assert rows[0]["l_ts"] == 5_000_000 and rows[0]["r_ts"] == 7_000_000

    def test_negative_lower_bound(self, ray_session):
        from ctinexus_ray.ops.streaming import JoinStream

        # right may precede left by up to 10s
        s = JoinStream(lower_sec=-10, upper_sec=0, num_partitions=1,
                       allowed_lateness_sec=1 << 30)
        s.feed(right=self._tbl(["a"], [3_000_000]))
        s.feed(left=self._tbl(["a"], [8_000_000]))
        rows = s.close().take_all()
        assert [(r["l_ts"], r["r_ts"]) for r in rows] == [(8_000_000, 3_000_000)]

    def test_late_rows_dropped_and_counted(self, ray_session):
        from ctinexus_ray.ops.streaming import JoinStream

        US = 1_000_000
        s = JoinStream(lower_sec=0, upper_sec=1, allowed_lateness_sec=0,
                       num_partitions=2)
        # both sides advance to t=1000s -> wm = 1000s
        s.feed(left=self._tbl(["a"], [1000 * US]),
               right=self._tbl(["a"], [1000 * US]))
        # a left row at t=10s is below the watermark: dropped, counted
        s.feed(left=self._tbl(["a"], [10 * US]))
        out = s.close().take_all()
        assert s.late_dropped() == 1
        assert all(r["l_ts"] != 10 * US for r in out)

    def test_state_bounded_by_horizon(self, ray_session):
        from ctinexus_ray.ops.streaming import JoinStream

        US = 1_000_000
        s = JoinStream(lower_sec=0, upper_sec=5, allowed_lateness_sec=5,
                       num_partitions=2)
        for t in range(0, 500, 10):
            s.feed(left=self._tbl(["a", "b"], [t * US, t * US]),
                   right=self._tbl(["a"], [t * US]))
        # horizon = span(5) + lateness(5) = 10s -> ~1 tick of rows per
        # side stays buffered, not the 150 fed
        assert s.state_rows() <= 12
        s.close()

    def test_hot_key_chunked_probe(self, ray_session):
        # one key holding a large buffer: the chunked probe, forced to
        # 1-row chunks on a LOCAL (non-actor) instance so the patch
        # provably applies, must emit the identical pair set
        import numpy as np

        from ctinexus_ray.ops.streaming import _JoinPartition

        cls = _JoinPartition.__ray_metadata__.modified_class
        US = 1_000_000
        n = 300
        l_rows = [("hot", t * US) for t in range(n)]
        r_rows = [("hot", (t + 50) * US) for t in range(n)]
        want = self._brute(l_rows, r_rows, 0, 100 * US)

        part = cls(0, 100 * US)
        part._PROBE_CELLS = 64  # instance override: ~1-row chunks
        out1 = part.ingest((self._tbl(*zip(*[(k, t) for k, t in r_rows])).slice(0, 0),
                            self._tbl(*zip(*r_rows))), "string")
        assert out1.num_rows == 0  # right arrives first: nothing to probe
        out2 = part.ingest(
            (self._tbl(*zip(*l_rows)), self._tbl(*zip(*l_rows)).slice(0, 0)),
            "string",
        )
        got = sorted(
            zip(
                out2.column("key").to_pylist(),
                out2.column("l_ts").to_pylist(),
                out2.column("r_ts").to_pylist(),
            )
        )
        assert got == want and len(got) > 10_000

    def test_buffered_row_below_watermark_still_matches(self, ray_session):
        # eviction (r.ts > wm + lo) is deliberately LAZIER than the
        # late-drop rule (arriving ts <= wm): with lo = -10 a right row
        # buffered at t=95 survives the watermark reaching 100 and must
        # still pair with a later left at t=101
        from ctinexus_ray.ops.streaming import JoinStream

        US = 1_000_000
        s = JoinStream(lower_sec=-10, upper_sec=0, allowed_lateness_sec=0,
                       num_partitions=1)
        s.feed(right=self._tbl(["a"], [95 * US]))
        # advance BOTH sides to t=100 -> wm = 100s; the t=95 right row
        # stays buffered (bound wm + lo = 90s)
        s.feed(left=self._tbl(["b"], [100 * US]),
               right=self._tbl(["b"], [100 * US]))
        s.feed(left=self._tbl(["a"], [101 * US]))
        rows = [
            (r["key"], r["l_ts"], r["r_ts"]) for r in s.close().take_all()
        ]
        assert ("a", 101 * US, 95 * US) in rows
        assert s.late_dropped() == 0
