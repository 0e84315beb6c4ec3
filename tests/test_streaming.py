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
