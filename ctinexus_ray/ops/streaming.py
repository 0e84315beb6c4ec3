"""Event-time windowed aggregation with watermarks — the
Dataflow/Flink-style STREAMING operator family (out-of-order arrival,
late-data policy, incremental finalization) that the batch Dataset API
cannot express: a Dataset pipeline sees a complete input, a stream
must decide when a window is DONE while data is still arriving.

Semantics (the standard model):

* tumbling event-time windows of ``window_sec`` over an int64
  microsecond timestamp column, optionally keyed;
* the watermark is ``max(event_time seen) - allowed_lateness``:
  everything at or before it is assumed to have arrived;
* a window FINALIZES (emits exactly once, immutable) when the
  watermark passes its end; rows arriving for an already-finalized
  window are DROPPED and counted (``late_dropped``) — never silently;
* ``close()`` finalizes every still-open window (end-of-stream).

Scale shape: raw Ray actors are justified here (the module docstring
rule from ops/graph.py — "keep this partition resident across
iterations" has no Dataset spelling). P partition actors each own the
open-window counts whose ``hash(window) % P`` lands there; a
micro-batch is ``ray.put`` once and a single split task routes
sub-tables to actors BY REFERENCE (each byte moves once, nothing
row-sized stays on the driver). The driver holds only the scalar
watermark and per-flush emitted-block refs; finalized output
re-assembles zero-copy via ``from_arrow_refs``. Open-state memory is
bounded by (#windows inside the lateness horizon) x (#keys), the
textbook watermark bound.

The reference system has no streaming (single-document tool); this is
the continuous-crawl monitoring shape next to ``jobs/stream_job.py``'s
ingestion loop.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

_US = 1_000_000


@ray.remote
class _WindowPartition:
    """Owns the open (window_start, key) -> count state for the windows
    hashing to this partition. Finalization returns an immutable Arrow
    block; late rows are counted, never silently dropped."""

    def __init__(self, keyed: bool, window_us: int):
        self.keyed = keyed
        self.window_us = window_us
        self.open: dict = {}
        # the watermark only advances, so "already finalized" is just
        # "window end <= the last flushed watermark" — tracking a set of
        # finalized window ids would grow without bound on an infinite
        # stream, the one thing a streaming operator must never do
        self.flushed_watermark = -(2**62)
        self.late = 0

    def ingest(self, tbl: pa.Table) -> None:
        ws = tbl.column("window_start").to_numpy(zero_copy_only=False)
        keys = (
            tbl.column("key").to_pylist() if self.keyed else [None] * len(ws)
        )
        for w, k in zip(ws, keys):
            w = int(w)
            if w + self.window_us <= self.flushed_watermark:
                self.late += 1
                continue
            cell = (w, k)
            self.open[cell] = self.open.get(cell, 0) + 1

    def flush(self, watermark_us: int) -> pa.Table:
        """Finalize every open window whose END is at or before the
        watermark; return the emitted rows."""
        self.flushed_watermark = max(self.flushed_watermark, watermark_us)
        done = [
            cell
            for cell in self.open
            if cell[0] + self.window_us <= self.flushed_watermark
        ]
        rows_w, rows_k, rows_n = [], [], []
        for cell in sorted(done):
            rows_w.append(cell[0])
            rows_k.append(cell[1])
            rows_n.append(self.open.pop(cell))
        cols = {"window_start": pa.array(rows_w, type=pa.int64())}
        if self.keyed:
            cols["key"] = pa.array(rows_k, type=pa.string())
        cols["n"] = pa.array(rows_n, type=pa.int64())
        return pa.Table.from_pydict(cols)

    def late_count(self) -> int:
        return self.late


@ray.remote
def _route(
    tbl_ref: pa.Table,
    ts_col: str,
    key_col,
    window_us: int,
    hop_us: int,
    p: int,
):
    """Map side: window-assign rows (fanning each event out to
    window/hop hopping windows when hop < window) and slice the batch
    into P sub-tables by hash(window) % P (one task per micro-batch;
    each byte moves driver -> here -> owning actor exactly once)."""
    tbl = tbl_ref
    ts = tbl.column(ts_col).to_numpy(zero_copy_only=False).astype(np.int64)
    n_k = window_us // hop_us
    base = (ts // hop_us) * hop_us
    ws = (
        base[:, None] - np.arange(n_k, dtype=np.int64) * hop_us
    ).ravel()
    cols = {"window_start": pa.array(ws, type=pa.int64())}
    if key_col is not None:
        keys = tbl.column(key_col).cast(pa.string())
        cols["key"] = keys.take(
            pa.array(np.repeat(np.arange(len(ts), dtype=np.int64), n_k))
        )
    assigned = pa.Table.from_pydict(cols)
    part = (ws // hop_us) % p
    out = []
    for j in range(p):
        mask = part == j
        out.append(
            assigned.filter(pa.array(mask)) if mask.any() else assigned.slice(0, 0)
        )
    return out


class WindowStream:
    """Driver-side handle for a watermarked tumbling-window count.

    ``feed(table)`` ingests one micro-batch (any arrival order);
    ``results()`` / ``close()`` return finalized rows as a Dataset of
    (window_start us, [key,] n). See module docstring for semantics.
    """

    def __init__(
        self,
        window_sec: int,
        allowed_lateness_sec: int = 0,
        ts_col: str = "ts_us",
        key_col: str | None = None,
        num_partitions: int = 4,
        hop_sec: int | None = None,
    ):
        if window_sec <= 0:
            raise ValueError("window_sec must be positive")
        hop_sec = window_sec if hop_sec is None else hop_sec
        if hop_sec <= 0 or window_sec % hop_sec:
            raise ValueError("hop_sec must divide window_sec")
        self.hop_us = hop_sec * _US
        self.window_us = window_sec * _US
        self.lateness_us = allowed_lateness_sec * _US
        self.ts_col = ts_col
        self.key_col = key_col
        self.p = num_partitions
        self.actors = [
            _WindowPartition.remote(key_col is not None, self.window_us)
            for _ in range(num_partitions)
        ]
        self.max_ts: int | None = None
        self.emitted: list = []
        self.closed = False

    def feed(self, table: pa.Table) -> None:
        if self.closed:
            raise RuntimeError("stream is closed")
        if table.num_rows == 0:
            return
        ts = table.column(self.ts_col)
        import pyarrow.compute as pc

        if ts.null_count:
            raise ValueError("NULL event times have no window")
        batch_max = int(pc.max(ts).as_py())
        # num_returns=p: each partition's slice is its own ObjectRef,
        # passed STRAIGHT to its owning actor — the batch never bounces
        # back through the driver (route worker -> actor is the only
        # post-route hop)
        parts = _route.options(num_returns=self.p).remote(
            ray.put(table), self.ts_col, self.key_col, self.window_us,
            self.hop_us, self.p,
        )
        if self.p == 1:
            parts = [parts]
        ray.get(
            [a.ingest.remote(t) for a, t in zip(self.actors, parts)]
        )
        self.max_ts = (
            batch_max if self.max_ts is None else max(self.max_ts, batch_max)
        )
        watermark = self.max_ts - self.lateness_us
        self.emitted.extend(
            a.flush.remote(watermark) for a in self.actors
        )

    def close(self):
        """Finalize every open window and return the full result."""
        if not self.closed:
            self.closed = True
            horizon = (2**62) if self.max_ts is None else self.max_ts
            self.emitted.extend(
                a.flush.remote(horizon + self.window_us + self.lateness_us)
                for a in self.actors
            )
        return self.results()

    def results(self):
        """Dataset over everything finalized so far — zero-copy block
        re-assembly straight from the actors' emitted refs; nothing
        row-sized touches the driver."""
        import ray.data

        if not self.emitted:
            cols = {"window_start": pa.array([], type=pa.int64())}
            if self.key_col is not None:
                cols["key"] = pa.array([], type=pa.string())
            cols["n"] = pa.array([], type=pa.int64())
            return ray.data.from_arrow(pa.Table.from_pydict(cols))
        return ray.data.from_arrow_refs(list(self.emitted))

    def late_dropped(self) -> int:
        """Rows that arrived after their window finalized (dropped,
        counted — the no-silent-loss rule)."""
        return sum(ray.get([a.late_count.remote() for a in self.actors]))


@ray.remote
class _SessionPartition:
    """Open gap-sessions for the keys hashing to this partition. A
    session is (start, last, n); an arriving event merges every open
    session it bridges (the Dataflow merging-window rule). Events
    earlier than the watermark at arrival are dropped and counted."""

    def __init__(self, gap_us: int):
        self.gap = gap_us
        self.open: dict = {}
        self.late = 0

    def ingest(self, tbl: pa.Table, watermark_us: int) -> None:
        ts_arr = tbl.column("ts_us").to_numpy(zero_copy_only=False)
        keys = tbl.column("key").to_pylist()
        for k, ts in zip(keys, ts_arr):
            ts = int(ts)
            if ts < watermark_us:
                self.late += 1
                continue
            sessions = self.open.setdefault(k, [])
            hit = [
                s
                for s in sessions
                if s[0] - self.gap <= ts <= s[1] + self.gap
            ]
            for s in hit:
                sessions.remove(s)
            start = min([ts] + [s[0] for s in hit])
            last = max([ts] + [s[1] for s in hit])
            n = 1 + sum(s[2] for s in hit)
            sessions.append([start, last, n])

    def flush(self, watermark_us: int) -> pa.Table:
        """Finalize sessions no future in-watermark event can extend:
        STRICTLY last + gap < watermark — an event AT the watermark is
        not late (late rule is ts < watermark) and an event exactly
        gap away still chains (the batch sessionize rule is
        diff > gap starts a new session), so the <= boundary would
        split one session in two."""
        out_k, out_s, out_l, out_n = [], [], [], []
        for k in sorted(self.open):
            keep = []
            for s in self.open[k]:
                if s[1] + self.gap < watermark_us:
                    out_k.append(k)
                    out_s.append(s[0])
                    out_l.append(s[1])
                    out_n.append(s[2])
                else:
                    keep.append(s)
            if keep:
                self.open[k] = keep
            else:
                del self.open[k]
        return pa.Table.from_pydict(
            {
                "key": pa.array(out_k, type=pa.string()),
                "session_start": pa.array(out_s, type=pa.int64()),
                "session_last": pa.array(out_l, type=pa.int64()),
                "n_events": pa.array(out_n, type=pa.int64()),
            }
        )

    def late_count(self) -> int:
        return self.late


@ray.remote
def _route_keyed(tbl: pa.Table, ts_col: str, key_col: str, p: int):
    """Slice one micro-batch into P sub-tables by hash(key) % P —
    sessions are per-key, so a key's whole history MUST land on one
    actor. The hash is the deterministic vectorized string hash
    (``ops.dedup.hash64_strings``), NOT Python ``hash``: route tasks
    run in arbitrary worker processes, and per-process string-hash
    randomization would scatter one key across actors."""
    from ctinexus_ray.ops.dedup import hash64_strings

    keys = tbl.column(key_col).cast(pa.string())
    if tbl.num_rows:
        h = (
            hash64_strings(keys.to_pylist()).astype(np.uint64)
            >> np.uint64(1)
        ).astype(np.int64)
    else:
        h = np.empty(0, dtype=np.int64)
    assigned = pa.Table.from_pydict(
        {"ts_us": tbl.column(ts_col).cast(pa.int64()), "key": keys}
    )
    part = h % p
    return [
        assigned.filter(pa.array(part == j)) if (part == j).any()
        else assigned.slice(0, 0)
        for j in range(p)
    ]


class SessionStream:
    """Watermarked GAP-SESSION windows per key (the merging-window
    sibling of ``WindowStream``): events closer than ``gap_sec`` chain
    into one session; a session finalizes once the watermark proves no
    in-order event can extend it. Emits (key, session_start,
    session_last, n_events), exactly once per session.

    Keys route by the deterministic ``hash64_strings`` (stable across
    worker processes, runs, and cluster sizes); NULL keys are not
    supported (a session of nobody is meaningless — cast or filter
    first).
    """

    def __init__(
        self,
        gap_sec: int,
        allowed_lateness_sec: int = 0,
        ts_col: str = "ts_us",
        key_col: str = "key",
        num_partitions: int = 4,
    ):
        if gap_sec <= 0:
            raise ValueError("gap_sec must be positive")
        self.gap_us = gap_sec * _US
        self.lateness_us = allowed_lateness_sec * _US
        self.ts_col = ts_col
        self.key_col = key_col
        self.p = num_partitions
        self.actors = [
            _SessionPartition.remote(self.gap_us) for _ in range(num_partitions)
        ]
        self.max_ts: int | None = None
        self.emitted: list = []
        self.closed = False

    def _watermark(self) -> int:
        if self.max_ts is None:
            return -(2**62)
        return self.max_ts - self.lateness_us

    def feed(self, table: pa.Table) -> None:
        if self.closed:
            raise RuntimeError("stream is closed")
        if table.num_rows == 0:
            return
        import pyarrow.compute as pc

        ts = table.column(self.ts_col)
        if ts.null_count:
            raise ValueError("NULL event times have no session")
        pre_watermark = self._watermark()
        # per-partition ObjectRefs straight to the actors (see
        # WindowStream.feed)
        parts = _route_keyed.options(num_returns=self.p).remote(
            ray.put(table), self.ts_col, self.key_col, self.p
        )
        if self.p == 1:
            parts = [parts]
        ray.get(
            [
                a.ingest.remote(t, pre_watermark)
                for a, t in zip(self.actors, parts)
            ]
        )
        batch_max = int(pc.max(ts).as_py())
        self.max_ts = (
            batch_max if self.max_ts is None else max(self.max_ts, batch_max)
        )
        self.emitted.extend(
            a.flush.remote(self._watermark()) for a in self.actors
        )

    def close(self):
        if not self.closed:
            self.closed = True
            horizon = (
                (2**62)
                if self.max_ts is None
                else self.max_ts + self.gap_us + self.lateness_us + 1
            )
            self.emitted.extend(a.flush.remote(horizon) for a in self.actors)
        return self.results()

    def results(self):
        import ray.data

        if not self.emitted:
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "key": pa.array([], type=pa.string()),
                        "session_start": pa.array([], type=pa.int64()),
                        "session_last": pa.array([], type=pa.int64()),
                        "n_events": pa.array([], type=pa.int64()),
                    }
                )
            )
        return ray.data.from_arrow_refs(list(self.emitted))

    def late_dropped(self) -> int:
        return sum(ray.get([a.late_count.remote() for a in self.actors]))


# ---------------------------------------------------------------------------
# watermarked stream-stream interval join
# ---------------------------------------------------------------------------


@ray.remote
class _JoinPartition:
    """Owns the left/right event buffers for the keys hashing to this
    partition. Matches emit EAGERLY on arrival of the later side (each
    pair exactly once); state is bounded by the lateness horizon via
    the watermark eviction guards (see JoinStream docstring)."""

    def __init__(self, lower_us: int, upper_us: int):
        self.lo = lower_us
        self.hi = upper_us
        self.buf_l: dict = {}  # key -> np.ndarray[int64] event times
        self.buf_r: dict = {}
        self.flushed_wm = -(2**62)
        self.late = 0

    @staticmethod
    def _group(tbl: pa.Table):
        keys = tbl.column("key").to_pylist()
        ts = tbl.column("ts").to_numpy(zero_copy_only=False).astype(np.int64)
        by_key: dict = {}
        for k, t in zip(keys, ts):
            by_key.setdefault(k, []).append(t)
        return {k: np.array(v, dtype=np.int64) for k, v in by_key.items()}

    _PROBE_CELLS = 1 << 20  # max boolean-matrix cells per chunk

    def _probe(self, arriving: dict, buf: dict, arriving_is_left: bool):
        """All (arriving x buffered-opposite) pairs inside the interval
        — a vectorized window test per key, CHUNKED over the arriving
        side so a hot key never allocates one giant m x n matrix (the
        pair OUTPUT is inherently m-x-n-sized when everything matches;
        the transient mask need not be)."""
        out_k, out_l, out_r = [], [], []
        for k, a_all in arriving.items():
            b_ts = buf.get(k)
            if b_ts is None or not len(b_ts):
                continue
            step = max(1, self._PROBE_CELLS // max(1, len(b_ts)))
            for s0 in range(0, len(a_all), step):
                a_ts = a_all[s0 : s0 + step]
                if arriving_is_left:  # match: r.ts in [l.ts+lo, l.ts+hi]
                    hit = (b_ts[None, :] >= a_ts[:, None] + self.lo) & (
                        b_ts[None, :] <= a_ts[:, None] + self.hi
                    )
                    li, ri = np.nonzero(hit)
                    out_l.extend(a_ts[li].tolist())
                    out_r.extend(b_ts[ri].tolist())
                else:  # arriving right: l.ts in [r.ts-hi, r.ts-lo]
                    hit = (b_ts[None, :] + self.lo <= a_ts[:, None]) & (
                        b_ts[None, :] + self.hi >= a_ts[:, None]
                    )
                    ri, li = np.nonzero(hit)
                    out_l.extend(b_ts[li].tolist())
                    out_r.extend(a_ts[ri].tolist())
                out_k.extend([k] * len(li))
        return out_k, out_l, out_r

    @staticmethod
    def _drop_late(groups: dict, wm: int):
        kept, n_late = {}, 0
        for k, ts in groups.items():
            ok = ts > wm
            n_late += int((~ok).sum())
            if ok.any():
                kept[k] = ts[ok]
        return kept, n_late

    @staticmethod
    def _append(buf: dict, groups: dict):
        for k, ts in groups.items():
            prev = buf.get(k)
            buf[k] = ts if prev is None else np.concatenate([prev, ts])

    def ingest(self, pair, key_type: str):
        """One micro-batch for each side (either may be empty — the
        route task ships one (left, right) sub-table pair per
        partition). Returns the pairs emitted by this tick as
        (key, l_ts, r_ts)."""
        l_tbl, r_tbl = pair
        l_new = self._group(l_tbl) if l_tbl.num_rows else {}
        r_new = self._group(r_tbl) if r_tbl.num_rows else {}
        # the completeness rule: ts <= flushed watermark means some of
        # the row's matches may already be evicted -> drop + count
        l_new, n1 = self._drop_late(l_new, self.flushed_wm)
        r_new, n2 = self._drop_late(r_new, self.flushed_wm)
        self.late += n1 + n2
        # (L_new x R_old) BEFORE this tick's R lands, then append L,
        # then (L_any x R_new) — every pair exactly once, incl. both-
        # sides-same-tick pairs (emitted by the second probe)
        k1, l1, r1 = self._probe(l_new, self.buf_r, True)
        self._append(self.buf_l, l_new)
        k2, l2, r2 = self._probe(r_new, self.buf_l, False)
        self._append(self.buf_r, r_new)
        return pa.Table.from_pydict(
            {
                "key": pa.array(k1 + k2, type=getattr(pa, key_type)()),
                "l_ts": pa.array(l1 + l2, type=pa.int64()),
                "r_ts": pa.array(r1 + r2, type=pa.int64()),
            }
        )

    def evict(self, watermark_us: int) -> None:
        """Drop state no FUTURE non-late row can match: a non-late left
        arrival has l.ts > wm so its matches satisfy r.ts > wm + lo;
        a non-late right arrival has r.ts > wm so its matches satisfy
        l.ts > wm - hi. Anything at or below those bounds is dead."""
        self.flushed_wm = max(self.flushed_wm, watermark_us)
        wm = self.flushed_wm
        for buf, bound in ((self.buf_l, wm - self.hi), (self.buf_r, wm + self.lo)):
            dead = []
            for k, ts in buf.items():
                keep = ts > bound
                if keep.all():
                    continue
                if keep.any():
                    buf[k] = ts[keep]
                else:
                    dead.append(k)
            for k in dead:
                del buf[k]

    def state_rows(self) -> int:
        return sum(len(v) for v in self.buf_l.values()) + sum(
            len(v) for v in self.buf_r.values()
        )

    def late_count(self) -> int:
        return self.late


@ray.remote
def _route_join(l_tbl: pa.Table, r_tbl: pa.Table, p: int):
    """Slice both sides' micro-batches into P (left, right) sub-table
    pairs by the SAME content hash of the key — co-locating each key's
    two streams on one partition actor."""
    from ctinexus_ray.ops.dedup import hash64_strings

    out = []
    parts = {}
    for side, tbl in (("l", l_tbl), ("r", r_tbl)):
        if tbl.num_rows:
            keys = [str(k) for k in tbl.column("key").to_pylist()]
            parts[side] = (
                hash64_strings(keys) % np.uint64(p)
            ).astype(np.int64)
    for j in range(p):
        pair = []
        for side, tbl in (("l", l_tbl), ("r", r_tbl)):
            if tbl.num_rows:
                mask = parts[side] == j
                pair.append(
                    tbl.filter(pa.array(mask)) if mask.any() else tbl.slice(0, 0)
                )
            else:
                pair.append(tbl)
        out.append(tuple(pair))
    # num_returns=1 means "one value", not "a 1-list of values"
    return out[0] if p == 1 else out


class JoinStream:
    """Watermarked stream-stream INTERVAL JOIN (the Flink/Dataflow
    two-input shape): left row l matches right row r of the same key
    when ``r.ts in [l.ts + lower_sec, l.ts + upper_sec]``; pairs emit
    exactly once, on arrival of the later side.

    Dataflow semantics, mirrored from WindowStream:

      * each side's watermark is ``max(event ts seen) - lateness``; the
        JOIN watermark is the MIN over the two sides (a pair is only
        provably complete when BOTH inputs have passed it);
      * arriving rows at or below the flushed watermark are DROPPED and
        counted (``late_dropped``) — their match set may already be
        evicted, so emitting a partial pair list would make the output
        arrival-order-dependent;
      * buffered state is evicted once no future non-late arrival can
        match it (left: ``l.ts + upper <= wm``; right:
        ``r.ts <= wm + lower``) — state is bounded by key-rate x
        (interval span + lateness horizon), the textbook bound.

    With lateness covering the replay disorder nothing drops and the
    result equals the batch band join — the exact-SQL anchor
    (``streaming_join``); finite-lateness drop/evict semantics are
    pinned in tests/test_streaming.py. Emits (key, l_ts, r_ts); join
    payloads back by (key, ts) if needed — buffering timestamps only
    keeps the actor state minimal."""

    def __init__(
        self,
        lower_sec: int,
        upper_sec: int,
        allowed_lateness_sec: int = 0,
        num_partitions: int = 4,
        key_type: str = "string",
    ):
        if upper_sec < lower_sec:
            raise ValueError("upper_sec must be >= lower_sec")
        self.lo_us = lower_sec * _US
        self.hi_us = upper_sec * _US
        self.lateness_us = allowed_lateness_sec * _US
        self.p = num_partitions
        self.key_type = key_type
        self.actors = [
            _JoinPartition.remote(self.lo_us, self.hi_us)
            for _ in range(num_partitions)
        ]
        self.max_l: int | None = None
        self.max_r: int | None = None
        self.emitted: list = []
        self.closed = False

    def _empty(self) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "key": pa.array([], type=getattr(pa, self.key_type)()),
                "ts": pa.array([], type=pa.int64()),
            }
        )

    def feed(self, left: pa.Table | None = None, right: pa.Table | None = None):
        """Ingest one micro-batch per side — (key, ts us) tables, any
        arrival order. Advances the join watermark and evicts."""
        import pyarrow.compute as pc

        if self.closed:
            raise RuntimeError("stream is closed")
        left = self._empty() if left is None or not left.num_rows else left
        right = self._empty() if right is None or not right.num_rows else right
        if left.num_rows == 0 and right.num_rows == 0:
            return
        for tbl in (left, right):
            if tbl.num_rows and tbl.column("ts").null_count:
                raise ValueError("NULL event times have no interval")
        parts = _route_join.options(num_returns=self.p).remote(
            left, right, self.p
        )
        if self.p == 1:
            parts = [parts]
        self.emitted.extend(
            a.ingest.remote(pair_ref, self.key_type)
            for a, pair_ref in zip(self.actors, parts)
        )
        if left.num_rows:
            m = int(pc.max(left.column("ts")).as_py())
            self.max_l = m if self.max_l is None else max(self.max_l, m)
        if right.num_rows:
            m = int(pc.max(right.column("ts")).as_py())
            self.max_r = m if self.max_r is None else max(self.max_r, m)
        if self.max_l is not None and self.max_r is not None:
            wm = min(self.max_l, self.max_r) - self.lateness_us
            ray.get([a.evict.remote(wm) for a in self.actors])

    def close(self):
        self.closed = True
        return self.results()

    def results(self):
        import ray.data

        if not self.emitted:
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "key": pa.array([], type=getattr(pa, self.key_type)()),
                        "l_ts": pa.array([], type=pa.int64()),
                        "r_ts": pa.array([], type=pa.int64()),
                    }
                )
            )
        return ray.data.from_arrow_refs(list(self.emitted))

    def state_rows(self) -> int:
        """Buffered rows across partitions (the bounded-state probe)."""
        return sum(ray.get([a.state_rows.remote() for a in self.actors]))

    def late_dropped(self) -> int:
        return sum(ray.get([a.late_count.remote() for a in self.actors]))
