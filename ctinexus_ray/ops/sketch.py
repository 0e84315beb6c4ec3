"""Mergeable streaming sketches: HyperLogLog distinct counting and
Misra-Gries heavy hitters.

At 10^12 docs an exact COUNT(DISTINCT) over a corpus-cardinality column
is a full shuffle of every distinct value; a sketch replaces it with a
fixed-size state that (a) each batch updates locally, (b) merges
associatively across blocks, and (c) the driver finalizes from ONE small
object. Both sketches here follow that shape as Ray Data aggregations:
``map_batches`` emits one serialized partial per batch, and a tiny final
reduce merges the partials (the merge input is O(num_batches) rows of
fixed-size state, never corpus-sized).

HyperLogLog: standard 2^p-register estimator (Flajolet et al. 2007)
with the usual small-range linear-counting correction; hashes come from
the engine's splitmix64-based ``hash64_strings``, so results are
deterministic across runs and partitionings (register maxima are
order-independent).

Misra-Gries: k-counter summary; merged partials keep the classic
guarantee (any value with true frequency > N/k survives), so it is the
scale path for "top words" when the exact hash-partitioned count
(``word_freq_top100``) would shuffle the whole vocabulary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ctinexus_ray.ops.dedup import hash64_strings


def _hll_partial(values, p: int) -> np.ndarray:
    """Update-from-batch: 2^p uint8 registers from a string array."""
    m = 1 << p
    regs = np.zeros(m, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = hash64_strings(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = h << np.uint64(p)  # remaining 64-p bits, left-aligned
    # vectorized count-leading-zeros: binary search for the highest set
    # bit in 6 all-numpy passes (float64 exponent tricks are unsafe at
    # 64-bit precision)
    cur = rest.copy()
    nonzero = cur != 0
    lzv = np.zeros(len(h), dtype=np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        top_is_zero = (cur >> np.uint64(64 - s)) == 0
        both = nonzero & top_is_zero
        lzv[both] += s
        cur[both] = cur[both] << np.uint64(s)
    lz = np.where(nonzero, lzv, 64 - p)
    rank = np.minimum(lz + 1, 64 - p + 1)
    np.maximum.at(regs, idx, rank.astype(np.uint8))
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Finalize: bias-corrected harmonic mean + linear counting."""
    m = regs.size
    alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1 + 1.079 / m))
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = int(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)  # linear counting for small ranges
    return float(est)


def hll_distinct(
    ds: ray.data.Dataset, column: str, p: int = 14
) -> ray.data.Dataset:
    """Approximate COUNT(DISTINCT column) via HyperLogLog (2^p registers,
    standard error ~ 1.04/sqrt(2^p) ≈ 0.8% at p=14). Returns ONE row
    (approx_distinct: int64). Each batch contributes one fixed-size
    register partial; the final merge is an elementwise max over
    O(num_batches) partials — nothing corpus-sized moves or lands on the
    driver."""
    m = 1 << p

    def partial(batch: pa.Table):
        regs = _hll_partial(batch.column(column), p)
        yield pa.Table.from_pydict({"regs": pa.array([regs.tobytes()], type=pa.binary())})

    partials = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow"
    )
    # a zero-register seed guarantees one output row even when the input
    # is empty (map UDFs never run on empty datasets)
    seed = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"regs": pa.array([np.zeros(m, dtype=np.uint8).tobytes()], type=pa.binary())}
        )
    )
    partials = partials.union(seed)

    def merge(batch: pa.Table):
        acc = np.zeros(m, dtype=np.uint8)
        for buf in batch.column("regs").to_pylist():
            acc = np.maximum(acc, np.frombuffer(buf, dtype=np.uint8))
        yield pa.Table.from_pydict({"regs": pa.array([acc.tobytes()], type=pa.binary())})

    # two-level merge keeps every task's input small even with millions
    # of partials (each partial is 2^p bytes)
    merged = partials.repartition(8).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    ).repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=None)

    def finalize(batch: pa.Table):
        regs = np.frombuffer(batch.column("regs")[0].as_py(), dtype=np.uint8)
        yield pa.Table.from_pydict(
            {"approx_distinct": pa.array([int(round(_hll_estimate(regs)))], type=pa.int64())}
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def misra_gries_topk(
    ds: ray.data.Dataset,
    column: str,
    k: int = 1024,
    top: int = 100,
    weight: str | None = None,
) -> ray.data.Dataset:
    """Approximate heavy hitters: per-batch Misra-Gries summaries of k
    counters, merged pairwise (counter-wise sum, then decrement-compact
    back to k). Any value with true frequency > N/k is guaranteed to
    survive; counts are underestimates within N/k. Returns the ``top``
    rows by (approx count desc, value asc).

    ``weight`` names an optional int count column so pre-combined
    (value, n) partials — e.g. ``word_explode_batch`` output — feed the
    sketch with WEIGHTED inserts instead of re-exploding to raw
    occurrences (same summary the raw stream would produce batch-wise:
    MG compaction is insensitive to how equal values arrive).

    This is the sketch-path replacement for an exact all-vocabulary
    shuffle when only the head of the distribution matters."""

    def summarize(batch: pa.Table):
        from collections import Counter

        if weight is not None:
            c: Counter = Counter()
            for v, n in zip(
                batch.column(column).to_pylist(),
                batch.column(weight).to_pylist(),
            ):
                c[v] += n
        else:
            c = Counter(batch.column(column).to_pylist())
        if len(c) > k:
            kth = sorted(c.values(), reverse=True)[k - 1]
            # decrement by the k-th largest count (MG batch compaction)
            c = Counter({v: n - kth for v, n in c.items() if n > kth})
        if not c:
            return
        vals = list(c.keys())
        yield pa.Table.from_pydict(
            {
                "value": pa.array(vals, type=pa.string()),
                "n": pa.array([c[v] for v in vals], type=pa.int64()),
            }
        )

    def merge(batch: pa.Table):
        from collections import Counter

        c: Counter = Counter()
        for v, n in zip(
            batch.column("value").to_pylist(), batch.column("n").to_pylist()
        ):
            c[v] += n
        if len(c) > k:
            kth = sorted(c.values(), reverse=True)[k - 1]
            c = Counter({v: n - kth for v, n in c.items() if n > kth})
        if not c:
            return
        vals = list(c.keys())
        yield pa.Table.from_pydict(
            {
                "value": pa.array(vals, type=pa.string()),
                "n": pa.array([c[v] for v in vals], type=pa.int64()),
            }
        )

    cols = [column] + ([weight] if weight is not None else [])
    partials = ds.select_columns(cols).map_batches(
        summarize, batch_format="pyarrow"
    )
    merged = partials.repartition(8).map_batches(
        merge, batch_format="pyarrow", batch_size=None
    ).repartition(1).map_batches(merge, batch_format="pyarrow", batch_size=None)
    return merged.sort(["n", "value"], descending=[True, False]).limit(top)


def _bloom_positions(values, m_bits: int, k: int) -> np.ndarray:
    """(n, k) bit positions via double hashing: h1 + i*h2 mod m
    (Kirsch-Mitzenmacher — two vectorized hashes give k independent-enough
    probes). Deterministic across runs/workers."""
    from ctinexus_ray.ops.dedup import _splitmix64, hash64_strings

    h1 = hash64_strings(values)
    h2 = _splitmix64(h1 ^ np.uint64(0xA076_1D64_78BD_642F)) | np.uint64(1)
    i = np.arange(k, dtype=np.uint64)[None, :]
    with np.errstate(over="ignore"):
        pos = (h1[:, None] + i * h2[:, None]) % np.uint64(m_bits)
    return pos.astype(np.int64)


def bloom_build(
    ds: ray.data.Dataset, column: str, m_bits: int = 1 << 23, k: int = 4
) -> bytes:
    """Build a Bloom filter over a key column — the mergeable membership
    sketch for incremental-ingestion dedup when the exact fingerprint
    index is too big to join against cheaply (m_bits=2^23 = 1 MiB
    packed; size m ≈ 1.44 * n * log2(1/fp) for target fp rate).

    Each batch contributes one fixed-size packed-bitmap partial
    (``np.bitwise_or`` merge, same two-level tree as the HLL registers);
    nothing corpus-sized moves or lands on the driver — the final
    bitmap IS sketch-sized by definition. Returns the packed bitmap
    bytes (m_bits/8)."""
    n_bytes = m_bits // 8

    def partial(batch: pa.Table):
        pos = _bloom_positions(batch.column(column), m_bits, k).ravel()
        bits = np.zeros(n_bytes, dtype=np.uint8)
        np.bitwise_or.at(bits, pos >> 3, np.uint8(1) << (pos & 7).astype(np.uint8))
        yield pa.Table.from_pydict(
            {"bits": pa.array([bits.tobytes()], type=pa.binary())}
        )

    partials = ds.select_columns([column]).map_batches(
        partial, batch_format="pyarrow"
    )
    seed = ray.data.from_arrow(
        pa.Table.from_pydict(
            {"bits": pa.array([bytes(n_bytes)], type=pa.binary())}
        )
    )

    def merge(batch: pa.Table):
        acc = np.zeros(n_bytes, dtype=np.uint8)
        for buf in batch.column("bits").to_pylist():
            acc |= np.frombuffer(buf, dtype=np.uint8)
        yield pa.Table.from_pydict(
            {"bits": pa.array([acc.tobytes()], type=pa.binary())}
        )

    merged = (
        partials.union(seed)
        .repartition(8)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
    return merged.take_all()[0]["bits"]


def bloom_filter_new(
    ds: ray.data.Dataset,
    column: str,
    bloom_bits: bytes,
    m_bits: int = 1 << 23,
    k: int = 4,
) -> ray.data.Dataset:
    """Keep only the rows whose key is DEFINITELY NOT in the Bloom
    filter (all-bits-set rows are dropped: possibly-present, with the
    filter's false-positive rate — a Bloom filter never false-negatives,
    so every kept row is genuinely new). Broadcast the 1 MiB bitmap once
    via ``ray.put``; the corpus streams through a stateless vectorized
    membership test — no shuffle, no join. The exact-join sibling is
    ``hash_join how="left_anti"`` (query ``dedup_incremental``); this is
    the constant-memory fast path for when the known-corpus index has
    10^12 keys."""
    bits_ref = ray.put(np.frombuffer(bloom_bits, dtype=np.uint8))

    class Keep:
        def __init__(self, bits_ref):
            self.bits = ray.get(bits_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            pos = _bloom_positions(batch.column(column), m_bits, k)
            probed = (
                self.bits[pos >> 3] >> (pos & 7).astype(np.uint8)
            ) & np.uint8(1)
            maybe_present = probed.all(axis=1)
            return batch.filter(pa.array(~maybe_present))

    return ds.map_batches(
        Keep,
        fn_constructor_kwargs={"bits_ref": bits_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def _tdigest_compress(
    means: np.ndarray, weights: np.ndarray, delta: float
) -> tuple[np.ndarray, np.ndarray]:
    """One merging-t-digest compression pass (Dunning & Ertl): input
    centroids sorted by mean; greedily merge neighbours while the merged
    centroid's weight stays under the k0-style bound
    ``4 * N * q(1-q) / delta`` at its quantile position q — small near
    the tails (accurate extremes), large in the middle."""
    total = float(weights.sum())
    out_m: list[float] = []
    out_w: list[float] = []
    cur_m, cur_w = float(means[0]), float(weights[0])
    w_before = 0.0
    for m, w in zip(means[1:], weights[1:]):
        q = (w_before + cur_w / 2.0) / total
        limit = 4.0 * total * q * (1.0 - q) / delta
        if cur_w + w <= limit:
            cur_m = (cur_m * cur_w + float(m) * float(w)) / (cur_w + w)
            cur_w += float(w)
        else:
            out_m.append(cur_m)
            out_w.append(cur_w)
            w_before += cur_w
            cur_m, cur_w = float(m), float(w)
    out_m.append(cur_m)
    out_w.append(cur_w)
    return np.array(out_m), np.array(out_w)


def tdigest_quantiles(
    ds: ray.data.Dataset,
    column: str,
    quantiles: list[float],
    delta: float = 200.0,
) -> ray.data.Dataset:
    """Approximate quantiles of an UNBOUNDED-domain numeric column via a
    mergeable t-digest — the scale path where the exact value-domain
    histogram (``int_column_quantiles``) does not apply (continuous
    scores, latencies, losses). Relative accuracy is best at the tails
    (the merge bound shrinks like q(1-q)), typically <1% of rank at
    delta=200.

    Same two-level mergeable-sketch tree as HLL/Bloom: every batch sorts
    its values and compresses to <=delta centroids (one small (mean,
    weight) table per batch — the ONLY thing that moves), partials merge
    by sorted-mean compression in a small fan-in, and the driver holds
    one final digest of <=delta centroids. Nothing corpus-sized
    anywhere. Output: (q, value) rows with linear interpolation between
    centroid means."""

    def partial(batch: pa.Table):
        vals = np.asarray(
            batch.column(column).cast(pa.float64()).to_numpy(
                zero_copy_only=False
            ),
            dtype=np.float64,
        )
        vals = vals[~np.isnan(vals)]
        if not len(vals):
            yield pa.Table.from_pydict(
                {
                    "mean": pa.array([], type=pa.float64()),
                    "weight": pa.array([], type=pa.float64()),
                }
            )
            return
        vals.sort(kind="mergesort")
        m, w = _tdigest_compress(vals, np.ones_like(vals), delta)
        yield pa.Table.from_pydict(
            {
                "mean": pa.array(m, type=pa.float64()),
                "weight": pa.array(w, type=pa.float64()),
            }
        )

    def merge(batch: pa.Table):
        m = np.asarray(batch.column("mean").to_numpy(zero_copy_only=False))
        w = np.asarray(batch.column("weight").to_numpy(zero_copy_only=False))
        if not len(m):
            yield pa.Table.from_pydict(
                {
                    "mean": pa.array([], type=pa.float64()),
                    "weight": pa.array([], type=pa.float64()),
                }
            )
            return
        order = np.argsort(m, kind="mergesort")
        m2, w2 = _tdigest_compress(m[order], w[order], delta)
        yield pa.Table.from_pydict(
            {
                "mean": pa.array(m2, type=pa.float64()),
                "weight": pa.array(w2, type=pa.float64()),
            }
        )

    digest = (
        ds.select_columns([column])
        .map_batches(partial, batch_format="pyarrow")
        .repartition(8)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    ).take_all()
    means = np.array([r["mean"] for r in digest])
    weights = np.array([r["weight"] for r in digest])
    out_q, out_v = [], []
    if len(means):
        cum = np.cumsum(weights) - weights / 2.0  # centroid midpoints
        total = float(weights.sum())
        for q in quantiles:
            target = q * total
            v = float(np.interp(target, cum, means))
            out_q.append(float(q))
            out_v.append(v)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "q": pa.array(out_q, type=pa.float64()),
                "value": pa.array(out_v, type=pa.float64()),
            }
        )
    )


# ---------------------------------------------------------------------------
# Count-Min sketch
# ---------------------------------------------------------------------------

_CMS_SEED = np.uint64(0xC31B0C55)


def _cms_seeds(depth: int) -> np.ndarray:
    from ctinexus_ray.ops.dedup import _splitmix64

    return _splitmix64(np.arange(depth, dtype=np.uint64) + _CMS_SEED)


def _cms_indices(values, width: int, depth: int) -> np.ndarray:
    """(depth, n) column indices for a sequence/arrow array of strings."""
    from ctinexus_ray.ops.dedup import _splitmix64

    h = hash64_strings(values)
    seeds = _cms_seeds(depth)
    return np.stack(
        [
            (_splitmix64(h ^ seeds[d]) % np.uint64(width)).astype(np.int64)
            for d in range(depth)
        ]
    )


def count_min_estimates(
    ds: ray.data.Dataset,
    column: str,
    probe_values: list[str],
    width: int = 4096,
    depth: int = 4,
    weight: str | None = None,
) -> ray.data.Dataset:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) frequency estimates
    for a bounded list of probe values.

    Same mergeable-partial shape as ``hll_distinct``: each batch emits one
    fixed-size (depth x width) int64 counter partial; the merge is an
    elementwise SUM over O(num_batches) partials, so nothing corpus-sized
    moves or lands on the driver. Estimates (min across the depth rows)
    are never below the true count and exceed it by at most
    e/width * N with probability 1 - exp(-depth) — the sketch path for
    point-frequency queries when the exact answer would shuffle the whole
    vocabulary.

    ``weight`` names an optional int count column so pre-combined
    (value, n) partials — e.g. ``word_explode_batch`` output — feed the
    sketch without re-exploding to raw occurrences.

    Returns one (value:string, n_est:int64) row per probe, sorted by
    value. Approximate by design -> rows-only in the driver contract;
    accuracy is pinned against exact counts in tests/test_sketch.py.
    """
    cols = [column] + ([weight] if weight else [])

    def partial(batch: pa.Table):
        idx = _cms_indices(batch.column(column), width, depth)
        if weight:
            wcol = batch.column(weight)
            if wcol.null_count:
                raise ValueError(
                    f"count_min_estimates: weight column {weight!r} "
                    "contains NULLs; fill or filter them upstream"
                )
            w = wcol.to_numpy(zero_copy_only=False).astype(np.int64)
            if (w < 0).any():
                # a negative weight would silently break the sketch's
                # never-underestimates guarantee (np.add.at subtracts)
                raise ValueError(
                    f"count_min_estimates: weight column {weight!r} "
                    "contains negative values"
                )
        else:
            w = np.ones(batch.num_rows, dtype=np.int64)
        mat = np.zeros((depth, width), dtype=np.int64)
        for d in range(depth):
            np.add.at(mat[d], idx[d], w)
        yield pa.Table.from_pydict(
            {"counts": pa.array([mat.tobytes()], type=pa.binary())}
        )

    partials = ds.select_columns(cols).map_batches(
        partial, batch_format="pyarrow"
    )
    # zero seed partial: guarantees one output row on an empty dataset
    seed = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "counts": pa.array(
                    [np.zeros((depth, width), dtype=np.int64).tobytes()],
                    type=pa.binary(),
                )
            }
        )
    )
    partials = partials.union(seed)

    def merge(batch: pa.Table):
        acc = np.zeros(depth * width, dtype=np.int64)
        for buf in batch.column("counts").to_pylist():
            acc += np.frombuffer(buf, dtype=np.int64)
        yield pa.Table.from_pydict(
            {"counts": pa.array([acc.tobytes()], type=pa.binary())}
        )

    merged = (
        partials.repartition(8)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )
    probes = sorted(probe_values)

    def finalize(batch: pa.Table):
        mat = np.frombuffer(
            batch.column("counts")[0].as_py(), dtype=np.int64
        ).reshape(depth, width)
        if probes:
            idx = _cms_indices(probes, width, depth)
            ests = mat[0, idx[0]]
            for d in range(1, depth):
                ests = np.minimum(ests, mat[d, idx[d]])
        else:
            ests = np.zeros(0, dtype=np.int64)
        yield pa.Table.from_pydict(
            {
                "value": pa.array(probes, type=pa.string()),
                "n_est": pa.array(ests, type=pa.int64()),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped HyperLogLog
# ---------------------------------------------------------------------------


def grouped_hll_distinct(
    ds: ray.data.Dataset, key: str, column: str, p: int = 12
) -> ray.data.Dataset:
    """Per-group approximate COUNT(DISTINCT column) — one HLL register set
    per key, map-side combined: each batch emits ONE (key, registers)
    partial per key it contains, so the shuffle moves
    O(num_batches x keys_per_batch) fixed-size rows instead of every
    distinct (key, value) pair. The reduce is a register-wise max per key.

    The scale shape for "distinct users per dimension" when the exact
    answer would shuffle the full (key, value) distinct set. Approximate
    by design -> rows-only; anchored against the exact distributed
    distinct in tests and by the ``distinct_users_by_type`` ✓SQL query.

    Returns (``key``, approx_distinct:int64). Group cardinality must be
    modest per batch (registers are 2^p bytes per group per batch); for
    corpus-cardinality keys, pre-partition by key hash first so each
    batch holds few groups.
    """

    def partial(batch: pa.Table):
        import pandas as pd

        keys = batch.column(key).to_pylist()
        vals = batch.column(column)
        if not (
            pa.types.is_string(vals.type) or pa.types.is_large_string(vals.type)
        ):
            vals = vals.cast(pa.string())  # hash as decimal text
        # factorize keeps the NULL group (SQL GROUP BY semantics —
        # np.unique would raise on a None key); dtype=object prevents
        # pandas coercing int64 keys to float64 when a null is present
        # (floats above 2^53 would silently merge distinct keys)
        inverse, uniq = pd.factorize(
            pd.Series(keys, dtype=object), use_na_sentinel=False
        )
        out_k, out_r = [], []
        for gi, kv in enumerate(uniq):
            rows = np.nonzero(inverse == gi)[0]
            regs = _hll_partial(vals.take(pa.array(rows)), p)
            out_k.append(None if pd.isna(kv) else kv)
            out_r.append(regs.tobytes())
        yield pa.Table.from_pydict(
            {key: pa.array(out_k), "regs": pa.array(out_r, type=pa.binary())}
        )

    partials = ds.select_columns([key, column]).map_batches(
        partial, batch_format="pyarrow"
    )
    m = 1 << p

    def merge_group(g) -> "pa.Table":
        import pandas as pd

        acc = np.zeros(m, dtype=np.uint8)
        for buf in g["regs"]:
            acc = np.maximum(acc, np.frombuffer(buf, dtype=np.uint8))
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]],
                "approx_distinct": pd.array(
                    [int(round(_hll_estimate(acc)))], dtype="int64"
                ),
            }
        )

    return partials.groupby(key).map_groups(merge_group, batch_format="pandas")


def grouped_tdigest_quantiles(
    ds: ray.data.Dataset,
    key: str,
    column: str,
    quantiles: list[float],
    delta: float = 200.0,
) -> ray.data.Dataset:
    """Per-group approximate quantiles via one mergeable t-digest per key
    — the grouped sibling of ``tdigest_quantiles`` for unbounded numeric
    domains (per-domain latency/score/length distributions at corpus
    scale).

    Map side: each batch sorts per group and emits <=delta (key, mean,
    weight) centroid rows per group it contains — fixed-size partials,
    map-side combined. Reduce: ``groupby(key)`` merges each key's
    centroids by sorted-mean compression and interpolates the requested
    quantiles. Group count is assumed >> partials per group, so the
    shuffle moves O(batches x groups_per_batch x delta) small rows, never
    the corpus values.

    Output: (``key``, q:float64, value:float64) rows. Approximate by
    design -> rows-only; accuracy pinned vs exact grouped quantiles in
    tests."""

    def partial(batch: pa.Table):
        import pandas as pd

        df = pd.DataFrame(
            {
                "k": batch.column(key).to_pylist(),
                "v": np.asarray(
                    batch.column(column).cast(pa.float64()).to_numpy(
                        zero_copy_only=False
                    ),
                    dtype=np.float64,
                ),
            }
        )
        df = df[~df["v"].isna()]
        out_k, out_m, out_w = [], [], []
        # dropna=False: SQL GROUP BY keeps the NULL group (same invariant
        # as partitioned_agg / grouped_hll_distinct)
        for kv, sub in df.groupby("k", sort=False, dropna=False):
            vals = np.sort(sub["v"].to_numpy(), kind="mergesort")
            m, w = _tdigest_compress(vals, np.ones_like(vals), delta)
            out_k.extend([None if pd.isna(kv) else kv] * len(m))
            out_m.extend(m)
            out_w.extend(w)
        if not out_k:
            return
        yield pa.Table.from_pydict(
            {
                key: pa.array(out_k),
                "mean": pa.array(out_m, type=pa.float64()),
                "weight": pa.array(out_w, type=pa.float64()),
            }
        )

    partials = ds.select_columns([key, column]).map_batches(
        partial, batch_format="pyarrow"
    )

    def merge_group(g) -> "pd.DataFrame":
        import pandas as pd

        m = g["mean"].to_numpy(dtype=np.float64)
        w = g["weight"].to_numpy(dtype=np.float64)
        order = np.argsort(m, kind="mergesort")
        m2, w2 = _tdigest_compress(m[order], w[order], delta)
        cum = np.cumsum(w2) - w2 / 2.0
        total = float(w2.sum())
        vals = [float(np.interp(q * total, cum, m2)) for q in quantiles]
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]] * len(quantiles),
                "q": pd.array([float(q) for q in quantiles], dtype="float64"),
                "value": pd.array(vals, dtype="float64"),
            }
        )

    return partials.groupby(key).map_groups(merge_group, batch_format="pandas")


def grouped_misra_gries_topk(
    ds: ray.data.Dataset,
    key: str,
    column: str,
    k: int = 256,
    top: int = 5,
) -> ray.data.Dataset:
    """Per-group approximate heavy hitters — one Misra-Gries k-counter
    summary per key (completing the grouped-sketch family alongside
    ``grouped_hll_distinct`` / ``grouped_tdigest_quantiles``): each batch
    emits <=k (key, value, n) counter rows per group it contains
    (map-side combined, fixed size); the reduce merges each key's
    summaries (counter-wise sum + decrement-compaction back to k) and
    keeps the ``top`` rows per group by (approx count desc, value asc).

    Classic MG guarantee per group: any value with true in-group
    frequency > N_group/k survives; counts are underestimates within
    N_group/k. Approximate -> rows-only; anchored by the exact grouped
    top-N (`top_words_by_lang`-style window) in tests."""
    from collections import Counter

    def _compact(c: "Counter", limit: int) -> "Counter":
        if len(c) > limit:
            kth = sorted(c.values(), reverse=True)[limit - 1]
            c = Counter({v: n - kth for v, n in c.items() if n > kth})
        return c

    def summarize(batch: pa.Table):
        import pandas as pd

        per_key: dict = {}
        for kv, val in zip(
            batch.column(key).to_pylist(), batch.column(column).to_pylist()
        ):
            if val is None:
                # NULL values are ignored (SQL count(col) semantics,
                # matching grouped_hll_distinct); leaving them in would
                # crash the (count, value) tie-break sort on None vs str
                continue
            per_key.setdefault(kv, Counter())[val] += 1
        out_k, out_v, out_n = [], [], []
        for kv, c in per_key.items():
            c = _compact(c, k)
            for v, n in c.items():
                out_k.append(kv)
                out_v.append(v)
                out_n.append(n)
        if not out_k:
            return
        yield pa.Table.from_pydict(
            {
                key: pa.array(out_k),
                "value": pa.array(out_v, type=pa.string()),
                "n": pa.array(out_n, type=pa.int64()),
            }
        )

    partials = ds.select_columns([key, column]).map_batches(
        summarize, batch_format="pyarrow"
    )

    def merge_group(g) -> "pd.DataFrame":
        import pandas as pd

        c: Counter = Counter()
        for v, n in zip(g["value"], g["n"]):
            c[v] += n
        c = _compact(c, k)
        rows = sorted(c.items(), key=lambda t: (-t[1], t[0]))[:top]
        return pd.DataFrame(
            {
                key: [g[key].iloc[0]] * len(rows),
                "value": pd.Series([r[0] for r in rows], dtype=object),
                "n_est": pd.array([r[1] for r in rows], dtype="int64"),
            }
        )

    return partials.groupby(key).map_groups(merge_group, batch_format="pandas")


def hll_set_cardinalities(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    column: str,
    p: int = 14,
) -> ray.data.Dataset:
    """Approximate set-operation cardinalities between two corpora's
    distinct values of ``column`` via two HyperLogLog register sets:
    |A|, |B|, |A∪B| (elementwise register max — exact HLL union), then
    |A∩B| = |A|+|B|−|A∪B| (inclusion–exclusion, clamped at 0) and the
    two differences from the union. The constant-memory scale path for
    corpus-overlap questions (crawl-vs-crawl vocabulary overlap,
    contamination screening) where ``distinct_set_op`` would shuffle
    both vocabularies; the exact op is the anchor this sketch is judged
    against (same pattern as ``hll_distinct`` ↔ the exact distinct).

    Scale shape: each batch of each side emits one side-tagged 2^p-byte
    register partial; merges are elementwise max per side — fixed-size,
    mergeable, nothing corpus-sized moves. Intersection error grows as
    the true intersection shrinks relative to the union (standard
    inclusion–exclusion caveat) — accuracy pinned in tests.

    Returns six (op: string, approx: int64) rows: distinct_left,
    distinct_right, union, intersect, except_left, except_right.

    NULL semantics: NULLs hash as "" (the hash64_strings convention),
    so a corpus containing BOTH NULL and '' sees them conflated into
    one distinct value — filter upstream if that distinction matters
    (the exact anchor counts them separately, as SQL DISTINCT does)."""
    m = 1 << p
    zero = np.zeros(m, dtype=np.uint8).tobytes()

    def make_partial(side: int):
        def partial(batch: pa.Table):
            regs = _hll_partial(batch.column(column), p)
            yield pa.Table.from_pydict(
                {
                    "side": pa.array([side], type=pa.int64()),
                    "regs": pa.array([regs.tobytes()], type=pa.binary()),
                }
            )

        return partial

    parts = (
        left.select_columns([column])
        .map_batches(make_partial(0), batch_format="pyarrow")
        .union(
            right.select_columns([column]).map_batches(
                make_partial(1), batch_format="pyarrow"
            )
        )
    )
    # zero seeds guarantee both sides exist even on empty inputs
    seed = ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "side": pa.array([0, 1], type=pa.int64()),
                "regs": pa.array([zero, zero], type=pa.binary()),
            }
        )
    )
    parts = parts.union(seed)

    def merge(batch: pa.Table):
        acc = {0: np.zeros(m, dtype=np.uint8), 1: np.zeros(m, dtype=np.uint8)}
        for side, buf in zip(
            batch.column("side").to_pylist(), batch.column("regs").to_pylist()
        ):
            acc[side] = np.maximum(acc[side], np.frombuffer(buf, dtype=np.uint8))
        yield pa.Table.from_pydict(
            {
                "side": pa.array([0, 1], type=pa.int64()),
                "regs": pa.array(
                    [acc[0].tobytes(), acc[1].tobytes()], type=pa.binary()
                ),
            }
        )

    merged = (
        parts.repartition(8)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
        .repartition(1)
        .map_batches(merge, batch_format="pyarrow", batch_size=None)
    )

    def finalize(batch: pa.Table):
        regs = {
            side: np.frombuffer(buf, dtype=np.uint8)
            for side, buf in zip(
                batch.column("side").to_pylist(),
                batch.column("regs").to_pylist(),
            )
        }
        a = _hll_estimate(regs[0])
        b = _hll_estimate(regs[1])
        u = _hll_estimate(np.maximum(regs[0], regs[1]))
        inter = max(0.0, a + b - u)
        ops = [
            ("distinct_left", a),
            ("distinct_right", b),
            ("union", u),
            ("intersect", inter),
            ("except_left", max(0.0, u - b)),
            ("except_right", max(0.0, u - a)),
        ]
        yield pa.Table.from_pydict(
            {
                "op": pa.array([o for o, _ in ops], type=pa.string()),
                "approx": pa.array(
                    [int(round(v)) for _, v in ops], type=pa.int64()
                ),
            }
        )

    return merged.map_batches(finalize, batch_format="pyarrow")


def hll_register_rows(
    ds: ray.data.Dataset, column: str, p: int = 14
) -> ray.data.Dataset:
    """HyperLogLog registers as ROWS — (reg:int64, rho:int64), nonzero
    registers only, max-combined across batches. The row form exists for
    DELTA-MAINTAINED distinct-count views (state/ivm.py): registers are
    a max-monoid, so a tick's register rows fold into a persisted view
    with ``apply_delta(value_cols={"rho": "max"})`` and the view's
    estimate equals the full-corpus sketch exactly (pinned in tests).
    At most 2^p rows regardless of corpus size."""
    from ctinexus_ray.ops.groupagg import partitioned_agg

    def partial(batch: pa.Table):
        regs = _hll_partial(batch.column(column), p)
        nz = np.nonzero(regs)[0]
        if not len(nz):
            return
        yield pa.Table.from_pydict(
            {
                "reg": pa.array(nz.astype(np.int64), type=pa.int64()),
                "rho": pa.array(regs[nz].astype(np.int64), type=pa.int64()),
            }
        )

    return partitioned_agg(
        ds.select_columns([column]).map_batches(partial, batch_format="pyarrow"),
        keys=["reg"],
        named_aggs={"rho": ("rho", "max")},
        num_partitions=16,
    )


def hll_estimate_from_rows(rows: list[dict], p: int = 14) -> int:
    """Finalize an estimate from (reg, rho) rows (missing registers are
    zero) — the read side of the delta-maintained distinct view."""
    regs = np.zeros(1 << p, dtype=np.uint8)
    for r in rows:
        regs[int(r["reg"])] = int(r["rho"])
    return int(round(_hll_estimate(regs)))
