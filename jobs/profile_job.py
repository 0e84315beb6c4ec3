"""``ray job submit`` entrypoint for corpus profiling.

The step a 100-TB run does FIRST: one streaming pass over the corpus
producing the report that sizes everything downstream — partition
counts, dedup strategy, quality-filter thresholds, language mix:

    python jobs/profile_job.py --input /data/corpus --output /tmp/profile

Signals (all from ONE ``map_batches`` pass emitting fixed-size
per-batch partials — nothing corpus-sized reaches the driver, and the
corpus never shuffles):

  * doc/char/token totals and per-language splits
  * Gopher quality keep-rate (the cheap pre-filter survival estimate)
  * document length histogram (fixed equi-width char buckets)
  * approximate distinct-text count via HyperLogLog (p=14, ~0.8% err) —
    the exact-dup-rate estimate WITHOUT paying a text-hash shuffle

Output: ``profile.json`` + ``lang_counts.parquet`` +
``length_histogram.parquet``, committed atomically behind
``_PROFILE_SUCCESS.json``; a rerun over a committed output dir skips
the pass entirely (``"skipped": true``).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)

# bucket edges in chars; the last bucket is open-ended
HIST_EDGES = [0, 100, 200, 400, 800, 1600, 3200, 6400, 12800, 25600]
HLL_P = 14


def _profile_partials(batch):
    """One batch -> per-lang stat rows plus a single batch-level row
    (lang NULL) carrying the histogram vector and HLL registers."""
    import numpy as np
    import pyarrow as pa

    from ctinexus_ray.ops.sketch import _hll_partial
    from ctinexus_ray.ops.textstats import gopher_quality_batch

    q = gopher_quality_batch(batch)
    n_words = q.column("n_words").to_numpy(zero_copy_only=False)
    keep = q.column("keep").to_numpy(zero_copy_only=False).astype(np.int64)
    n_chars = np.asarray(
        [len(t or "") for t in batch.column("text").to_pylist()],
        dtype=np.int64,
    )
    langs = (
        # NULL lang buckets as "?" (same sentinel as a missing column):
        # pandas groupby would otherwise DROP those rows from the
        # per-lang sums while the histogram/HLL keep them, breaking the
        # report's hist_sum == n_docs invariant. lang=None stays
        # reserved for the batch-sentinel row carrying hist/regs.
        [l if l is not None else "?" for l in
         batch.column("lang").to_pylist()]
        if "lang" in batch.column_names
        else ["?"] * batch.num_rows
    )

    import pandas as pd

    df = pd.DataFrame(
        {
            "lang": langs,
            "n_docs": np.ones(batch.num_rows, dtype=np.int64),
            "chars": n_chars,
            "tokens": n_words.astype(np.int64),
            "gopher_keep": keep,
        }
    )
    agg = df.groupby("lang", sort=False).sum().reset_index()

    hist = np.bincount(
        np.searchsorted(HIST_EDGES, n_chars, side="right") - 1,
        minlength=len(HIST_EDGES),
    ).astype(np.int64)
    regs = _hll_partial(batch.column("text"), HLL_P)

    n = len(agg) + 1
    out = pa.Table.from_pydict(
        {
            "lang": pa.array(list(agg["lang"]) + [None], type=pa.string()),
            "n_docs": pa.array(
                list(agg["n_docs"]) + [0], type=pa.int64()
            ),
            "chars": pa.array(list(agg["chars"]) + [0], type=pa.int64()),
            "tokens": pa.array(list(agg["tokens"]) + [0], type=pa.int64()),
            "gopher_keep": pa.array(
                list(agg["gopher_keep"]) + [0], type=pa.int64()
            ),
            "hist": pa.array(
                [None] * (n - 1) + [hist.tolist()],
                type=pa.list_(pa.int64()),
            ),
            "regs": pa.array(
                [None] * (n - 1) + [regs.tobytes()], type=pa.binary()
            ),
        }
    )
    yield out


def run_profile(input_dir: str, output_dir: str) -> dict:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    from ctinexus_ray.ops.sketch import _hll_estimate

    out = Path(output_dir)
    success = out / "_PROFILE_SUCCESS.json"
    if success.exists():
        return {"skipped": True, **json.loads(success.read_text())}
    out.mkdir(parents=True, exist_ok=True)

    start = time.perf_counter()
    paths = sorted(str(p) for p in Path(input_dir).glob("*.parquet"))
    if not paths:
        raise SystemExit(f"no parquet files under {input_dir}")
    ds = ray.data.read_parquet(paths)
    cols = ds.schema().names
    keep_cols = [c for c in ("doc_id", "text", "lang") if c in cols]
    if "doc_id" not in cols:
        # CC-shaped corpus (url-keyed, per input_hint): the profile pass
        # only needs SOME id column to ride through gopher_quality_batch;
        # zeros (not nulls — null ids would trip any future numeric
        # consumer) are enough since ids never leave the batch
        import numpy as np
        import pyarrow as pa

        def add_id(batch: pa.Table) -> pa.Table:
            return batch.append_column(
                "doc_id",
                pa.array(
                    np.zeros(batch.num_rows, dtype=np.int64),
                    type=pa.int64(),
                ),
            )

        parts_ds = ds.select_columns(keep_cols).map_batches(
            add_id, batch_format="pyarrow"
        )
    else:
        parts_ds = ds.select_columns(keep_cols)
    parts = parts_ds.map_batches(
        _profile_partials, batch_format="pyarrow"
    ).take_all()  # O(#batches x langs) small rows

    lang_stats: dict[str, dict[str, int]] = {}
    hist = np.zeros(len(HIST_EDGES), dtype=np.int64)
    regs = np.zeros(1 << HLL_P, dtype=np.uint8)
    for r in parts:
        if r["lang"] is None:
            hist += np.asarray(r["hist"], dtype=np.int64)
            regs = np.maximum(
                regs, np.frombuffer(r["regs"], dtype=np.uint8)
            )
        else:
            s = lang_stats.setdefault(
                r["lang"],
                {"n_docs": 0, "chars": 0, "tokens": 0, "gopher_keep": 0},
            )
            for k in s:
                s[k] += r[k]

    n_docs = sum(s["n_docs"] for s in lang_stats.values())
    total_chars = sum(s["chars"] for s in lang_stats.values())
    total_tokens = sum(s["tokens"] for s in lang_stats.values())
    gopher_keep = sum(s["gopher_keep"] for s in lang_stats.values())
    approx_distinct = int(round(_hll_estimate(regs)))

    langs_sorted = sorted(lang_stats)
    lang_table = pa.Table.from_pydict(
        {
            "lang": pa.array(langs_sorted, type=pa.string()),
            "n_docs": pa.array(
                [lang_stats[g]["n_docs"] for g in langs_sorted],
                type=pa.int64(),
            ),
            "chars": pa.array(
                [lang_stats[g]["chars"] for g in langs_sorted],
                type=pa.int64(),
            ),
            "tokens": pa.array(
                [lang_stats[g]["tokens"] for g in langs_sorted],
                type=pa.int64(),
            ),
            "gopher_keep": pa.array(
                [lang_stats[g]["gopher_keep"] for g in langs_sorted],
                type=pa.int64(),
            ),
        }
    )
    hist_table = pa.Table.from_pydict(
        {
            "bucket_lo": pa.array(HIST_EDGES, type=pa.int64()),
            "n_docs": pa.array(hist.tolist(), type=pa.int64()),
        }
    )
    pq.write_table(lang_table, out / "lang_counts.parquet")
    pq.write_table(hist_table, out / "length_histogram.parquet")

    report = {
        "input": input_dir,
        "n_docs": n_docs,
        "total_chars": total_chars,
        "total_tokens": total_tokens,
        "gopher_keep_rate": (gopher_keep / n_docs) if n_docs else 0.0,
        "approx_distinct_texts": approx_distinct,
        "approx_dup_rate": (
            max(0.0, 1.0 - approx_distinct / n_docs) if n_docs else 0.0
        ),
        "langs": len(lang_stats),
        "sec": round(time.perf_counter() - start, 2),
    }
    (out / "profile.json").write_text(json.dumps(report, indent=2))
    tmp = success.with_suffix(".tmp")
    tmp.write_text(json.dumps(report, indent=2))
    tmp.rename(success)
    return report


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="dir of parquet files")
    parser.add_argument("--output", required=True)
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    print(json.dumps(run_profile(args.input, args.output), indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
