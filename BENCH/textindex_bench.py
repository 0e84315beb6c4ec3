"""Text-index scale evidence: build + append + search over a 650k-doc
corpus (the round-4 family was only sanity-checked at sf0.1 = 5k docs).

Measures: positional build wall, one +10k-doc append tick, BM25 /
boolean / phrase query walls (each touching only the query terms'
buckets), and a delete tick. Prints one JSON line for BASELINE.md.

Run: python BENCH/textindex_bench.py [--corpus /tmp/kg_incr_bench_4x/cc]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", default="/tmp/kg_incr_bench_4x/cc",
                    help="CC-parquet shard dir (url/text)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--index", default="/tmp/textindex_bench_idx")
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    import ray
    import ray.data

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus,
                 include_dashboard=False)

    from ctinexus_ray.ops.textindex import (
        text_index_append,
        text_index_boolean,
        text_index_build,
        text_index_delete,
        text_index_phrase,
        text_index_search,
    )
    from ctinexus_ray.sources.documents import ensure_doc_id
    from ctinexus_ray.state.tableformat import version_extra

    files = sorted(glob.glob(os.path.join(args.corpus, "*.parquet")))
    if len(files) < 2:
        raise FileNotFoundError(
            f"{args.corpus}: need >=2 shards (regenerate via "
            "BENCH/kg_incr_bench.py)"
        )
    base, extra_shard = files[:-1], files[-1]

    def docs_of(paths):
        return ensure_doc_id(
            ray.data.read_parquet(paths, columns=["url", "text"])
        ).select_columns(["doc_id", "text"])

    shutil.rmtree(args.index, ignore_errors=True)
    t0 = time.time()
    text_index_build(
        docs_of(base), args.index, num_buckets=args.buckets,
        positions=True,
    )
    build_sec = time.time() - t0
    meta = version_extra(args.index)["text_index"]
    n_docs = int(meta["n_docs"])

    t0 = time.time()
    text_index_append(docs_of([extra_shard]), args.index, batch_id="tick2")
    append_sec = time.time() - t0

    # words chosen FROM the synthetic vocabulary so the queries do real
    # posting work (absent terms would measure an empty scan)
    t0 = time.time()
    n_bm25 = len(
        text_index_search(args.index, ["the", "and", "ransomware"], k=20)
    )
    bm25_sec = time.time() - t0
    t0 = time.time()
    n_bool = text_index_boolean(
        args.index, ["the", "and"], mode="and"
    ).count()
    bool_sec = time.time() - t0
    t0 = time.time()
    n_phrase = text_index_phrase(
        args.index, ["ransomware", "campaign"], num_partitions=16
    ).count()
    phrase_sec = time.time() - t0

    # delete tick: drop 1% of docs (every 100th id)
    import numpy as np

    meta2 = version_extra(args.index)["text_index"]
    all_ids = None  # ids are url hashes — sample from postings instead
    sample = ray.data.read_parquet(
        sorted(
            f for f in glob.glob(os.path.join(args.index, "buckets-*", "*"))
        )[:2],
        columns=["doc_id"],
    ).take(20000)
    drop = sorted({r["doc_id"] for r in sample})[:5000]
    t0 = time.time()
    text_index_delete(args.index, drop, batch_id="drop1")
    delete_sec = time.time() - t0

    print(json.dumps({
        "metric": "textindex_scale",
        "num_cpus": args.cpus,
        "n_docs": n_docs,
        "total_tokens": int(meta["total_len"]),
        "build_sec": round(build_sec, 2),
        "append_docs": int(meta2["n_docs"]) - n_docs,
        "append_sec": round(append_sec, 2),
        "bm25_sec": round(bm25_sec, 2), "bm25_rows": n_bm25,
        "boolean_sec": round(bool_sec, 2), "boolean_rows": int(n_bool),
        "phrase_sec": round(phrase_sec, 2), "phrase_rows": int(n_phrase),
        "delete_docs": len(drop),
        "delete_sec": round(delete_sec, 2),
    }))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
