"""``ray job submit`` entrypoint for corpus near-duplicate removal.

On a real cluster (the north_rule deployment shape):

    ray job submit --working-dir . -- \
        python jobs/dedup_job.py --input s3://bucket/cc/ --output s3://bucket/clean/

Pipeline: MinHash-LSH star-mode candidates -> exact-Jaccard verify (two
hash-partitioned text joins) -> tiered distributed connected components
-> anti-join survivors -> join surviving doc_ids back to full rows ->
partitioned parquet. Nothing corpus-sized touches the driver; for truly
large runs the shuffle strategy auto-selects push-based from the
input size (see ctinexus_ray/rayutil.py select_shuffle_strategy).

In this sandbox the same entrypoint runs standalone:
``python jobs/dedup_job.py --input <parquet dir> --output /tmp/out``.
Two input shapes are accepted: the documents table (doc_id:int64,
text:string, ...) and the url-keyed Common-Crawl corpus of input_hint
(a stable int64 doc_id then derives from the url hash — see the
collision note in main()). Extra columns pass through to the output.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="parquet dir or file")
    parser.add_argument("--output", required=True)
    parser.add_argument("--threshold", type=float, default=0.8,
                        help="Jaccard threshold for near-dup verification")
    parser.add_argument("--num-partitions", type=int, default=64)
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    import ray.data

    from ctinexus_ray.ops.dedup import minhash_dedup_keep
    from ctinexus_ray.ops.distjoin import hash_join

    # all-or-nothing phase resume (prepare_job's _DEDUP_SUCCESS pattern):
    # a completed output is skipped wholesale; a partial one — parquet
    # files but no marker — is a crashed run and is rebuilt from scratch
    # (ray write_parquet APPENDS into an existing dir, so rerunning over
    # a partial output would double-count rows).
    import shutil
    from pathlib import Path

    marker = Path(args.output) / "_DEDUP_SUCCESS.json"
    if marker.exists():
        stats = json.loads(marker.read_text())
        stats["skipped"] = True
        print(json.dumps(stats, indent=2))
        ray.shutdown()
        return 0
    shutil.rmtree(args.output, ignore_errors=True)

    start = time.perf_counter()
    from ctinexus_ray.sources.documents import ensure_doc_id

    # accepts both table shapes (documents doc_id / url-keyed CC corpus
    # — see ensure_doc_id for the hash-collision caveat)
    from ctinexus_ray.sources.flatfiles import read_corpus_auto

    docs = ensure_doc_id(read_corpus_auto(args.input))
    # corpus-scale runs cross to push-based shuffle (driver metadata
    # stays flat); small runs keep pull-based. Env var still overrides.
    from ctinexus_ray.rayutil import select_shuffle_strategy

    strategy = select_shuffle_strategy(docs)
    n_in = docs.count()
    survivors = minhash_dedup_keep(
        docs,
        threshold=args.threshold,
        num_partitions=args.num_partitions,
        pair_mode="star",
    )
    # join surviving ids back to the full rows (both sides corpus-sized)
    kept = hash_join(
        docs, survivors, on=["doc_id"], num_partitions=args.num_partitions
    )
    kept.write_parquet(args.output)
    n_out = ray.data.read_parquet(args.output).count()
    stats = {
        "input_docs": n_in,
        "surviving_docs": n_out,
        "dropped": n_in - n_out,
        "sec": round(time.perf_counter() - start, 2),
        "shuffle_strategy": strategy,
        "output": args.output,
        "skipped": False,
    }
    # atomic commit: the marker only appears after a complete write
    tmp = str(marker) + ".tmp"
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, marker)
    print(json.dumps(stats, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
