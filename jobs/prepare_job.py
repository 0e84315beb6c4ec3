"""``ray job submit`` entrypoint for end-to-end training-data preparation:
the composed pipeline a user of this engine runs over a raw crawl.

    ray job submit --working-dir . -- \
        python jobs/prepare_job.py --input s3://bucket/docs/ --output s3://bucket/prep/

Two phases with different (honest) resume granularity:

  phase 1 — GLOBAL near-dedup (MinHash-LSH star candidates -> exact-Jaccard
  verify -> tiered distributed connected components -> anti-join) over the
  whole input. Cross-partition by nature, so it commits atomically as one
  unit: ``<out>/deduped/`` parquet + a ``_DEDUP_SUCCESS.json`` marker with
  metrics; a rerun that finds the marker skips straight to phase 2.

  phase 2 — per-partition quality filter (Gopher-style rules) -> token
  count -> sequence packing, via ``state.checkpoint.run_resumable``: each
  deduped shard commits independently with a lineage sidecar
  (``_SUCCESS.<pid>.json``), so a crashed run resumes at the first
  unfinished shard (``skipped: N`` on rerun). Packing is per-shard (pack
  ids are unique per shard via the shard id) — the standard layout where
  each output file is a self-contained bundle of training packs.

Nothing corpus-sized touches the driver in either phase. In this sandbox
the same entrypoint runs standalone:
``python jobs/prepare_job.py --input /root/testdata/sf0.01/documents.parquet --output /tmp/prep``.
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time
from pathlib import Path

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if _REPO_ROOT not in sys.path:
    sys.path.insert(0, _REPO_ROOT)


def dedup_phase(input_path: str, deduped_dir: str, threshold: float,
                num_partitions: int) -> dict:
    """Global near-dedup -> partitioned parquet + marker. Skipped when the
    marker exists (all-or-nothing resume at phase granularity)."""
    import ray.data

    from ctinexus_ray.ops.dedup import minhash_dedup_keep
    from ctinexus_ray.ops.distjoin import hash_join

    marker = Path(deduped_dir) / "_DEDUP_SUCCESS.json"
    if marker.exists():
        stats = json.loads(marker.read_text())
        stats["skipped"] = True
        return stats
    # a marker-less deduped dir is a half-finished previous attempt —
    # clear it, else write_parquet APPENDS a second copy of every row
    # (the commit is data-then-marker; rerun-after-crash must start clean)
    import shutil

    shutil.rmtree(deduped_dir, ignore_errors=True)
    start = time.perf_counter()
    from ctinexus_ray.sources.documents import ensure_doc_id

    # url-keyed CC corpora gain a derived doc_id here; every later
    # phase reads the deduped parquet, which then carries it
    from ctinexus_ray.sources.flatfiles import read_corpus_auto

    docs = ensure_doc_id(read_corpus_auto(input_path))
    from ctinexus_ray.rayutil import select_shuffle_strategy

    select_shuffle_strategy(docs)
    n_in = docs.count()
    survivors = minhash_dedup_keep(
        docs, threshold=threshold, num_partitions=num_partitions,
        pair_mode="star",
    )
    kept = hash_join(
        docs, survivors, on=["doc_id"], num_partitions=num_partitions
    )
    kept.write_parquet(deduped_dir)
    n_out = ray.data.read_parquet(deduped_dir).count()
    stats = {
        "input_docs": n_in,
        "surviving_docs": n_out,
        "dropped": n_in - n_out,
        "sec": round(time.perf_counter() - start, 2),
        "skipped": False,
    }
    tmp = marker.with_suffix(".tmp")
    tmp.write_text(json.dumps(stats, indent=2))
    tmp.rename(marker)
    return stats


def lm_filter_phase(deduped_dir: str, filtered_dir: str, tail_drop: float,
                    num_partitions: int) -> dict:
    """CCNet-style global LM quality filter: score every document with
    the corpus-trained unigram LM (``ops.textstats.unigram_lm_scores``)
    and drop the worst ``tail_drop`` fraction by per-token score (the
    rare-word-soup tail). The LM trains on the whole deduped corpus, so
    this phase is global like dedup and commits atomically behind a
    ``_LMFILTER_SUCCESS.json`` marker."""
    import shutil

    import ray.data

    from ctinexus_ray.ops.distjoin import hash_join
    from ctinexus_ray.ops.shards import global_row_number
    from ctinexus_ray.ops.textstats import unigram_lm_scores

    marker = Path(filtered_dir) / "_LMFILTER_SUCCESS.json"
    if marker.exists():
        stats = json.loads(marker.read_text())
        stats["skipped"] = True
        return stats
    shutil.rmtree(filtered_dir, ignore_errors=True)
    start = time.perf_counter()
    docs = ray.data.read_parquet(deduped_dir)
    n_in = docs.count()
    keep_n = n_in - int(n_in * tail_drop)
    scores = unigram_lm_scores(
        docs.select_columns(["doc_id", "text"])
    ).select_columns(["doc_id", "lm_score"])
    ranked = global_row_number(
        scores, ["lm_score", "doc_id"], descending=[True, False]
    )
    keep_ids = ranked.filter(expr=f"rank <= {keep_n}").select_columns(["doc_id"])
    kept = hash_join(
        docs, keep_ids, on=["doc_id"], how="left_semi",
        num_partitions=num_partitions,
    )
    kept.write_parquet(filtered_dir)
    stats = {
        "input_docs": n_in,
        "surviving_docs": keep_n,
        "dropped": n_in - keep_n,
        "tail_drop": tail_drop,
        "sec": round(time.perf_counter() - start, 2),
        "skipped": False,
    }
    tmp = marker.with_suffix(".tmp")
    tmp.write_text(json.dumps(stats, indent=2))
    tmp.rename(marker)
    return stats


def prep_pipeline(capacity: int, min_words: int):
    """Per-shard phase-2 pipeline: quality filter -> tokens -> packs."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ctinexus_ray.ops.shards import pack_sequences
    from ctinexus_ray.ops.textstats import gopher_quality_batch

    def run(ds):
        def keep_quality(batch: pa.Table):
            flags = gopher_quality_batch(batch, min_words=min_words)
            kept = batch.filter(
                pc.equal(flags.column("keep"), pa.scalar(True))
            )
            if kept.num_rows == 0:
                return
            n_words = pc.cast(
                pc.list_value_length(
                    pc.split_pattern_regex(
                        pc.utf8_trim_whitespace(kept.column("text")),
                        pattern=r"\s+",
                    )
                ),
                pa.int64(),
            )
            yield pa.Table.from_pydict(
                {
                    "doc_id": kept.column("doc_id"),
                    "text": kept.column("text"),
                    "n_tokens": n_words,
                }
            )

        # materialize once (shard-sized, bounded): `filtered` feeds BOTH
        # pack_sequences and the re-attach join — without this the
        # quality/tokenize stage executes twice per shard
        filtered = ds.map_batches(
            keep_quality, batch_format="pyarrow"
        ).materialize()
        packed = pack_sequences(filtered, capacity=capacity)
        # re-attach text for the final training shard rows
        from ctinexus_ray.ops.distjoin import hash_join

        return hash_join(
            packed,
            filtered.drop_columns(["n_tokens"]),
            on=["doc_id"],
            num_partitions=16,
            left_types={
                "doc_id": pa.int64(),
                "n_tokens": pa.int64(),
                "pack_id": pa.int64(),
            },
            right_types={"doc_id": pa.int64(), "text": pa.string()},
        )

    return run


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--input", required=True, help="parquet dir or file")
    parser.add_argument("--output", required=True)
    parser.add_argument("--threshold", type=float, default=0.8)
    parser.add_argument("--capacity", type=int, default=2048,
                        help="tokens per training pack")
    parser.add_argument("--min-words", type=int, default=5)
    parser.add_argument("--lm-tail-drop", type=float, default=0.0,
                        help="drop this fraction of docs with the worst "
                             "per-token unigram-LM score (0 disables the "
                             "CCNet-style perplexity filter phase)")
    parser.add_argument("--num-partitions", type=int, default=64)
    args = parser.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)

    from ctinexus_ray.state.checkpoint import run_resumable

    deduped_dir = os.path.join(args.output, "deduped")
    shards_dir = os.path.join(args.output, "shards")

    dedup_stats = dedup_phase(
        args.input, deduped_dir, args.threshold, args.num_partitions
    )
    shard_src = deduped_dir
    lm_stats = None
    if args.lm_tail_drop > 0:
        filtered_dir = os.path.join(args.output, "lm_filtered")
        lm_stats = lm_filter_phase(
            deduped_dir, filtered_dir, args.lm_tail_drop, args.num_partitions
        )
        shard_src = filtered_dir
    shard_files = sorted(glob.glob(os.path.join(shard_src, "*.parquet")))
    summary = run_resumable(
        shard_files,
        shards_dir,
        prep_pipeline(args.capacity, args.min_words),
        lineage_fn=lambda t: {
            "n_packs": len(set(t.column("pack_id").to_pylist())),
            "n_tokens": sum(t.column("n_tokens").to_pylist()),
        },
    )
    report = {"dedup": dedup_stats, "shards": summary}
    if lm_stats is not None:
        report["lm_filter"] = lm_stats
    print(json.dumps(report, indent=2))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
