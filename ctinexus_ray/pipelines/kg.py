"""Corpus-scale KG construction pipeline (SURVEY §3.4 restated on Ray Data).

    read_parquet(documents)                    # S1, column-pruned
      -> map_batches(extract_batch)            # E0-E3, stateless, drops html
      -> map_batches(KGDocStage, concurrency)  # IE+ET+EA+LP fused actor pool
      -> map_batches(explode_triples_batch)    # nested -> flat triples
      -> [entity partials -> groupby(entity_key) -> nodes]   # THE wide shuffle
      -> write_parquet(triples/nodes/edges)

Everything streams; nothing materializes the corpus. The only all-to-all
exchange is the canonicalization groupby, fed by map-side-combined partials
(one row per (doc, entity)) — see SURVEY §7.3 for the skew rationale.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ctinexus_ray.config import PipelineConfig
from ctinexus_ray.sources.demos import select_demos
from ctinexus_ray.sources.synth import make_demo_corpus
from ctinexus_ray.stages.extract import extract_batch
from ctinexus_ray.stages.kg import KGDocStage
from ctinexus_ray.stages.triples import (
    edges_batch,
    entity_partials_batch,
    explode_triples_batch,
)

DOCUMENT_COLUMNS = ["url", "warc_ts", "html", "text", "lang"]


def read_documents(paths: str | list[str], columns: list[str] | None = None) -> ray.data.Dataset:
    """Column-pruned parquet read of the Common-Crawl-shaped corpus."""
    return ray.data.read_parquet(paths, columns=columns or DOCUMENT_COLUMNS)


def default_demos(config: PipelineConfig) -> list[dict]:
    """Driver-side demo selection — constant per corpus (quirk Q1), shipped
    to IE actors as a constructor argument (broadcast once per actor).

    ``retriever == "fixed"`` means no few-shot demos at all (the
    reference's other working retriever path,
    ctinexus/llm_processor.py:1104-1107).
    """
    if config.retriever == "fixed":
        return []
    return select_demos(
        make_demo_corpus(), shot=config.shot, permutation=config.permutation
    )


def extract_documents(ds: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """E0-E3: html -> extracted/normalized/focused text; html dropped."""
    return ds.map_batches(
        extract_batch, batch_format="pyarrow", batch_size=config.cpu_batch_size
    )


def run_kg_stage(
    ds: ray.data.Dataset,
    config: PipelineConfig,
    demos: list[dict] | None = None,
) -> ray.data.Dataset:
    """Fused IE->ET->EA->LP actor pool over extracted documents."""
    return ds.map_batches(
        KGDocStage,
        fn_constructor_kwargs={
            "config": config,
            "demos": demos if demos is not None else default_demos(config),
        },
        batch_format="pyarrow",
        batch_size=config.doc_batch_size,
        concurrency=config.llm_concurrency,
        num_cpus=config.llm_num_cpus,
    )


def triples_dataset(kg_ds: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """Flat triples table (one row per aligned or predicted triple)."""
    return kg_ds.select_columns(
        ["url", "kg_aligned_json", "kg_links_json"]
    ).map_batches(
        explode_triples_batch,
        batch_format="pyarrow",
        batch_size=config.cpu_batch_size,
    )


def canonicalize_node_partials(
    docs_kg_ds: ray.data.Dataset, config: PipelineConfig
) -> ray.data.Dataset:
    """Cross-document entity canonicalization — the one wide shuffle.

    Input: per-DOCUMENT kg rows (``kg_aligned_json`` [+ ``kg_links_json``])
    — doc-aligned batching keeps doc counts exact. Two map-side combine
    levels (entity_partials_batch) -> a single ``groupby(entity_key)``
    with BUILT-IN vectorized aggregates (Sum/Max) -> a cheap strip map.

    No per-group Python function runs anywhere on this path: with 10^9+
    distinct entities, a per-group ``map_groups`` callback pays ~1 ms of
    interpreter overhead per key and dominates the job (measured at 400k
    docs before this design).

    Canonical rules (deterministic regardless of partitioning; the
    reference's A1 most-frequent-mention rule applies WITHIN a document,
    in merge_doc — cross-doc canonicalization is this engine's addition):
      * entity_text  = Max over per-doc first-seen variants (variants of a
        key differ only in case/whitespace — key = hash(normalized text))
      * entity_class = class of the (doc,key) record with the highest
        in-doc mention count, ties toward the lexicographically greatest
        class (pre-encoded in ``class_rank`` so a plain Max suffices)
      * doc_count / mention_count = exact Sums of the batch partials

    The reduce is a hash-partitioned groupby (``entity_key`` mod P) with
    one VECTORIZED pandas groupby.agg per partition — NOT a built-in
    per-key aggregate, whose per-group overhead is linear in distinct
    entities (measured 16.4 s over 436 k entities at 400 k docs vs ~4 s
    this way; at 10^9 entities the difference is fatal). Partitioning by
    key hash keeps every key's rows together, so results are exact.
    """
    import pandas as pd
    import pyarrow.compute as pc

    partials = docs_kg_ds.map_batches(
        entity_partials_batch,
        batch_format="pyarrow",
        batch_size=config.cpu_batch_size,
    )
    num_partitions = config.canon_num_partitions or 64
    assert num_partitions & (num_partitions - 1) == 0, "power of two"

    def add_pkey(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "pkey", pc.bit_wise_and(batch.column("entity_key"), num_partitions - 1)
        )

    def reduce_partition(g: pd.DataFrame) -> pd.DataFrame:
        out = (
            g.groupby("entity_key", sort=False)
            .agg(
                entity_text=("entity_text", "max"),
                class_rank=("class_rank", "max"),
                doc_count=("doc_count", "sum"),
                mention_count=("mention_count", "sum"),
            )
            .reset_index()
        )
        return pd.DataFrame(
            {
                "entity_key": out["entity_key"].astype("int64").values,
                "entity_text": out["entity_text"].values,
                "class_rank": out["class_rank"].values,
                "doc_count": out["doc_count"].astype("int64").values,
                "mention_count": out["mention_count"].astype("int64").values,
            }
        )

    return (
        partials.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(reduce_partition, batch_format="pandas")
    )


def strip_class_rank_batch(batch: pa.Table) -> pa.Table:
    """Final presentation map: decode ``class_rank``
    ("<zero-padded count>|<class>") into ``entity_class`` — applied
    AFTER all folding, because class_rank is the Max-monoid encoding
    the incremental view keeps foldable across ticks."""
    import pyarrow.compute as pc

    return pa.table(
        {
            "entity_key": batch.column("entity_key"),
            "entity_text": batch.column("entity_text"),
            "entity_class": pc.replace_substring_regex(
                batch.column("class_rank"), r"^[^|]*\|", ""
            ),
            "doc_count": batch.column("doc_count"),
            "mention_count": batch.column("mention_count"),
        }
    )


def canonicalize_nodes(
    docs_kg_ds: ray.data.Dataset, config: PipelineConfig
) -> ray.data.Dataset:
    """Canonical nodes table — ``canonicalize_node_partials`` (the
    foldable Sum/Max shape, shared with the incremental view in
    ``pipelines/kg_incr.py``) plus the class_rank -> entity_class
    presentation map."""
    return canonicalize_node_partials(docs_kg_ds, config).map_batches(
        strip_class_rank_batch, batch_format="pyarrow"
    )


def edges_dataset(triples_ds: ray.data.Dataset, config: PipelineConfig) -> ray.data.Dataset:
    """Canonical-keyed edges; no shuffle (keys are computed per row)."""
    return triples_ds.map_batches(
        edges_batch, batch_format="pyarrow", batch_size=config.cpu_batch_size
    )


def metrics_dataset(kg_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Corpus-level stage metrics (A2/A3): token totals + doc/triple/entity
    counters, reduced from the per-doc columns via a tiny groupby."""
    import pyarrow as pa

    def to_rows(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        def s(col):
            return sum(batch.column(col).to_pylist()) if col in batch.column_names else 0
        return pa.Table.from_pydict(
            {
                "stage": ["kg"],
                "docs": [n],
                "triples": [s("triples_count")],
                "mentions": [s("mentions_num")],
                "entities": [s("entity_num")],
                "subgraphs": [s("subgraph_num")],
                "dropped_triplets": [s("dropped_triplets")],
                "llm_input_tokens": [s("llm_input_tokens")],
                "llm_output_tokens": [s("llm_output_tokens")],
                "embed_tokens": [s("embed_tokens")],
            }
        )

    from ray.data.aggregate import Sum

    partials = kg_ds.map_batches(to_rows, batch_format="pyarrow")
    agg = partials.groupby("stage").aggregate(
        *[
            Sum(c)
            for c in (
                "docs", "triples", "mentions", "entities", "subgraphs",
                "dropped_triplets", "llm_input_tokens", "llm_output_tokens",
                "embed_tokens",
            )
        ]
    )

    def rename(batch: pa.Table) -> pa.Table:
        return batch.rename_columns(
            [c[4:-1] if c.startswith("sum(") else c for c in batch.column_names]
        )

    return agg.map_batches(rename, batch_format="pyarrow")


def run_kg_to_parquet(
    documents: ray.data.Dataset,
    out_dir: str,
    config: PipelineConfig | None = None,
    demos: list[dict] | None = None,
) -> dict[str, str]:
    """Execute the expensive per-doc stages ONCE, checkpointing their
    output to parquet on disk (not the object store); triples / nodes /
    edges / metrics all derive from re-reading that checkpoint, so the
    LLM stages never run twice and nothing corpus-sized is pinned in
    memory."""
    from pathlib import Path

    config = config or PipelineConfig()
    out = Path(out_dir)
    extracted = extract_documents(documents, config)
    kg = run_kg_stage(extracted, config, demos)

    docs_kg_path = str(out / "docs_kg")
    kg.select_columns(
        ["url", "kg_aligned_json", "kg_links_json", "triples_count",
         "mentions_num", "entity_num", "subgraph_num", "dropped_triplets",
         "llm_input_tokens", "llm_output_tokens", "embed_tokens"]
    ).write_parquet(docs_kg_path)

    paths = _write_derived_outputs(docs_kg_path, out, config)
    return {"docs_kg": docs_kg_path, **paths}


def _settle_fsspec_http_import() -> None:
    """Ray's path resolution probes ``fsspec.implementations.http`` on
    every read/write. In this environment that import always fails
    (aiohttp absent) and therefore never lands in ``sys.modules`` — so
    two driver threads resolving paths concurrently race inside the
    import machinery and one sees a half-initialized module (plain
    ImportError, which Ray does NOT catch, vs the ModuleNotFoundError it
    does). Seed a sentinel module once, single-threaded: the class is
    never instantiated here (no http filesystems in this engine), it only
    makes ``isinstance`` checks answer False deterministically."""
    import sys as _sys
    import types as _types

    try:
        import fsspec.implementations.http  # noqa: F401
    except ImportError:
        mod = _types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel only
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        _sys.modules["fsspec.implementations.http"] = mod


def _write_derived_outputs(docs_kg_path: str, out, config: PipelineConfig) -> dict[str, str]:
    """Derive triples / nodes / edges / metrics from the docs_kg
    checkpoint CONCURRENTLY (each in its own driver thread with its own
    read of the checkpoint — the four pipelines are independent, and
    running them serially pays 4× the fixed per-execution latency).
    Edges re-run the cheap explode map instead of waiting on the written
    triples table."""
    import concurrent.futures as cf
    from pathlib import Path

    _settle_fsspec_http_import()
    triples_path = str(out / "triples")
    nodes_path = str(out / "nodes")
    edges_path = str(out / "edges")
    metrics_path = str(out / "metrics")

    def _read():
        return ray.data.read_parquet(docs_kg_path)

    def _explode(ds):
        return ds.map_batches(
            explode_triples_batch,
            batch_format="pyarrow",
            batch_size=config.cpu_batch_size,
        )

    # build the (lazy) plans serially on the main thread — concurrent
    # read_parquet calls race on fsspec's lazy imports; only the
    # write_parquet EXECUTIONS run in the pool
    plans = {
        "triples": (_explode(_read()), triples_path),
        "nodes": (canonicalize_nodes(_read(), config), nodes_path),
        "edges": (edges_dataset(_explode(_read()), config), edges_path),
        "metrics": (metrics_dataset(_read()), metrics_path),
    }
    jobs = {
        name: (lambda ds=ds, path=path: ds.write_parquet(path))
        for name, (ds, path) in plans.items()
    }
    import os

    # Concurrency across executions overlaps their fixed per-execution
    # latency (~1s each) — a win only while the checkpoint is small.
    # Once the corpus is large each derivation saturates the cluster on
    # its own and running them concurrently just contends for CPU and
    # object-store memory (measured 28% slower at 400k docs), so fall
    # back to serial above a size threshold. Override via env.
    env = os.environ.get("CTINEXUS_DERIVED_WORKERS")
    if env:
        workers = max(1, int(env))
    else:
        ckpt_bytes = sum(
            f.stat().st_size for f in Path(docs_kg_path).glob("**/*") if f.is_file()
        )
        workers = 4 if ckpt_bytes < 64 * 1024 * 1024 else 1
    with cf.ThreadPoolExecutor(max_workers=workers) as ex:
        futures = {name: ex.submit(fn) for name, fn in jobs.items()}
        for name, fut in futures.items():
            fut.result()  # propagate the first failure
    return {
        "triples": triples_path,
        "nodes": nodes_path,
        "edges": edges_path,
        "metrics": metrics_path,
    }


KG_DOC_COLUMNS = [
    "url", "kg_aligned_json", "kg_links_json", "triples_count",
    "mentions_num", "entity_num", "subgraph_num", "dropped_triplets",
    "llm_input_tokens", "llm_output_tokens", "embed_tokens",
]


def checkpoint_docs_kg(
    input_files: list[str],
    docs_kg_dir,
    config: PipelineConfig,
    demos: list[dict] | None = None,
    reader=None,
) -> dict:
    """The expensive per-doc stages, run per INPUT SHARD with
    per-partition commits + lineage sidecars (extract -> fused LLM
    actor pool -> KG_DOC_COLUMNS). Shared by the full-rederive runner
    (``run_kg_resumable``) and the incremental one
    (``pipelines/kg_incr.py``)."""
    from ctinexus_ray.sources.documents import read_cc
    from ctinexus_ray.state.checkpoint import run_resumable

    def pipeline(ds: ray.data.Dataset) -> ray.data.Dataset:
        return run_kg_stage(
            extract_documents(ds, config), config, demos
        ).select_columns(KG_DOC_COLUMNS)

    def lineage_fn(table: pa.Table) -> dict:
        def s(col):
            return int(pa.compute.sum(table.column(col)).as_py() or 0)

        return {
            "docs": table.num_rows,
            "triples": s("triples_count"),
            "llm_input_tokens": s("llm_input_tokens"),
            "llm_output_tokens": s("llm_output_tokens"),
            "embed_tokens": s("embed_tokens"),
        }

    return run_resumable(
        input_files, docs_kg_dir, pipeline, reader=reader or read_cc,
        lineage_fn=lineage_fn,
    )


def run_kg_resumable(
    input_files: list[str],
    out_dir: str,
    config: PipelineConfig | None = None,
    demos: list[dict] | None = None,
    reader=None,
) -> dict:
    """Resumable corpus run: the expensive per-doc stages execute per INPUT
    SHARD, each committing a ``part-<pid>.parquet`` + ``_SUCCESS.<pid>.json``
    lineage sidecar (rows, wall time, token/triple metrics) under
    ``out_dir/docs_kg``. A restarted run skips committed shards, then
    triples/nodes/edges/metrics are (re)derived from the full docs_kg
    checkpoint — idempotent and cheap relative to the LLM stages.

    ``reader`` maps one shard path to a CC-shaped Dataset; default is the
    parquet reader (``sources.documents.read_cc``) — pass
    ``sources.warc.read_warc`` to run straight off a crawl archive.
    """
    from pathlib import Path

    config = config or PipelineConfig()
    out = Path(out_dir)
    docs_kg_dir = out / "docs_kg"
    summary = checkpoint_docs_kg(
        input_files, docs_kg_dir, config, demos, reader
    )

    # derived outputs are idempotent re-computations over the docs_kg
    # checkpoint — clear stale copies first (write_parquet appends files)
    import shutil

    for derived in ("triples", "nodes", "edges", "metrics"):
        shutil.rmtree(out / derived, ignore_errors=True)

    paths = _write_derived_outputs(str(docs_kg_dir), out, config)
    return {**summary, "docs_kg": str(docs_kg_dir), **paths}


def build_kg(
    documents: ray.data.Dataset,
    config: PipelineConfig | None = None,
    demos: list[dict] | None = None,
) -> dict[str, ray.data.Dataset]:
    """Full pipeline; returns lazy datasets {'triples', 'nodes', 'edges'}.

    The caller consumes them with write_parquet / iter_batches — nothing is
    materialized here.
    """
    config = config or PipelineConfig()
    extracted = extract_documents(documents, config)
    kg = run_kg_stage(extracted, config, demos)
    triples = triples_dataset(kg, config)
    return {
        "triples": triples,
        "nodes": canonicalize_nodes(
            kg.select_columns(["url", "kg_aligned_json", "kg_links_json"]), config
        ),
        "edges": edges_dataset(triples, config),
    }
