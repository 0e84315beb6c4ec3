"""KG actor-pool stages (M1-M3, IE/ET/EA/LP) over Arrow batches.

Two equivalent compositions are provided:

  * ``KGDocStage`` — the flagship FUSED stage: one actor pool runs
    IE -> ET -> EA -> LP per document. With per-document LLM semantics and
    no shuffle between the four stages, fusing removes three rounds of
    batch (de)serialization; actor state (client, demo list, embedding
    cache, compiled templates) is built once in ``__init__``.
  * ``IEStage`` / ``ETStage`` / ``EAStage`` / ``LPStage`` — the unfused
    per-stage actor classes, carrying intermediate nested state in a JSON
    string column (``kg_*_json``). Use these when stages need different
    pool sizes (e.g. a rate-limited real LLM for IE but a cheap local
    embedding server for EA).

All classes follow the Ray Data actor contract: construct with
``map_batches(Cls, fn_constructor_kwargs=..., concurrency=(min,max),
batch_size=B, batch_format="pyarrow")``.
"""

from __future__ import annotations

import json

import pyarrow as pa

from ctinexus_ray.config import PipelineConfig
from ctinexus_ray.llm.client import get_client
from ctinexus_ray.pipelines import singledoc


def _str_col(values) -> pa.Array:
    return pa.array(values, type=pa.string())


def _i32(values) -> pa.Array:
    return pa.array(values, type=pa.int32())


def _i64(values) -> pa.Array:
    return pa.array(values, type=pa.int64())


class _ActorBase:
    """Shared actor setup: client + config built once per actor process."""

    def __init__(self, config: PipelineConfig, demos: list[dict] | None = None):
        from ctinexus_ray.llm.prompts import make_ie_prefix

        self.config = config
        self.client = get_client(config)
        self.demos = demos or []
        # static few-shot prompt prefix rendered ONCE per actor (quirk Q1:
        # the demo selection is a corpus constant)
        self.ie_prefix = make_ie_prefix(self.demos)
        # corpus-level embedding cache (normalized mention text -> vector);
        # lives for the actor's lifetime, shared across batches
        self.embed_cache: dict[str, tuple[list[float], int]] = {}

    def _map_docs(self, items: list, fn) -> list:
        """Run ``fn`` over the batch's documents with at most
        ``config.llm_max_inflight`` concurrent LLM requests in flight
        (order-preserving). Serial when the knob is 1 — exact reference
        parity. The embed cache is shared across threads; the worst race
        is recomputing one deterministic (vector, token_count) pair
        twice (dict get/set are GIL-atomic), never a wrong result —
        per-doc embed metering charges each document for its own texts
        (run_ea), so cache state cannot leak into outputs."""
        inflight = getattr(self.config, "llm_max_inflight", 1)
        if inflight <= 1 or len(items) <= 1:
            return [fn(x) for x in items]
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=min(inflight, len(items))) as ex:
            return list(ex.map(fn, items))


class KGDocStage(_ActorBase):
    """Fused IE->ET->EA->LP per document (the flagship stage)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column("cti_text").to_pylist()
        envelopes = self._map_docs(
            texts,
            lambda text: singledoc.process_document(
                text, self.client, self.config, self.demos, self.embed_cache,
                ie_prefix=self.ie_prefix,
            ),
        )
        out = batch
        out = out.append_column(
            "kg_aligned_json",
            _str_col([json.dumps(e["EA"]["aligned_triplets"]) for e in envelopes]),
        )
        out = out.append_column(
            "kg_links_json",
            _str_col([json.dumps(e["LP"]["predicted_links"]) for e in envelopes]),
        )
        out = out.append_column(
            "mentions_num", _i32([e["EA"]["mentions_num"] for e in envelopes])
        )
        out = out.append_column(
            "entity_num", _i32([e["EA"]["entity_num"] for e in envelopes])
        )
        out = out.append_column(
            "subgraph_num", _i32([e["LP"]["subgraph_num"] for e in envelopes])
        )
        out = out.append_column(
            "triples_count", _i32([e["IE"]["triples_count"] for e in envelopes])
        )
        out = out.append_column(
            "dropped_triplets",
            _i32(
                [
                    e["IE"]["dropped"] + e["ET"]["dropped"] + e["EA"]["dropped"]
                    + e["LP"]["dropped"]
                    for e in envelopes
                ]
            ),
        )
        out = out.append_column(
            "llm_input_tokens",
            _i64(
                [
                    e["IE"]["model_usage"]["input"]["tokens"]
                    + e["ET"]["model_usage"]["input"]["tokens"]
                    + e["LP"]["model_usage"]["input"]["tokens"]
                    for e in envelopes
                ]
            ),
        )
        out = out.append_column(
            "llm_output_tokens",
            _i64(
                [
                    e["IE"]["model_usage"]["output"]["tokens"]
                    + e["ET"]["model_usage"]["output"]["tokens"]
                    + e["LP"]["model_usage"]["output"]["tokens"]
                    for e in envelopes
                ]
            ),
        )
        out = out.append_column(
            "embed_tokens",
            _i64([e["EA"]["model_usage"]["input"]["tokens"] for e in envelopes]),
        )
        return out


class IEStage(_ActorBase):
    """Few-shot triple extraction; adds ``kg_ie_json`` + counters."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = self._map_docs(
            batch.column("cti_text").to_pylist(),
            lambda text: singledoc.run_ie(
                text, self.client, self.config, self.demos,
                ie_prefix=self.ie_prefix,
            ),
        )
        out = batch.append_column(
            "kg_ie_json", _str_col([json.dumps(r["triplets"]) for r in results])
        )
        out = out.append_column(
            "triples_count", _i32([r["triples_count"] for r in results])
        )
        out = out.append_column("ie_dropped", _i32([r["dropped"] for r in results]))
        out = out.append_column(
            "ie_input_tokens",
            _i64([r["model_usage"]["input"]["tokens"] for r in results]),
        )
        out = out.append_column(
            "ie_output_tokens",
            _i64([r["model_usage"]["output"]["tokens"] for r in results]),
        )
        return out


class ETStage(_ActorBase):
    """Entity typing; consumes ``kg_ie_json``, adds ``kg_et_json``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = self._map_docs(
            batch.column("kg_ie_json").to_pylist(),
            lambda ie_json: singledoc.run_et(
                json.loads(ie_json), self.client, self.config
            ),
        )
        out = batch.append_column(
            "kg_et_json", _str_col([json.dumps(r["typed_triplets"]) for r in results])
        )
        out = out.append_column("et_dropped", _i32([r["dropped"] for r in results]))
        out = out.append_column(
            "et_input_tokens",
            _i64([r["model_usage"]["input"]["tokens"] for r in results]),
        )
        out = out.append_column(
            "et_output_tokens",
            _i64([r["model_usage"]["output"]["tokens"] for r in results]),
        )
        return out


class EAStage(_ActorBase):
    """Alignment (preprocess + embed-merge + IOC unmerge); consumes
    ``kg_et_json``, adds ``kg_aligned_json``."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = self._map_docs(
            batch.column("kg_et_json").to_pylist(),
            lambda et_json: singledoc.run_ea(
                json.loads(et_json), self.client, self.config, self.embed_cache
            ),
        )
        out = batch.append_column(
            "kg_aligned_json",
            _str_col([json.dumps(r["aligned_triplets"]) for r in results]),
        )
        out = out.append_column(
            "mentions_num", _i32([r["mentions_num"] for r in results])
        )
        out = out.append_column("entity_num", _i32([r["entity_num"] for r in results]))
        out = out.append_column("ea_dropped", _i32([r["dropped"] for r in results]))
        out = out.append_column(
            "embed_tokens",
            _i64([r["model_usage"]["input"]["tokens"] for r in results]),
        )
        return out


class LPStage(_ActorBase):
    """Link prediction; consumes ``kg_aligned_json`` + ``cti_text``,
    adds ``kg_links_json`` + graph counters."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        results = self._map_docs(
            list(
                zip(
                    batch.column("cti_text").to_pylist(),
                    batch.column("kg_aligned_json").to_pylist(),
                )
            ),
            lambda item: singledoc.run_lp(
                item[0], json.loads(item[1]), self.client, self.config
            ),
        )
        out = batch.append_column(
            "kg_links_json",
            _str_col([json.dumps(r["predicted_links"]) for r in results]),
        )
        out = out.append_column(
            "subgraph_num", _i32([r["subgraph_num"] for r in results])
        )
        out = out.append_column(
            "lp_input_tokens",
            _i64([r["model_usage"]["input"]["tokens"] for r in results]),
        )
        out = out.append_column(
            "lp_output_tokens",
            _i64([r["model_usage"]["output"]["tokens"] for r in results]),
        )
        return out
