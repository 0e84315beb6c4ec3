"""Pipeline configuration.

Replaces the reference's hydra/omegaconf config tree
(reference ctinexus/config/config.yaml, ctinexus/utils/model_utils.py) with a
plain frozen dataclass that is cheap to ship to Ray actors.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    """Knobs mirroring the reference defaults.

    Defaults follow reference ctinexus/config/config.yaml:9-30 where a
    counterpart exists; Ray-specific knobs (batch sizes, concurrency) are new.
    """

    # --- model / provider (reference config.yaml:9-11) -------------------
    provider: str = "mock"            # mock | openai | anthropic | gemini | meta | ollama
    model: str = "mock-1"
    embedding_model: str = "mock-embed-64"

    # --- stage behavior ---------------------------------------------------
    similarity_threshold: float = 0.6  # EA cosine threshold (config.yaml:14)
    shot: int = 3                      # few-shot demo count (config.yaml:29)
    permutation: str = "asc"           # demo order (config.yaml:28)
    retriever: str = "knn"             # knn | fixed (config.yaml:27)
    max_tokens: int = 4096             # completion cap (llm_processor.py:1022)
    temperature: float = 0.8           # IE/ET/LP temp (llm_processor.py:1049..)
    summary_temperature: float = 0.0   # URL summarize temp (llm_processor.py:680)
    max_retries: int = 5               # app-level retry (llm_processor.py:140-160)

    # --- extraction caps (llm_processor.py:419,723) ----------------------
    merge_max_chars: int = 16000
    focus_max_chars: int = 10000

    # --- Ray execution knobs ---------------------------------------------
    # Batch of documents handled per actor call. Against a rate-limited
    # real LLM API, use a SMALL batch (16-64) so one slow batch cannot
    # stall a block; with the CPU-bound mock provider, a large batch
    # amortizes per-task dispatch overhead (measured: 64 -> 512 nearly
    # doubled throughput at 32 CPUs).
    doc_batch_size: int = 512
    # Actor-pool bounds for LLM-backed stages. Fixed-size pools (min=max)
    # utilize immediately; autoscaling ramps too slowly for short jobs.
    llm_concurrency: tuple[int, int] = (2, 8)
    # CPUs reserved per LLM actor. Against a real rate-limited API this
    # should drop to ~0.25 with a much higher concurrency ceiling.
    llm_num_cpus: float = 1.0
    # Bounded in-flight LLM requests per actor __call__. 1 = serial
    # (reference parity: llm_processor.py:911-974 loops documents
    # serially). Against a real rate-limited HTTP provider raise this so
    # one actor keeps N requests outstanding (threads block on I/O, not
    # the GIL); with the CPU-bound mock there is nothing to overlap, so
    # the default stays serial.
    llm_max_inflight: int = 1
    # Stateless CPU stages (extraction, preprocess, explode).
    cpu_batch_size: int = 256

    # canonicalization shuffle
    canon_num_partitions: int = 0      # 0 = let Ray pick
    # map-side combine threshold: pre-aggregate duplicate mentions inside
    # each batch before the global groupby (head-key skew mitigation).
    combine_in_batch: bool = True

    extra: dict = field(default_factory=dict)
