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


# ---------------------------------------------------------------------------
# compose + dotted overrides (the reference's hydra compose/override
# surface — reference ctinexus/utils/gradio_utils.py:70-86 builds its
# config with hydra.compose(config_name=..., overrides=["k=v", ...]) —
# re-expressed over the plain dataclass: JSON/dict layers merge in order,
# then "key=value" overrides win, with types coerced from the dataclass
# field defaults and unknown keys rejected loudly).
# ---------------------------------------------------------------------------


def _coerce(value: str, template):
    """Parse a string override to the type of the field's default."""
    if isinstance(template, bool):
        low = value.lower()
        if low in ("true", "1", "yes", "on"):
            return True
        if low in ("false", "0", "no", "off"):
            return False
        raise ValueError(f"expected a boolean, got {value!r}")
    if isinstance(template, int) and not isinstance(template, bool):
        return int(value)
    if isinstance(template, float):
        return float(value)
    if isinstance(template, tuple):
        parts = [p for p in value.replace("(", "").replace(")", "").split(",") if p]
        inner = template[0] if template else 0
        return tuple(_coerce(p.strip(), inner) for p in parts)
    return value


def compose_config(*layers, overrides: tuple | list = ()) -> PipelineConfig:
    """Build a PipelineConfig from ordered layers + dotted overrides.

    ``layers`` are dicts or paths to JSON files; later layers win, and
    each layer's ``extra`` dict MERGES instead of replacing (the config-
    group behavior of the reference's compose tree). ``overrides`` are
    ``"key=value"`` strings — ``extra.some_key=v`` targets the extras
    dict, everything else must name a dataclass field (typo-checked
    against the field list, value coerced to the field default's type).
    """
    import dataclasses
    import difflib
    import json

    fields = {f.name: f for f in dataclasses.fields(PipelineConfig)}
    merged: dict = {}
    extra: dict = {}
    for layer in layers:
        if isinstance(layer, (str, bytes)):
            with open(layer, encoding="utf-8") as fh:
                layer = json.load(fh)
        if not isinstance(layer, dict):
            raise TypeError(f"config layer must be dict or path, got {type(layer)}")
        layer = dict(layer)
        extra.update(layer.pop("extra", {}) or {})
        for key in layer:
            if key not in fields:
                hint = difflib.get_close_matches(key, fields, n=1)
                raise KeyError(
                    f"unknown config key {key!r}"
                    + (f" — did you mean {hint[0]!r}?" if hint else "")
                )
        merged.update(layer)
    for item in overrides:
        key, sep, value = item.partition("=")
        if not sep:
            raise ValueError(f"override {item!r} is not key=value")
        key = key.strip()
        if key.startswith("extra."):
            extra[key[len("extra."):]] = value
            continue
        if key not in fields:
            hint = difflib.get_close_matches(key, fields, n=1)
            raise KeyError(
                f"unknown config key {key!r}"
                + (f" — did you mean {hint[0]!r}?" if hint else "")
            )
        default = fields[key].default
        if default is dataclasses.MISSING:
            default = fields[key].default_factory()  # type: ignore[misc]
        merged[key] = _coerce(value, default) if isinstance(value, str) else value
    if extra:
        merged["extra"] = extra
    # json round-trips tuples as lists; restore tuple-typed fields
    for key, val in list(merged.items()):
        if isinstance(val, list) and isinstance(fields[key].default, tuple):
            merged[key] = tuple(val)
    return PipelineConfig(**merged)
