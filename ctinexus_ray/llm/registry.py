"""Model/provider registry (operator M5 in SURVEY §2.3).

Replaces the reference's env-keyed ``MODELS``/``EMBEDDING_MODELS`` dicts and
provider auto-detection (reference ctinexus/utils/model_utils.py:8-101,
ctinexus/__init__.py:81-100): plain data, resolved once on the driver and
shipped to actors inside ``PipelineConfig``.
"""

from __future__ import annotations

import os

# provider -> (env var holding the API key, example models)
PROVIDERS: dict[str, dict] = {
    "openai": {
        "api_key_env": "OPENAI_API_KEY",
        "models": ("gpt-4.1", "gpt-4o", "o4-mini"),
        "embedding_models": ("text-embedding-3-large", "text-embedding-3-small"),
    },
    "anthropic": {
        "api_key_env": "ANTHROPIC_API_KEY",
        "models": ("claude-sonnet-4-20250514",),
        "embedding_models": (),
    },
    "gemini": {
        "api_key_env": "GEMINI_API_KEY",
        "models": ("gemini-2.0-flash",),
        "embedding_models": ("text-embedding-004",),
    },
    "meta": {
        "api_key_env": "META_API_KEY",
        "models": ("llama-3.3-70b",),
        "embedding_models": (),
    },
    "ollama": {
        "api_key_env": None,  # local server, no key
        "models": ("llama3", "qwen2"),
        "embedding_models": ("nomic-embed-text",),
    },
    "mock": {
        "api_key_env": None,
        "models": ("mock-1",),
        "embedding_models": ("mock-embed-64",),
    },
}

_MODEL_PREFIX_TO_PROVIDER = {
    "gpt": "openai",
    "o4": "openai",
    "o3": "openai",
    "claude": "anthropic",
    "gemini": "gemini",
    "llama": "meta",
    "qwen": "ollama",
    "mock": "mock",
}


def detect_provider(model: str) -> str:
    """Auto-detect provider from a model name; 'provider/model' strings win
    (reference ctinexus/__init__.py:93-100 semantics)."""
    if "/" in model:
        return model.split("/", 1)[0]
    low = model.lower()
    for prefix, provider in _MODEL_PREFIX_TO_PROVIDER.items():
        if low.startswith(prefix):
            return provider
    return "openai"


def split_model(model: str) -> tuple[str, str]:
    """'provider/model' -> (provider, model); bare model auto-detected."""
    if "/" in model:
        provider, name = model.split("/", 1)
        return provider, name
    return detect_provider(model), model


def has_api_key(provider: str) -> bool:
    env = PROVIDERS.get(provider, {}).get("api_key_env")
    return env is None or bool(os.getenv(env))


def resolve_stage_models(
    default_model: str, overrides: dict[str, str] | None = None
) -> dict[str, tuple[str, str]]:
    """Per-stage (provider, model) resolution with per-stage overrides,
    mirroring the reference's ie/et/ea/lp_model CLI flags
    (reference ctinexus/app.py:60-73)."""
    overrides = overrides or {}
    stages = ("ie", "et", "ea", "lp", "summarize")
    return {
        stage: split_model(overrides.get(f"{stage}_model", default_model))
        for stage in stages
    }
