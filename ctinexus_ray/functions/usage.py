"""Token/cost accounting (operators M4, A2 in SURVEY §2).

Replaces the reference's ``UsageCalculator`` + ``merge_usages``
(reference ctinexus/llm_processor.py:1214-1272, :804-826). The price map is
loaded once and closed over inside actors; per-call usage becomes rows of
the ``metrics`` table instead of nested dicts.
"""

from __future__ import annotations

# Per-token USD prices (input, output): the COMPLETE price table of the
# reference (reference ctinexus/config/cost.json:1-186 — public provider
# list prices), plus the free mock provider. Unknown models price at 0
# (reference UsageCalculator behavior for missing entries).
DEFAULT_PRICES: dict[str, tuple[float, float]] = {
    # OpenAI completion models
    "gpt-4.1": (2e-06, 8e-06),
    "gpt-4o": (2.5e-06, 1e-05),
    "gpt-4": (3e-05, 6e-05),
    "gpt-4-turbo": (1e-05, 3e-05),
    "gpt-3.5-turbo": (5e-07, 1.5e-06),
    "gpt-4.1-mini": (4e-07, 1.6e-06),
    "gpt-4o-mini": (1.5e-07, 6e-07),
    "gpt-4.1-nano": (1e-07, 4e-07),
    "o3": (2e-06, 8e-06),
    "o3-pro": (2e-05, 8e-05),
    "o3-mini": (1.1e-06, 4.4e-06),
    "o4-mini": (1.1e-06, 4.4e-06),
    # Bedrock / Anthropic / Amazon / partner models
    "anthropic.claude-3-7-sonnet": (3e-06, 1.5e-05),
    "anthropic.claude-3-5-sonnet": (3e-06, 1.5e-05),
    "anthropic.claude-3-5-haiku": (8e-07, 4e-06),
    "anthropic.claude-3-haiku": (2.5e-07, 1.25e-06),
    "amazon.nova-micro-v1:0": (3.5e-08, 1.4e-07),
    "amazon.nova-lite-v1:0": (6e-08, 2.4e-07),
    "amazon.nova-pro-v1:0": (4.5e-07, 1.8e-06),
    "deepseek.r1-v1:0": (1.4e-07, 7e-07),
    "mistral.pixtral-large-2502-v1:0": (1e-06, 3e-06),
    "meta.llama3-1-8b-instruct-v1:0": (1.5e-07, 6e-07),
    "meta.llama3-1-70b-instruct-v1:0": (7.5e-07, 3e-06),
    "meta.llama3-2-11b-instruct-v1:0": (2e-07, 8e-07),
    # embedding models
    "text-embedding-3-small": (2e-08, 0.0),
    "text-embedding-3-large": (1.3e-07, 0.0),
    "text-embedding-ada-002": (1e-07, 0.0),
    "amazon.titan-embed-text-v2:0": (1.2e-07, 0.0),
    "gemini-embedding-001": (1.5e-07, 0.0),
    # Gemini completion models
    "gemini-2.5-flash-lite": (1e-07, 4e-07),
    "gemini-2.0-flash": (1e-07, 4e-07),
    "gemini-2.0-flash-lite": (7.5e-08, 3e-07),
    # local (ollama) models — free
    "llama3.1:8b": (0.0, 0.0),
    "llama3.1:70b": (0.0, 0.0),
    "llama3:8b": (0.0, 0.0),
    "mistral:7b": (0.0, 0.0),
    "mixtral:8x7b": (0.0, 0.0),
    "qwen2.5:7b": (0.0, 0.0),
    "qwen2.5:14b": (0.0, 0.0),
    "phi3:14b": (0.0, 0.0),
    "gemma2:9b": (0.0, 0.0),
    "gemma2:27b": (0.0, 0.0),
    "nomic-embed-text": (0.0, 0.0),
    "mxbai-embed-large": (0.0, 0.0),
    "all-minilm": (0.0, 0.0),
    "snowflake-arctic-embed": (0.0, 0.0),
    # this engine's deterministic mock provider
    "mock-1": (0.0, 0.0),
    "mock-embed-64": (0.0, 0.0),
}


def zero_usage(model: str) -> dict:
    return {
        "model": model,
        "input": {"tokens": 0, "cost": 0},
        "output": {"tokens": 0, "cost": 0},
        "total": {"tokens": 0, "cost": 0},
    }


def calculate_usage(
    model: str,
    input_tokens: int,
    output_tokens: int,
    prices: dict[str, tuple[float, float]] | None = None,
) -> dict:
    """Build the reference-shaped usage record from raw token counts."""
    prices = prices or DEFAULT_PRICES
    in_price, out_price = prices.get(model, (0.0, 0.0))
    in_cost = input_tokens * in_price
    out_cost = output_tokens * out_price
    return {
        "model": model,
        "input": {"tokens": input_tokens, "cost": in_cost},
        "output": {"tokens": output_tokens, "cost": out_cost},
        "total": {"tokens": input_tokens + output_tokens, "cost": in_cost + out_cost},
    }


def merge_usages(usage_a: dict, usage_b: dict) -> dict:
    """Sum two usage records of the same model; mirror the reference's
    keep-b-on-model-mismatch behavior (ctinexus/llm_processor.py:804-826)."""
    if not usage_a:
        return usage_b
    if not usage_b:
        return usage_a
    if usage_a.get("model") != usage_b.get("model"):
        return usage_b
    return {
        "model": usage_a["model"],
        "input": {
            "tokens": usage_a["input"]["tokens"] + usage_b["input"]["tokens"],
            "cost": usage_a["input"]["cost"] + usage_b["input"]["cost"],
        },
        "output": {
            "tokens": usage_a["output"]["tokens"] + usage_b["output"]["tokens"],
            "cost": usage_a["output"]["cost"] + usage_b["output"]["cost"],
        },
        "total": {
            "tokens": usage_a["total"]["tokens"] + usage_b["total"]["tokens"],
            "cost": usage_a["total"]["cost"] + usage_b["total"]["cost"],
        },
    }
