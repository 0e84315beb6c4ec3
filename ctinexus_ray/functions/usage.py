"""Token/cost accounting (operators M4, A2 in SURVEY §2).

Replaces the reference's ``UsageCalculator`` + ``merge_usages``
(reference ctinexus/llm_processor.py:1214-1272, :804-826). The price map is
loaded once and closed over inside actors; per-call usage becomes rows of
the ``metrics`` table instead of nested dicts.
"""

from __future__ import annotations

# Per-token USD prices (input, output). A small built-in subset of the
# reference's price table (reference ctinexus/config/cost.json); the mock
# provider is free.
DEFAULT_PRICES: dict[str, tuple[float, float]] = {
    "gpt-4.1": (2e-06, 8e-06),
    "gpt-4o": (2.5e-06, 1e-05),
    "o4-mini": (1.1e-06, 4.4e-06),
    "text-embedding-3-large": (1.3e-07, 0.0),
    "text-embedding-3-small": (2e-08, 0.0),
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
