"""LLM client layer: provider request shaping, retry, deterministic mock."""

from ctinexus_ray.llm.client import LLMClient, build_request, get_client

__all__ = ["LLMClient", "build_request", "get_client"]
