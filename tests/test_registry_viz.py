"""Tests for the model registry (M5) and the HTML graph writer (S5)."""

from __future__ import annotations

from ctinexus_ray.llm.registry import (
    detect_provider,
    has_api_key,
    resolve_stage_models,
    split_model,
)
from ctinexus_ray.viz import write_graph_html


class TestRegistry:
    def test_detect(self):
        assert detect_provider("gpt-4.1") == "openai"
        assert detect_provider("claude-sonnet-4-20250514") == "anthropic"
        assert detect_provider("gemini-2.0-flash") == "gemini"
        assert detect_provider("mock-1") == "mock"
        assert detect_provider("openai/gpt-4o") == "openai"

    def test_split(self):
        assert split_model("gemini/flash-x") == ("gemini", "flash-x")
        assert split_model("gpt-4.1") == ("openai", "gpt-4.1")

    def test_stage_overrides(self):
        resolved = resolve_stage_models("mock-1", {"ie_model": "openai/gpt-4.1"})
        assert resolved["ie"] == ("openai", "gpt-4.1")
        assert resolved["et"] == ("mock", "mock-1")

    def test_mock_needs_no_key(self):
        assert has_api_key("mock")
        assert has_api_key("ollama")


class TestViz:
    def test_writes_self_contained_html(self, tmp_path):
        nodes = [
            {"entity_key": 1, "entity_text": "ShadowPulse", "entity_class": "Malware"},
            {"entity_key": 2, "entity_text": "CVE-2023-1", "entity_class": "Vulnerability"},
            {"entity_key": 3, "entity_text": "Acme <Corp>", "entity_class": "Organization"},
        ]
        edges = [
            {"subj_key": 1, "rel": "exploits", "obj_key": 2},
            {"subj_key": 1, "rel": "targets", "obj_key": 3},
            {"subj_key": 9, "rel": "dangling", "obj_key": 1},  # dropped
        ]
        path = write_graph_html(nodes, edges, tmp_path / "g.html")
        doc = path.read_text()
        assert "<svg" in doc and "ShadowPulse" in doc
        assert "Acme &lt;Corp&gt;" in doc  # escaped
        assert doc.count("<line") == 2  # dangling edge dropped
        assert "3 nodes, 2 edges" in doc

    def test_cap(self, tmp_path):
        nodes = [
            {"entity_key": i, "entity_text": f"e{i}", "entity_class": "Tool"}
            for i in range(300)
        ]
        path = write_graph_html(nodes, [], tmp_path / "g.html", max_nodes=100)
        assert "100 nodes" in path.read_text()
