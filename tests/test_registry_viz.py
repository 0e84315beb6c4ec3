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


class TestInteractiveViz:
    NODES = [
        {"entity_key": 1, "entity_text": "ShadowPulse", "entity_class": "Malware"},
        {"entity_key": 2, "entity_text": "CVE-2023-1", "entity_class": "Vulnerability"},
        {"entity_key": 3, "entity_text": "Acme <Corp>", "entity_class": "Organization"},
    ]
    EDGES = [
        {"subj_key": 1, "rel": "exploits", "obj_key": 2},
        {"subj_key": 1, "rel": "targets", "obj_key": 3, "predicted": True},
        {"subj_key": 9, "rel": "dangling", "obj_key": 1},  # dropped
    ]

    def test_interactive_html_payload(self, tmp_path):
        import json

        from ctinexus_ray.viz import write_interactive_graph_html

        path = write_interactive_graph_html(self.NODES, self.EDGES, tmp_path / "g.html")
        doc = path.read_text()
        # embedded data island parses and carries the graph
        start = doc.index('type="application/json">') + len('type="application/json">')
        data = json.loads(doc[start:doc.index("</script>", start)])
        assert [n["id"] for n in data["nodes"]] == [1, 2, 3]
        assert len(data["edges"]) == 2  # dangling edge dropped
        assert data["edges"][1]["p"] is True  # predicted flag survives
        # dark-theme + legend + interaction hooks present (pyvis parity)
        assert "#27272a" in doc and "Legend" in doc
        assert "Predicted" in doc and "#ff4444" in doc
        for hook in ("mousedown", "mousemove", "wheel", "requestAnimationFrame"):
            assert hook in doc
        # self-contained: no external scripts/styles
        assert "http" not in doc.split("</style>")[0]
        assert "src=" not in doc

    def test_graph_server_roundtrip(self, tmp_path):
        import urllib.request

        from ctinexus_ray.viz import start_graph_server, write_interactive_graph_html

        write_interactive_graph_html(self.NODES, self.EDGES, tmp_path / "net_1.html")
        base, server = start_graph_server(tmp_path)
        try:
            with urllib.request.urlopen(f"{base}/net_1.html", timeout=5) as resp:
                body = resp.read().decode()
            assert resp.status == 200
            assert "ShadowPulse" in body
            # directory listing also serves (reference serves the dir)
            with urllib.request.urlopen(f"{base}/", timeout=5) as resp:
                assert resp.status == 200
        finally:
            server.shutdown()

    def test_js_executes_under_node_shim(self, tmp_path):
        """Run the embedded physics/render loop in a real JS engine with a
        minimal DOM shim: the loop must survive 5 frames and draw every
        node each frame."""
        import json
        import shutil
        import subprocess

        import pytest

        if not shutil.which("node"):
            pytest.skip("node not available")
        from ctinexus_ray.viz import write_interactive_graph_html

        path = write_interactive_graph_html(self.NODES, self.EDGES, tmp_path / "g.html")
        shim = r"""
const fs = require('fs');
const doc = fs.readFileSync(process.argv[1], 'utf8');
const m = doc.match(/<script id="graph-data" type="application\/json">([\s\S]*?)<\/script>\s*<script>([\s\S]*?)<\/script>/);
const dataJson = m[1], js = m[2];
const calls = {arc: 0, fillText: 0};
const ctx = new Proxy({}, {get: (t, k) => { if (k in calls) return () => calls[k]++; return () => {}; }, set: () => true});
const canvas = {width: 0, height: 0, getContext: () => ctx, addEventListener: () => {}, title: '', style: {}};
let frames = 0;
global.document = {getElementById: id => id === 'graph-data' ? {textContent: dataJson} : canvas};
global.window = {innerWidth: 1280, innerHeight: 720, addEventListener: () => {}};
global.requestAnimationFrame = f => { if (frames++ < 5) f(); };
eval(js);
console.log(JSON.stringify({frames, arc: calls.arc, labels: calls.fillText}));
"""
        out = subprocess.run(
            ["node", "-e", shim, str(path)],
            capture_output=True, text=True, timeout=30,
        )
        assert out.returncode == 0, out.stderr
        result = json.loads(out.stdout)
        assert result["frames"] >= 5
        assert result["arc"] == len(self.NODES) * 6  # every node, every frame

    def test_find_free_port_skips_taken(self):
        import socket

        from ctinexus_ray.viz import find_free_port

        with socket.socket() as s:
            s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
            s.bind(("127.0.0.1", 0))
            s.listen(1)
            taken = s.getsockname()[1]
            port = find_free_port(default=taken)
            assert port != taken


class TestWebApp:
    """The dependency-free Gradio-app counterpart (ctinexus_ray/webapp.py):
    form -> pipeline -> triples table + graph; /api/run JSON surface."""

    @staticmethod
    def _serve():
        import threading

        from ctinexus_ray.webapp import serve

        server, port = serve(port=0)
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        return server, port

    def test_form_run_and_api(self):
        import json
        import urllib.parse
        import urllib.request

        server, port = self._serve()
        try:
            base = f"http://127.0.0.1:{port}"
            with urllib.request.urlopen(base + "/") as resp:
                page = resp.read().decode()
            assert "Extract knowledge graph" in page

            text = ("In March 2024 the threat actor APT99 exploited "
                    "CVE-2024-1234 to deploy the LockBit ransomware "
                    "against the healthcare sector.")
            body = urllib.parse.urlencode(
                {"text": text, "provider": "mock", "model": "mock-1",
                 "similarity_threshold": "0.6", "shot": "3"}
            ).encode()
            with urllib.request.urlopen(base + "/run", data=body) as resp:
                result = resp.read().decode()
            assert "entities" in result and "raw envelope JSON" in result
            assert "graph-data" in result  # embedded interactive graph

            req = urllib.request.Request(
                base + "/api/run",
                data=json.dumps({"text": text}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req) as resp:
                envelope = json.loads(resp.read())
            assert {"IE", "ET", "EA", "LP"} <= set(envelope)
            assert envelope["EA"]["aligned_triplets"]
        finally:
            server.shutdown()
            server.server_close()

    def test_error_paths(self):
        import json
        import urllib.error
        import urllib.parse
        import urllib.request

        server, port = self._serve()
        try:
            base = f"http://127.0.0.1:{port}"
            # empty form re-renders with an error, not a 500
            with urllib.request.urlopen(
                base + "/run", data=urllib.parse.urlencode({"text": ""}).encode()
            ) as resp:
                page = resp.read().decode()
            assert "provide report text" in page
            # API surfaces the error as JSON 400
            req = urllib.request.Request(
                base + "/api/run", data=b"{}",
                headers={"Content-Type": "application/json"},
            )
            try:
                urllib.request.urlopen(req)
                raise AssertionError("expected 400")
            except urllib.error.HTTPError as e:
                assert e.code == 400
                assert "error" in json.loads(e.read())
        finally:
            server.shutdown()
            server.server_close()

    def test_envelope_graph_shapes(self):
        from ctinexus_ray.webapp import build_envelope, envelope_graph

        envelope = build_envelope(
            "APT99 exploited CVE-2024-1234 to deploy LockBit.", None
        )
        nodes, edges = envelope_graph(envelope)
        assert nodes and edges
        keys = {n["entity_key"] for n in nodes}
        assert all(e["subj_key"] in keys and e["obj_key"] in keys for e in edges)
