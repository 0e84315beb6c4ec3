"""Minimal self-contained HTML graph visualization (operator S5).

The reference renders an interactive pyvis network with a legend and
serves it over a local HTTP thread (reference
ctinexus/graph_constructor.py:483-677, ctinexus/utils/http_server_utils.py).
pyvis and its CDN assets are unavailable here, so this writes a single
dependency-free HTML file: inline SVG with a deterministic circular
layout, class-colored nodes, a legend, and hover titles. A driver-side
utility for SMALL graphs (the engine's real output is the parquet
nodes/edges tables) — cap enforced.
"""

from __future__ import annotations

import html
import json
import math
from pathlib import Path

# class -> color, following the reference's legend spirit
_CLASS_COLORS = {
    "Malware": "#d62728",
    "Attacker": "#9467bd",
    "Tool": "#1f77b4",
    "Indicator": "#ff7f0e",
    "Vulnerability": "#e377c2",
    "Infrastructure": "#2ca02c",
    "Organization": "#17becf",
    "Location": "#bcbd22",
    "Event": "#8c564b",
    "Time": "#7f7f7f",
}
_DEFAULT_COLOR = "#aaaaaa"


def write_graph_html(
    nodes: list[dict],
    edges: list[dict],
    out_path: str | Path,
    max_nodes: int = 200,
    title: str = "ctinexus-ray knowledge graph",
) -> Path:
    """nodes: [{entity_key, entity_text, entity_class}]; edges:
    [{subj_key, rel, obj_key}]. Returns the written path."""
    nodes = nodes[:max_nodes]
    keys = {n["entity_key"] for n in nodes}
    edges = [e for e in edges if e["subj_key"] in keys and e["obj_key"] in keys]

    n = max(len(nodes), 1)
    cx, cy, radius = 500, 400, 340
    positions = {}
    for i, node in enumerate(sorted(nodes, key=lambda x: x["entity_key"])):
        angle = 2 * math.pi * i / n
        positions[node["entity_key"]] = (
            cx + radius * math.cos(angle),
            cy + radius * math.sin(angle),
        )

    svg: list[str] = []
    for e in edges:
        x1, y1 = positions[e["subj_key"]]
        x2, y2 = positions[e["obj_key"]]
        svg.append(
            f'<line x1="{x1:.0f}" y1="{y1:.0f}" x2="{x2:.0f}" y2="{y2:.0f}" '
            f'stroke="#ccc" stroke-width="1"><title>{html.escape(e["rel"])}'
            "</title></line>"
        )
    for node in nodes:
        x, y = positions[node["entity_key"]]
        color = _CLASS_COLORS.get(node.get("entity_class", ""), _DEFAULT_COLOR)
        label = html.escape(str(node["entity_text"])[:24])
        svg.append(
            f'<circle cx="{x:.0f}" cy="{y:.0f}" r="7" fill="{color}">'
            f'<title>{html.escape(str(node["entity_text"]))} '
            f'({html.escape(str(node.get("entity_class", "")))})</title></circle>'
            f'<text x="{x + 9:.0f}" y="{y + 4:.0f}" font-size="9">{label}</text>'
        )

    legend = "".join(
        f'<span style="color:{c}">&#9679;</span> {html.escape(cls)} &nbsp;'
        for cls, c in _CLASS_COLORS.items()
    )
    doc = (
        "<!DOCTYPE html><html><head><meta charset='utf-8'>"
        f"<title>{html.escape(title)}</title></head><body>"
        f"<h3>{html.escape(title)}</h3><div>{legend}</div>"
        f"<svg width='1000' height='800' font-family='sans-serif'>"
        f"{''.join(svg)}</svg>"
        f"<p>{len(nodes)} nodes, {len(edges)} edges"
        f"{' (capped)' if len(nodes) == max_nodes else ''}</p>"
        "</body></html>"
    )
    out_path = Path(out_path)
    out_path.write_text(doc, encoding="utf-8")
    return out_path


_INTERACTIVE_JS = """
'use strict';
const DATA = JSON.parse(document.getElementById('graph-data').textContent);
const canvas = document.getElementById('net');
const ctx = canvas.getContext('2d');
let W = canvas.width = window.innerWidth, H = canvas.height = window.innerHeight;
const nodes = DATA.nodes.map((n, i) => ({
  ...n,
  x: W / 2 + Math.cos(2 * Math.PI * i / DATA.nodes.length) * Math.min(W, H) / 3,
  y: H / 2 + Math.sin(2 * Math.PI * i / DATA.nodes.length) * Math.min(W, H) / 3,
  vx: 0, vy: 0,
}));
const byId = Object.fromEntries(nodes.map(n => [n.id, n]));
const edges = DATA.edges.filter(e => byId[e.s] && byId[e.t]);
const deg = {};
edges.forEach(e => { deg[e.s] = (deg[e.s] || 0) + 1; deg[e.t] = (deg[e.t] || 0) + 1; });
let scale = 1, panX = 0, panY = 0, dragNode = null, dragView = false;
let lastX = 0, lastY = 0, hoverNode = null, running = true, ticks = 0;
function step() {
  const repulse = DATA.cfg.gravity, springLen = DATA.cfg.springLength;
  for (let i = 0; i < nodes.length; i++) for (let j = i + 1; j < nodes.length; j++) {
    const a = nodes[i], b = nodes[j];
    let dx = a.x - b.x, dy = a.y - b.y, d2 = dx * dx + dy * dy + 0.01, d = Math.sqrt(d2);
    const f = repulse / d2;
    dx /= d; dy /= d;
    a.vx += dx * f; a.vy += dy * f; b.vx -= dx * f; b.vy -= dy * f;
  }
  for (const e of edges) {
    const a = byId[e.s], b = byId[e.t];
    let dx = b.x - a.x, dy = b.y - a.y, d = Math.sqrt(dx * dx + dy * dy) + 0.01;
    const f = (d - springLen) * 0.02;
    dx /= d; dy /= d;
    a.vx += dx * f; a.vy += dy * f; b.vx -= dx * f; b.vy -= dy * f;
  }
  for (const n of nodes) {
    n.vx += (W / 2 - n.x) * 0.001; n.vy += (H / 2 - n.y) * 0.001;
    if (n !== dragNode) { n.x += n.vx; n.y += n.vy; }
    n.vx *= 0.6; n.vy *= 0.6;
  }
}
function draw() {
  ctx.setTransform(1, 0, 0, 1, 0, 0);
  ctx.fillStyle = DATA.cfg.background; ctx.fillRect(0, 0, W, H);
  ctx.setTransform(scale, 0, 0, scale, panX, panY);
  ctx.font = '12px sans-serif';
  for (const e of edges) {
    const a = byId[e.s], b = byId[e.t];
    ctx.strokeStyle = e.p ? DATA.cfg.predictedColor : DATA.cfg.edgeColor;
    ctx.setLineDash(e.p ? [6, 4] : []);
    ctx.beginPath(); ctx.moveTo(a.x, a.y); ctx.lineTo(b.x, b.y); ctx.stroke();
    const mx = (a.x + b.x) / 2, my = (a.y + b.y) / 2;
    ctx.fillStyle = '#cccccc'; ctx.fillText(e.r, mx + 4, my - 4);
    const ang = Math.atan2(b.y - a.y, b.x - a.x);
    const hx = b.x - Math.cos(ang) * 14, hy = b.y - Math.sin(ang) * 14;
    ctx.setLineDash([]);
    ctx.beginPath();
    ctx.moveTo(hx, hy);
    ctx.lineTo(hx - Math.cos(ang - 0.4) * 8, hy - Math.sin(ang - 0.4) * 8);
    ctx.lineTo(hx - Math.cos(ang + 0.4) * 8, hy - Math.sin(ang + 0.4) * 8);
    ctx.closePath(); ctx.fillStyle = ctx.strokeStyle; ctx.fill();
  }
  for (const n of nodes) {
    const r = 8 + Math.min(20, (deg[n.id] || 0) * 2);
    ctx.beginPath(); ctx.arc(n.x, n.y, r, 0, 2 * Math.PI);
    ctx.fillStyle = n.c; ctx.fill();
    if (n === hoverNode) { ctx.strokeStyle = '#ffffff'; ctx.lineWidth = 2; ctx.stroke(); ctx.lineWidth = 1; }
    ctx.fillStyle = '#ffffff'; ctx.fillText(n.l, n.x + r + 3, n.y + 4);
  }
}
function frame() {
  if (running && ticks < 600) { step(); ticks += 1; }
  draw();
  requestAnimationFrame(frame);
}
function toWorld(x, y) { return [(x - panX) / scale, (y - panY) / scale]; }
function pick(x, y) {
  const [wx, wy] = toWorld(x, y);
  return nodes.find(n => (n.x - wx) ** 2 + (n.y - wy) ** 2 < 400) || null;
}
canvas.addEventListener('mousedown', ev => {
  dragNode = pick(ev.offsetX, ev.offsetY);
  dragView = !dragNode; lastX = ev.offsetX; lastY = ev.offsetY; ticks = 0;
});
canvas.addEventListener('mousemove', ev => {
  hoverNode = pick(ev.offsetX, ev.offsetY);
  canvas.title = hoverNode ? hoverNode.title : '';
  if (dragNode) { const [wx, wy] = toWorld(ev.offsetX, ev.offsetY); dragNode.x = wx; dragNode.y = wy; ticks = 0; }
  else if (dragView) { panX += ev.offsetX - lastX; panY += ev.offsetY - lastY; lastX = ev.offsetX; lastY = ev.offsetY; }
});
window.addEventListener('mouseup', () => { dragNode = null; dragView = false; });
canvas.addEventListener('wheel', ev => {
  ev.preventDefault();
  const k = ev.deltaY < 0 ? 1.1 : 0.9;
  panX = ev.offsetX - (ev.offsetX - panX) * k; panY = ev.offsetY - (ev.offsetY - panY) * k;
  scale *= k;
}, { passive: false });
window.addEventListener('resize', () => { W = canvas.width = window.innerWidth; H = canvas.height = window.innerHeight; });
frame();
"""


def interactive_graph_html(
    nodes: list[dict],
    edges: list[dict],
    max_nodes: int = 300,
    title: str = "ctinexus-ray knowledge graph",
) -> str:
    """Interactive single-file HTML graph (operator S5, pyvis-parity path).

    The reference renders vis-network via pyvis with a physics layout,
    draggable nodes, zoom/pan, hover titles, degree-scaled node sizes,
    red predicted-link edges, and an injected fixed-position legend
    (reference ctinexus/graph_constructor.py:483-677). pyvis/CDN assets
    are unavailable here, so the same interactions are implemented as
    ~100 lines of inline vanilla JS on a canvas: spring+repulsion
    physics, drag nodes / drag view / wheel zoom, hover highlight,
    dashed red predicted edges, legend overlay. Zero dependencies —
    the file opens offline in any browser.

    nodes: [{entity_key, entity_text, entity_class, predicted?}];
    edges: [{subj_key, rel, obj_key, predicted?}].
    """
    nodes = nodes[:max_nodes]
    keys = {n["entity_key"] for n in nodes}
    edges = [e for e in edges if e["subj_key"] in keys and e["obj_key"] in keys]

    cfg = {
        # visual constants follow the reference's dark theme
        # (_VIS_CONFIG, graph_constructor.py:450-468)
        "background": "#27272a",
        "edgeColor": "#666666",
        "predictedColor": "#ff4444",
        "gravity": 3000.0,
        "springLength": _spring_length(nodes, edges),
    }
    data = {
        "cfg": cfg,
        "nodes": [
            {
                "id": n["entity_key"],
                "l": str(n["entity_text"])[:32],
                "title": f"{n['entity_text']} ({n.get('entity_class', '')})",
                "c": _CLASS_COLORS.get(n.get("entity_class", ""), _DEFAULT_COLOR),
            }
            for n in nodes
        ],
        "edges": [
            {
                "s": e["subj_key"],
                "t": e["obj_key"],
                "r": str(e.get("rel", "")),
                "p": bool(e.get("predicted")),
            }
            for e in edges
        ],
    }
    legend_items = "".join(
        f"<li><span style='background:{c}'></span>{html.escape(cls)}</li>"
        for cls, c in _CLASS_COLORS.items()
    )
    doc = f"""<!DOCTYPE html><html><head><meta charset="utf-8">
<title>{html.escape(title)}</title>
<style>
 body {{ margin: 0; background: {cfg["background"]}; color: #fff; font-family: sans-serif; }}
 canvas {{ display: block; cursor: grab; }}
 #legend {{ position: fixed; top: 50px; right: 20px; background: {cfg["background"]};
   padding: 15px; border-radius: 8px; border: 1px solid #444; max-width: 200px; }}
 #legend ul {{ list-style: none; padding: 0; margin: 0 0 10px; }}
 #legend li span {{ display: inline-block; width: 15px; height: 15px;
   margin-right: 10px; border-radius: 50%; vertical-align: middle; }}
 #legend .edge span {{ height: 2px; border-radius: 0; }}
</style></head><body>
<canvas id="net"></canvas>
<div id="legend"><h3>Legend</h3><h4>Node Types:</h4><ul>{legend_items}</ul>
<h4>Edge Types:</h4><ul class="edge">
<li><span style='background:{cfg["edgeColor"]}'></span>Extracted</li>
<li><span style='background:{cfg["predictedColor"]}'></span>Predicted</li></ul></div>
<script id="graph-data" type="application/json">{json.dumps(data)}</script>
<script>{_INTERACTIVE_JS}</script>
</body></html>"""
    return doc


def write_interactive_graph_html(
    nodes: list[dict],
    edges: list[dict],
    out_path: str | Path,
    max_nodes: int = 300,
    title: str = "ctinexus-ray knowledge graph",
) -> Path:
    """File form of ``interactive_graph_html`` (the original S5 sink)."""
    out_path = Path(out_path)
    out_path.write_text(
        interactive_graph_html(nodes, edges, max_nodes=max_nodes, title=title),
        encoding="utf-8",
    )
    return out_path


def _spring_length(nodes: list[dict], edges: list[dict]) -> float:
    """Dynamic rest length from the longest labels, mirroring the
    reference's base_spring_length formula (graph_constructor.py:526-535)
    scaled to the canvas renderer's smaller glyphs."""
    max_edge = max((len(str(e.get("rel", ""))) for e in edges), default=0)
    max_node = max((len(str(n.get("entity_text", ""))[:32]) for n in nodes), default=0)
    return 80.0 + max_edge * 2.0 + max_node * 1.5


DEFAULT_PORT = 57623


def find_free_port(default: int = DEFAULT_PORT) -> int:
    """Pick a serving port: the default when bindable, else scan upward,
    else let the OS assign one (reference utils/http_server_utils.py:92-119
    semantics, minus the reuse-an-existing-server probe)."""
    import socket

    for port in range(default, default + 100):
        try:
            with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
                s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
                s.bind(("127.0.0.1", port))
                return port
        except OSError:
            continue
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def start_graph_server(directory: str | Path, port: int | None = None):
    """Serve ``directory`` over a daemon HTTP thread; returns
    (base_url, server). Call ``server.shutdown()`` when done.

    Mirrors the reference's local viz server
    (utils/http_server_utils.py:270-330): SO_REUSEADDR, background
    thread, files served relative to the graph output directory.
    """
    import http.server
    import threading

    class _Handler(http.server.SimpleHTTPRequestHandler):
        def __init__(self, *args, **kwargs):
            super().__init__(*args, directory=str(directory), **kwargs)

        def log_message(self, *a):  # quiet per-request stderr logging
            pass

    handler = _Handler
    port = port or find_free_port()
    server = http.server.ThreadingHTTPServer(("127.0.0.1", port), handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    return f"http://127.0.0.1:{port}", server


def visualize_parquet(nodes_dir: str, edges_dir: str, out_path: str, max_nodes: int = 200) -> Path:
    """Driver-side convenience: read the pipeline's parquet sinks and write
    the HTML. Top nodes by doc_count are kept under the cap."""
    import pyarrow.parquet as pq

    nodes_table = pq.read_table(nodes_dir)
    nodes = sorted(
        nodes_table.to_pylist(), key=lambda r: (-r.get("doc_count", 0), r["entity_key"])
    )
    edges = pq.read_table(edges_dir).to_pylist()
    return write_graph_html(nodes, edges, out_path, max_nodes=max_nodes)
