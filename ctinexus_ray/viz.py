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
