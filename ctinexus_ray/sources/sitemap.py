"""Sitemap XML source — the crawl-DISCOVERY wire format beside WARC
(capture) and robots.txt (politeness): a ``<sitemapindex>`` names child
``<urlset>`` files, each listing ``<url>`` entries with ``<loc>``,
``<lastmod>``, ``<changefreq>`` and ``<priority>`` (sitemaps.org 0.9,
the format robots.txt ``Sitemap:`` lines point at).

Scale shape: one Ray task per child sitemap parses that file alone
(sitemapindex fan-out is exactly Ray Data's file-parallel read shape);
the index itself is tiny and parsed on the driver. Writes put each
``urlset`` in its own task with atomic rename and fixed bytes — the
resumable-output rule. Gzip (.xml.gz) handled on both sides; malformed
XML and unknown root elements raise loudly rather than yielding
partial rows.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa
import ray
import ray.data

_NS = "{http://www.sitemaps.org/schemas/sitemap/0.9}"


def _read_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        data = f.read()
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    return data


def parse_urlset(data: bytes) -> list[dict]:
    """Rows from one ``<urlset>`` document. Missing optional fields are
    None; a non-urlset root raises (an index passed where a urlset is
    expected is a caller bug, not an empty file)."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(data)
    if root.tag != f"{_NS}urlset":
        raise ValueError(f"expected urlset root, got {root.tag!r}")
    rows = []
    for url in root.findall(f"{_NS}url"):
        loc = url.findtext(f"{_NS}loc")
        if loc is None:
            raise ValueError("url entry without <loc>")
        prio = url.findtext(f"{_NS}priority")
        rows.append(
            {
                "url": loc.strip(),
                "lastmod": (url.findtext(f"{_NS}lastmod") or "").strip() or None,
                "changefreq": (url.findtext(f"{_NS}changefreq") or "").strip()
                or None,
                "priority": float(prio) if prio is not None else None,
            }
        )
    return rows


def parse_sitemapindex(data: bytes) -> list[str]:
    """Child sitemap locations from a ``<sitemapindex>`` document."""
    import xml.etree.ElementTree as ET

    root = ET.fromstring(data)
    if root.tag != f"{_NS}sitemapindex":
        raise ValueError(f"expected sitemapindex root, got {root.tag!r}")
    locs = []
    for sm in root.findall(f"{_NS}sitemap"):
        loc = sm.findtext(f"{_NS}loc")
        if loc is None:
            raise ValueError("sitemap entry without <loc>")
        locs.append(loc.strip())
    return locs


_SITEMAP_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("lastmod", pa.string()),
        ("changefreq", pa.string()),
        ("priority", pa.float64()),
        ("sitemap_file", pa.string()),
    ]
)


@ray.remote
def _parse_task(path: str) -> pa.Table:
    rows = parse_urlset(_read_bytes(path))
    base = os.path.basename(path)
    return pa.Table.from_pydict(
        {
            "url": pa.array([r["url"] for r in rows], type=pa.string()),
            "lastmod": pa.array([r["lastmod"] for r in rows], type=pa.string()),
            "changefreq": pa.array(
                [r["changefreq"] for r in rows], type=pa.string()
            ),
            "priority": pa.array(
                [r["priority"] for r in rows], type=pa.float64()
            ),
            "sitemap_file": pa.array([base] * len(rows), type=pa.string()),
        },
        schema=_SITEMAP_SCHEMA,
    )


def read_sitemaps(index_or_paths: str | list[str]) -> ray.data.Dataset:
    """Dataset over sitemap url entries. A string path is treated as a
    ``<sitemapindex>`` whose child ``<loc>`` values are LOCAL paths
    resolved against the index's directory (the sandbox has no network;
    on a real crawl the locs are URLs and the fetch layer maps them to
    the mirror's paths). A list of paths is read as urlset files
    directly — one parse task per file either way."""
    if isinstance(index_or_paths, str):
        base_dir = os.path.dirname(index_or_paths)
        locs = parse_sitemapindex(_read_bytes(index_or_paths))
        paths = [
            loc if os.path.isabs(loc) else os.path.join(base_dir, os.path.basename(loc))
            for loc in locs
        ]
    else:
        paths = list(index_or_paths)
    if not paths:
        return ray.data.from_arrow(_SITEMAP_SCHEMA.empty_table())
    return ray.data.from_arrow_refs([_parse_task.remote(p) for p in paths])


@ray.remote
def _write_urlset_task(path: str, rows: list[dict]) -> str:
    from xml.sax.saxutils import escape

    parts = ['<?xml version="1.0" encoding="UTF-8"?>\n']
    parts.append('<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n')
    for r in rows:
        parts.append("  <url>\n")
        parts.append(f"    <loc>{escape(r['url'])}</loc>\n")
        if r.get("lastmod"):
            parts.append(f"    <lastmod>{r['lastmod']}</lastmod>\n")
        if r.get("changefreq"):
            parts.append(f"    <changefreq>{r['changefreq']}</changefreq>\n")
        if r.get("priority") is not None:
            parts.append(f"    <priority>{r['priority']:.1f}</priority>\n")
        parts.append("  </url>\n")
    parts.append("</urlset>\n")
    data = "".join(parts).encode("utf-8")
    if path.endswith(".gz"):
        data = gzip.compress(data, compresslevel=9, mtime=0)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)
    return path


def write_sitemap_corpus(
    out_dir: str, rows: list[dict], urls_per_file: int = 500, gz: bool = False
) -> str:
    """Write url rows as child urlset files + one ``sitemap_index.xml``
    referencing them; returns the index path. One Ray task per child
    file, atomic rename, fixed bytes — deterministic for a given row
    list."""
    os.makedirs(out_dir, exist_ok=True)
    suffix = ".xml.gz" if gz else ".xml"
    chunks = [
        rows[i : i + urls_per_file] for i in range(0, len(rows), urls_per_file)
    ] or [[]]
    paths = [
        os.path.join(out_dir, f"sitemap-{i:05d}{suffix}")
        for i in range(len(chunks))
    ]
    ray.get(
        [_write_urlset_task.remote(p, c) for p, c in zip(paths, chunks)]
    )
    index = os.path.join(out_dir, "sitemap_index.xml")
    body = ['<?xml version="1.0" encoding="UTF-8"?>\n']
    body.append(
        '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    )
    for p in paths:
        body.append(
            f"  <sitemap>\n    <loc>{os.path.basename(p)}</loc>\n  </sitemap>\n"
        )
    body.append("</sitemapindex>\n")
    tmp = index + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        f.write("".join(body))
    os.replace(tmp, index)
    return index
