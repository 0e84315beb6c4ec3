"""Deterministic synthetic Common-Crawl-style CTI corpus.

BASELINE.json's ``input_hint`` fixes the input shape:
``(url: string, warc_ts: timestamp, html: binary, text: string, lang: string)``.
This module synthesizes that table deterministically (stable hashes of the
doc id — no RNG state, no wall clock), both as a standalone generator and as
an adapter that wraps the driver's ``documents.parquet`` word-bag texts into
the Common-Crawl shape.

The generated HTML embeds the body in one of several template variants
(plain <article>, JSON-LD articleBody, meta-description-only, boilerplate-
heavy) so the hybrid extraction stage (E1) is exercised on every path; the
original clean text is recoverable, which gives the byte-identity extraction
tests their ground truth.
"""

from __future__ import annotations

import datetime
import json
from html import escape
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

from ctinexus_ray.llm.mock import rule_extract_triples, stable_hash

# ---------------------------------------------------------------------------
# entity pools (indexable, deterministic)
# ---------------------------------------------------------------------------

_MALWARE = ("ShadowPulse", "NightVine", "CrimsonOtter", "GhostLoader", "IronMantis",
            "DarkFerry", "BlueLocust", "EmberWasp")
_ACTORS = ("Storm-1417", "Moonlit Badger", "APT-Quartz", "SilverFin Group",
           "Crimson Sandpiper")
_TOOLS = ("Cobalt Strike", "Mimikatz", "PsExec", "AnyDesk", "Rclone", "WinSCP")
_SECTORS = ("healthcare", "finance", "energy", "manufacturing", "education")
_COUNTRIES = ("Germany", "Brazil", "Japan", "Canada", "Australia")
_MONTHS = ("January", "February", "March", "April", "May", "June", "July",
           "August", "September", "October", "November", "December")


def _pick(pool, h: int, salt: int = 0):
    return pool[(h >> (salt * 5)) % len(pool)]


def make_report_text(doc_id: int) -> str:
    """3-6 deterministic CTI-like sentences with IOC-bearing entities."""
    h = stable_hash(f"report:{doc_id}")
    malware = _pick(_MALWARE, h, 0)
    actor = _pick(_ACTORS, h, 1)
    tool = _pick(_TOOLS, h, 2)
    sector = _pick(_SECTORS, h, 3)
    country = _pick(_COUNTRIES, h, 4)
    month = _pick(_MONTHS, h, 5)
    year = 2021 + (h >> 30) % 5
    cve = f"CVE-{2019 + (h >> 16) % 7}-{1000 + h % 9000}"
    ip = f"{10 + h % 200}.{(h >> 8) % 256}.{(h >> 16) % 256}.{(h >> 24) % 254 + 1}"

    sentences = [
        f"In {month} {year}, researchers observed the {malware} ransomware "
        f"campaign targeting the {sector} sector in {country}.",
        f"The threat actor {actor} exploited {cve} to gain initial access "
        f"before deploying {malware}.",
        f"During lateral movement the operators relied on {tool} and "
        f"harvested credential material from domain controllers.",
        f"Command and control traffic was routed through {ip} over an "
        f"encrypted channel.",
    ]
    if h % 3 == 0:
        sentences.append(
            f"Victims reported double extortion attempts referencing a leak "
            f"site operated by {actor}."
        )
    if h % 5 == 0:
        sentences.append(
            f"A YARA rule matching {malware} payloads was published for "
            f"defenders in the {sector} sector."
        )
    return " ".join(sentences)


_BOILERPLATE_LINES = (
    "<p>Subscribe to our newsletter for weekly updates.</p>",
    "<p>Cookie settings: we use cookies to improve your experience.</p>",
    "<p>All rights reserved. Privacy Policy. Terms of Use.</p>",
    "<p>Advertisement</p>",
)


def make_html(doc_id: int, text: str) -> bytes:
    """Wrap ``text`` in one of four deterministic HTML template variants."""
    h = stable_hash(f"html:{doc_id}")
    title = f"Threat Report {doc_id}"
    variant = h % 4
    paragraphs = "\n".join(f"<p>{escape(s)}.</p>" for s in text.split(". "))
    boiler = _BOILERPLATE_LINES[h % len(_BOILERPLATE_LINES)]

    if variant == 0:  # clean <article>
        body = f"<article>\n{paragraphs}\n</article>\n{boiler}"
        extra_head = ""
    elif variant == 1:  # JSON-LD articleBody alongside a nav-heavy body
        ld = json.dumps(
            {
                "@type": "Article",
                "headline": title,
                "articleBody": text,
                "datePublished": "2024-01-01",
                "author": {"name": "Threat Research Team"},
            }
        )
        extra_head = f'<script type="application/ld+json">{ld}</script>'
        body = f"<nav>Home | Blog | About</nav>\n<article>\n{paragraphs}\n</article>\n{boiler}"
    elif variant == 2:  # <main> with meta description
        extra_head = f'<meta name="description" content="{escape(text[:150])}">'
        body = f"<main>\n{paragraphs}\n</main>\n{boiler}"
    else:  # bare body with scripts to strip
        extra_head = ""
        body = f"<script>var x = 1;</script>\n{paragraphs}\n{boiler}"

    html = (
        f"<!DOCTYPE html>\n<html>\n<head>\n<title>{escape(title)}</title>\n"
        f"{extra_head}\n</head>\n<body>\n{body}\n</body>\n</html>"
    )
    return html.encode("utf-8")


_EPOCH = datetime.datetime(2025, 1, 1, tzinfo=datetime.timezone.utc)
_LANGS = ("en", "en", "en", "de", "es")  # en-weighted, deterministic


def make_cc_row(doc_id: int, text: str | None = None) -> dict:
    """One Common-Crawl-shaped row. ``text`` defaults to a synthetic report."""
    body = text if text is not None else make_report_text(doc_id)
    h = stable_hash(f"meta:{doc_id}")
    return {
        "url": f"https://threat-reports.example.com/{doc_id:08d}",
        "warc_ts": _EPOCH + datetime.timedelta(seconds=doc_id),
        "html": make_html(doc_id, body),
        "text": body,
        "lang": _LANGS[h % len(_LANGS)],
    }


CC_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)


def make_cc_table(n_docs: int, start_id: int = 0) -> pa.Table:
    rows = [make_cc_row(i) for i in range(start_id, start_id + n_docs)]
    return pa.Table.from_pylist(rows, schema=CC_SCHEMA)


def write_cc_corpus(out_dir: str | Path, n_docs: int, rows_per_file: int = 10000) -> list[Path]:
    """Write a synthetic corpus as one parquet file per shard (deterministic
    shard ids — the resumable-output layout of SURVEY §7.1 step 9)."""
    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths = []
    for start in range(0, n_docs, rows_per_file):
        count = min(rows_per_file, n_docs - start)
        path = out / f"part-{start // rows_per_file:05d}.parquet"
        pq.write_table(make_cc_table(count, start_id=start), path)
        paths.append(path)
    return paths


def write_cc_corpus_ray(
    out_dir: str | Path, n_docs: int, num_shards: int = 64
) -> str:
    """Generate a large synthetic corpus IN PARALLEL with Ray (deterministic
    per doc id regardless of sharding) and write one parquet file per
    shard. Returns the directory; skips generation if it already exists
    with the expected shard count."""
    import ray
    import ray.data

    out = Path(out_dir)
    if out.exists() and len(list(out.glob("*.parquet"))) >= num_shards:
        return str(out)
    out.mkdir(parents=True, exist_ok=True)

    def render(batch: pa.Table) -> pa.Table:
        ids = batch.column("id").to_pylist()
        return pa.Table.from_pylist([make_cc_row(i) for i in ids], schema=CC_SCHEMA)

    ds = ray.data.range(n_docs).repartition(num_shards).map_batches(
        render, batch_format="pyarrow"
    )
    ds.write_parquet(str(out))
    return str(out)


def cc_table_from_texts(doc_ids: list[int], texts: list[str]) -> pa.Table:
    """Adapter: wrap existing (doc_id, text) rows — e.g. the driver's
    ``documents.parquet`` — into the Common-Crawl input shape."""
    rows = [make_cc_row(i, t) for i, t in zip(doc_ids, texts)]
    return pa.Table.from_pylist(rows, schema=CC_SCHEMA)


def make_demo_corpus(n_demos: int = 16) -> list[dict]:
    """Synthetic demo corpus for the few-shot retriever: texts + the triples
    the deterministic mock extractor yields for them (self-consistent)."""
    demos = []
    for i in range(n_demos):
        text = make_report_text(10_000_000 + i)
        demos.append(
            {
                "name": f"demo-{i:03d}",
                "text": text,
                "triplets": rule_extract_triples(text),
            }
        )
    return demos
