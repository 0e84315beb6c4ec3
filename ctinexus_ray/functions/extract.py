"""Deterministic HTML -> text extraction (operator E1 in SURVEY §2.2).

The reference runs trafilatura in three modes plus JSON-LD and
meta-description fallbacks and merges the candidates
(reference ctinexus/llm_processor.py:361-670). trafilatura is not available
in this environment, so the candidate *extractors* here are a from-scratch,
dependency-free implementation (regex tag stripping over <article>/<main>/
<body>, JSON-LD articleBody/description walk, <meta name=description>),
while the *merge semantics* — source-priority + length ordering,
case-insensitive line dedup, CTI-signal gate for non-base candidates, and
the 16 000-char word-boundary cap — mirror the reference
(ctinexus/llm_processor.py:419-519).

The per-row invariant the engine guarantees is: extraction is a pure
function of the html bytes — byte-identical output per url across runs,
workers and cluster sizes.
"""

from __future__ import annotations

import json
import re
from html import unescape

from ctinexus_ray.functions.text import normalize_text

# ---------------------------------------------------------------------------
# low-level HTML helpers (dependency-free)
# ---------------------------------------------------------------------------

_SCRIPT_STYLE_RE = re.compile(
    r"<(script|style|noscript|template)\b[^>]*>[\s\S]*?</\1\s*>", re.IGNORECASE
)
_COMMENT_RE = re.compile(r"<!--[\s\S]*?-->")
# Tags that imply a line break when stripped.
_BLOCK_TAG_RE = re.compile(
    r"</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|section|article|header|"
    r"footer|aside|nav|blockquote|pre|figure|figcaption|main)\b[^>]*>",
    re.IGNORECASE,
)
_ANY_TAG_RE = re.compile(r"<[^>]+>")
_ARTICLE_RE = re.compile(r"<article\b[^>]*>([\s\S]*?)</article\s*>", re.IGNORECASE)
_MAIN_RE = re.compile(r"<main\b[^>]*>([\s\S]*?)</main\s*>", re.IGNORECASE)
_BODY_RE = re.compile(r"<body\b[^>]*>([\s\S]*?)</body\s*>", re.IGNORECASE)
_TITLE_RE = re.compile(r"<title\b[^>]*>([\s\S]*?)</title\s*>", re.IGNORECASE)
_JSONLD_RE = re.compile(
    r"<script\b[^>]*type\s*=\s*[\"']application/ld\+json[\"'][^>]*>([\s\S]*?)</script\s*>",
    re.IGNORECASE,
)
_META_DESC_RE = re.compile(
    r"<meta\b[^>]*name\s*=\s*[\"']description[\"'][^>]*content\s*=\s*[\"']([^\"']*)[\"']",
    re.IGNORECASE,
)
_META_AUTHOR_RE = re.compile(
    r"<meta\b[^>]*name\s*=\s*[\"']author[\"'][^>]*content\s*=\s*[\"']([^\"']*)[\"']",
    re.IGNORECASE,
)


def _html_fragment_to_lines(fragment: str) -> str:
    """Strip tags from an HTML fragment, preserving block-tag line breaks."""
    fragment = _SCRIPT_STYLE_RE.sub(" ", fragment)
    fragment = _COMMENT_RE.sub(" ", fragment)
    fragment = _BLOCK_TAG_RE.sub("\n", fragment)
    fragment = _ANY_TAG_RE.sub(" ", fragment)
    return unescape(fragment)


def extract_body_text(html: str) -> str | None:
    """Main-content candidate: first <article>, else <main>, else <body>,
    else the whole document, tag-stripped."""
    for pat in (_ARTICLE_RE, _MAIN_RE, _BODY_RE):
        m = pat.search(html)
        if m:
            return _html_fragment_to_lines(m.group(1))
    return _html_fragment_to_lines(html)


def _walk_jsonld(obj, out: dict) -> None:
    """Collect articleBody/description/headline/author/datePublished from a
    JSON-LD object tree (mirrors the walker at
    reference ctinexus/llm_processor.py:646-670)."""
    if isinstance(obj, list):
        for item in obj:
            _walk_jsonld(item, out)
        return
    if not isinstance(obj, dict):
        return
    body = obj.get("articleBody")
    if isinstance(body, str) and body.strip() and "text" not in out:
        out["text"] = body
    desc = obj.get("description")
    if isinstance(desc, str) and desc.strip() and "description" not in out:
        out["description"] = desc
    headline = obj.get("headline") or obj.get("name")
    if isinstance(headline, str) and headline.strip() and "title" not in out:
        out["title"] = headline
    author = obj.get("author")
    if isinstance(author, dict):
        author = author.get("name")
    if isinstance(author, str) and author.strip() and "author" not in out:
        out["author"] = author
    date = obj.get("datePublished") or obj.get("dateModified")
    if isinstance(date, str) and date.strip() and "date" not in out:
        out["date"] = date
    for value in obj.values():
        if isinstance(value, (dict, list)):
            _walk_jsonld(value, out)


def extract_jsonld(html: str) -> dict | None:
    """JSON-LD candidate: articleBody (or description as fallback text)."""
    collected: dict = {}
    for m in _JSONLD_RE.finditer(html):
        try:
            data = json.loads(m.group(1))
        except json.JSONDecodeError:
            continue
        _walk_jsonld(data, collected)
    if not collected:
        return None
    if "text" not in collected and "description" in collected:
        collected["text"] = collected["description"]
    return collected


def extract_meta_description(html: str) -> str | None:
    m = _META_DESC_RE.search(html)
    return unescape(m.group(1)) if m else None


def extract_title(html: str) -> str | None:
    m = _TITLE_RE.search(html)
    if not m:
        return None
    title = unescape(_ANY_TAG_RE.sub(" ", m.group(1)))
    title = re.sub(r"\s+", " ", title).strip()
    return title or None


def extract_meta_author(html: str) -> str | None:
    m = _META_AUTHOR_RE.search(html)
    return unescape(m.group(1)).strip() or None if m else None


# ---------------------------------------------------------------------------
# CTI-signal line gate (reference ctinexus/llm_processor.py:458-519)
# ---------------------------------------------------------------------------

_SIGNAL_DROP_RES = [
    re.compile(p)
    for p in (
        r"^figure\s+\d+",
        r"^source:",
        r"^sources:",
        r"^cookie",
        r"^subscribe",
        r"^sign up",
        r"^read more",
        r"^trend micro solutions?",
        r"^here are some security best practices",
        r"^recommendations?$",
    )
]

_STRONG_TERMS = (
    "ransomware", "threat actor", "campaign", "extortion", "raas", "cve-",
    "exploit", "vulnerability", "cobalt strike", "mimikatz", "psexec",
    "anydesk", "rclone", "winscp", "linux", "esxi", "vpn", "initial access",
    "persistence", "defense evasion", "lateral movement",
    "command and control", "exfiltration", "impact", "encrypt", "leak site",
    "conti", "ryuk", "akira", "victim", "compromis", "credential",
    "double extortion", "tor", "hc3", "cisco",
)

_SENTENCE_END_RE = re.compile(r"[.!?]$")


def is_cti_signal_line(line: str) -> bool:
    """Keep a non-base-candidate line only if it carries CTI signal.
    Mirrors reference ctinexus/llm_processor.py:458-519."""
    low = line.lower()
    if any(p.match(low) for p in _SIGNAL_DROP_RES):
        return False
    if any(term in low for term in _STRONG_TERMS):
        return True
    return len(line) >= 90 and bool(_SENTENCE_END_RE.search(line))


# ---------------------------------------------------------------------------
# hybrid merge (reference ctinexus/llm_processor.py:361-456)
# ---------------------------------------------------------------------------

_SOURCE_PRIORITY = {
    # builtin main-content candidate shares rank 0 with trafilatura_json
    "body": 0,
    # reference priorities (ctinexus/llm_processor.py:424-431) for the
    # trafilatura-backed candidates (see extract_hybrid_content backend)
    "trafilatura_json": 0,
    "trafilatura_bare": 1,
    "trafilatura_txt": 2,
    "readability": 3,
    "jsonld": 4,
    "meta_description": 5,
}


def merge_extraction_candidates(candidates: list[dict], max_chars: int = 16000) -> str:
    """Priority/length-ordered merge with case-insensitive line dedup and a
    CTI-signal gate for secondary candidates; cap at a word boundary."""
    if not candidates:
        return ""
    candidates_sorted = sorted(
        candidates,
        key=lambda c: (_SOURCE_PRIORITY.get(c["source"], 99), -c["length"]),
    )
    base_lines = [
        ln.strip() for ln in candidates_sorted[0]["text"].splitlines() if ln.strip()
    ]
    seen = {ln.lower() for ln in base_lines}
    merged_lines = list(base_lines)

    for candidate in candidates_sorted[1:]:
        for line in candidate["text"].splitlines():
            line = line.strip()
            if not line:
                continue
            key = line.lower()
            if key in seen:
                continue
            if not is_cti_signal_line(line):
                continue
            seen.add(key)
            merged_lines.append(line)

    merged = "\n".join(merged_lines).strip()
    if len(merged) > max_chars:
        merged = merged[:max_chars].rsplit(" ", 1)[0].strip()
    return merged


def trafilatura_available() -> bool:
    try:
        import trafilatura  # noqa: F401

        return True
    except ImportError:
        return False


def _trafilatura_candidates(html: str, metadata: dict) -> list[dict]:
    """The reference's three trafilatura candidate extractors, byte-for-
    byte parameter parity (ctinexus/llm_processor.py:521-577): json mode
    (with metadata), txt mode, and bare_extraction — all with
    include_comments=False, include_tables=False, deduplicate=True,
    favor_recall=True. Raises ImportError when trafilatura is absent."""
    import trafilatura

    candidates: list[dict] = []

    def merge_meta(extract: dict) -> None:
        for k in ("title", "author", "date"):
            if metadata.get(k) is None and extract.get(k):
                metadata[k] = extract[k]

    try:
        result = trafilatura.extract(
            html,
            output_format="json",
            with_metadata=True,
            include_comments=False,
            include_tables=False,
            deduplicate=True,
            favor_recall=True,
        )
        if result:
            parsed = (
                json.loads(result) if isinstance(result, str) else result
            )
            if isinstance(parsed, dict):
                merge_meta(parsed)
                if parsed.get("text"):
                    candidates.append(
                        {"source": "trafilatura_json", "text": parsed["text"]}
                    )
    except json.JSONDecodeError:
        candidates.append({"source": "trafilatura_json", "text": result})
    except Exception:  # noqa: BLE001 — candidate extractors are best-effort
        pass

    try:
        txt = trafilatura.extract(
            html,
            output_format="txt",
            include_comments=False,
            include_tables=False,
            deduplicate=True,
            favor_recall=True,
        )
        if txt:
            candidates.append({"source": "trafilatura_txt", "text": txt})
    except Exception:  # noqa: BLE001
        pass

    if hasattr(trafilatura, "bare_extraction"):
        try:
            bare = trafilatura.bare_extraction(
                html,
                with_metadata=True,
                include_comments=False,
                include_tables=False,
                deduplicate=True,
                favor_recall=True,
            )
            if isinstance(bare, dict):
                merge_meta(bare)
                if bare.get("text"):
                    candidates.append(
                        {"source": "trafilatura_bare", "text": bare["text"]}
                    )
        except Exception:  # noqa: BLE001
            pass
    return candidates


def extract_hybrid_content(
    html: str, max_chars: int = 16000, backend: str = "builtin"
) -> dict:
    """Full E1: candidates -> normalize -> merge. Deterministic per html.

    Returns ``{"text", "title", "author", "date", "candidates"}`` shaped like
    reference ctinexus/llm_processor.py:361-417.

    ``backend="builtin"`` (default) uses the dependency-free candidate
    extractors — the engine's stable, self-consistent behavior.
    ``backend="trafilatura"`` swaps the main-content candidates for the
    reference's trafilatura json/txt/bare trio behind the SAME merge
    semantics, proving byte-parity with the real reference wherever the
    dependency is installed (it is not in this sandbox — the golden-html
    test is marked skip-if-unavailable).
    """
    metadata: dict = {"title": None, "author": None, "date": None}
    candidate_bodies: list[dict] = []

    if backend == "trafilatura":
        candidate_bodies.extend(_trafilatura_candidates(html, metadata))
    elif backend == "builtin":
        body = extract_body_text(html)
        if body:
            candidate_bodies.append({"source": "body", "text": body})
    else:
        raise ValueError(f"unknown extraction backend {backend!r}")

    jsonld = extract_jsonld(html)
    if jsonld:
        for k in ("title", "author", "date"):
            if metadata[k] is None and jsonld.get(k):
                metadata[k] = jsonld[k]
        if jsonld.get("text"):
            candidate_bodies.append({"source": "jsonld", "text": jsonld["text"]})

    meta_desc = extract_meta_description(html)
    if meta_desc:
        candidate_bodies.append({"source": "meta_description", "text": meta_desc})

    if metadata["title"] is None:
        metadata["title"] = extract_title(html)
    if metadata["author"] is None:
        metadata["author"] = extract_meta_author(html)

    normalized_candidates = []
    for item in candidate_bodies:
        normalized = normalize_text(item["text"])
        if not normalized:
            continue
        normalized_candidates.append(
            {"source": item["source"], "text": normalized, "length": len(normalized)}
        )

    merged = merge_extraction_candidates(normalized_candidates, max_chars=max_chars)
    return {
        "text": merged,
        "title": metadata["title"],
        "author": metadata["author"],
        "date": metadata["date"],
        "candidates": [
            {k: v for k, v in c.items() if k != "text"} for c in normalized_candidates
        ],
    }
