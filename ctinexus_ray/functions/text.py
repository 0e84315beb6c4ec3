"""Text normalization / CTI-focus filtering (operators E0, E2-E5 in SURVEY §2.2).

Semantics match the reference:
  normalize_text            reference ctinexus/llm_processor.py:828-863
  build_cti_focus_text      reference ctinexus/llm_processor.py:723-771
  normalize_summary_text    reference ctinexus/llm_processor.py:773-781
  is_well_formed_cti_paragraph  reference ctinexus/llm_processor.py:783-802
  normalize_url / is_valid_url  reference ctinexus/llm_processor.py:865-874

All functions are pure and deterministic; they run inside stateless
``map_batches`` tasks. Regexes are compiled at module import (once per
worker process), not per call.
"""

from __future__ import annotations

import re
from html import unescape
from urllib.parse import urlparse

_ZERO_WIDTH_RE = re.compile(r"[​-‏⁠﻿]")
_WS_RE = re.compile(r"\s+")
_MANY_NEWLINES_RE = re.compile(r"\n{3,}")

_BOILERPLATE_RES = [
    re.compile(p, re.IGNORECASE)
    for p in (
        r"^\s*cookie(s)?\b",
        r"^\s*accept (all )?cookies\b",
        r"^\s*privacy policy\b",
        r"^\s*terms (of use|and conditions)\b",
        r"^\s*subscribe\b",
        r"^\s*sign up\b",
        r"^\s*advertisement\b",
        r"^\s*all rights reserved\b",
    )
]

_SKIP_SECTION_RES = [
    re.compile(p)
    for p in (
        r"^recommendations?$",
        r"^trend micro solutions?$",
        r"^to protect systems against similar threats",
        r"^here are some best practices",
        r"^audit and inventory$",
        r"^configure and monitor$",
        r"^patch and update$",
        r"^protect and recover$",
        r"^secure and defend$",
        r"^about trend micro$",
        r"^copyright",
    )
]

_DROP_LINE_RES = [
    re.compile(p)
    for p in (
        r"^figure\s+\d+",
        r"^source:",
        r"^sources:",
        r"^read more",
        r"^related",
        r"^subscribe",
    )
]

_RESUME_SECTION_RE = re.compile(
    r"^(infection chain and techniques|initial access|execution|defense evasion"
    r"|lateral movement|command and control|exfiltration|impact"
    r"|other technical details)"
)

_FENCE_OPEN_RE = re.compile(r"^```[a-zA-Z]*\s*")
_FENCE_CLOSE_RE = re.compile(r"\s*```$")
_BULLET_RE = re.compile(r"(^|\n)\s*[-*+]\s+")
_HEADER_RE = re.compile(r"(^|\n)\s*#{1,6}\s+")
_SENTENCE_SPLIT_RE = re.compile(r"(?<=[.!?])\s+")


def normalize_text(extracted_text: str) -> str:
    """Boilerplate-stripping whitespace normalization with case-insensitive
    line dedup. Mirrors reference ctinexus/llm_processor.py:828-863."""
    if not isinstance(extracted_text, str):
        return ""

    cleaned = unescape(extracted_text).replace("\r\n", "\n").replace("\r", "\n")
    cleaned = _ZERO_WIDTH_RE.sub("", cleaned)

    normalized_lines: list[str] = []
    seen: set[str] = set()
    for line in cleaned.splitlines():
        line = _WS_RE.sub(" ", line).strip()
        if not line:
            continue
        if any(p.match(line) for p in _BOILERPLATE_RES):
            continue
        key = line.lower()
        if key in seen:
            continue
        seen.add(key)
        normalized_lines.append(line)

    normalized = "\n".join(normalized_lines)
    return _MANY_NEWLINES_RE.sub("\n\n", normalized).strip()


def build_cti_focus_text(normalized_text: str, max_chars: int = 10000) -> str:
    """Drop non-CTI sections (recommendations / vendor marketing) with a
    resume-on-technical-header state machine; cap at a word boundary.
    Mirrors reference ctinexus/llm_processor.py:723-771."""
    lines = [ln.strip() for ln in normalized_text.splitlines() if ln.strip()]

    filtered: list[str] = []
    skip_section = False
    for line in lines:
        low = line.lower()
        if any(p.match(low) for p in _SKIP_SECTION_RES):
            skip_section = True
            continue
        if skip_section:
            if _RESUME_SECTION_RE.match(low):
                skip_section = False
            else:
                continue
        if any(p.match(low) for p in _DROP_LINE_RES):
            continue
        filtered.append(line)

    focused = "\n".join(filtered).strip()
    if len(focused) > max_chars:
        focused = focused[:max_chars].rsplit(" ", 1)[0].strip()
    return focused


def normalize_summary_text(summary_text: str) -> str:
    """Strip code fences, collapse to a single paragraph.
    Mirrors reference ctinexus/llm_processor.py:773-781."""
    if not isinstance(summary_text, str):
        return ""
    s = summary_text.strip()
    s = _FENCE_OPEN_RE.sub("", s)
    s = _FENCE_CLOSE_RE.sub("", s)
    return _WS_RE.sub(" ", s).strip()


def is_well_formed_cti_paragraph(summary_text: str) -> bool:
    """Strict 3-6 sentence single-paragraph check.
    Mirrors reference ctinexus/llm_processor.py:783-802."""
    if not summary_text or not isinstance(summary_text, str):
        return False
    text = summary_text.strip()
    if len(text) < 120:
        return False
    if _BULLET_RE.search(text):
        return False
    if _HEADER_RE.search(text):
        return False
    if text.lower().startswith(("here is", "here's", "summary:", "in summary")):
        return False
    sentences = [s for s in _SENTENCE_SPLIT_RE.split(text) if s.strip()]
    return 3 <= len(sentences) <= 6


def normalize_url(source_url: str) -> str:
    """Prefix ``https://`` when no scheme is present.
    Mirrors reference ctinexus/llm_processor.py:865-870."""
    url = source_url.strip()
    if not urlparse(url).scheme:
        url = f"https://{url}"
    return url


def is_valid_url(source_url: str) -> bool:
    """http/https + non-empty netloc without spaces.
    Mirrors reference ctinexus/llm_processor.py:872-874."""
    parsed = urlparse(source_url)
    return parsed.scheme in {"http", "https"} and bool(
        parsed.netloc and " " not in parsed.netloc
    )


def extract_domain(source_url: str) -> str:
    """Lower-cased netloc. Mirrors reference ctinexus/llm_processor.py:876-877."""
    return urlparse(source_url).netloc.lower()


def strip_type_suffix(text: str) -> str:
    """'X (Malware)' -> 'X'. Mirrors reference ctinexus/graph_constructor.py:444-446."""
    return re.sub(r"\s*\([^)]+\)\s*$", "", text).strip()


_TYPE_SUFFIX_RE = re.compile(r"^(?P<text>.*?)\s*\((?P<cls>[^()]+)\)\s*$")


def split_type_suffix(text: str) -> tuple[str, str | None]:
    """Split 'X (Malware)' into ('X', 'Malware'); (text, None) when absent.

    Used by the mock ET path: reference IE triples carry '(Class)' suffixes
    inside subject/object strings (quirk Q6, reference ctinexus/prompts/ie.jinja:2-5).
    """
    m = _TYPE_SUFFIX_RE.match(text)
    if not m:
        return text.strip(), None
    return m.group("text").strip(), m.group("cls").strip()
