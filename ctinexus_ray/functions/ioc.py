"""IOC detection (operator E9 in SURVEY §2.2).

The 16 patterns and the cheap pre-filter are behavior-compatible with
reference ctinexus/cti_processor.py:10-48 (regexes intentionally
byte-identical — the reference's unit tests pin their exact semantics and
the EA IOC-unmerge pass depends on them).
"""

from __future__ import annotations

import re

IOC_PATTERNS: dict[str, re.Pattern] = {
    "date": re.compile(
        r"\b(?:January|February|March|April|May|June|July|August|September|October|November|December)\s\d{4}\b"
    ),
    "ip": re.compile(r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    "domain": re.compile(r"\b(?:[a-zA-Z0-9-]+\.)+[a-zA-Z]{2,6}\b"),
    "url": re.compile(r"\b(?:https?://|www\.)[a-zA-Z0-9-]+\.[a-zA-Z]{2,6}\S*\b"),
    "email": re.compile(r"\b[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,6}\b"),
    "hash_md5": re.compile(r"\b[a-fA-F0-9]{32}\b"),
    "hash_sha1": re.compile(r"\b[a-fA-F0-9]{40}\b"),
    "hash_sha256": re.compile(r"\b[a-fA-F0-9]{64}\b"),
    "hash_sha512": re.compile(r"\b[a-fA-F0-9]{128}\b"),
    "cve": re.compile(r"\bCVE-\d{4}-\d{4,7}\b"),
    "cvss": re.compile(r"\bCVSS\d\.\d\b"),
    "yara": re.compile(r"\bYARA\d{4}\b"),
    "money": re.compile(r"[€£\$]\d+(?:\.\d+)?\s(?:million|billion)\b"),
    "os": re.compile(
        r"\b(?:Windows|Linux|MacOS|Android|iOS|Unix)\soperating\s(?:system|systems)\b"
    ),
    "sector": re.compile(r"\b[A-Za-z]+(?:\s[A-Za-z]+)*\ssector\b"),
    "version": re.compile(r"\b(?:v|version)\s\d+(?:\.\d+){1,3}\b"),
}

# Cheap pre-filter: a mention without any of these cannot match any pattern
# above (reference ctinexus/cti_processor.py:37-40).
_PREFILTER_RE = re.compile(
    r"[0-9@:/\-\.]|(?:CVE|CVSS|YARA|Windows|Linux|MacOS|Android|iOS|Unix|sector|million|billion)"
)


def detect_iocs(mention_merged: list[str], mention_text: str) -> set[str]:
    """Return the set of matched IOC substrings over merged mentions + the
    mention itself. Mirrors reference ctinexus/cti_processor.py:32-48
    (first match per (mention, pattern) pair, collected into a set)."""
    iocs: set[str] = set()
    for mention in (*mention_merged, mention_text):
        if not _PREFILTER_RE.search(mention):
            continue
        for pattern in IOC_PATTERNS.values():
            m = pattern.search(mention)
            if m:
                iocs.add(m.group())
    return iocs
