"""LLM-response JSON rescue parser (operator E6 in SURVEY §2.2).

Behavior-compatible with reference ctinexus/llm_processor.py:1389-1441
(the reference's unit tests pin its rescue ladder):

1. direct ``json.loads``
2. last ``{...}`` span (newlines flattened) with single-quote fix,
   trailing-comma strip, bare-key quoting
3. four bare triplet regex patterns -> ``{"triplets": [...]}``
4. ``ValueError`` on total failure
"""

from __future__ import annotations

import json
import re


class JSONRescueError(ValueError):
    """Raised when no rescue strategy recovers a JSON object."""


_BRACE_SPAN_RE = re.compile(r"\{[\s\S]*\}")
_TRAILING_COMMA_RE = re.compile(r",(\s*[}\]])")
_BARE_KEY_RE = re.compile(r"([{,]\s*)(\w+)(\s*):")

_TRIPLET_PATTERNS = [
    re.compile(r"\{'subject':\s*'([^']*)',\s*'relation':\s*'([^']*)',\s*'object':\s*'([^']*)'\}"),
    re.compile(r'\{"subject":\s*"([^"]*)",\s*"relation":\s*"([^"]*)",\s*"object":\s*"([^"]*)"\}'),
    re.compile(r"'subject':\s*'([^']*)',\s*'relation':\s*'([^']*)',\s*'object':\s*'([^']*)'"),
    re.compile(r'"subject":\s*"([^"]*)",\s*"relation":\s*"([^"]*)",\s*"object":\s*"([^"]*)"'),
]


def extract_json_from_response(response_text) -> dict:
    """Parse an LLM response into a dict, rescuing common malformations."""
    if not isinstance(response_text, str):
        return dict(response_text)

    cleaned = response_text.strip()
    try:
        return json.loads(cleaned)
    except (json.JSONDecodeError, TypeError):
        pass

    matches = list(_BRACE_SPAN_RE.finditer(cleaned.replace("\n", " ")))
    if matches:
        json_text = matches[-1].group()
        try:
            try:
                return json.loads(json_text)
            except json.JSONDecodeError:
                fixed = json_text.replace("'", '"')
                try:
                    return json.loads(fixed)
                except json.JSONDecodeError:
                    fixed = _TRAILING_COMMA_RE.sub(r"\1", fixed)
                    fixed = _BARE_KEY_RE.sub(r'\1"\2"\3:', fixed)
                    return json.loads(fixed)
        except Exception:
            # fall through to bare triplet-pattern rescue
            pass

    for pattern in _TRIPLET_PATTERNS:
        found = pattern.findall(cleaned)
        if found:
            return {
                "triplets": [
                    {"subject": s.strip(), "relation": r.strip(), "object": o.strip()}
                    for s, r, o in found
                ]
            }

    raise JSONRescueError("Failed to extract JSON from response text")
