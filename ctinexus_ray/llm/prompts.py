"""Prompt construction for the IE / ET / LP stages (operator E12 in SURVEY §2.2).

The reference renders Jinja templates from disk
(reference ctinexus/prompts/ie.jinja, et.jinja, link.jinja;
ctinexus/llm_processor.py:1149-1175). Here the templates are package data
(authored for this engine, same information contract: few-shot demos + query
for IE, taxonomy + triples for ET, context + node pair for LP) rendered with
jinja2 loaded once per actor.

The entity-class contracts are part of the data model and match the
reference exactly:
  * IE inline classes (reference ctinexus/prompts/ie.jinja:3)
  * ET taxonomy incl. hierarchical Indicator / Malware Characteristic
    subclasses (reference ctinexus/prompts/et.jinja:1-37)
"""

from __future__ import annotations

import json

from jinja2 import Environment

# IE stage: classes allowed inline as "(Class)" suffixes (quirk Q6).
IE_CLASSES = (
    "Malware Type", "Malware", "Application", "Campaign", "System",
    "System Feature", "Orginzation", "Time", "Threat Actor", "Location",
    "Indicator Type", "Indicator", "Attack Pattern", "Vulnerability Type",
    "Vulnerability", "Report",
)

# ET stage taxonomy; hierarchical classes are flattened downstream as
# "Parent:Child" (reference ctinexus/cti_processor.py:197-198).
ET_TAXONOMY = (
    "Account", "Credential", "Tool", "Attacker", "Event", "Exploit Target",
    "Indicator", "Information", "Location", "Malware",
    "Malware Characteristic", "Organization", "Infrastructure", "Time",
    "Vulnerability",
    "This entity cannot be classified into any of the existing types",
)

INDICATOR_SUBCLASSES = (
    "File", "IP", "URL", "Domain", "Registry Key", "Hash", "Mutex",
    "User Agent", "Email", "Yara Rule", "SSL Certificate",
)

MALWARE_CHARACTERISTIC_SUBCLASSES = (
    "Behavior", "Capability", "Feature", "Payload", "Variants",
)

_ENV = Environment(autoescape=False, keep_trailing_newline=False)

_IE_TEMPLATE = _ENV.from_string(
    """You are a security analyst extracting subject-relation-object triplets \
from cyber threat intelligence reports.
Each triplet must be JSON of the form \
{"subject": "...(entity class)", "relation": "...", "object": "...(entity class)"}.
Subjects and objects must belong to one of these entity classes: {{ classes }}.
Respond with a JSON object: {"triplets": [...]} and nothing else.
---------------------{% for demo in demos %}
Example {{ loop.index }}:

'CTI': {{ demo.text }}

'triplets': {{ demo.triplets }}
---------------------{% endfor %}
Target report:

"CTI": {{ query }}

\"\"\"insert your answer here\"\"\""""
)

_ET_TEMPLATE = _ENV.from_string(
    """Classify the subject and object of each triple below into this CTI taxonomy:
{{ taxonomy }}
Hierarchical classes: Indicator has subclasses {{ indicator_subclasses }}; \
Malware Characteristic has subclasses {{ mc_subclasses }}.
Respond with JSON only: {"typed_triplets": [{"subject": {"text": ..., "class": ...}, \
"relation": ..., "object": {"text": ..., "class": ...}}, ...]}.

Triples:
{{ triples }}"""
)

_LINK_TEMPLATE = _ENV.from_string(
    """Given the report context below, predict the relationship linking two entities.

"Context": {{ cti }}

"Question": What do you think is the relationship between entity "{{ main_node }}" \
and entity "{{ topic_node }}"?

Respond with JSON only: {"predicted_triple": {"subject": ..., "relation": ..., "object": ...}}.
The predicted subject and object must be chosen from entity "{{ main_node }}" and \
entity "{{ topic_node }}"; do not invent new entities."""
)


_IE_QUERY_SUFFIX = '\n\n"""insert your answer here"""'


def make_ie_prefix(demos: list[dict]) -> str:
    """Render the static part of the IE prompt (instructions + few-shot
    demos) ONCE. The demo selection is constant per corpus (quirk Q1), so
    actors cache this prefix in ``__init__`` and per-document prompt
    construction is a single string concatenation."""
    rendered = [
        {"text": d["text"], "triplets": json.dumps(d["triplets"])} for d in demos
    ]
    full = _IE_TEMPLATE.render(
        classes=", ".join(IE_CLASSES), demos=rendered, query="\x00QUERY\x00"
    )
    prefix, _, _ = full.partition("\x00QUERY\x00")
    return prefix


def build_ie_prompt(
    query_text: str, demos: list[dict], prefix: str | None = None
) -> str:
    """demos: [{"text": str, "triplets": list[dict]}] selected by the
    retriever (constant per corpus — quirk Q1). Pass a cached ``prefix``
    from :func:`make_ie_prefix` to skip re-rendering the demos."""
    if prefix is None:
        prefix = make_ie_prefix(demos)
    return f"{prefix}{query_text}{_IE_QUERY_SUFFIX}"


def build_et_prompt(triples: list[dict]) -> str:
    return _ET_TEMPLATE.render(
        taxonomy=json.dumps(list(ET_TAXONOMY)),
        indicator_subclasses=", ".join(INDICATOR_SUBCLASSES),
        mc_subclasses=", ".join(MALWARE_CHARACTERISTIC_SUBCLASSES),
        triples=json.dumps(triples),
    )


_SUMMARY_TEMPLATE = _ENV.from_string(
    """Summarize the following threat report as a single dense CTI paragraph \
of 3-6 sentences. Keep every actor, malware, tool, CVE, IOC and sector \
mention; no bullets, no headers, no preamble.

URL: {{ url }}
Domain: {{ domain }}
Title: {{ title }}

Report content:
{{ content }}"""
)

_REPAIR_TEMPLATE = _ENV.from_string(
    """Rewrite the draft summary below as EXACTLY one plain paragraph of 3-6 \
sentences — no bullets, headers, or preamble — preserving all technical \
indicators.

URL: {{ url }}
Domain: {{ domain }}
Title: {{ title }}

Draft summary:
{{ draft }}

Source excerpt:
{{ excerpt }}"""
)


def build_summary_prompt(url: str, domain: str, title: str | None, content: str) -> str:
    """URL-source summarization prompt (reference url_source_input.jinja via
    ctinexus/llm_processor.py:315-359); runs at temperature 0.0."""
    return _SUMMARY_TEMPLATE.render(
        url=url, domain=domain, title=title or "", content=content
    )


def build_repair_prompt(
    url: str, domain: str, title: str | None, draft: str, excerpt: str
) -> str:
    """Summary repair prompt (reference ctinexus/llm_processor.py:702-721:
    inlines url/domain/title + the first 9000 chars of focused text)."""
    return _REPAIR_TEMPLATE.render(
        url=url, domain=domain, title=title or "", draft=draft, excerpt=excerpt[:9000]
    )


def build_link_prompt(cti_text: str, main_node_text: str, topic_node_text: str) -> str:
    return _LINK_TEMPLATE.render(
        cti=cti_text, main_node=main_node_text, topic_node=topic_node_text
    )
