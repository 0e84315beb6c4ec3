"""Per-stage triplet validators (operator E7 in SURVEY §2.2).

Behavior-compatible with the reference's four structural gates:
  validate_ie_triplet           reference ctinexus/llm_processor.py:81-116
  validate_typed_triplet        reference ctinexus/cti_processor.py:118-144
  validate_preprocessed_triplet reference ctinexus/graph_constructor.py:212-243
  validate_aligned_triplet      reference ctinexus/graph_constructor.py:19-48

Instead of log lines, callers collect drop counts into the metrics table.
"""

from __future__ import annotations

_REQUIRED = ("subject", "relation", "object")


def _has_required(triplet) -> bool:
    return isinstance(triplet, dict) and all(k in triplet for k in _REQUIRED)


def _valid_relation(triplet: dict) -> bool:
    rel = triplet.get("relation")
    return isinstance(rel, str) and bool(rel.strip())


def validate_ie_triplet(triplet) -> bool:
    """IE stage: subject/object are non-empty strings or dicts with
    text / mention_text."""
    if not _has_required(triplet):
        return False
    for key in ("subject", "object"):
        value = triplet[key]
        if value is None:
            return False
        if isinstance(value, str):
            if not value.strip():
                return False
        elif isinstance(value, dict):
            if not (value.get("text") or value.get("mention_text")):
                return False
        else:
            return False
    return _valid_relation(triplet)


def validate_typed_triplet(triplet) -> bool:
    """ET stage: subject/object are dicts with a non-empty 'text'."""
    if not _has_required(triplet):
        return False
    for key in ("subject", "object"):
        value = triplet.get(key)
        if not isinstance(value, dict) or not value.get("text"):
            return False
    return _valid_relation(triplet)


def validate_preprocessed_triplet(triplet) -> bool:
    """Post-preprocess: dicts with mention_id (0 ok) + mention_text +
    mention_class."""
    if not _has_required(triplet):
        return False
    for key in ("subject", "object"):
        value = triplet.get(key)
        if not isinstance(value, dict):
            return False
        if "mention_id" not in value:
            return False
        if not value.get("mention_text"):
            return False
        if "mention_class" not in value:
            return False
    return _valid_relation(triplet)


def validate_aligned_triplet(triplet) -> bool:
    """Post-merge: dicts with entity_id (0 ok) and entity_text or
    mention_text."""
    if not _has_required(triplet):
        return False
    for key in ("subject", "object"):
        value = triplet.get(key)
        if not isinstance(value, dict):
            return False
        if "entity_id" not in value:
            return False
        if not value.get("entity_text") and not value.get("mention_text"):
            return False
    return _valid_relation(triplet)


def filter_valid(triplets, validator) -> tuple[list, int]:
    """Apply ``validator`` to each triplet; return (kept, dropped_count)."""
    if not triplets:
        return [], 0
    kept = [t for t in triplets if validator(t)]
    return kept, len(triplets) - len(kept)
