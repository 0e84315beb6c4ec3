"""Arrow schemas for the engine's tables (SURVEY §1.3).

  documents — Common-Crawl-shaped input (BASELINE.json input_hint)
  triples   — flat one-row-per-triple output of the per-doc pipeline
  nodes     — canonical cross-document entities (after the groupby shuffle)
  edges     — canonical-keyed edges
"""

from __future__ import annotations

import pyarrow as pa

DOCUMENTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us", tz="UTC")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

TRIPLES_SCHEMA = pa.schema(
    [
        ("doc_url", pa.string()),
        ("triple_idx", pa.int32()),
        ("rel", pa.string()),
        ("predicted", pa.bool_()),
        ("subj_text", pa.string()),
        ("subj_class", pa.string()),
        ("subj_entity_id", pa.int32()),   # per-document id; -2 = hallucination
        ("subj_entity_text", pa.string()),
        ("subj_mention_merged", pa.list_(pa.string())),
        ("obj_text", pa.string()),
        ("obj_class", pa.string()),
        ("obj_entity_id", pa.int32()),
        ("obj_entity_text", pa.string()),
        ("obj_mention_merged", pa.list_(pa.string())),
    ]
)

# map-side partial rows feeding the canonicalization groupby:
# one row per (document, entity_key); class_rank = "<count:09d>|<class>"
# so the reducer's class pick is a plain vectorized Max
ENTITY_PARTIAL_SCHEMA = pa.schema(
    [
        ("entity_key", pa.int64()),
        ("entity_text", pa.string()),
        ("class_rank", pa.string()),
        ("doc_url", pa.string()),
        ("mention_count", pa.int64()),
    ]
)

NODES_SCHEMA = pa.schema(
    [
        ("entity_key", pa.int64()),
        ("entity_text", pa.string()),
        ("entity_class", pa.string()),
        ("doc_count", pa.int64()),
        ("mention_count", pa.int64()),
    ]
)

EDGES_SCHEMA = pa.schema(
    [
        ("subj_key", pa.int64()),
        ("rel", pa.string()),
        ("obj_key", pa.int64()),
        ("subj_class", pa.string()),
        ("obj_class", pa.string()),
        ("doc_url", pa.string()),
        ("predicted", pa.bool_()),
    ]
)
