"""Explode per-document nested results into the flat triples table, and
map-side partials for canonicalization.

Stateless ``map_batches`` tasks (no actor state needed).
"""

from __future__ import annotations

import hashlib
import json
import re

import pyarrow as pa

from ctinexus_ray.schemas import TRIPLES_SCHEMA

HALLUCINATION_ENTITY_ID = -2

_WS_RE = re.compile(r"\s+")


def normalize_entity_text(text: str) -> str:
    """Canonicalization key normalization: casefold + whitespace collapse
    (documented key choice, SURVEY §7.3)."""
    return _WS_RE.sub(" ", text.casefold()).strip()


def entity_key(text: str) -> int:
    """Stable signed-int64 key of the normalized entity text."""
    digest = hashlib.blake2b(
        normalize_entity_text(text).encode("utf-8"), digest_size=8
    ).digest()
    return int.from_bytes(digest, "big", signed=True)


def _node_fields(node: dict) -> tuple[str, str, int, str, list[str]]:
    """(text, class, entity_id, entity_text, mention_merged) with the
    hallucination sentinel mapped to entity_id -2 (quirk Q7)."""
    text = node.get("mention_text", "")
    cls = node.get("mention_class", "default")
    raw_id = node.get("entity_id", -1)
    eid = HALLUCINATION_ENTITY_ID if raw_id == "hallucination" else int(raw_id)
    etext = node.get("entity_text") or text
    merged = node.get("mention_merged") or []
    return text, cls, eid, etext, merged


def explode_triples_batch(batch: pa.Table) -> pa.Table:
    """Per-document (kg_aligned_json, kg_links_json) -> flat TRIPLES_SCHEMA
    rows. Aligned triples keep their in-document order (``triple_idx``);
    predicted links follow, flagged ``predicted=True``."""
    urls = batch.column("url").to_pylist()
    aligned_col = batch.column("kg_aligned_json").to_pylist()
    links_col = batch.column("kg_links_json").to_pylist()

    rows: dict[str, list] = {name: [] for name in TRIPLES_SCHEMA.names}

    def emit(url: str, idx: int, rel: str, predicted: bool, subj: dict, obj: dict):
        s_text, s_cls, s_id, s_etext, s_merged = _node_fields(subj)
        o_text, o_cls, o_id, o_etext, o_merged = _node_fields(obj)
        rows["doc_url"].append(url)
        rows["triple_idx"].append(idx)
        rows["rel"].append(rel)
        rows["predicted"].append(predicted)
        rows["subj_text"].append(s_text)
        rows["subj_class"].append(s_cls)
        rows["subj_entity_id"].append(s_id)
        rows["subj_entity_text"].append(s_etext)
        rows["subj_mention_merged"].append(s_merged)
        rows["obj_text"].append(o_text)
        rows["obj_class"].append(o_cls)
        rows["obj_entity_id"].append(o_id)
        rows["obj_entity_text"].append(o_etext)
        rows["obj_mention_merged"].append(o_merged)

    for url, aligned_json, links_json in zip(urls, aligned_col, links_col):
        idx = 0
        for triple in json.loads(aligned_json):
            emit(url, idx, triple["relation"], False, triple["subject"], triple["object"])
            idx += 1
        for link in json.loads(links_json):
            emit(url, idx, link["relation"], True, link["subject"], link["object"])
            idx += 1

    return pa.Table.from_pydict(rows, schema=TRIPLES_SCHEMA)


def entity_partials_batch(batch: pa.Table) -> pa.Table:
    """Map-side combine for the canonicalization shuffle: flat triples ->
    ONE row per (doc, entity_key) with within-doc mention counts.

    Pre-aggregating here (instead of shipping one row per mention) is the
    head-key skew mitigation of SURVEY §7.3: a hot entity mentioned 50
    times in a document contributes ONE row to the shuffle. The
    ``class_rank`` column ("<zero-padded in-doc count>|<class>") lets the
    reducer pick a deterministic per-key class with a plain vectorized
    ``Max`` instead of a per-group Python reduce.
    """
    per_doc: dict[tuple[int, str], list] = {}
    for side in ("subj", "obj"):
        texts = batch.column(f"{side}_entity_text").to_pylist()
        classes = batch.column(f"{side}_class").to_pylist()
        ids = batch.column(f"{side}_entity_id").to_pylist()
        urls = batch.column("doc_url").to_pylist()
        for text, cls, eid, url in zip(texts, classes, ids, urls):
            if eid == HALLUCINATION_ENTITY_ID or not text:
                continue
            key = entity_key(text)
            slot = per_doc.get((key, url))
            if slot is None:
                # [text, class, count] — first-seen text/class variant wins
                # within the doc (variants of a key differ only in
                # case/whitespace: same key <=> same normalized text)
                per_doc[(key, url)] = [text, cls, 1]
            else:
                slot[2] += 1

    keys, etexts, ranks, urls_out, counts = [], [], [], [], []
    for (key, url), (text, cls, count) in per_doc.items():
        keys.append(key)
        etexts.append(text)
        ranks.append(f"{count:09d}|{cls}")
        urls_out.append(url)
        counts.append(count)
    return pa.Table.from_pydict(
        {
            "entity_key": pa.array(keys, type=pa.int64()),
            "entity_text": pa.array(etexts, type=pa.string()),
            "class_rank": pa.array(ranks, type=pa.string()),
            "doc_url": pa.array(urls_out, type=pa.string()),
            "mention_count": pa.array(counts, type=pa.int64()),
        }
    )


def edges_batch(batch: pa.Table) -> pa.Table:
    """Flat triples -> canonical-keyed edges (no shuffle needed: the
    entity key is computable per row)."""
    n = batch.num_rows
    subj_keys = [
        entity_key(t) if i != HALLUCINATION_ENTITY_ID else HALLUCINATION_ENTITY_ID
        for t, i in zip(
            batch.column("subj_entity_text").to_pylist(),
            batch.column("subj_entity_id").to_pylist(),
        )
    ]
    obj_keys = [
        entity_key(t) if i != HALLUCINATION_ENTITY_ID else HALLUCINATION_ENTITY_ID
        for t, i in zip(
            batch.column("obj_entity_text").to_pylist(),
            batch.column("obj_entity_id").to_pylist(),
        )
    ]
    return pa.Table.from_pydict(
        {
            "subj_key": pa.array(subj_keys, type=pa.int64()),
            "rel": batch.column("rel"),
            "obj_key": pa.array(obj_keys, type=pa.int64()),
            "subj_class": batch.column("subj_class"),
            "obj_class": batch.column("obj_class"),
            "doc_url": batch.column("doc_url"),
            "predicted": batch.column("predicted"),
        }
    )
