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
    """Map-side combine for the canonicalization shuffle, computed from
    PER-DOCUMENT rows (``kg_aligned_json`` / ``kg_links_json``) so a
    document is never split across batches and doc counts stay exact.

    Two combine levels before the wide groupby (SURVEY §7.3 skew
    mitigation):
      1. within doc:   all mentions of an entity -> one (doc, key) record
      2. within batch: all docs' records of a key -> ONE shuffle row
         (entity_key, entity_text, class_rank, doc_count, mention_count)

    A planet-hot entity therefore ships one row per BATCH (not per doc or
    mention). ``class_rank`` = "<zero-padded in-doc count>|<class>" of the
    best in-doc record, so the reducer picks a deterministic class with a
    plain vectorized ``Max``; text variants of one key differ only in
    case/whitespace (key = hash of normalized text), so ``Max`` over texts
    is an equivalent deterministic canonical pick.
    """
    per_key: dict[int, list] = {}  # key -> [text, rank, doc_count, mentions]
    aligned_col = batch.column("kg_aligned_json").to_pylist()
    links_col = (
        batch.column("kg_links_json").to_pylist()
        if "kg_links_json" in batch.column_names
        else [None] * batch.num_rows
    )
    for aligned_json, links_json in zip(aligned_col, links_col):
        doc_counts: dict[int, list] = {}  # key -> [text, class, count]
        def see(text, cls):
            if not text or text == "hallucination":
                return
            key = entity_key(text)
            slot = doc_counts.get(key)
            if slot is None:
                doc_counts[key] = [text, cls, 1]
            else:
                slot[2] += 1

        for triple in json.loads(aligned_json):
            for side in ("subject", "object"):
                node = triple[side]
                see(node.get("entity_text") or node.get("mention_text"),
                    node.get("mention_class", "default"))
        if links_json:
            for link in json.loads(links_json):
                for side in ("subject", "object"):
                    node = link[side]
                    if node.get("entity_id") == "hallucination":
                        continue
                    see(node.get("entity_text") or node.get("mention_text"),
                        node.get("mention_class", "default"))

        for key, (text, cls, count) in doc_counts.items():
            rank = f"{count:09d}|{cls}"
            slot = per_key.get(key)
            if slot is None:
                per_key[key] = [text, rank, 1, count]
            else:
                if text > slot[0]:
                    slot[0] = text
                if rank > slot[1]:
                    slot[1] = rank
                slot[2] += 1
                slot[3] += count

    return pa.Table.from_pydict(
        {
            "entity_key": pa.array(list(per_key.keys()), type=pa.int64()),
            "entity_text": pa.array([v[0] for v in per_key.values()], type=pa.string()),
            "class_rank": pa.array([v[1] for v in per_key.values()], type=pa.string()),
            "doc_count": pa.array([v[2] for v in per_key.values()], type=pa.int64()),
            "mention_count": pa.array([v[3] for v in per_key.values()], type=pa.int64()),
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
