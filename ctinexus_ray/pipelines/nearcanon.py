"""Second-pass cross-document NEAR canonicalization (SURVEY §2.7 D3,
cross-doc variant): after the exact normalized-text groupby, merge
canonical entities whose texts are embedding-near within a class.

Scalable shape (no all-pairs over the node table):

    nodes -> embed entity_text (actor pool, per-actor cache)
          -> hyperplane-LSH bucket WITHIN entity_class
          -> per (class, bucket): greedy threshold clustering (capped)
          -> mapping entity_key -> canonical entity_key
          -> merged nodes (+ edge remap via broadcast of the mapping)

The per-bucket work is bounded (``max_bucket``); representative = highest
doc_count, ties toward the smallest entity_key — deterministic regardless
of partitioning. LSH bucketing is an approximation: near pairs landing in
different buckets stay unmerged (recall/n_planes trade-off, standard for
embedding near-dup at corpus scale).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ctinexus_ray.config import PipelineConfig
from ctinexus_ray.llm.client import get_client


def _hash_unit(tag: str, dim: int) -> np.ndarray:
    from ctinexus_ray.llm.mock import stable_hash

    vec = np.array(
        [((stable_hash(f"{tag}-{d}") / 2**64) * 2.0 - 1.0) for d in range(dim)]
    )
    return vec / np.linalg.norm(vec)


class EmbedNodesStage:
    """Actor-pool stage: entity_text -> embedding + L class-scoped LSH
    buckets (multi-table hyperplane LSH: ``n_tables`` independent tables of
    ``planes_per_table`` planes each — a near pair collides in SOME table
    with probability 1-(1-(1-θ/π)^k)^L, ~0.9 for cosine 0.6 at L=8, k=4).
    Emits one row per (node, table)."""

    def __init__(
        self,
        config: PipelineConfig,
        n_tables: int = 8,
        planes_per_table: int = 4,
    ):
        self.config = config
        self.client = get_client(config)
        self.n_tables = n_tables
        self.planes_per_table = planes_per_table
        self._planes: np.ndarray | None = None  # (tables*planes, dim)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ctinexus_ray.llm.mock import stable_hash

        texts = batch.column("entity_text").to_pylist()
        classes = batch.column("entity_class").to_pylist()
        vectors, _ = self.client.embed(texts)
        mat = np.asarray(vectors, dtype=np.float64)
        total_planes = self.n_tables * self.planes_per_table
        if self._planes is None:
            dim = mat.shape[1] if mat.size else 64
            self._planes = np.stack(
                [_hash_unit(f"nearcanon-plane-{p}", dim) for p in range(total_planes)]
            )
        bits = (
            (mat @ self._planes.T) > 0
            if mat.size
            else np.zeros((0, total_planes), bool)
        )

        out_rows = {name: [] for name in
                    ("entity_key", "entity_text", "entity_class", "doc_count",
                     "mention_count", "bucket", "embedding")}
        keys = batch.column("entity_key").to_pylist()
        docs = batch.column("doc_count").to_pylist()
        mentions = batch.column("mention_count").to_pylist()
        for i in range(len(keys)):
            class_tag = stable_hash(classes[i]) % (1 << 24)
            for t in range(self.n_tables):
                chunk = bits[i, t * self.planes_per_table : (t + 1) * self.planes_per_table]
                value = int(chunk.dot(1 << np.arange(self.planes_per_table)))
                bucket = (class_tag << 24) | (t << 16) | value
                out_rows["entity_key"].append(keys[i])
                out_rows["entity_text"].append(texts[i])
                out_rows["entity_class"].append(classes[i])
                out_rows["doc_count"].append(docs[i])
                out_rows["mention_count"].append(mentions[i])
                out_rows["bucket"].append(bucket)
                out_rows["embedding"].append(mat[i].tolist())
        return pa.Table.from_pydict(
            {
                "entity_key": pa.array(out_rows["entity_key"], type=pa.int64()),
                "entity_text": pa.array(out_rows["entity_text"], type=pa.string()),
                "entity_class": pa.array(out_rows["entity_class"], type=pa.string()),
                "doc_count": pa.array(out_rows["doc_count"], type=pa.int64()),
                "mention_count": pa.array(out_rows["mention_count"], type=pa.int64()),
                "bucket": pa.array(out_rows["bucket"], type=pa.int64()),
                "embedding": pa.array(out_rows["embedding"], type=pa.list_(pa.float64())),
            }
        )


def _bucket_pairs(group: pd.DataFrame, threshold: float, max_bucket: int) -> pd.DataFrame:
    """Emit (a, b, doc_a, doc_b) near pairs within one LSH bucket (exact
    cosine verify; bucket capped by doc_count rank)."""
    g = group.drop_duplicates("entity_key").sort_values(
        ["doc_count", "entity_key"], ascending=[False, True], kind="stable"
    ).head(max_bucket)
    keys = g["entity_key"].to_numpy(dtype=np.int64)
    docs = g["doc_count"].to_numpy(dtype=np.int64)
    mat = np.array(g["embedding"].tolist(), dtype=np.float64)
    if len(keys) < 2:
        return pd.DataFrame(
            {c: pd.Series([], dtype="int64") for c in ("a", "b", "doc_a", "doc_b")}
        )
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    sims = mat @ mat.T
    out = {"a": [], "b": [], "doc_a": [], "doc_b": []}
    for i in range(len(keys)):
        for j in range(i + 1, len(keys)):
            if sims[i, j] >= threshold:
                out["a"].append(int(keys[i]))
                out["b"].append(int(keys[j]))
                out["doc_a"].append(int(docs[i]))
                out["doc_b"].append(int(docs[j]))
    return pd.DataFrame({k: pd.Series(v, dtype="int64") for k, v in out.items()})


def near_canonical_mapping(
    nodes: ray.data.Dataset,
    config: PipelineConfig,
    threshold: float | None = None,
    n_tables: int = 8,
    planes_per_table: int = 4,
    max_bucket: int = 500,
) -> ray.data.Dataset:
    """(entity_key -> canon_key) rows for entities merged into a near
    neighbor; identity rows are omitted.

    Pairs from all LSH tables are resolved with a driver-side union-find
    (the near-pair set is tiny relative to the node table); component
    representative = highest doc_count, ties toward the smallest key.
    """
    threshold = threshold if threshold is not None else config.similarity_threshold
    embedded = nodes.map_batches(
        EmbedNodesStage,
        fn_constructor_kwargs={
            "config": config,
            "n_tables": n_tables,
            "planes_per_table": planes_per_table,
        },
        batch_format="pyarrow",
        batch_size=config.cpu_batch_size,
        concurrency=(1, 8),
    )
    pairs = embedded.groupby("bucket").map_groups(
        lambda g: _bucket_pairs(g, threshold, max_bucket), batch_format="pandas"
    )

    parent: dict[int, int] = {}
    doc_counts: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    for row in pairs.iter_rows():
        doc_counts[row["a"]] = row["doc_a"]
        doc_counts[row["b"]] = row["doc_b"]
        ra, rb = find(row["a"]), find(row["b"])
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    components: dict[int, list[int]] = {}
    for key in doc_counts:
        components.setdefault(find(key), []).append(key)

    mapping_rows = []
    for members in components.values():
        rep = max(members, key=lambda k: (doc_counts[k], -k))
        for member in members:
            if member != rep:
                mapping_rows.append({"entity_key": member, "canon_key": rep})
    if not mapping_rows:
        mapping_rows = []  # empty mapping dataset below needs a schema hint
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"entity_key": pa.array([], type=pa.int64()),
                 "canon_key": pa.array([], type=pa.int64())}
            )
        )
    return ray.data.from_items(mapping_rows)


def apply_mapping_to_nodes(
    nodes: ray.data.Dataset, mapping: ray.data.Dataset
) -> ray.data.Dataset:
    """Merge mapped nodes into their canonical representatives (doc/mention
    counts summed; representative keeps its text/class)."""
    from ray.data.aggregate import Max, Sum

    lookup = {r["entity_key"]: r["canon_key"] for r in mapping.iter_rows()}
    lookup_ref = ray.put(lookup)

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(lookup_ref)
        keys = batch.column("entity_key").to_pylist()
        canon = [m.get(k, k) for k in keys]
        is_rep = [m.get(k, k) == k for k in keys]
        texts = batch.column("entity_text").to_pylist()
        classes = batch.column("entity_class").to_pylist()
        # representative rank: representatives win the Max over rank-text
        rank_text = [
            ("1|" + t) if rep else "0|" for t, rep in zip(texts, is_rep)
        ]
        rank_class = [
            ("1|" + c) if rep else "0|" for c, rep in zip(classes, is_rep)
        ]
        return pa.Table.from_pydict(
            {
                "entity_key": pa.array(canon, type=pa.int64()),
                "rank_text": pa.array(rank_text, type=pa.string()),
                "rank_class": pa.array(rank_class, type=pa.string()),
                "doc_count": batch.column("doc_count"),
                "mention_count": batch.column("mention_count"),
            }
        )

    agg = nodes.map_batches(remap, batch_format="pyarrow").groupby(
        "entity_key"
    ).aggregate(Max("rank_text"), Max("rank_class"), Sum("doc_count"), Sum("mention_count"))

    def finalize(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "entity_key": batch.column("entity_key"),
                "entity_text": pa.array(
                    [t.split("|", 1)[1] for t in batch.column("max(rank_text)").to_pylist()],
                    type=pa.string(),
                ),
                "entity_class": pa.array(
                    [c.split("|", 1)[1] for c in batch.column("max(rank_class)").to_pylist()],
                    type=pa.string(),
                ),
                "doc_count": batch.column("sum(doc_count)"),
                "mention_count": batch.column("sum(mention_count)"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def apply_mapping_to_edges(
    edges: ray.data.Dataset, mapping: ray.data.Dataset
) -> ray.data.Dataset:
    """Rewrite edge endpoints through the near-canonical mapping
    (broadcast once via ray.put)."""
    lookup = {r["entity_key"]: r["canon_key"] for r in mapping.iter_rows()}
    lookup_ref = ray.put(lookup)

    def remap(batch: pa.Table) -> pa.Table:
        m = ray.get(lookup_ref)
        subj = [m.get(k, k) for k in batch.column("subj_key").to_pylist()]
        obj = [m.get(k, k) for k in batch.column("obj_key").to_pylist()]
        out = batch.drop_columns(["subj_key", "obj_key"])
        out = out.append_column("subj_key", pa.array(subj, type=pa.int64()))
        return out.append_column("obj_key", pa.array(obj, type=pa.int64()))

    return edges.map_batches(remap, batch_format="pyarrow")
