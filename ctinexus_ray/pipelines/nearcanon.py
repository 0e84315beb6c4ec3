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

        n = len(texts)
        T = self.planes_per_table
        L = self.n_tables
        if n == 0:
            return pa.Table.from_pydict(
                {
                    "entity_key": pa.array([], type=pa.int64()),
                    "entity_text": pa.array([], type=pa.string()),
                    "entity_class": pa.array([], type=pa.string()),
                    "doc_count": pa.array([], type=pa.int64()),
                    "mention_count": pa.array([], type=pa.int64()),
                    "bucket": pa.array([], type=pa.int64()),
                    "embedding": pa.array([], type=pa.list_(pa.float64())),
                }
            )
        # fully vectorized explosion to (node x table) rows
        vals = bits.reshape(n, L, T).dot(1 << np.arange(T)).astype(np.int64)  # (n, L)
        class_tags = np.fromiter(
            (stable_hash(c) % (1 << 24) for c in classes), dtype=np.int64, count=n
        )
        buckets = (
            (class_tags[:, None] << 24)
            | (np.arange(L, dtype=np.int64)[None, :] << 16)
            | vals
        ).ravel()
        idx = np.repeat(np.arange(n), L)
        take = pa.array(idx, type=pa.int64())
        flat = pa.array(mat[idx].ravel(), type=pa.float64())
        dim = mat.shape[1]
        embedding = pa.FixedSizeListArray.from_arrays(flat, dim).cast(
            pa.list_(pa.float64())
        )
        import pyarrow.compute as pc

        return pa.Table.from_pydict(
            {
                "entity_key": pc.take(batch.column("entity_key"), take),
                "entity_text": pc.take(batch.column("entity_text"), take),
                "entity_class": pc.take(batch.column("entity_class"), take),
                "doc_count": pc.take(batch.column("doc_count"), take),
                "mention_count": pc.take(batch.column("mention_count"), take),
                "bucket": pa.array(buckets, type=pa.int64()),
                "embedding": embedding,
            }
        )


def _bucket_pairs(
    group: pd.DataFrame, threshold: float, max_bucket: int, star: bool = True
) -> pd.DataFrame:
    """Emit (a, b, doc_a, doc_b) near pairs within one LSH bucket (exact
    cosine verify; bucket capped by doc_count rank).

    ``star=True`` (default) scores only against the bucket REPRESENTATIVE
    (highest doc_count, smallest key) — the documented greedy
    cluster-around-representative semantic, O(B·d) per bucket and at most
    B-1 edges. ``star=False`` is exact all-pairs (O(B²·d)); on dup-heavy
    node tables it emits quadratically many edges (measured 517k pairs
    from 50k nodes) and drowns the driver-side union-find."""
    g = group.drop_duplicates("entity_key").sort_values(
        ["doc_count", "entity_key"], ascending=[False, True], kind="stable"
    ).head(max_bucket)
    keys = g["entity_key"].to_numpy(dtype=np.int64)
    docs = g["doc_count"].to_numpy(dtype=np.int64)
    texts = g["entity_text"].to_numpy(dtype=object)
    klasses = g["entity_class"].to_numpy(dtype=object)

    def frame(ai, bi):
        # texts + class ride along so the optional LLM fine-verify pass
        # can prompt without a join back to the node table
        return pd.DataFrame(
            {
                "a": pd.Series(keys[ai], dtype="int64"),
                "b": pd.Series(keys[bi], dtype="int64"),
                "doc_a": pd.Series(docs[ai], dtype="int64"),
                "doc_b": pd.Series(docs[bi], dtype="int64"),
                "text_a": pd.Series(texts[ai], dtype=object),
                "text_b": pd.Series(texts[bi], dtype=object),
                "klass": pd.Series(klasses[ai], dtype=object),
            }
        )

    empty = frame(np.array([], dtype=int), np.array([], dtype=int))
    if len(keys) < 2:
        return empty
    mat = np.array(g["embedding"].tolist(), dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms
    if star:
        sims = mat[0] @ mat.T  # representative vs all
        bi = np.nonzero(sims[1:] >= threshold)[0] + 1
        if not len(bi):
            return empty
        return frame(np.zeros(len(bi), dtype=int), bi)
    sims = mat @ mat.T
    ai, bi = np.nonzero(np.triu(sims >= threshold, k=1))
    if not len(ai):
        return empty
    return frame(ai, bi)


def _partition_pairs(
    g: pd.DataFrame, threshold: float, max_bucket: int, star: bool = True
) -> pd.DataFrame:
    """Near pairs for one hash partition of bucket rows. The Ray-level
    group key is ``pkey = bucket mod P`` (O(P) per-group overhead —
    distinct buckets are corpus-cardinality); the inner loop over the
    partition's buckets is plain pandas with a vectorized cosine verify
    per bucket. Duplicate edges (same pair found in several tables)
    collapse partition-locally."""
    frames = [
        _bucket_pairs(sub, threshold, max_bucket, star=star)
        for _, sub in g.groupby("bucket", sort=False)
    ]
    frames = [f for f in frames if len(f)]
    if not frames:
        return pd.DataFrame(
            {
                **{c: pd.Series([], dtype="int64")
                   for c in ("a", "b", "doc_a", "doc_b")},
                **{c: pd.Series([], dtype=object)
                   for c in ("text_a", "text_b", "klass")},
            }
        )
    return pd.concat(frames, ignore_index=True).drop_duplicates(["a", "b"])


MERGE_VERIFY_PROMPT = (
    "Do these two entity mentions refer to the same real-world entity?\n"
    'Entity A: "{a}" (class {ka})\n'
    'Entity B: "{b}" (class {kb})\n'
    "Answer strictly YES or NO."
)


class MergeVerifyStage:
    """Actor-pool LLM fine pass of coarse-to-fine canonical-entity
    merging (the north-star stage the embedding threshold alone cannot
    express): the coarse pass proposes embedding-near candidate pairs;
    each pair is confirmed or rejected by one completion at temperature
    0. State (client) loads once per actor; a per-actor memo keyed on
    the (text_a, text_b, class) triple collapses repeat pairs across
    batches (head entities recur). Only YES pairs survive into the
    component resolution."""

    def __init__(self, config: PipelineConfig):
        self.client = get_client(config)
        self._memo: dict[tuple, bool] = {}

    def _verdict(self, a: str, b: str, klass: str) -> bool:
        key = (a, b, klass)
        hit = self._memo.get(key)
        if hit is None:
            prompt = MERGE_VERIFY_PROMPT.format(a=a, ka=klass, b=b, kb=klass)
            text, _ti, _to = self.client.complete(prompt, temperature=0.0)
            hit = text.strip().upper().startswith("YES")
            self._memo[key] = hit
        return hit

    def __call__(self, batch: pa.Table):
        if batch.num_rows == 0:
            return
        keep = [
            self._verdict(a, b, k)
            for a, b, k in zip(
                batch.column("text_a").to_pylist(),
                batch.column("text_b").to_pylist(),
                batch.column("klass").to_pylist(),
            )
        ]
        kept = batch.filter(pa.array(keep))
        if kept.num_rows:
            yield kept


def near_canonical_mapping(
    nodes: ray.data.Dataset,
    config: PipelineConfig,
    threshold: float | None = None,
    n_tables: int = 8,
    planes_per_table: int = 4,
    max_bucket: int = 500,
    pair_mode: str = "star",
    distributed_threshold: int = 2_000_000,
    llm_verify: bool = False,
    llm_concurrency: tuple[int, int] = (1, 4),
) -> ray.data.Dataset:
    """(entity_key -> canon_key) rows for entities merged into a near
    neighbor; identity rows are omitted. Component representative =
    highest doc_count, ties toward the smallest key.

    ``llm_verify=True`` inserts the LLM FINE pass between the coarse
    embedding candidates and component resolution (coarse-to-fine
    merging): only pairs the model confirms merge. Deterministic under
    the mock provider (equal-after-normalization or containment).

    Two resolution paths with IDENTICAL results (property-tested):
      * edge count <= ``distributed_threshold``: driver-side union-find —
        lowest latency while the near-pair set is small relative to the
        node table (the common case).
      * above the threshold: fully distributed — connected components via
        ``ops.distjoin.connected_components`` (min-label propagation, one
        scalar on the driver per round), per-component representative via
        a hash-partitioned (doc_count desc, key asc) first-reduce, and
        the mapping via a partitioned join. Survives web-scale node
        tables where the edge set itself is corpus-sized.
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
    num_partitions = 64

    def add_pkey(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.append_column(
            "pkey", pc.bit_wise_and(batch.column("bucket"), num_partitions - 1)
        )

    star = pair_mode == "star"
    pairs = embedded.map_batches(add_pkey, batch_format="pyarrow").groupby(
        "pkey"
    ).map_groups(
        lambda g: _partition_pairs(g, threshold, max_bucket, star=star),
        batch_format="pandas",
    )

    if llm_verify:
        pairs = pairs.map_batches(
            MergeVerifyStage,
            fn_constructor_args=(config,),
            batch_format="pyarrow",
            concurrency=llm_concurrency,
        )

    pairs = pairs.materialize()
    if pairs.count() > distributed_threshold:
        return _distributed_mapping(pairs, num_partitions)

    parent: dict[int, int] = {}
    doc_counts: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.get(x, x) != x:
            parent[x] = parent.get(parent[x], parent[x])
            x = parent[x]
        return x

    # batched columnar iteration: the edge set is linear in nodes under
    # star mode, but iter_rows() per-row overhead would still dominate
    for batch in pairs.iter_batches(batch_size=65536, batch_format="pyarrow"):
        for a, b, da, db in zip(
            batch.column("a").to_pylist(),
            batch.column("b").to_pylist(),
            batch.column("doc_a").to_pylist(),
            batch.column("doc_b").to_pylist(),
        ):
            doc_counts[a] = da
            doc_counts[b] = db
            ra, rb = find(a), find(b)
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


def _distributed_mapping(
    pairs: ray.data.Dataset, num_partitions: int
) -> ray.data.Dataset:
    """Distributed (entity_key -> canon_key) resolution over a near-pair
    dataset with (a, b, doc_a, doc_b) rows. Same semantics as the driver
    union-find: component representative = (max doc_count, min key)."""
    import pandas as pd

    from ctinexus_ray.ops.distjoin import connected_components, hash_join
    from ctinexus_ray.ops.groupagg import add_hash_pkey, partitioned_agg

    i64 = pa.int64()
    cc = connected_components(
        pairs.select_columns(["a", "b"]), num_partitions=num_partitions
    )

    def explode_counts(batch: pa.Table):
        if batch.num_rows == 0:
            return
        a = batch.column("a").cast(i64).combine_chunks()
        b = batch.column("b").cast(i64).combine_chunks()
        da = batch.column("doc_a").cast(i64).combine_chunks()
        db = batch.column("doc_b").cast(i64).combine_chunks()
        yield pa.Table.from_arrays(
            [pa.chunked_array([a, b]), pa.chunked_array([da, db])],
            names=["node", "doc_count"],
        )

    dcounts = partitioned_agg(
        pairs.map_batches(explode_counts, batch_format="pyarrow"),
        keys=["node"],
        named_aggs={"doc_count": ("doc_count", "max")},
        num_partitions=num_partitions,
    )
    labeled = hash_join(
        cc,
        dcounts,
        on=["node"],
        num_partitions=num_partitions,
        left_types={"node": i64, "label": i64},
        right_types={"node": i64, "doc_count": i64},
    )

    def rep_partition(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["label", "doc_count", "node"],
            ascending=[True, False, True],
            kind="mergesort",
        )
        first = g.groupby("label", sort=False).first().reset_index()
        return pd.DataFrame(
            {
                "label": first["label"].astype("int64").values,
                "canon_key": first["node"].astype("int64").values,
            }
        )

    reps = (
        labeled.map_batches(
            lambda b: add_hash_pkey(b, ["label"], num_partitions),
            batch_format="pyarrow",
        )
        .groupby("pkey")
        .map_groups(rep_partition, batch_format="pandas")
    )
    mapped = hash_join(
        cc,
        reps,
        on=["label"],
        num_partitions=num_partitions,
        left_types={"label": i64, "node": i64},
        right_types={"label": i64, "canon_key": i64},
    )

    def non_identity(batch: pa.Table):
        import pyarrow.compute as pc

        kept = batch.filter(
            pc.not_equal(batch.column("node"), batch.column("canon_key"))
        )
        if kept.num_rows == 0:
            return
        yield pa.Table.from_pydict(
            {
                "entity_key": kept.column("node"),
                "canon_key": kept.column("canon_key"),
            }
        )

    return mapped.map_batches(non_identity, batch_format="pyarrow")


_BROADCAST_MAPPING_MAX = 2_000_000


def _canonized_keys(
    ds: ray.data.Dataset,
    key_cols: list[str],
    mapping: ray.data.Dataset,
    num_partitions: int = 64,
) -> ray.data.Dataset:
    """Rewrite each ``key_cols`` column of ``ds`` through the
    (entity_key -> canon_key) mapping with one left-outer ``hash_join``
    per column (unmapped keys keep their value via coalesce). The
    distributed counterpart of the broadcast-dict remap, for mappings too
    large to ship to every task — at web-scale merge rates the mapping is
    itself corpus-sized (VERDICT r1: the named-but-unimplemented
    fallback)."""
    import pyarrow.compute as pc

    from ctinexus_ray.ops.distjoin import _arrow_type, hash_join

    for col in key_cols:
        ds_types = {
            n: _arrow_type(t)
            for n, t in zip(ds.schema().names, ds.schema().types)
        }

        def ren(batch: pa.Table, col=col) -> pa.Table:
            return batch.rename_columns([col, "__canon"])

        side = mapping.select_columns(["entity_key", "canon_key"]).map_batches(
            ren, batch_format="pyarrow"
        )
        joined = hash_join(
            ds,
            side,
            on=[col],
            how="left",
            num_partitions=num_partitions,
            left_types=ds_types,
            right_types={col: pa.int64(), "__canon": pa.int64()},
        )

        def coalesce(batch: pa.Table, col=col) -> pa.Table:
            canon = pc.coalesce(batch.column("__canon"), batch.column(col))
            i = batch.column_names.index(col)
            return batch.drop_columns(["__canon"]).set_column(
                i, col, canon
            )

        ds = joined.map_batches(coalesce, batch_format="pyarrow")
    return ds


def apply_mapping_to_nodes(
    nodes: ray.data.Dataset,
    mapping: ray.data.Dataset,
    broadcast_max: int = _BROADCAST_MAPPING_MAX,
) -> ray.data.Dataset:
    """Merge mapped nodes into their canonical representatives (doc/mention
    counts summed; representative keeps its text/class).

    The mapping holds one row per MERGED node. While that stays small
    (the common case: merges are a few % of nodes) it is broadcast once
    via ``ray.put``; above ``broadcast_max`` rows the remap switches to
    hash-partitioned left-outer joins (``_canonized_keys``) so nothing
    mapping-sized touches the driver or any single task."""
    from ctinexus_ray.ops.groupagg import partitioned_agg

    mapping = mapping.materialize()
    if mapping.count() > broadcast_max:
        canonized = _canonized_keys(
            nodes.map_batches(
                lambda b: b.append_column(
                    "orig_key", b.column("entity_key")
                ),
                batch_format="pyarrow",
            ),
            ["entity_key"],
            mapping,
        )

        def rank_batch(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            is_rep = pc.equal(
                batch.column("entity_key"), batch.column("orig_key")
            )
            rank_text = pc.if_else(
                is_rep,
                pc.binary_join_element_wise(
                    pa.array(["1"] * batch.num_rows),
                    batch.column("entity_text"),
                    "|",
                ),
                pa.array(["0|"] * batch.num_rows),
            )
            rank_class = pc.if_else(
                is_rep,
                pc.binary_join_element_wise(
                    pa.array(["1"] * batch.num_rows),
                    batch.column("entity_class"),
                    "|",
                ),
                pa.array(["0|"] * batch.num_rows),
            )
            return pa.Table.from_pydict(
                {
                    "entity_key": batch.column("entity_key"),
                    "rank_text": rank_text,
                    "rank_class": rank_class,
                    "doc_count": batch.column("doc_count"),
                    "mention_count": batch.column("mention_count"),
                }
            )

        agg = partitioned_agg(
            canonized.map_batches(rank_batch, batch_format="pyarrow"),
            keys=["entity_key"],
            named_aggs={
                "rank_text": ("rank_text", "max"),
                "rank_class": ("rank_class", "max"),
                "doc_count": ("doc_count", "sum"),
                "mention_count": ("mention_count", "sum"),
            },
        )
        return agg.map_batches(_finalize_ranked, batch_format="pyarrow")

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

    # entity_key is corpus-cardinality -> hash-partitioned vectorized
    # reduce (see groupagg), not a built-in per-key aggregate
    agg = partitioned_agg(
        nodes.map_batches(remap, batch_format="pyarrow"),
        keys=["entity_key"],
        named_aggs={
            "rank_text": ("rank_text", "max"),
            "rank_class": ("rank_class", "max"),
            "doc_count": ("doc_count", "sum"),
            "mention_count": ("mention_count", "sum"),
        },
    )
    return agg.map_batches(_finalize_ranked, batch_format="pyarrow")


def _finalize_ranked(batch: pa.Table) -> pa.Table:
    """Strip the '1|'/'0|' representative-rank prefixes after the max
    reduce (shared by the broadcast and distributed remap paths)."""
    return pa.Table.from_pydict(
        {
            "entity_key": batch.column("entity_key"),
            "entity_text": pa.array(
                [t.split("|", 1)[1] for t in batch.column("rank_text").to_pylist()],
                type=pa.string(),
            ),
            "entity_class": pa.array(
                [c.split("|", 1)[1] for c in batch.column("rank_class").to_pylist()],
                type=pa.string(),
            ),
            "doc_count": batch.column("doc_count"),
            "mention_count": batch.column("mention_count"),
        }
    )


def apply_mapping_to_edges(
    edges: ray.data.Dataset,
    mapping: ray.data.Dataset,
    broadcast_max: int = _BROADCAST_MAPPING_MAX,
) -> ray.data.Dataset:
    """Rewrite edge endpoints through the near-canonical mapping —
    broadcast once via ``ray.put`` while the mapping is small; above
    ``broadcast_max`` rows, two hash-partitioned left-outer joins
    (one per endpoint column) so the mapping never ships whole."""
    mapping = mapping.materialize()
    if mapping.count() > broadcast_max:
        return _canonized_keys(edges, ["subj_key", "obj_key"], mapping)

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
