"""Distributed two-large-sides join + connected components.

``ops.relational`` covers the broadcast (map-side) join, which requires the
small side to fit in one object. The operators here are the shuffle
counterparts that stay correct when BOTH sides grow with the corpus and no
driver-side state is allowed:

  hash_join             union of side-tagged rows -> ONE hash shuffle on the
                        key -> per-partition Arrow (Acero) join. Per-group
                        overhead is O(P) (the Ray-level group key is
                        ``pkey = hash(keys) mod P``, not the join key — see
                        ``ops.groupagg`` for why per-key built-ins don't
                        scale), and the per-partition join is a vectorized
                        C++ kernel. Supports inner / left / right / full
                        outer / left anti / left semi.
  connected_components  iterated min-label propagation with pointer jumping
                        over an (a, b) edge dataset. Every iteration is a
                        bounded number of shuffles over edge-sized data; the
                        driver holds ONE scalar (the label-sum convergence
                        check), never the edge set, the label table, or a
                        union-find — this is the web-dedup shape where dup
                        components are corpus-sized.

These are the scale replacements for the round-1 driver-side union-find /
broadcast-drop-set patterns flagged in VERDICT.md (ops/dedup.py:346-425).
The reference system has no distributed joins at all (single-document
litellm tool) — these operators exist for the corpus-scale pipelines.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa
import ray
import ray.data

from ctinexus_ray.ops.groupagg import add_hash_pkey

_JOIN_TYPES = {
    "inner": "inner",
    "left": "left outer",
    "right": "right outer",
    "full": "full outer",
    "left_anti": "left anti",
    "left_semi": "left semi",
}


def _arrow_type(t) -> pa.DataType:
    """Normalize a ray.data.Schema column type to a pyarrow DataType."""
    if isinstance(t, pa.DataType):
        return t
    import numpy as np

    if isinstance(t, np.dtype):
        if t == object:  # pandas object blocks: strings in this codebase
            return pa.string()
        return pa.from_numpy_dtype(t)
    if t is object:
        # pandas-block-backed datasets (map_groups output) report plain
        # ``object`` for string columns, not np.dtype('O')
        return pa.string()
    raise TypeError(f"cannot map schema type {t!r} to pyarrow")


def _schema_fields(ds: ray.data.Dataset, types: dict[str, pa.DataType] | None):
    """Ordered (name, pyarrow type) pairs for a dataset. ``types`` (explicit
    column->type map) skips the ``ds.schema()`` probe — pass it when the
    caller already knows the layout (e.g. inside iterative algorithms where
    a metadata probe per iteration would add latency)."""
    if types is not None:
        return list(types.items())
    schema = ds.schema()
    return [(n, _arrow_type(t)) for n, t in zip(schema.names, schema.types)]


def hash_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    how: str = "inner",
    num_partitions: int | None = None,
    left_types: dict[str, pa.DataType] | None = None,
    right_types: dict[str, pa.DataType] | None = None,
) -> ray.data.Dataset:
    """Join two datasets of unbounded size on equal-named key columns.

    Shuffle shape: each side's batches are projected into ONE shared arrow
    schema (missing columns become typed nulls) and tagged with ``_side``;
    the union makes a single dataset that shuffles ONCE on
    ``pkey = hash(on) mod num_partitions``. Each partition holds every row
    of both sides for its key slice, so a per-partition
    ``pyarrow.Table.join`` (hash join in Arrow C++) produces exact results.

    ``how``: ``inner`` | ``left`` | ``right`` | ``full`` | ``left_anti``
    | ``left_semi``. Output columns: keys + left non-key columns + (for
    inner/left/right/full) right non-key columns; for right/full outer
    the key columns are coalesced across sides (ANSI USING semantics).
    Non-key
    column names must be disjoint across sides (rename first). Output row
    order is unspecified (hash-partitioned).

    At 100 TB: both sides stream through the shuffle; no driver state, no
    broadcast. Use ``ops.relational.broadcast_enrich`` instead when one
    side is a dimension table — that shape avoids shuffling the big side
    entirely. ``num_partitions`` bounds per-task memory (size it ~ total
    rows / comfortable task rows).
    """
    if how not in _JOIN_TYPES:
        raise ValueError(f"how must be one of {sorted(_JOIN_TYPES)}")
    if num_partitions is None:
        from ctinexus_ray.ops.groupagg import derive_num_partitions

        num_partitions = derive_num_partitions(left, right)
    assert num_partitions & (num_partitions - 1) == 0, "power of two"
    lfields = _schema_fields(left, left_types)
    rfields = _schema_fields(right, right_types)
    ltypes = dict(lfields)
    rtypes = dict(rfields)
    for k in on:
        if k not in ltypes or k not in rtypes:
            raise ValueError(f"join key {k!r} missing from a side")
        if ltypes[k] != rtypes[k]:
            raise ValueError(
                f"join key {k!r} type mismatch: {ltypes[k]} vs {rtypes[k]}"
            )
    lcols = [n for n, _ in lfields if n not in on]
    rcols = [n for n, _ in rfields if n not in on]
    overlap = set(lcols) & set(rcols)
    if overlap:
        raise ValueError(f"non-key columns must be disjoint, got {overlap}")

    combined = pa.schema(
        [pa.field(k, ltypes[k]) for k in on]
        + [pa.field(n, ltypes[n]) for n in lcols]
        + [pa.field(n, rtypes[n]) for n in rcols]
        + [pa.field("_side", pa.int8())]
    )

    def _placeholder(n: int, t: pa.DataType) -> pa.Array:
        # The other side's columns are never read (join_partition selects
        # each side's own columns before joining), but they must NOT be
        # typed nulls: a nullable int64 column degrades to float64 when
        # Ray's sort shuffle round-trips the block through pandas.
        if pa.types.is_integer(t) or pa.types.is_floating(t):
            return pa.array([0] * n, type=t)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            return pa.array([""] * n, type=t)
        if pa.types.is_boolean(t):
            return pa.array([False] * n, type=t)
        return pa.nulls(n, type=t)

    def to_combined(side: int):
        def project(batch: pa.Table):
            n = batch.num_rows
            if n == 0:  # yield nothing: no schema-less empty blocks
                return
            arrays = []
            for f in combined:
                if f.name == "_side":
                    arrays.append(pa.array([side] * n, type=pa.int8()))
                elif f.name in batch.column_names:
                    arrays.append(batch.column(f.name).cast(f.type))
                else:
                    arrays.append(_placeholder(n, f.type))
            yield pa.Table.from_arrays(arrays, schema=combined)

        return project

    tagged = left.map_batches(to_combined(0), batch_format="pyarrow").union(
        right.map_batches(to_combined(1), batch_format="pyarrow")
    )
    keyed = tagged.map_batches(
        lambda b: add_hash_pkey(b, on, num_partitions), batch_format="pyarrow"
    )

    join_type = _JOIN_TYPES[how]
    out_cols = on + lcols + (
        [] if how in ("left_anti", "left_semi") else rcols
    )
    out_schema = pa.schema(
        [pa.field(c, (ltypes | rtypes)[c]) for c in out_cols]
    )

    def join_partition(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        side = g.column("_side")
        lt = g.filter(pc.equal(side, 0)).select(on + lcols)
        rt = g.filter(pc.equal(side, 1)).select(on + rcols)
        out = lt.join(rt, keys=on, join_type=join_type).select(out_cols)
        # pin the output schema (left-outer null fills must stay typed)
        return out.cast(out_schema)

    return keyed.groupby("pkey").map_groups(
        join_partition, batch_format="pyarrow"
    )


def anti_join_ids(
    ds: ray.data.Dataset,
    key: str,
    drop: ray.data.Dataset,
    drop_key: str | None = None,
    num_partitions: int | None = None,
    key_type: pa.DataType = pa.int64(),
) -> ray.data.Dataset:
    """Keep the rows of ``ds`` whose ``key`` does NOT appear in ``drop``
    (distributed anti-join — the scale replacement for broadcasting a
    drop-set as a Python set). ``drop`` may be corpus-sized."""
    drop_key = drop_key or key
    if num_partitions is None:
        from ctinexus_ray.ops.groupagg import derive_num_partitions

        num_partitions = derive_num_partitions(ds, drop)
    drops = drop.select_columns([drop_key])
    if drop_key != key:

        def ren(batch: pa.Table) -> pa.Table:
            return batch.rename_columns([key])

        drops = drops.map_batches(ren, batch_format="pyarrow")
    ds_types = None
    try:
        ds_types = {
            n: _arrow_type(t)
            for n, t in zip(ds.schema().names, ds.schema().types)
        }
    except Exception:  # noqa: BLE001 — schema probe best-effort
        pass
    return hash_join(
        ds,
        drops,
        on=[key],
        how="left_anti",
        num_partitions=num_partitions,
        left_types=ds_types,
        right_types={key: key_type},
    )


def _cc_arrays(a, b):
    """Exact in-memory connected components over edge arrays -> (nodes,
    labels) numpy arrays, label = smallest node id in the component.

    Fully vectorized (FastSV-style): alternate edge min-relaxation
    (``np.minimum.at`` scatter) with pointer jumping (``lab = lab[lab]``)
    until the label vector is a fixpoint; both converge in O(log n)
    in-memory passes. Because ``np.unique`` sorts node ids ascending,
    index order equals value order, so the component's root index maps
    back to its smallest node id with no extra pass."""
    import numpy as np

    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    u, v = inv[: len(a)], inv[len(a) :]
    lab = np.arange(len(nodes), dtype=np.int64)
    while True:
        while True:  # pointer jumping: contract chains geometrically
            nl = lab[lab]
            if np.array_equal(nl, lab):
                break
            lab = nl
        before = lab.sum()
        m = np.minimum(lab[u], lab[v])
        np.minimum.at(lab, u, m)
        np.minimum.at(lab, v, m)
        np.minimum.at(lab, lab[u], m)  # relax the roots too
        np.minimum.at(lab, lab[v], m)
        if lab.sum() == before:
            break
    return nodes, nodes[lab]


def connected_components(
    pairs: ray.data.Dataset,
    num_partitions: int | None = None,
    max_iters: int = 30,
    local_threshold: int = 5_000_000,
    contract_rounds: int = 4,
) -> ray.data.Dataset:
    """Distributed connected components over an (a, b) int64 edge dataset.

    Returns (node, label) for every node that appears in an edge, where
    ``label`` is the SMALLEST node id in the node's component (the same
    survivor rule as a driver union-find, so results are interchangeable).

    Three-tier strategy (cheapest that fits, never driver-side):

    1. **Single-task exact** — when the edge count is at most
       ``local_threshold`` (5M edges = ~80 MB of int64 pairs, far under a
       worker's heap), ONE Ray task runs the vectorized in-memory solver
       (``_cc_arrays``). This is the common case after dedup candidate
       generation: star-mode pair counts are linear in corpus size and
       orders of magnitude below the corpus row count.
    2. **Contraction rounds** — otherwise, partition the edges
       arbitrarily (keyless ``repartition``, no sort shuffle), solve each
       partition in-task, and emit its components as STAR edges
       (min-node, other-node). Star contraction preserves both
       connectivity and the node set, and caps the edge count at the
       node count; the partition count shrinks 4x per round so
       cross-partition components keep colliding. Each round is one
       cheap coalesce + an embarrassingly parallel map — no all-to-all.
    3. **Min-label propagation fallback** — if ``contract_rounds`` rounds
       still leave more than ``local_threshold`` edges (a single
       component spanning billions of nodes), fall back to fully
       distributed iterated min-label propagation with pointer jumping
       (2 hash-shuffles per round, O(log diameter) rounds, driver holds
       one scalar per round).

    This replaces both the round-1 driver union-find AND the round-2
    propagation-only version whose per-round shuffle overhead dominated
    (VERDICT.md: 800 s / 7 GB driver RSS at 400 k docs — the same input
    now takes one task)."""
    if num_partitions is None:
        from ctinexus_ray.ops.groupagg import derive_num_partitions

        num_partitions = derive_num_partitions(pairs)
    i64 = pa.int64()

    def clean(batch: pa.Table):
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return
        a = batch.column("a").cast(i64)
        b = batch.column("b").cast(i64)
        t = pa.Table.from_arrays([a, b], names=["a", "b"])
        t = t.filter(pc.not_equal(t.column("a"), t.column("b")))
        if t.num_rows:
            yield t

    edges = pairs.select_columns(["a", "b"]).map_batches(
        clean, batch_format="pyarrow"
    ).materialize()

    def solve_block(batch: pa.Table):
        import numpy as np

        if batch.num_rows == 0:
            return
        nodes, labels = _cc_arrays(
            batch.column("a").to_numpy(zero_copy_only=False),
            batch.column("b").to_numpy(zero_copy_only=False),
        )
        yield pa.Table.from_pydict(
            {
                "node": pa.array(nodes, type=i64),
                "label": pa.array(labels, type=i64),
            }
        )

    def contract_block(batch: pa.Table):
        import numpy as np
        import pyarrow.compute as pc

        if batch.num_rows == 0:
            return
        nodes, labels = _cc_arrays(
            batch.column("a").to_numpy(zero_copy_only=False),
            batch.column("b").to_numpy(zero_copy_only=False),
        )
        keep = labels != nodes  # star edges: (component min, other node)
        if not keep.any():
            return
        yield pa.Table.from_pydict(
            {
                "a": pa.array(labels[keep], type=i64),
                "b": pa.array(nodes[keep], type=i64),
            }
        )

    for rnd in range(contract_rounds):
        n_edges = edges.count()
        if n_edges == 0:
            return ray.data.from_arrow(
                pa.Table.from_pydict(
                    {
                        "node": pa.array([], type=i64),
                        "label": pa.array([], type=i64),
                    }
                )
            )
        if n_edges <= local_threshold:
            return edges.repartition(1).map_batches(
                solve_block, batch_format="pyarrow", batch_size=None
            )
        p = max(1, num_partitions >> (2 * rnd))
        edges = (
            edges.repartition(p)
            .map_batches(contract_block, batch_format="pyarrow", batch_size=None)
            .materialize()
        )
    return _label_prop_cc(edges, num_partitions, max_iters)


def _label_prop_cc(
    edges_ab: ray.data.Dataset,
    num_partitions: int = 64,
    max_iters: int = 30,
) -> ray.data.Dataset:
    """Fully distributed min-label propagation with pointer jumping (the
    asymptotic path of ``connected_components``; see its docstring).
    Convergence is detected by the label SUM (labels only decrease, so an
    unchanged sum is a fixpoint) — a single scalar on the driver per
    round; the label table only ever lives in the object store."""
    from ctinexus_ray.ops.groupagg import partitioned_agg

    i64 = pa.int64()

    def sym(batch: pa.Table):
        if batch.num_rows == 0:
            return
        a = batch.column("a").cast(i64).combine_chunks()
        b = batch.column("b").cast(i64).combine_chunks()
        yield pa.Table.from_arrays(
            [
                pa.chunked_array([a, b]),
                pa.chunked_array([b, a]),
            ],
            names=["src", "dst"],
        )

    edges = edges_ab.select_columns(["a", "b"]).map_batches(
        sym, batch_format="pyarrow"
    )

    def to_node(batch: pa.Table):
        if batch.num_rows == 0:
            return
        yield pa.Table.from_pydict({"node": batch.column("src"), "cand": batch.column("src")})

    # NOTE every materialize below is preceded by a keyless repartition:
    # sort-shuffle output block counts scale with input block counts, and
    # the label table feeds THREE branches of the next round's shuffle, so
    # without the bound the block count (and thus per-round latency)
    # grows ~3x per round. repartition(P) is a cheap coalesce (no keys).
    labels = partitioned_agg(
        edges.map_batches(to_node, batch_format="pyarrow"),
        keys=["node"],
        named_aggs={"label": ("cand", "min")},
        num_partitions=num_partitions,
    ).repartition(num_partitions).materialize()
    if labels.count() == 0:
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"node": pa.array([], type=i64), "label": pa.array([], type=i64)}
            )
        )
    prev_sum = labels.sum("label")

    # label lookups per round, fused into ONE join: a "request" row
    # (key, out_node) asks for label[key] to become a candidate label of
    # out_node. Edges request neighbor labels (key=src -> dst); labels
    # request their own label's label (key=label -> node: pointer jump,
    # which contracts paths geometrically so rounds ~ O(log diameter)).
    edge_requests = edges.map_batches(
        lambda b: b.rename_columns(["key", "out_node"]), batch_format="pyarrow"
    ).materialize()

    for _ in range(max_iters):
        jump_requests = labels.map_batches(
            lambda b: pa.Table.from_pydict(
                {"key": b.column("label"), "out_node": b.column("node")}
            ),
            batch_format="pyarrow",
        )
        lookup = labels.map_batches(
            lambda b: b.rename_columns(["key", "cand"]), batch_format="pyarrow"
        )
        answered = hash_join(
            edge_requests.union(jump_requests),
            lookup,
            on=["key"],
            num_partitions=num_partitions,
            left_types={"key": i64, "out_node": i64},
            right_types={"key": i64, "cand": i64},
        ).map_batches(
            lambda b: pa.Table.from_pydict(
                {"node": b.column("out_node"), "cand": b.column("cand")}
            ),
            batch_format="pyarrow",
        )
        # identity candidates: a node's label never increases
        ident = labels.map_batches(
            lambda b: b.rename_columns(["node", "cand"]), batch_format="pyarrow"
        )
        new_labels = partitioned_agg(
            answered.union(ident),
            keys=["node"],
            named_aggs={"label": ("cand", "min")},
            num_partitions=num_partitions,
        ).repartition(num_partitions).materialize()
        new_sum = new_labels.sum("label")
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum
    return labels


def component_drops(labels: ray.data.Dataset) -> ray.data.Dataset:
    """(node) rows for every non-survivor (label != node) — the dedup drop
    set as a DATASET, for anti-joining against the corpus."""

    def non_survivor(batch: pa.Table):
        import pyarrow.compute as pc

        kept = batch.filter(
            pc.not_equal(batch.column("node"), batch.column("label"))
        )
        if kept.num_rows == 0:
            return
        yield kept.select(["node"])

    return labels.map_batches(non_survivor, batch_format="pyarrow")


def distinct_set_op(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    keys: list[str],
    op: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """SQL bag-to-set operators over arbitrary key tuples:
    ``INTERSECT`` (distinct keys present on BOTH sides), ``EXCEPT``
    (distinct left keys absent from the right), ``UNION`` (distinct keys
    of either side). ANSI set-op semantics: output is DISTINCT rows.

    Shape: tag each side with a presence flag, union the two streams,
    then ONE hash-partitioned reduce (``partitioned_agg``: O(P)
    per-group overhead however many distinct keys) computes per-key
    left/right presence, and a stateless filter applies the op. Two
    column projections + one shuffle of key columns only — both sides
    may be corpus-sized (unlike the broadcast ``semi_join``, which
    requires a small right side). Skew-safe: presence flags max() to a
    bit regardless of key multiplicity."""
    if op not in ("intersect", "except", "union"):
        raise ValueError(f"unknown set op: {op}")

    def tag(side_val: int):
        def f(batch: pa.Table) -> pa.Table:
            n = batch.num_rows
            return batch.select(keys).append_column(
                "__l", pa.array([1 - side_val] * n, type=pa.int8())
            ).append_column(
                "__r", pa.array([side_val] * n, type=pa.int8())
            )

        return f

    from ctinexus_ray.ops.groupagg import partitioned_agg

    tagged = left.map_batches(tag(0), batch_format="pyarrow").union(
        right.map_batches(tag(1), batch_format="pyarrow")
    )
    presence = partitioned_agg(
        tagged,
        keys=keys,
        named_aggs={"__l": ("__l", "max"), "__r": ("__r", "max")},
        num_partitions=num_partitions,
    )

    def apply_op(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        l, r = batch.column("__l"), batch.column("__r")
        if op == "intersect":
            mask = pc.and_(pc.equal(l, 1), pc.equal(r, 1))
        elif op == "except":
            mask = pc.and_(pc.equal(l, 1), pc.equal(r, 0))
        else:  # union: every distinct key
            mask = pc.equal(pc.max_element_wise(l, r), 1)
        # return (not conditionally yield) so an all-filtered partition
        # still carries the TYPED empty schema downstream
        return batch.filter(mask).select(keys)

    return presence.map_batches(apply_op, batch_format="pyarrow")


def salted_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    how: str = "inner",
    salt: int = 8,
    num_partitions: int | None = None,
    left_types: dict[str, pa.DataType] | None = None,
    right_types: dict[str, pa.DataType] | None = None,
) -> ray.data.Dataset:
    """Skew-resistant hash join: identical output to ``hash_join`` but a
    hot key's rows spread over ``salt`` partitions instead of melting one
    task.

    Shape: every left row gets a deterministic-content-free ``_salt`` in
    [0, salt) (round-robin within its batch — any assignment is correct,
    it only routes rows); the right side is replicated once per salt
    value; the join key becomes ``on + [_salt]``. A key holding 30% of a
    web corpus (empty string, a boilerplate checksum, a crawl-error
    sentinel) now fans across ``salt`` tasks.

    Cost: right-side shuffle bytes x ``salt`` — use when the LEFT side is
    large and skewed and the right is modest but too big to broadcast
    (``ops.relational.broadcast_enrich`` beats this when the right side
    fits in one object). ``how`` is limited to inner/left: right rows are
    replicated, so right/full-outer and anti/semi-on-right semantics
    would count unmatched right rows once per salt.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports how='inner'|'left' only")
    if salt < 1:
        raise ValueError("salt must be >= 1")
    lfields = _schema_fields(left, left_types)
    rfields = _schema_fields(right, right_types)
    if "_salt" in dict(lfields) or "_salt" in dict(rfields):
        raise ValueError("column name '_salt' is reserved")
    import numpy as np

    def add_salt(batch: pa.Table):
        if batch.num_rows == 0:
            return
        s = np.arange(batch.num_rows, dtype=np.int64) % salt
        yield batch.append_column("_salt", pa.array(s, type=pa.int64()))

    def replicate(batch: pa.Table):
        n = batch.num_rows
        if n == 0:
            return
        rep = batch.take(pa.array(np.tile(np.arange(n, dtype=np.int64), salt)))
        s = np.repeat(np.arange(salt, dtype=np.int64), n)
        yield rep.append_column("_salt", pa.array(s, type=pa.int64()))

    joined = hash_join(
        left.map_batches(add_salt, batch_format="pyarrow"),
        right.map_batches(replicate, batch_format="pyarrow"),
        on=on + ["_salt"],
        how=how,
        num_partitions=num_partitions,
        left_types=dict(lfields) | {"_salt": pa.int64()},
        right_types=dict(rfields) | {"_salt": pa.int64()},
    )
    return joined.drop_columns(["_salt"])


def bloom_prefiltered_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    num_partitions: int | None = None,
    m_bits: int = 1 << 23,
    k_hashes: int = 4,
    left_types: dict[str, pa.DataType] | None = None,
    right_types: dict[str, pa.DataType] | None = None,
) -> ray.data.Dataset:
    """Inner hash join with Bloom-filter shuffle pruning: build a
    fixed-size Bloom bitmap over the RIGHT side's keys (mergeable
    partials — nothing corpus-sized on the driver), broadcast it once,
    and drop left rows whose key is DEFINITELY absent BEFORE the
    all-to-all.

    When the right side matches a small fraction of the left (the
    filtered-dimension shape: "lineitems of pending orders" over a 100 TB
    fact table), the left's shuffle bytes drop by ~the miss rate. Bloom
    false positives only waste shuffle rows — the exact per-partition
    join drops them — so the output EQUALS ``hash_join(..., "inner")``
    row-for-row (the SQL oracle is the plain join).

    Single join key only (the bitmap hashes one key column, cast to its
    decimal/string form).
    """
    if len(on) != 1:
        raise ValueError("bloom_prefiltered_join supports exactly one key")
    key = on[0]
    import numpy as np

    from ctinexus_ray.ops.sketch import _bloom_positions, bloom_build

    # the right side feeds TWO consumers (the bitmap build and the join);
    # materialize once — it is the modest side by precondition — so its
    # scan/filter work is not executed twice
    right = right.materialize()

    def key_as_str(batch: pa.Table):
        if batch.num_rows == 0:
            return
        col = batch.column(key)
        if not (
            pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
        ):
            col = col.cast(pa.string())
        yield pa.Table.from_pydict({key: col})

    bits = bloom_build(
        right.map_batches(key_as_str, batch_format="pyarrow"),
        key,
        m_bits=m_bits,
        k=k_hashes,
    )
    bits_ref = ray.put(np.frombuffer(bits, dtype=np.uint8))

    def prune(batch: pa.Table):
        if batch.num_rows == 0:
            return
        bitmap = ray.get(bits_ref)
        col = batch.column(key)
        if not (
            pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
        ):
            col = col.cast(pa.string())
        pos = _bloom_positions(col, m_bits, k_hashes)
        hit = (
            (bitmap[pos >> 3] >> (pos & 7).astype(np.uint8)) & 1
        ).all(axis=1)
        kept = batch.filter(pa.array(hit))
        if kept.num_rows:
            yield kept

    pruned = left.map_batches(prune, batch_format="pyarrow")
    return hash_join(
        pruned,
        right,
        on=on,
        how="inner",
        num_partitions=num_partitions,
        left_types=left_types,
        right_types=right_types,
    )


def snapshot_delta(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key: str,
    fingerprint: str,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Crawl-to-crawl incremental delta: classify every key as ``added``
    (in new only), ``removed`` (in old only) or ``changed`` (in both,
    fingerprints differ). UNCHANGED keys are dropped — the point at
    100 TB is that downstream stages reprocess only the delta, which is
    typically a small fraction of the snapshot.

    Shape: ONE full-outer hash join on the key (both sides corpus-sized
    stream through the shuffle; no driver state), then a vectorized
    classify/filter pass. Inputs need only (key, fingerprint) columns —
    fingerprint is any content hash (e.g. md5 of the payload) computed
    upstream so the join never moves payload bytes."""

    def tag(ds: ray.data.Dataset, out: str) -> ray.data.Dataset:
        def fn(batch: pa.Table) -> pa.Table:
            return pa.Table.from_arrays(
                [batch.column(key), batch.column(fingerprint)],
                names=[key, out],
            )

        return ds.map_batches(fn, batch_format="pyarrow")

    # resolve the key type from whichever side knows its schema so a
    # fully EMPTY side (first crawl: no old snapshot) still joins —
    # schema inference over an empty mapped dataset returns None
    ktype = None
    for side in (old, new):
        schema = side.schema(fetch_if_missing=True)
        if schema is not None and key in schema.names:
            ktype = _arrow_type(schema.types[schema.names.index(key)])
            break
    if ktype is None:
        raise ValueError("both snapshots are empty — nothing to diff")

    joined = hash_join(
        tag(old, "fp_old"),
        tag(new, "fp_new"),
        on=[key],
        how="full",
        num_partitions=num_partitions,
        left_types={key: ktype, "fp_old": pa.string()},
        right_types={key: ktype, "fp_new": pa.string()},
    )

    def classify(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        fo = batch.column("fp_old")
        fn_ = batch.column("fp_new")
        added = pc.is_null(fo)
        removed = pc.is_null(fn_)
        changed = pc.and_kleene(
            pc.and_(pc.is_valid(fo), pc.is_valid(fn_)),
            pc.not_equal(fo, fn_),
        )
        changed = pc.fill_null(changed, False)
        keep = pc.or_(pc.or_(added, removed), changed)
        status = pc.if_else(
            added,
            pa.scalar("added", type=pa.string()),
            pc.if_else(
                removed,
                pa.scalar("removed", type=pa.string()),
                pa.scalar("changed", type=pa.string()),
            ),
        )
        out = pa.Table.from_arrays(
            [batch.column(key), status], names=[key, "status"]
        )
        return out.filter(keep)

    return joined.map_batches(classify, batch_format="pyarrow")


def skew_aware_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: list[str],
    how: str = "inner",
    num_partitions: int | None = None,
    sample_stride: int = 20,
    skew_threshold: float = 0.10,
    salt: int = 8,
    left_types: dict[str, pa.DataType] | None = None,
    right_types: dict[str, pa.DataType] | None = None,
    return_strategy: bool = False,
):
    """``hash_join`` that measures LEFT-side key skew first and switches
    to ``salted_join`` when one key would melt a reduce task — the
    auto-wired form of the manual pick (a web corpus's empty-string /
    boilerplate-checksum key can hold 30% of all rows, and a plain hash
    join serializes that key into one straggler task).

    Detection: a content-independent every-``sample_stride``-th-row
    sample of the left key column (content hashing would drop a hot key
    wholesale — exactly the rows we're looking for), ONE count reduce
    over the sample, then the hottest key's sample fraction. At or
    above ``skew_threshold`` — and when ``how`` permits replication
    (inner/left only) — the join salts; otherwise it runs plain. The
    estimate is a heuristic (stride sampling, not exact counts): it
    decides STRATEGY, never results — both paths produce identical
    output (pinned in tests).

    ``return_strategy=True`` returns ``(dataset, strategy)`` with
    strategy in {"hash", "salted"}.
    """
    import numpy as np

    from ctinexus_ray.ops.groupagg import partitioned_agg

    def sample(batch: pa.Table):
        if batch.num_rows == 0:
            return
        idx = np.arange(0, batch.num_rows, sample_stride, dtype=np.int64)
        yield batch.select(on).take(pa.array(idx))

    counts = partitioned_agg(
        left.map_batches(sample, batch_format="pyarrow"),
        keys=on,
        named_aggs={"n": (on[0], "size")},
        num_partitions=num_partitions,
    )

    def fold(df):
        import pandas as pd

        return pd.DataFrame(
            {"mx": [int(df["n"].max())], "tot": [int(df["n"].sum())]}
        )

    parts = counts.map_batches(fold, batch_format="pandas").take_all()
    mx = max((int(p["mx"]) for p in parts), default=0)
    tot = sum(int(p["tot"]) for p in parts)
    skewed = tot > 0 and mx / tot >= skew_threshold
    if skewed and how in ("inner", "left"):
        out = salted_join(
            left, right, on=on, how=how, salt=salt,
            num_partitions=num_partitions,
            left_types=left_types, right_types=right_types,
        )
        strategy = "salted"
    else:
        out = hash_join(
            left, right, on=on, how=how,
            num_partitions=num_partitions,
            left_types=left_types, right_types=right_types,
        )
        strategy = "hash"
    return (out, strategy) if return_strategy else out


# ---------------------------------------------------------------------------
# bucketed storage-aligned join (Hive/Iceberg bucketing)
# ---------------------------------------------------------------------------


def bucketed_write(
    ds: ray.data.Dataset,
    on: list[str],
    out_dir: str,
    n_buckets: int | None = None,
) -> dict:
    """Write ``ds`` as ``n_buckets`` parquet files bucketed by
    ``hash(on) mod n_buckets`` — the Hive/Iceberg storage-layout
    contract that lets two tables bucketed the SAME way join with ZERO
    shuffle (``bucketed_join``): matching keys are co-located by
    construction, so the join is n independent file-pair tasks. The
    bucket spec (keys, count, hash id) lands in ``_BUCKETS.json`` and
    incompatible joins refuse loudly.

    At 100 TB this moves the join's all-to-all exchange to WRITE time —
    paid once, amortized over every subsequent join on that key (the
    fact-table pattern: bucket on the join key at ingest). One task per
    bucket; size ``n_buckets`` so a bucket pair fits a worker
    (``derive_num_partitions`` by default)."""
    import json

    from ctinexus_ray.ops.groupagg import add_hash_pkey, derive_num_partitions

    if n_buckets is None:
        n_buckets = derive_num_partitions(ds)
    assert n_buckets & (n_buckets - 1) == 0, "power of two"
    os.makedirs(out_dir, exist_ok=True)

    def add_pkey(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, on, n_buckets)

    def write_bucket(g: pd.DataFrame) -> pd.DataFrame:
        import pyarrow.parquet as pq

        bucket = int(g["pkey"].iloc[0])
        t = pa.Table.from_pandas(g.drop(columns=["pkey"]), preserve_index=False)
        path = os.path.join(out_dir, f"bucket-{bucket:05d}.parquet")
        tmp = path + f".tmp.{os.getpid()}"
        pq.write_table(t, tmp)
        os.replace(tmp, path)
        return pd.DataFrame({"bucket": [bucket], "rows": [len(g)]})

    written = (
        ds.map_batches(add_pkey, batch_format="pyarrow")
        .groupby("pkey")
        .map_groups(write_bucket, batch_format="pandas")
        .take_all()
    )
    spec = {
        "on": list(on),
        "n_buckets": n_buckets,
        "hash": "add_hash_pkey/v1",
        "rows": int(sum(r["rows"] for r in written)),
    }
    with open(os.path.join(out_dir, "_BUCKETS.json"), "w") as fh:
        json.dump(spec, fh)
    return spec


def bucketed_join(
    dir_a: str,
    dir_b: str,
    on: list[str],
    how: str = "inner",
) -> ray.data.Dataset:
    """Zero-shuffle join of two ``bucketed_write`` directories: bucket i
    of A joins bucket i of B in its own Ray task (matching keys are
    co-located by the shared bucket spec), results stream back as
    arrow blocks — the joined tables stay in the object store
    (``from_arrow_refs``), the driver never materializes them; the
    output schema is fixed up-front from the two sides' parquet
    footers so every task aligns to it locally. Refuses loudly when
    the specs differ (different keys, bucket counts, or hash versions
    would silently drop matches). ``how``: inner | left — a bucket
    file missing on the right is an empty right side; missing on the
    left contributes nothing. An empty join yields an empty Dataset
    (left-side schema when the right directory has no buckets at
    all)."""
    import json

    with open(os.path.join(dir_a, "_BUCKETS.json")) as fh:
        sa = json.load(fh)
    with open(os.path.join(dir_b, "_BUCKETS.json")) as fh:
        sb = json.load(fh)
    for spec in (sa, sb):
        if spec["on"] != list(on) or spec["hash"] != "add_hash_pkey/v1":
            raise ValueError(
                f"bucketed_join: directory bucketed by {spec['on']} "
                f"({spec['hash']}), join asked for {list(on)}"
            )
    if sa["n_buckets"] != sb["n_buckets"]:
        raise ValueError(
            f"bucketed_join: bucket counts differ "
            f"({sa['n_buckets']} vs {sb['n_buckets']}) — rebucket one side"
        )
    if how not in ("inner", "left"):
        raise ValueError(f"bucketed_join: unsupported how={how!r}")

    # fix the output schema up-front from the parquet FOOTERS (no data
    # read): left columns, then right columns minus the join keys — the
    # pa.Table.join layout — so each bucket task aligns locally and the
    # joined blocks never pass through the driver
    import pyarrow.parquet as _pq

    def _dir_schema(d: str) -> pa.Schema | None:
        for name in sorted(os.listdir(d)):
            if name.startswith("bucket-") and name.endswith(".parquet"):
                return _pq.read_schema(os.path.join(d, name))
        return None

    schema_a = _dir_schema(dir_a)
    schema_b = _dir_schema(dir_b)
    if schema_a is None:
        return ray.data.from_arrow([])  # no left buckets: empty join
    fields = list(schema_a)
    if schema_b is not None:
        fields += [f for f in schema_b if f.name not in schema_a.names]
    out_schema = pa.schema(fields)

    @ray.remote
    def join_bucket(pa_path: str, pb_path: str) -> pa.Table:
        import pyarrow.parquet as pq

        empty = out_schema.empty_table()
        if not os.path.exists(pa_path):
            return empty
        ta = pq.read_table(pa_path)
        if os.path.exists(pb_path):
            tb = pq.read_table(pb_path)
        elif how == "inner":
            return empty
        else:
            tb = None  # left join with empty right: null-fill below
        if tb is None:
            joined = ta
        else:
            joined = ta.join(
                tb,
                keys=list(on),
                join_type=("inner" if how == "inner" else "left outer"),
            )
        arrays = [
            joined.column(f.name)
            if f.name in joined.column_names
            else pa.nulls(joined.num_rows, type=f.type)
            for f in out_schema
        ]
        return pa.Table.from_arrays(arrays, schema=out_schema)

    n = sa["n_buckets"]
    refs = [
        join_bucket.remote(
            os.path.join(dir_a, f"bucket-{i:05d}.parquet"),
            os.path.join(dir_b, f"bucket-{i:05d}.parquet"),
        )
        for i in range(n)
    ]
    return ray.data.from_arrow_refs(refs)


def partitioned_attach(
    big: ray.data.Dataset,
    side: ray.data.Dataset,
    key: str,
    attach: list[str],
    num_partitions: int | None = None,
    side_types: dict[str, pa.DataType] | None = None,
) -> ray.data.Dataset:
    """Attach ``side``'s ``attach`` columns onto ``big`` by ``key`` when
    BOTH sides are large AND ``big`` carries nested columns
    (list/struct) that Arrow's acero join rejects as payload — e.g.
    attaching ``lang`` to an embedding table. Left-join semantics:
    unmatched keys null-fill; duplicate side keys keep the first by
    side order (refusing would make reruns fragile; document your key
    as unique).

    Shuffle shape: ONE hash shuffle of each side on ``key`` (the big
    side ships its payload once — same cost as any large-two-sides
    join), then a per-partition vectorized pandas merge (object-dtype
    columns ride untouched). Prefer ``broadcast_enrich`` when the side
    is dimension-sized and ``hash_join`` when no nested payload is
    involved.

    ``side_types`` (column -> pyarrow type, covering ``key`` and every
    ``attach`` column) skips the side's ``ds.schema()`` probe — required
    when the side can legitimately be EMPTY (a schemaless dataset, e.g.
    "no duplicate spans anywhere"): unmatched big rows then null-fill
    under the declared types instead of failing the probe."""
    from ctinexus_ray.ops.groupagg import add_hash_pkey, derive_num_partitions

    if num_partitions is None:
        num_partitions = derive_num_partitions(big, side)
    assert num_partitions & (num_partitions - 1) == 0, "power of two"

    big_cols = big.schema().names
    if key not in big_cols:
        raise ValueError(f"partitioned_attach: {key!r} not in big side")
    overlap = set(attach) & set(big_cols)
    if overlap:
        raise ValueError(f"partitioned_attach: columns already exist: {overlap}")

    def tag_big(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, [key], num_partitions).append_column(
            "_side", pa.array([0] * batch.num_rows, type=pa.int8())
        )

    def tag_side(batch: pa.Table) -> pa.Table:
        return add_hash_pkey(batch, [key], num_partitions).append_column(
            "_side", pa.array([1] * batch.num_rows, type=pa.int8())
        )

    big_t = big.map_batches(tag_big, batch_format="pyarrow")
    side_t = side.select_columns([key, *attach]).map_batches(
        tag_side, batch_format="pyarrow"
    )

    def merge_partition(g: pd.DataFrame) -> pd.DataFrame:
        b = g[g["_side"] == 0]
        s = g[g["_side"] == 1]
        s = s[[key, *attach]].drop_duplicates(key, keep="first")
        return b[big_cols].merge(s, on=key, how="left")

    # union of two differently-shaped sides: project each into the
    # shared (big ∪ attach) schema with typed nulls
    btypes = dict(_schema_fields(big, None))
    stypes = (
        dict(side_types)
        if side_types is not None
        else dict(_schema_fields(side.select_columns([key, *attach]), None))
    )
    shared = pa.schema(
        [pa.field(c, btypes[c]) for c in big_cols]
        + [pa.field(c, stypes[c]) for c in attach]
        + [pa.field("pkey", pa.int64()), pa.field("_side", pa.int8())]
    )

    def conform(batch: pa.Table) -> pa.Table:
        arrays = []
        for f in shared:
            if f.name in batch.column_names:
                arrays.append(batch.column(f.name).cast(f.type))
            else:
                arrays.append(pa.nulls(batch.num_rows, type=f.type))
        return pa.Table.from_arrays(arrays, schema=shared)

    unioned = big_t.map_batches(conform, batch_format="pyarrow").union(
        side_t.map_batches(conform, batch_format="pyarrow")
    )
    return (
        unioned.groupby("pkey")
        .map_groups(merge_partition, batch_format="pandas")
    )
