"""Similarity search over an embedding column (``list<float>``).

  * ``brute_force_topk`` — exact cosine top-k: every batch computes a numpy
    matmul against a broadcast query matrix (``ray.put`` once, read per
    task), emits batch-local top-k partials, and a tiny
    ``groupby(query_id)`` reduce merges them. Exact, embarrassingly
    parallel, no all-to-all over the corpus.
  * ``lsh_topk`` — hyperplane-LSH bucketed approximate variant (scale
    path): only vectors sharing a bucket with the query are scored.

Determinism: ties broken by (score desc, vec_id asc); all arithmetic in
float64 so the DuckDB oracle (DOUBLE) computes the same ranking.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data



def _normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return mat / norms


def brute_force_topk(
    embeddings: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 5,
    exclude_self: bool = True,
) -> ray.data.Dataset:
    """Exact top-k cosine neighbors for each query vector.

    Returns (query_id, rank, neighbor_id, sim) with rank 1..k.
    """
    q_ids = np.asarray(query_ids, dtype=np.int64)
    q_mat = _normalize(np.asarray(query_matrix, dtype=np.float64))
    query_ref = ray.put((q_ids, q_mat))

    def local_topk(batch: pa.Table) -> pa.Table:
        qids, qmat = ray.get(query_ref)
        v_ids = np.array(batch.column("vec_id").to_pylist(), dtype=np.int64)
        v_mat = _normalize(
            np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        )
        sims = qmat @ v_mat.T  # (n_queries, batch)
        out_q, out_v, out_s = [], [], []
        keep = min(k + (1 if exclude_self else 0), sims.shape[1])
        for qi in range(sims.shape[0]):
            row = sims[qi]
            # batch-local candidate cut; final ordering happens in the reduce
            idx = np.argpartition(-row, keep - 1)[:keep] if keep < len(row) else np.arange(len(row))
            for j in idx:
                if exclude_self and v_ids[j] == qids[qi]:
                    continue
                out_q.append(int(qids[qi]))
                out_v.append(int(v_ids[j]))
                out_s.append(float(row[j]))
        return pa.Table.from_pydict(
            {
                "query_id": pa.array(out_q, type=pa.int64()),
                "neighbor_id": pa.array(out_v, type=pa.int64()),
                "sim": pa.array(out_s, type=pa.float64()),
            }
        )

    partials = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        local_topk, batch_format="pyarrow"
    )

    def merge(group: pd.DataFrame) -> pd.DataFrame:
        ranked = group.sort_values(
            ["sim", "neighbor_id"], ascending=[False, True], kind="stable"
        ).head(k)
        return pd.DataFrame(
            {
                "query_id": ranked["query_id"].astype("int64").values,
                "rank": np.arange(1, len(ranked) + 1, dtype=np.int64),
                "neighbor_id": ranked["neighbor_id"].astype("int64").values,
                "sim": ranked["sim"].values,
            }
        )

    return partials.groupby("query_id").map_groups(merge, batch_format="pandas")


def self_topk(
    embeddings: ray.data.Dataset, n_queries: int, k: int = 5
) -> ray.data.Dataset:
    """Top-k neighbors for the first ``n_queries`` vectors of the table
    itself (vec_id < n_queries), excluding self."""
    head = embeddings.filter(
        expr=f"vec_id < {n_queries}"
    ).select_columns(["vec_id", "embedding"]).take_all()
    ids = [r["vec_id"] for r in head]
    mat = np.array([r["embedding"] for r in head], dtype=np.float64)
    return brute_force_topk(embeddings, ids, mat, k=k, exclude_self=True)


def lsh_topk(
    embeddings: ray.data.Dataset,
    n_queries: int,
    k: int = 5,
    n_planes: int = 8,
) -> ray.data.Dataset:
    """Approximate top-k: hyperplane-LSH bucket the corpus, score only
    bucket-mates of each query. Recall trades off with n_planes.

    Scale path: buckets shard naturally (groupby bucket), so the matmul per
    group is tiny regardless of corpus size.
    """
    from ctinexus_ray.ops.dedup import lsh_bucket_ids

    # bucket id is a pure function of the embedding (deterministic
    # hyperplanes recomputed per worker) — nothing materializes on the
    # driver and nothing is broadcast
    def tag(batch: pa.Table) -> pa.Table:
        mat = np.array(batch.column("embedding").to_pylist(), dtype=np.float64)
        return batch.append_column(
            "bucket", pa.array(lsh_bucket_ids(mat, n_planes), type=pa.int64())
        )

    tagged = embeddings.select_columns(["vec_id", "embedding"]).map_batches(
        tag, batch_format="pyarrow"
    )

    def per_bucket(group: pd.DataFrame) -> pd.DataFrame:
        ids = group["vec_id"].to_numpy(dtype=np.int64)
        mat = _normalize(np.array(group["embedding"].tolist(), dtype=np.float64))
        q_mask = ids < n_queries
        if not q_mask.any():
            return pd.DataFrame(
                {
                    "query_id": pd.Series([], dtype="int64"),
                    "rank": pd.Series([], dtype="int64"),
                    "neighbor_id": pd.Series([], dtype="int64"),
                    "sim": pd.Series([], dtype="float64"),
                }
            )
        sims = mat[q_mask] @ mat.T
        out = {"query_id": [], "rank": [], "neighbor_id": [], "sim": []}
        for qi, qid in enumerate(ids[q_mask]):
            order = sorted(
                (
                    (float(sims[qi, j]), int(ids[j]))
                    for j in range(len(ids))
                    if ids[j] != qid
                ),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            for rank, (sim, nid) in enumerate(order, 1):
                out["query_id"].append(int(qid))
                out["rank"].append(rank)
                out["neighbor_id"].append(nid)
                out["sim"].append(sim)
        return pd.DataFrame(out)

    return tagged.groupby("bucket").map_groups(per_bucket, batch_format="pandas")
