"""Distributed model-evaluation metrics over scored corpora.

The reference system evaluates extraction quality per document
(reference ctinexus/eval/*.py operates on single annotated files);
this module holds the corpus-scale counterparts a training-data
pipeline needs when a quality classifier (fasttext-style language/
quality scorer, unigram-LM perplexity, a learned filter) gates
documents: "how well does this score actually separate the classes?"
is an AUC over the whole corpus, not a per-file P/R.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def auc_rank(
    ds: ray.data.Dataset,
    score_col: str,
    label_col: str,
    range_size: int = 1 << 16,
) -> ray.data.Dataset:
    """Exact ROC-AUC via the Mann-Whitney rank-sum, ties handled by the
    midrank rule: AUC = (#(pos>neg pairs) + 0.5 * #(pos==neg pairs))
    / (n_pos * n_neg). Output is ONE row of exact int64 rationals —
    (n_pos, n_neg, auc_num, auc_den) with AUC = auc_num / auc_den —
    so the cross-row arithmetic is order-independent and bit-exact
    against a SQL window twin. Exactness bound: auc_num <= 2 * n_pos *
    n_neg, so results are exact for corpora up to ~3e9 rows per class;
    beyond that the int64 rational overflows and a sampled AUC is the
    right tool.

    ``score_col`` must be a NON-NEGATIVE integer column (quantize floats
    first — the usual micro-unit rule); ``label_col`` is 0/1 (NULL
    counts as 0, SQL ``CASE WHEN`` semantics).

    Scale shape: the corpus collapses to one row per DISTINCT score via
    a hash-partitioned count reduce (map-side combined by
    ``partitioned_agg``); the "how many negatives scored strictly
    lower" term is the two-phase ``partitioned_prefix_sum`` over that
    distinct-score table (O(#scores / range_size) ints on the driver);
    the final triple is a per-block partial sum + O(#blocks) driver
    fold. The corpus itself shuffles once and nothing row-sized ever
    reaches the driver.
    """
    import pyarrow.compute as pc

    from ctinexus_ray.ops.groupagg import partitioned_agg
    from ctinexus_ray.ops.shards import partitioned_prefix_sum

    def project(batch: pa.Table) -> pa.Table:
        score = batch.column(score_col).cast(pa.int64())
        if pc.any(pc.less(score, 0)).as_py():
            raise ValueError(
                f"auc_rank: {score_col} must be non-negative "
                "(shift or micro-quantize the score first)"
            )
        lab = batch.column(label_col)
        pos = pc.cast(
            pc.fill_null(pc.cast(lab, pa.int64()), 0), pa.int64()
        )
        bad = pc.any(
            pc.and_(pc.not_equal(pos, 0), pc.not_equal(pos, 1))
        ).as_py()
        if bad:
            raise ValueError(f"auc_rank: {label_col} must be 0/1 or NULL")
        return pa.Table.from_pydict({"score": score, "pos": pos})

    grouped = partitioned_agg(
        ds.map_batches(project, batch_format="pyarrow"),
        keys=["score"],
        named_aggs={"npos": ("pos", "sum"), "n": ("pos", "size")},
    )

    def add_nneg(batch: pa.Table) -> pa.Table:
        nneg = pc.subtract(
            batch.column("n").cast(pa.int64()),
            batch.column("npos").cast(pa.int64()),
        )
        return pa.Table.from_pydict(
            {
                "score": batch.column("score").cast(pa.int64()),
                "npos": batch.column("npos").cast(pa.int64()),
                "nneg": nneg,
            }
        )

    scanned = partitioned_prefix_sum(
        grouped.map_batches(add_nneg, batch_format="pyarrow"),
        order_key="score",
        value_col="nneg",
        out_col="nneg_less",
        range_size=range_size,
        exclusive=True,
    )

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        npos = df["npos"].to_numpy(dtype=np.int64)
        nneg = df["nneg"].to_numpy(dtype=np.int64)
        less = df["nneg_less"].to_numpy(dtype=np.int64)
        return pd.DataFrame(
            {
                "n_pos": [int(npos.sum())],
                "n_neg": [int(nneg.sum())],
                "auc_num": [int((npos * (2 * less + nneg)).sum())],
            }
        )

    parts = scanned.map_batches(partial, batch_format="pandas").take_all()
    n_pos = sum(int(r["n_pos"]) for r in parts)
    n_neg = sum(int(r["n_neg"]) for r in parts)
    auc_num = sum(int(r["auc_num"]) for r in parts)
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "n_pos": pa.array([n_pos], type=pa.int64()),
                "n_neg": pa.array([n_neg], type=pa.int64()),
                "auc_num": pa.array([auc_num], type=pa.int64()),
                "auc_den": pa.array([2 * n_pos * n_neg], type=pa.int64()),
            }
        )
    )
