"""auc_rank (ops/mleval.py) vs a from-first-principles O(n^2) pair count."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ctinexus_ray.ops.mleval import auc_rank


def _ds(scores, labels):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "s": pa.array(scores, type=pa.int64()),
                "y": pa.array(labels, type=pa.int64()),
            }
        )
    )


def _brute_auc(scores, labels):
    s = np.asarray(scores, dtype=np.int64)
    y = np.asarray(labels, dtype=np.int64)
    pos, neg = s[y == 1], s[y == 0]
    num = 0
    for p in pos:
        num += 2 * int((p > neg).sum()) + int((p == neg).sum())
    return len(pos), len(neg), num, 2 * len(pos) * len(neg)


def _run(scores, labels, **kw):
    row = auc_rank(_ds(scores, labels), "s", "y", **kw).take_all()[0]
    return (row["n_pos"], row["n_neg"], row["auc_num"], row["auc_den"])


class TestAucRank:
    def test_random_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(5)
        scores = rng.randint(0, 50, 400).tolist()  # heavy ties
        labels = rng.randint(0, 2, 400).tolist()
        assert _run(scores, labels) == _brute_auc(scores, labels)

    def test_perfect_separation(self, ray_session):
        n_pos, n_neg, num, den = _run([10, 11, 12, 1, 2, 3], [1, 1, 1, 0, 0, 0])
        assert (n_pos, n_neg) == (3, 3)
        assert num == den  # AUC = 1.0

    def test_all_tied_is_half(self, ray_session):
        n_pos, n_neg, num, den = _run([7] * 6, [1, 0, 1, 0, 1, 0])
        assert num * 2 == den  # AUC = 0.5

    def test_null_label_counts_as_negative(self, ray_session):
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "s": pa.array([5, 9], type=pa.int64()),
                    "y": pa.array([None, 1], type=pa.int64()),
                }
            )
        )
        row = auc_rank(ds, "s", "y").take_all()[0]
        assert (row["n_pos"], row["n_neg"]) == (1, 1)
        assert row["auc_num"] == row["auc_den"]  # 9 > 5

    def test_negative_score_raises(self, ray_session):
        with pytest.raises(Exception, match="non-negative"):
            auc_rank(_ds([-1, 2], [0, 1]), "s", "y").take_all()

    def test_non_binary_label_raises(self, ray_session):
        with pytest.raises(Exception, match="0/1"):
            auc_rank(_ds([1, 2], [0, 2]), "s", "y").take_all()

    def test_small_range_size_matches(self, ray_session):
        rng = np.random.RandomState(9)
        scores = rng.randint(0, 1000, 300).tolist()
        labels = rng.randint(0, 2, 300).tolist()
        assert _run(scores, labels, range_size=16) == _brute_auc(
            scores, labels
        )
