"""SemDeDup (cluster-scoped semantic dedup) semantics."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from ctinexus_ray.ops.dedup import semdedup_keep


def _emb(rows: list[tuple[int, int, list[float]]]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "vec_id": pa.array([r[0] for r in rows], type=pa.int64()),
                "label": pa.array([r[1] for r in rows], type=pa.int64()),
                "embedding": pa.array(
                    [r[2] for r in rows], type=pa.list_(pa.float32())
                ),
            }
        )
    )


def _keep_ids(ds) -> set[int]:
    return {r["vec_id"] for r in ds.take_all()}


class TestSemDedup:
    def test_first_occurrence_wins_within_cluster(self, ray_session):
        ds = _emb(
            [
                (0, 1, [1.0, 0.0]),
                (1, 1, [1.0, 0.0]),  # duplicate of 0, same cluster -> drop
                (2, 1, [0.0, 1.0]),  # orthogonal -> keep
            ]
        )
        assert _keep_ids(semdedup_keep(ds, cluster_col="label", threshold=0.9)) == {0, 2}

    def test_never_deduped_across_clusters(self, ray_session):
        ds = _emb([(0, 1, [1.0, 0.0]), (1, 2, [1.0, 0.0])])
        assert _keep_ids(semdedup_keep(ds, cluster_col="label", threshold=0.9)) == {0, 1}

    def test_dropped_rows_still_shadow_later_ones(self, ray_session):
        # NOT EXISTS is over ALL earlier rows, not just survivors: 1 is
        # dropped by 0, and 2 (similar to 1 AND to 0) is dropped too; a
        # chain where 2 resembles only the DROPPED 1 still drops 2.
        a = [1.0, 0.0]
        b = [np.cos(0.3), np.sin(0.3)]  # cos(a,b) ~ 0.955
        c = [np.cos(0.6), np.sin(0.6)]  # cos(b,c) ~ 0.955, cos(a,c) ~ 0.825
        ds = _emb([(0, 1, a), (1, 1, list(map(float, b))), (2, 1, list(map(float, c)))])
        assert _keep_ids(semdedup_keep(ds, cluster_col="label", threshold=0.9)) == {0}

    def test_zero_vector_is_safe(self, ray_session):
        ds = _emb([(0, 1, [0.0, 0.0]), (1, 1, [0.0, 0.0])])
        # zero norms are clamped; cos(0, 0) = 0 < threshold -> both kept
        assert _keep_ids(semdedup_keep(ds, cluster_col="label", threshold=0.5)) == {0, 1}

    def test_max_cluster_rows_raises_not_caps(self, ray_session):
        ds = _emb([(i, 1, [1.0, 0.0]) for i in range(10)])
        with pytest.raises(Exception, match="max_cluster_rows"):
            semdedup_keep(
                ds, cluster_col="label", threshold=0.9, max_cluster_rows=4
            ).take_all()

    def test_output_schema(self, ray_session):
        ds = _emb([(0, 7, [1.0, 0.0])])
        rows = semdedup_keep(ds, cluster_col="label", threshold=0.9).take_all()
        assert rows == [{"vec_id": 0, "cluster": 7}]


class TestSortedNeighborhood:
    """Sorted-neighborhood blocking vs a brute-force rank-window oracle,
    including cross-batch boundary pairs."""

    @staticmethod
    def _brute(keys, ids, window):
        import numpy as np

        order = np.lexsort((ids, keys))
        sids = np.asarray(ids)[order]
        want = set()
        for i in range(len(sids)):
            for d in range(1, window):
                if i + d < len(sids):
                    want.add((int(sids[i]), int(sids[i + d]), d))
        return want

    def _run(self, keys, ids, window, parts):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.dedup import sorted_neighborhood_pairs

        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "k": pa.array(keys, type=pa.int64()),
                    "doc_id": pa.array(ids, type=pa.int64()),
                }
            )
        ).repartition(parts)
        out = sorted_neighborhood_pairs(
            ds, sort_cols=["k", "doc_id"], id_col="doc_id", window=window
        ).to_pandas()
        return set(
            (int(a), int(b), int(g))
            for a, b, g in zip(out["id_a"], out["id_b"], out["gap"])
        )

    def test_matches_brute_force(self, ray_session):
        import numpy as np

        rng = np.random.default_rng(2)
        n = 400
        keys = rng.integers(0, 50, n).tolist()  # heavy ties
        ids = rng.permutation(n).tolist()
        for w in (2, 3, 5):
            assert self._run(keys, ids, w, parts=7) == self._brute(
                keys, ids, w
            )

    def test_many_tiny_blocks(self, ray_session):
        """Blocks smaller than the window force every pair through the
        driver-side boundary closure."""
        import numpy as np

        keys = list(range(12))
        ids = list(range(100, 112))
        assert self._run(keys, ids, 4, parts=12) == self._brute(
            keys, ids, 4
        )

    def test_window_validation(self, ray_session):
        import pytest

        with pytest.raises(ValueError):
            self._run([1], [1], 1, parts=1)
