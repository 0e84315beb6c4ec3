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


class TestMmrTopk:
    @staticmethod
    def _emb(vectors):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "vec_id": pa.array(range(len(vectors)), type=pa.int64()),
                    "embedding": [list(map(float, v)) for v in vectors],
                }
            )
        ).repartition(2)

    def test_lambda_one_equals_plain_topk(self, ray_session):
        import numpy as np

        from ctinexus_ray.ops.simsearch import mmr_topk, self_topk

        rng = np.random.RandomState(7)
        vecs = rng.randn(40, 8)
        ds = self._emb(vecs)
        plain = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in self_topk(ds, n_queries=3, k=5).take_all()
        }
        mmr = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in mmr_topk(ds, n_queries=3, k=5, pool=40, lam=1.0).take_all()
        }
        assert mmr == plain

    def test_diversity_breaks_near_duplicate_block(self, ray_session):
        from ctinexus_ray.ops.simsearch import mmr_topk

        # query q = [1, 0]; three near-clones of q; one orthogonal-ish doc
        vecs = [
            [1.0, 0.0],        # 0: the query itself
            [0.999, 0.001],    # 1: clone
            [0.998, 0.002],    # 2: clone
            [0.997, 0.003],    # 3: clone
            [0.5, 0.8],        # 4: different
        ]
        plain = mmr_topk(self._emb(vecs), 1, k=2, pool=4, lam=1.0).take_all()
        plain_ids = [r["neighbor_id"] for r in sorted(plain, key=lambda r: r["rank"])]
        assert plain_ids == [1, 2]  # pure relevance: two clones
        div = mmr_topk(self._emb(vecs), 1, k=2, pool=4, lam=0.3).take_all()
        div_ids = [r["neighbor_id"] for r in sorted(div, key=lambda r: r["rank"])]
        # diversity kicks the second clone out for the different doc
        assert div_ids[0] == 1 and div_ids[1] == 4

    def test_matches_naive_mmr(self, ray_session):
        import numpy as np

        from ctinexus_ray.ops.simsearch import mmr_topk

        rng = np.random.RandomState(3)
        vecs = rng.randn(25, 6)
        lam, k, nq = 0.6, 4, 2
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in mmr_topk(self._emb(vecs), nq, k=k, pool=24, lam=lam).take_all()
        }
        unit = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        sims = unit @ unit.T
        want = {}
        for q in range(nq):
            cand = sorted(
                (i for i in range(len(vecs)) if i != q),
                key=lambda i: (-sims[q, i], i),
            )[:24]
            chosen = []
            for rank in range(1, k + 1):
                best, best_score = None, -np.inf
                for i in cand:
                    if i in chosen:
                        continue
                    red = max((sims[i, j] for j in chosen), default=0.0)
                    s = lam * sims[q, i] - (1 - lam) * red
                    if s > best_score:
                        best, best_score = i, s
                chosen.append(best)
                want[(q, rank)] = best
        assert got == want
