"""Persisted IVF index tests (ops/annindex.py): build/search recall,
full-probe exactness, incremental append, table-format integration."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ctinexus_ray.ops.annindex import (
    ivf_index_append,
    ivf_index_build,
    ivf_index_search,
)

SF = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def embeddings(ray_session):
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def queries(embeddings):
    rows = sorted(
        embeddings.filter(expr="vec_id < 10").take_all(),
        key=lambda r: r["vec_id"],
    )
    ids = [r["vec_id"] for r in rows]
    mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return ids, mat


class TestIvfIndex:
    def test_full_probe_is_exact(self, embeddings, queries, tmp_path_factory):
        from ctinexus_ray.ops.simsearch import self_topk

        d = str(tmp_path_factory.mktemp("ivf") / "idx")
        ivf_index_build(embeddings, d, n_centroids=8)
        ids, mat = queries
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_index_search(d, ids, mat, k=5, n_probe=8).take_all()
        }
        want = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in self_topk(embeddings, n_queries=10, k=5).take_all()
        }
        assert got == want

    def test_probe_recall(self, embeddings, queries, tmp_path_factory):
        from ctinexus_ray.ops.simsearch import self_topk

        d = str(tmp_path_factory.mktemp("ivf") / "idx")
        ivf_index_build(embeddings, d, n_centroids=16)
        ids, mat = queries
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_index_search(d, ids, mat, k=5, n_probe=4).take_all()
        }
        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in self_topk(embeddings, n_queries=10, k=5).take_all()
        }
        assert len(approx & exact) / len(exact) >= 0.8

    def test_append_then_search_finds_new_vector(
        self, embeddings, queries, tmp_path_factory
    ):
        d = str(tmp_path_factory.mktemp("ivf") / "idx")
        v1 = ivf_index_build(embeddings, d, n_centroids=8)
        ids, mat = queries
        # append an exact duplicate of query 0 under a fresh id: it must
        # come back as that query's rank-1 neighbor
        dup = ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([999_999], type=pa.int64()),
                    "embedding": pa.array([list(map(float, mat[0]))]),
                }
            )
        )
        v2 = ivf_index_append(dup, d)
        assert v2 == v1 + 1
        top = {
            r["rank"]: r["neighbor_id"]
            for r in ivf_index_search(d, ids, mat, k=3, n_probe=8).take_all()
            if r["query_id"] == ids[0]
        }
        assert top[1] == 999_999

    def test_non_index_table_refuses(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from ctinexus_ray.state.tableformat import commit_version

        f = str(tmp_path / "x.parquet")
        pq.write_table(pa.table({"a": [1]}), f)
        t = str(tmp_path / "tbl")
        commit_version(t, [f])
        with pytest.raises(FileNotFoundError, match="IVF"):
            ivf_index_search(t, [0], np.ones((1, 4)))

    def test_search_scans_only_probed_cells(
        self, embeddings, queries, tmp_path_factory
    ):
        from ctinexus_ray.state.tableformat import read_version

        import pyarrow.dataset as pads

        d = str(tmp_path_factory.mktemp("ivf") / "idx")
        ivf_index_build(embeddings, d, n_centroids=16)
        # the cell filter actually restricts the scan
        one_cell = read_version(d, filter=pads.field("cell") == 0).count()
        assert 0 < one_cell < embeddings.count()


class TestIvfDelete:
    def test_delete_equals_brute_force_over_survivors(
        self, embeddings, queries, tmp_path_factory
    ):
        from ctinexus_ray.ops.annindex import ivf_index_delete
        from ctinexus_ray.ops.simsearch import brute_force_topk

        d = str(tmp_path_factory.mktemp("ivfdel") / "idx")
        ivf_index_build(embeddings, d, n_centroids=8)
        def mod3(t, eq):
            import numpy as np
            import pyarrow as pa

            v = t.column("vec_id").to_numpy(zero_copy_only=False)
            mask = (v % 3 == 0) if eq else (v % 3 != 0)
            return t.filter(pa.array(mask))

        drops = embeddings.map_batches(
            lambda t: mod3(t, True), batch_format="pyarrow"
        ).select_columns(["vec_id"])
        v = ivf_index_delete(d, drops)
        assert v == 2
        ids, mat = queries
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_index_search(d, ids, mat, k=5, n_probe=8).take_all()
        }
        surv = embeddings.map_batches(
            lambda t: mod3(t, False), batch_format="pyarrow"
        )
        want = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in brute_force_topk(
                surv, ids, mat, k=5, exclude_self=True
            ).take_all()
        }
        assert got == want
        # no dropped vector survives anywhere in the index
        from ctinexus_ray.state.tableformat import read_version

        left = {r["vec_id"] for r in read_version(d).take_all()}
        assert all(v % 3 != 0 for v in left)

    def test_absent_ids_and_refusal(
        self, embeddings, ray_session, tmp_path_factory
    ):
        from ctinexus_ray.ops.annindex import ivf_index_delete
        from ctinexus_ray.state.tableformat import read_version

        d = str(tmp_path_factory.mktemp("ivfdel") / "idx")
        ivf_index_build(embeddings, d, n_centroids=8)
        before = read_version(d).count()
        ivf_index_delete(d, [10_000_000, 10_000_001])
        assert read_version(d).count() == before
        with pytest.raises(ValueError, match="max_broadcast_ids"):
            ivf_index_delete(d, [1, 2, 3], max_broadcast_ids=1)


class TestIvfDeleteAfterAppend:
    def test_delete_spanning_build_and_append_cells(
        self, embeddings, queries, tmp_path_factory
    ):
        """Regression twin of the text-index basename-collision bug:
        cells written by both build and append share basenames."""
        from ctinexus_ray.ops.annindex import (
            ivf_index_append,
            ivf_index_delete,
        )
        from ctinexus_ray.ops.simsearch import brute_force_topk
        from ctinexus_ray.state.tableformat import version_files

        d = str(tmp_path_factory.mktemp("ivfdel2") / "idx")
        # ONE centroid: every vector lands in cell-00000.parquet
        half_a = embeddings.filter(expr="vec_id < 72")
        half_b = embeddings.filter(expr="vec_id >= 72")
        ivf_index_build(half_a, d, n_centroids=1)
        ivf_index_append(half_b, d)
        # drop one vector from each commit's file
        ivf_index_delete(d, [11, 100])
        files = version_files(d, 3)
        assert len(files) == len(set(files)), "duplicate path committed"
        ids, mat = queries
        got = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in ivf_index_search(d, ids, mat, k=5, n_probe=1).take_all()
        }
        surv = embeddings.filter(expr="vec_id != 11").filter(
            expr="vec_id != 100"
        )
        want = {
            (r["query_id"], r["rank"]): r["neighbor_id"]
            for r in brute_force_topk(
                surv, ids, mat, k=5, exclude_self=True
            ).take_all()
        }
        assert got == want
