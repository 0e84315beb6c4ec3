"""Data-quality rule engine tests."""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


class TestDataQualityReport:
    def test_counts_and_null_semantics(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.dq import data_quality_report

        t = pa.Table.from_pydict(
            {
                "v": [1.0, -2.0, None, 5.0, 0.0],
                "k": ["a", "b", "a", None, "z"],
            }
        )
        ds = ray.data.from_arrow(t).repartition(3)
        rules = {
            "v_nonneg": lambda b: pc.greater_equal(b.column("v"), 0.0),
            "k_in_enum": lambda b: pc.is_in(
                b.column("k"), value_set=pa.array(["a", "b"])
            ),
        }
        rows = {
            r["rule"]: r
            for r in data_quality_report(ds, rules).to_pylist()
        }
        # v: -2 fails, None fails (null is not a pass) -> 2 violations
        assert rows["v_nonneg"]["n_violations"] == 2
        assert rows["v_nonneg"]["n_rows"] == 5
        # k: None fails, 'z' fails -> 2
        assert rows["k_in_enum"]["n_violations"] == 2
        assert rows["k_in_enum"]["violation_rate"] == 2 / 5

    def test_all_pass(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.dq import data_quality_report

        t = pa.Table.from_pydict({"v": [1, 2, 3]})
        out = data_quality_report(
            ray.data.from_arrow(t),
            {"pos": lambda b: pc.greater(b.column("v"), 0)},
        ).to_pylist()
        assert out[0]["n_violations"] == 0
        assert out[0]["violation_rate"] == 0.0


class TestTableChecksum:
    def test_order_and_partitioning_invariant(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.dq import table_checksum

        rows = [{"id": i, "t": f"doc {i}"} for i in range(50)]
        a = table_checksum(
            ray.data.from_items(rows), ["id", "t"]
        ).to_pydict()
        b = table_checksum(
            ray.data.from_items(list(reversed(rows))).repartition(7),
            ["id", "t"],
        ).to_pydict()
        assert a == b and a["n_rows"] == [50]

    def test_detects_single_row_change(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.dq import table_checksum

        rows = [{"id": i, "t": f"doc {i}"} for i in range(10)]
        a = table_checksum(ray.data.from_items(rows), ["id", "t"])
        rows[3]["t"] = "doc 3 tampered"
        b = table_checksum(ray.data.from_items(rows), ["id", "t"])
        assert a.column("checksum") != b.column("checksum")
        assert a.column("n_rows") == b.column("n_rows")

    def test_null_vs_empty_distinct(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.dq import table_checksum

        a = table_checksum(
            ray.data.from_items([{"id": 1, "t": None}]), ["id", "t"]
        )
        b = table_checksum(
            ray.data.from_items([{"id": 1, "t": ""}]), ["id", "t"]
        )
        assert a.column("checksum") != b.column("checksum")

    def test_separator_in_value_cannot_collide(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.dq import table_checksum

        a = table_checksum(
            ray.data.from_items([{"a": "x|y", "b": "z"}]), ["a", "b"]
        )
        b = table_checksum(
            ray.data.from_items([{"a": "x", "b": "y|z"}]), ["a", "b"]
        )
        assert a.column("checksum") != b.column("checksum")


class TestCorrMatrix:
    def _ds(self, rows):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(pa.Table.from_pylist(rows))

    def test_matches_numpy_corrcoef(self, ray_session):
        import numpy as np

        from ctinexus_ray.ops.dq import corr_matrix

        rng = np.random.default_rng(3)
        x = rng.normal(10, 2, 500)
        y = 0.5 * x + rng.normal(0, 1, 500)
        z = rng.normal(0, 5, 500)
        rows = [{"x": float(a), "y": float(b), "z": float(c)}
                for a, b, c in zip(x, y, z)]
        out = corr_matrix(
            self._ds(rows), ["x", "y", "z"], scale=10**6
        ).to_pydict()
        # quantized at 1e-6 -> matches float corrcoef to ~1e-6
        xq = np.floor(x * 1e6 + 0.5)
        yq = np.floor(y * 1e6 + 0.5)
        zq = np.floor(z * 1e6 + 0.5)
        want = {
            ("x", "y"): np.corrcoef(xq, yq)[0, 1],
            ("x", "z"): np.corrcoef(xq, zq)[0, 1],
            ("y", "z"): np.corrcoef(yq, zq)[0, 1],
        }
        for cx, cy, r in zip(out["col_x"], out["col_y"], out["corr"]):
            assert abs(r - want[(cx, cy)]) < 1e-9

    def test_constant_column_yields_null(self, ray_session):
        from ctinexus_ray.ops.dq import corr_matrix

        rows = [{"a": 1.0, "b": float(i)} for i in range(10)]
        out = corr_matrix(self._ds(rows), ["a", "b"]).to_pydict()
        assert out["corr"] == [None]

    def test_null_refuses(self, ray_session):
        import pytest

        from ctinexus_ray.ops.dq import corr_matrix

        rows = [{"a": 1.0, "b": 2.0}, {"a": None, "b": 3.0}]
        with pytest.raises(Exception, match="NULL"):
            corr_matrix(self._ds(rows), ["a", "b"])

    def test_perfect_correlation(self, ray_session):
        from ctinexus_ray.ops.dq import corr_matrix

        rows = [{"a": float(i), "b": 2.0 * i + 3} for i in range(20)]
        out = corr_matrix(self._ds(rows), ["a", "b"]).to_pydict()
        assert abs(out["corr"][0] - 1.0) < 1e-12


class TestRangeChecksums:
    def test_buckets_fold_to_table_checksum(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.dq import range_checksums, table_checksum

        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "id": pa.array(range(37), type=pa.int64()),
                    "text": [f"row {i}" if i % 5 else None for i in range(37)],
                }
            )
        ).repartition(4)
        ranged = range_checksums(
            ds, cols=["id", "text"], key_col="id", bucket_size=10,
            num_partitions=4,
        ).take_all()
        whole = table_checksum(ds, cols=["id", "text"])
        # XOR of bucket checksums == the whole-table checksum; counts add
        fold = int(
            np.bitwise_xor.reduce(
                np.array([r["checksum"] for r in ranged], dtype=np.int64)
            )
        )
        assert fold == whole.column("checksum")[0].as_py()
        assert sum(r["n_rows"] for r in ranged) == 37
        assert sorted(r["bucket"] for r in ranged) == [0, 1, 2, 3]

    def test_divergence_localized(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.dq import range_checksums

        base = {
            "id": pa.array(range(30), type=pa.int64()),
            "text": [f"r{i}" for i in range(30)],
        }
        a = range_checksums(
            ray.data.from_arrow(pa.Table.from_pydict(base)),
            ["id", "text"], "id", 10, num_partitions=4,
        ).take_all()
        mutated = dict(base)
        mutated["text"] = [
            "CHANGED" if i == 17 else f"r{i}" for i in range(30)
        ]
        b = range_checksums(
            ray.data.from_arrow(pa.Table.from_pydict(mutated)),
            ["id", "text"], "id", 10, num_partitions=4,
        ).take_all()
        ca = {r["bucket"]: r["checksum"] for r in a}
        cb = {r["bucket"]: r["checksum"] for r in b}
        diff = [k for k in ca if ca[k] != cb[k]]
        assert diff == [1]  # only the bucket holding row 17


class TestUniqueViolations:
    def _ds(self, rows):
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "a": pa.array([r[0] for r in rows], type=pa.int64()),
                    "b": pa.array([r[1] for r in rows], type=pa.string()),
                }
            )
        )

    def test_counts_rows_beyond_first(self, ray_session):
        from ctinexus_ray.ops.dq import unique_violations

        ds = self._ds([(1, "x"), (1, "y"), (1, "x"), (2, "x")])
        assert unique_violations(ds, ["a"], num_partitions=4) == 2
        assert unique_violations(ds, ["a", "b"], num_partitions=4) == 1

    def test_unique_key_scores_zero(self, ray_session):
        from ctinexus_ray.ops.dq import unique_violations

        ds = self._ds([(i, str(i)) for i in range(50)])
        assert unique_violations(ds, ["a"], num_partitions=4) == 0

    def test_null_keys_group_together(self, ray_session):
        import pyarrow as pa

        import ray.data

        from ctinexus_ray.ops.dq import unique_violations

        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"a": pa.array([None, None, 3], type=pa.int64())}
            )
        )
        assert unique_violations(ds, ["a"], num_partitions=4) == 1


class TestFkViolations:
    def _ds(self, ids):
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict({"key": pa.array(ids, type=pa.int64())})
        )

    def test_orphan_rows_counted_with_multiplicity(self, ray_session):
        from ctinexus_ray.ops.dq import fk_violations

        child = self._ds([1, 2, 9, 9, 9])
        parent = self._ds([1, 2, 3])
        assert fk_violations(child, parent, "key", num_partitions=4) == 3

    def test_clean_fk_scores_zero(self, ray_session):
        from ctinexus_ray.ops.dq import fk_violations

        assert (
            fk_violations(
                self._ds([1, 1, 2]), self._ds([1, 2]), "key",
                num_partitions=4,
            )
            == 0
        )

    def test_null_child_key_is_violation(self, ray_session):
        from ctinexus_ray.ops.dq import fk_violations

        assert (
            fk_violations(
                self._ds([None, 1]), self._ds([1]), "key", num_partitions=4
            )
            == 1
        )
