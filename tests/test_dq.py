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
