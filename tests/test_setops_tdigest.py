"""Tests for distinct set ops, temperature sampling, exactly-k uniform
sampling, and t-digest approximate quantiles."""

import hashlib
import math

import numpy as np
import pyarrow as pa
import ray.data

from ctinexus_ray.ops.distjoin import distinct_set_op
from ctinexus_ray.ops.shards import temperature_sample, uniform_sample_k
from ctinexus_ray.ops.sketch import tdigest_quantiles


def _ds(rows, parallelism=4):
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(
        parallelism
    )


class TestDistinctSetOp:
    def setup_method(self):
        self.left = [{"k": i} for i in [1, 1, 2, 3, 5, 8]]
        self.right = [{"k": i} for i in [2, 2, 3, 9]]

    def _run(self, op):
        return sorted(
            r["k"]
            for r in distinct_set_op(
                _ds(self.left), _ds(self.right), keys=["k"], op=op
            ).take_all()
        )

    def test_intersect(self, ray_session):
        assert self._run("intersect") == [2, 3]

    def test_except(self, ray_session):
        assert self._run("except") == [1, 5, 8]

    def test_union(self, ray_session):
        assert self._run("union") == [1, 2, 3, 5, 8, 9]

    def test_empty_result_keeps_schema(self, ray_session):
        out = distinct_set_op(
            _ds(self.left), _ds(self.left), keys=["k"], op="except"
        )
        assert out.count() == 0
        assert out.schema().names == ["k"]

    def test_multi_column_keys(self, ray_session):
        left = [{"a": 1, "b": "x"}, {"a": 1, "b": "y"}, {"a": 2, "b": "x"}]
        right = [{"a": 1, "b": "y"}, {"a": 3, "b": "z"}]
        out = sorted(
            (r["a"], r["b"])
            for r in distinct_set_op(
                _ds(left), _ds(right), keys=["a", "b"], op="intersect"
            ).take_all()
        )
        assert out == [(1, "y")]


class TestTemperatureSample:
    def _rows(self):
        rows = []
        i = 0
        for src, n in [("a", 100), ("b", 400), ("c", 1600)]:
            for _ in range(n):
                rows.append({"doc_id": i, "source": src})
                i += 1
        return rows

    def test_alpha_one_keeps_everything(self, ray_session):
        out = temperature_sample(
            _ds(self._rows()), "source", "doc_id", alpha=1.0
        )
        assert out.count() == 2100

    def test_alpha_half_rates(self, ray_session):
        out = temperature_sample(
            _ds(self._rows()), "source", "doc_id", alpha=0.5
        ).take_all()
        rows = self._rows()
        # exact expected set: md5 threshold with rate sqrt(min/cnt)
        counts = {"a": 100, "b": 400, "c": 1600}
        thr = {
            g: format(
                min(
                    int(math.floor(math.sqrt(100 / c) * 4294967296.0)),
                    0xFFFFFFFF,
                ),
                "08x",
            )
            for g, c in counts.items()
        }
        expect = sorted(
            r["doc_id"]
            for r in rows
            if hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8]
            <= thr[r["source"]]
        )
        assert sorted(r["doc_id"] for r in out) == expect
        # rates sit between balanced (min/cnt) and natural (1.0)
        kept_c = sum(1 for r in out if r["source"] == "c")
        assert 100 < kept_c < 1600


class TestUniformSampleK:
    def test_exactly_k_smallest_digests(self, ray_session):
        rows = [{"doc_id": i, "source": "s"} for i in range(500)]
        out = uniform_sample_k(_ds(rows, 7), id_col="doc_id", k=25)
        got = sorted(r["doc_id"] for r in out.take_all())
        expect = sorted(
            sorted(
                range(500),
                key=lambda i: hashlib.md5(str(i).encode()).hexdigest(),
            )[:25]
        )
        assert got == expect

    def test_k_larger_than_corpus(self, ray_session):
        rows = [{"doc_id": i} for i in range(10)]
        out = uniform_sample_k(_ds(rows), id_col="doc_id", k=50)
        assert out.count() == 10


class TestTDigest:
    def test_accuracy_vs_exact(self, ray_session):
        rng = np.random.default_rng(11)
        vals = rng.lognormal(mean=3.0, sigma=1.0, size=20_000)
        rows = [{"v": float(v)} for v in vals]
        qs = [0.01, 0.25, 0.5, 0.75, 0.99]
        out = {
            r["q"]: r["value"]
            for r in tdigest_quantiles(
                _ds(rows, 16), "v", qs
            ).take_all()
        }
        s = np.sort(vals)
        for q in qs:
            exact = s[max(0, int(np.ceil(q * len(s))) - 1)]
            # rank error: position of the estimate within the sorted data
            rank = np.searchsorted(s, out[q]) / len(s)
            assert abs(rank - q) < 0.02, (q, exact, out[q], rank)

    def test_empty(self, ray_session):
        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"v": pa.array([], type=pa.float64())})
        )
        assert tdigest_quantiles(ds, "v", [0.5]).count() == 0
