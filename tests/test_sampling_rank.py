"""Tests for balanced sampling, global row numbering, grouped
quantiles, repetition stats, and Bloom-filter incremental dedup."""

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from ctinexus_ray.ops.relational import grouped_int_quantiles
from ctinexus_ray.ops.shards import balanced_sample, global_row_number
from ctinexus_ray.ops.sketch import bloom_build, bloom_filter_new
from ctinexus_ray.ops.textstats import repetition_stats_batch


def _ds(rows, parallelism=4):
    return ray.data.from_arrow(pa.Table.from_pylist(rows)).repartition(
        parallelism
    )


class TestBalancedSample:
    def _rows(self):
        rows = []
        i = 0
        for src, n in [("a", 40), ("b", 400), ("c", 4000)]:
            for _ in range(n):
                rows.append({"doc_id": i, "source": src})
                i += 1
        return rows

    def test_smallest_group_fully_kept(self, ray_session):
        out = balanced_sample(
            _ds(self._rows()), group_col="source", id_col="doc_id"
        ).take_all()
        kept_a = [r for r in out if r["source"] == "a"]
        # rate 1.0 clamps to ffffffff => every row of the smallest group
        assert len(kept_a) == 40

    def test_expected_counts_and_determinism(self, ray_session):
        ds = _ds(self._rows())
        out1 = sorted(
            r["doc_id"]
            for r in balanced_sample(
                ds, group_col="source", id_col="doc_id"
            ).take_all()
        )
        out2 = sorted(
            r["doc_id"]
            for r in balanced_sample(
                _ds(self._rows(), parallelism=9),
                group_col="source",
                id_col="doc_id",
            ).take_all()
        )
        assert out1 == out2  # stable across resharding
        # each kept id satisfies the md5-threshold rule exactly
        counts = {"a": 40, "b": 400, "c": 4000}
        thr = {
            g: format(
                min(int((40 / c) * 4294967296.0), 0xFFFFFFFF), "08x"
            )
            for g, c in counts.items()
        }
        rows = {r["doc_id"]: r["source"] for r in self._rows()}
        expect = sorted(
            i
            for i, g in rows.items()
            if hashlib.md5(str(i).encode()).hexdigest()[:8] <= thr[g]
        )
        assert out1 == expect


class TestGlobalRowNumber:
    def test_rank_matches_total_order(self, ray_session):
        rows = [
            {"doc_id": i, "n_chars": (i * 7) % 13} for i in range(50)
        ]
        out = global_row_number(
            _ds(rows),
            sort_keys=["n_chars", "doc_id"],
            descending=[True, False],
        ).take_all()
        assert sorted(r["rank"] for r in out) == list(range(1, 51))
        expect = sorted(rows, key=lambda r: (-r["n_chars"], r["doc_id"]))
        got = sorted(out, key=lambda r: r["rank"])
        assert [r["doc_id"] for r in got] == [r["doc_id"] for r in expect]

    def test_empty(self, ray_session):
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([], type=pa.int64()),
                    "n_chars": pa.array([], type=pa.int64()),
                }
            )
        )
        out = global_row_number(
            ds, sort_keys=["n_chars", "doc_id"], descending=[False, False]
        )
        assert out.count() == 0


class TestGroupedIntQuantiles:
    def test_matches_sorted_index_rule(self, ray_session):
        rng = np.random.default_rng(7)
        rows = []
        for g in ("en", "de"):
            for v in rng.integers(0, 50, size=101 if g == "en" else 17):
                rows.append({"lang": g, "n_chars": int(v)})
        qs = [0.25, 0.5, 0.75, 0.99]
        out = {
            (r["lang"], r["q"]): r["value"]
            for r in grouped_int_quantiles(
                _ds(rows), group_col="lang", col="n_chars", quantiles=qs
            ).take_all()
        }
        for g in ("en", "de"):
            vals = sorted(r["n_chars"] for r in rows if r["lang"] == g)
            for q in qs:
                idx = max(0, int(np.ceil(q * len(vals))) - 1)
                assert out[(g, q)] == vals[idx], (g, q)


class TestRepetitionStats:
    def test_hand_example(self, ray_session):
        batch = pa.Table.from_pylist(
            [
                {"doc_id": 1, "text": "aa bb aa cc aa"},
                {"doc_id": 2, "text": "x y z"},
            ]
        )
        out = {r["doc_id"]: r for r in repetition_stats_batch(batch).to_pylist()}
        r1 = out[1]
        assert r1["n_words"] == 5 and r1["n_distinct"] == 3
        assert abs(r1["dup_word_frac"] - (1 - 3 / 5)) < 1e-12
        assert r1["top_word"] == "aa"
        # chars: aa*3 + bb*2... total = 2*3 + 2 + 2 = 10; top = 6
        assert abs(r1["top_word_frac"] - 0.6) < 1e-12
        r2 = out[2]
        assert r2["dup_word_frac"] == 0.0
        assert r2["top_word"] == "x"  # tie -> lexicographically smallest


class TestBloomIncremental:
    def test_no_false_negatives_and_anchored(self, ray_session):
        known_keys = [f"k{i}" for i in range(500)]
        new_keys = [f"n{i}" for i in range(300)]
        known = _ds([{"fp": k} for k in known_keys])
        new = _ds([{"fp": k} for k in new_keys + known_keys[:50]])
        bits = bloom_build(known, "fp")
        kept = {r["fp"] for r in bloom_filter_new(new, "fp", bits).take_all()}
        # a Bloom filter never false-negatives: no known key survives
        assert not kept & set(known_keys)
        # at 1 MiB / 800 keys the fp rate is ~0: all new keys survive
        assert kept == set(new_keys)

    def test_empty_known(self, ray_session):
        known = ray.data.from_arrow(
            pa.Table.from_pydict({"fp": pa.array([], type=pa.string())})
        )
        new = _ds([{"fp": "a"}, {"fp": "b"}])
        bits = bloom_build(known, "fp")
        kept = {r["fp"] for r in bloom_filter_new(new, "fp", bits).take_all()}
        assert kept == {"a", "b"}


class TestWeightedSampleK:
    def test_bias_toward_heavy_rows(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.shards import weighted_sample_k

        # 500 light rows (w=1) + 100 heavy rows (w=50): a k=100 weighted
        # sample should be dominated by heavy rows
        n_light, n_heavy = 500, 100
        t = pa.Table.from_pydict(
            {
                "id": list(range(n_light + n_heavy)),
                "w": [1] * n_light + [50] * n_heavy,
            }
        )
        ds = ray.data.from_arrow(t).repartition(6)
        rows = weighted_sample_k(ds, "id", "w", k=100).take_all()
        assert len(rows) == 100
        heavy = sum(1 for r in rows if r["w"] == 50)
        assert heavy > 70, heavy  # expected ~91 under A-ES

    def test_deterministic_and_reshard_stable(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.shards import weighted_sample_k

        t = pa.Table.from_pydict(
            {"id": list(range(300)), "w": [(i % 7) + 1 for i in range(300)]}
        )
        a = {
            r["id"]
            for r in weighted_sample_k(
                ray.data.from_arrow(t).repartition(2), "id", "w", 40
            ).take_all()
        }
        b = {
            r["id"]
            for r in weighted_sample_k(
                ray.data.from_arrow(t).repartition(9), "id", "w", 40
            ).take_all()
        }
        assert a == b and len(a) == 40

    def test_nonpositive_weight_ineligible(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.shards import weighted_sample_k

        # zero / negative / NULL weights are ineligible (zero inclusion
        # probability), NOT an error — matching the oracle's
        # `WHERE weight > 0` predicate
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"id": [1, 2, 3, 4], "w": [3.0, 0.0, -1.0, None]}
            )
        )
        rows = weighted_sample_k(ds, "id", "w", k=4).take_all()
        assert [r["id"] for r in rows] == [1]
