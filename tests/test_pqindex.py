"""Parquet min/max pruning index tests — no false negatives, real
pruning on laid-out data, composition with the Z-order layout."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ctinexus_ray.sources.pqindex import (
    build_minmax_index,
    prune_row_groups,
    read_pruned,
)


@pytest.fixture()
def sorted_shards(tmp_path):
    """Ten files of a value-sorted corpus: file i covers [i*100, i*100+99],
    two row groups each."""
    paths = []
    for i in range(10):
        v = np.arange(i * 100, i * 100 + 100, dtype=np.int64)
        t = pa.Table.from_pydict({"v": v, "payload": v * 2})
        p = tmp_path / f"part-{i:03d}.parquet"
        pq.write_table(t, p, row_group_size=50)
        paths.append(str(p))
    return paths


class TestMinMaxIndex:
    def test_index_shape_and_bounds(self, ray_session, sorted_shards):
        idx = build_minmax_index(sorted_shards, ["v"])
        # 10 files x 2 row groups x 1 column
        assert idx.num_rows == 20
        first = idx.to_pylist()[0]
        assert first["vmin"] == "0" and first["vmax"] == "49"

    def test_prune_no_false_negatives_and_real_pruning(
        self, ray_session, sorted_shards
    ):
        idx = build_minmax_index(sorted_shards, ["v"])
        lo, hi = 230, 270
        pairs = prune_row_groups(idx, "v", lo, hi)
        # range spans file 2 rg1 (200-249) and file 2... values 230-270:
        # rgs [200-249] and [250-299] of file 2 only
        assert len(pairs) == 2
        got = sorted(
            r["v"]
            for r in read_pruned(pairs, columns=["v"]).take_all()
            if lo <= r["v"] <= hi
        )
        assert got == list(range(lo, hi + 1))  # nothing missed

    def test_stats_missing_keeps_group(self, ray_session, tmp_path):
        p = tmp_path / "nostats.parquet"
        t = pa.Table.from_pydict({"v": [1, 2, 3]})
        pq.write_table(t, p, write_statistics=False)
        idx = build_minmax_index([str(p)], ["v"])
        assert idx.to_pylist()[0]["vmin"] is None
        # unprunable -> always kept
        assert prune_row_groups(idx, "v", 10**9, 10**9 + 1) == [
            (str(p), 0)
        ]

    def test_composes_with_zorder_layout(self, ray_session, tmp_path):
        import ray.data

        from ctinexus_ray.ops.shards import zorder_layout

        rng = np.random.default_rng(2)
        n = 4000
        t = pa.Table.from_pydict(
            {
                "a": rng.integers(0, 64, n),
                "b": rng.integers(0, 64, n),
            }
        )
        laid = zorder_layout(ray.data.from_arrow(t), "a", "b")
        out = tmp_path / "zsorted"
        laid.repartition(8).write_parquet(str(out))
        paths = sorted(str(p) for p in out.glob("*.parquet"))
        idx = build_minmax_index(paths, ["zval"])
        # a point rectangle in (a,b) maps to a contained zval range
        # only when probing single z values; probe one exact z key instead
        from ctinexus_ray.ops.shards import zorder_key

        z = int(zorder_key(np.array([13]), np.array([27]))[0])
        pairs = prune_row_groups(idx, "zval", z, z)
        # pruning is effective: far fewer surviving groups than total
        total = idx.num_rows
        assert 0 < len(pairs) < total / 2
        rows = [
            r
            for r in read_pruned(pairs).take_all()
            if r["zval"] == z
        ]
        want = int(((t["a"].to_numpy() == 13) & (t["b"].to_numpy() == 27)).sum())
        assert len(rows) == want  # exact hits all found


class TestBloomIndex:
    """Per-row-group Bloom file skipping: no false negatives, real
    pruning on hash-distributed keys where min/max cannot prune."""

    @pytest.fixture()
    def hashed_shards(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        # keys hash-distributed across 8 files: every file's [min, max]
        # spans the whole domain, so the zone map is useless here
        paths = []
        for f in range(8):
            keys = [f"key-{i}" for i in range(f, 800, 8)]
            paths.append(str(tmp_path / f"part-{f}.parquet"))
            pq.write_table(
                pa.table(
                    {
                        "k": pa.array(keys, type=pa.string()),
                        "v": pa.array(list(range(len(keys))), type=pa.int64()),
                    }
                ),
                paths[-1],
                row_group_size=50,
            )
        return paths

    def test_no_false_negatives(self, hashed_shards):
        from ctinexus_ray.sources.pqindex import (
            build_bloom_index,
            prune_bloom,
            read_pruned,
        )

        idx = build_bloom_index(hashed_shards, "k")
        probes = ["key-3", "key-777", "key-123"]
        pairs = prune_bloom(idx, probes)
        got = {
            r["k"]
            for r in read_pruned(pairs).take_all()
            if r["k"] in set(probes)
        }
        assert got == {"key-3", "key-777", "key-123"}

    def test_prunes_most_groups(self, hashed_shards):
        from ctinexus_ray.sources.pqindex import (
            build_bloom_index,
            prune_bloom,
        )

        idx = build_bloom_index(hashed_shards, "k")
        total = idx.num_rows
        pairs = prune_bloom(idx, ["key-42"])
        # key-42 lives in exactly one row group of one file; Bloom fp
        # rate at m=2^17 bits over 100 keys/group is ~0 -> expect ~1
        assert 1 <= len(pairs) <= 3
        assert len(pairs) < total / 4

    def test_absent_key_prunes_everything(self, hashed_shards):
        from ctinexus_ray.sources.pqindex import (
            build_bloom_index,
            prune_bloom,
        )

        idx = build_bloom_index(hashed_shards, "k")
        assert prune_bloom(idx, ["no-such-key-xyz"]) == []
