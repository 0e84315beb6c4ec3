"""PageRank: Pregel pinned-partition actors vs the pure-Dataset join
expression (ops/graph.py) — plus a from-first-principles power-iteration
oracle in numpy."""

import numpy as np
import pyarrow as pa
import ray.data

from ctinexus_ray.ops.graph import pagerank, pagerank_joins


def _edges(src, dst):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "src": pa.array(np.asarray(src, dtype=np.int64)),
                "dst": pa.array(np.asarray(dst, dtype=np.int64)),
            }
        )
    )


def _numpy_pagerank(src, dst, damping=0.85, iterations=5):
    nodes = np.unique(np.concatenate([src, dst]))
    idx = {int(n): i for i, n in enumerate(nodes)}
    s = np.array([idx[int(v)] for v in src])
    d = np.array([idx[int(v)] for v in dst])
    n = len(nodes)
    outdeg = np.zeros(n)
    np.add.at(outdeg, s, 1.0)
    rank = np.full(n, 1.0 / n)
    for _ in range(iterations):
        contrib = np.zeros(n)
        np.add.at(contrib, d, rank[s] / outdeg[s])
        dangling = rank[outdeg == 0].sum()
        rank = (1 - damping) / n + damping * contrib + damping * dangling / n
    return nodes, rank


def _ranks(ds):
    df = ds.to_pandas().sort_values("node").reset_index(drop=True)
    return df["node"].to_numpy(), df["rank"].to_numpy()


class TestPageRank:
    def test_matches_numpy_power_iteration(self, ray_session):
        rng = np.random.RandomState(11)
        src = rng.randint(0, 80, 500)
        dst = rng.randint(0, 100, 500)  # ids 80..99 can be dangling
        keep = src != dst
        src, dst = src[keep], dst[keep]
        want_nodes, want_rank = _numpy_pagerank(src, dst)
        nodes, rank = _ranks(pagerank(_edges(src, dst), num_partitions=4))
        assert np.array_equal(nodes, want_nodes)
        assert np.allclose(rank, want_rank, rtol=1e-12, atol=1e-15)
        assert abs(rank.sum() - 1.0) < 1e-9  # rank mass conserved

    def test_pregel_equals_joins(self, ray_session):
        rng = np.random.RandomState(3)
        src = rng.randint(0, 60, 300)
        dst = rng.randint(0, 60, 300)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        n1, r1 = _ranks(pagerank(_edges(src, dst), num_partitions=4))
        n2, r2 = _ranks(pagerank_joins(_edges(src, dst), num_partitions=16))
        assert np.array_equal(n1, n2)
        assert np.allclose(r1, r2, rtol=1e-12)

    def test_single_partition(self, ray_session):
        src = [1, 2, 3]
        dst = [2, 3, 1]
        nodes, rank = _ranks(pagerank(_edges(src, dst), num_partitions=1))
        # symmetric cycle: uniform ranks
        assert np.allclose(rank, 1 / 3)

    def test_dangling_sink(self, ray_session):
        # star into a sink: sink rank > source ranks, mass conserved
        nodes, rank = _ranks(
            pagerank(_edges([1, 2, 3], [9, 9, 9]), num_partitions=2)
        )
        by = dict(zip(nodes, rank))
        assert by[9] > by[1]
        assert abs(rank.sum() - 1.0) < 1e-9

    def test_empty(self, ray_session):
        empty = _edges([], [])
        assert pagerank(empty, num_partitions=2).count() == 0

    def test_multi_edges_contribute_multiply(self, ray_session):
        # doubled edge 1->2 shifts rank toward 2 vs the single-edge graph
        _, r_single = _ranks(
            pagerank(_edges([1, 1], [2, 3]), num_partitions=2)
        )
        nodes, r_double = _ranks(
            pagerank(_edges([1, 1, 1], [2, 2, 3]), num_partitions=2)
        )
        by_s = dict(zip([1, 2, 3], r_single))
        by_d = dict(zip(nodes, r_double))
        assert by_d[2] > by_s[2]


class TestTriangles:
    def _edges(self, pairs):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"a": [p[0] for p in pairs], "b": [p[1] for p in pairs]}
            )
        ).repartition(3)

    def test_k4_plus_pendant(self, ray_session):
        from ctinexus_ray.ops.graph import degree_histogram, triangle_count

        edges = self._edges(
            [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (4, 5)]
        )
        assert triangle_count(edges, num_partitions=16) == 4
        hist = sorted(
            (r["degree"], r["n_nodes"])
            for r in degree_histogram(edges, num_partitions=16).take_all()
        )
        assert hist == [(1, 2), (3, 4)]

    def test_triangle_free_path(self, ray_session):
        from ctinexus_ray.ops.graph import triangle_count

        assert triangle_count(self._edges([(0, 1), (1, 2), (2, 3)]),
                              num_partitions=16) == 0

    def test_two_shared_edge_triangles(self, ray_session):
        from ctinexus_ray.ops.graph import triangle_count

        # triangles (0,1,2) and (1,2,3) share edge (1,2)
        edges = self._edges([(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)])
        assert triangle_count(edges, num_partitions=16) == 2


class TestKCore:
    def _edges(self, pairs):
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "a": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "b": pa.array([p[1] for p in pairs], type=pa.int64()),
                }
            )
        )

    def test_triangle_with_tail(self, ray_session):
        from ctinexus_ray.ops.graph import k_core

        out = k_core(self._edges([(0, 1), (0, 2), (1, 2), (2, 3)]), 2).take_all()
        assert sorted((r["node"], r["deg"]) for r in out) == [(0, 2), (1, 2), (2, 2)]

    def test_cascading_peel(self, ray_session):
        from ctinexus_ray.ops.graph import k_core

        # chain 0-1-2-3-4: 2-core empty, but only after CASCADED rounds
        out = k_core(self._edges([(0, 1), (1, 2), (2, 3), (3, 4)]), 2).take_all()
        assert out == []

    def test_clique_survives(self, ray_session):
        from ctinexus_ray.ops.graph import k_core

        import itertools

        clique = list(itertools.combinations(range(4), 2))
        tail = [(3, 9), (9, 10)]
        out = k_core(self._edges(clique + tail), 3).take_all()
        assert sorted((r["node"], r["deg"]) for r in out) == [
            (0, 3), (1, 3), (2, 3), (3, 3),
        ]

    def test_rounds_cap_respected(self, ray_session):
        from ctinexus_ray.ops.graph import k_core

        # chain of 6 needs 3 peel rounds to empty at k=2; rounds=1 stops
        # early by design (the SQL twin unrolls the same fixed count)
        chain = [(i, i + 1) for i in range(6)]
        one = k_core(self._edges(chain), 2, rounds=1).take_all()
        assert len(one) > 0
        full = k_core(self._edges(chain), 2, rounds=8).take_all()
        assert full == []

    def test_semijoin_fallback_matches_broadcast(self, ray_session):
        from ctinexus_ray.ops.graph import k_core

        import itertools

        clique = list(itertools.combinations(range(5), 2))
        tail = [(4, 20), (20, 21), (21, 22)]
        fast = k_core(self._edges(clique + tail), 3).take_all()
        slow = k_core(
            self._edges(clique + tail), 3, dead_broadcast_rows=0
        ).take_all()
        key = lambda r: (r["node"], r["deg"])
        assert sorted(fast, key=key) == sorted(slow, key=key)
        assert {r["node"] for r in fast} == {0, 1, 2, 3, 4}


class TestBfsHops:
    def _run(self, edges, seeds, max_hops, **kw):
        import ray.data

        from ctinexus_ray.ops.graph import bfs_hops

        e = ray.data.from_items([{"a": a, "b": b} for a, b in edges])
        s = ray.data.from_items([{"node": n} for n in seeds])
        got = bfs_hops(e, s, max_hops, num_partitions=16, **kw).take_all()
        return {r["node"]: r["dist"] for r in got}

    def test_chain_and_unreachable(self, ray_session):
        # 1-2-3-4-5 chain plus disconnected 10-11
        edges = [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)]
        assert self._run(edges, [1], 3) == {1: 0, 2: 1, 3: 2, 4: 3}

    def test_multi_source_min(self, ray_session):
        # two seeds; node 3 is 2 hops from 1 but 1 hop from 4
        edges = [(1, 2), (2, 3), (3, 4), (4, 5)]
        assert self._run(edges, [1, 4], 4) == {
            1: 0, 4: 0, 2: 1, 3: 1, 5: 1,
        }

    def test_early_exit_on_converged_component(self, ray_session):
        # triangle converges after 1 hop; max_hops far larger
        edges = [(1, 2), (2, 3), (1, 3)]
        assert self._run(edges, [1], 50) == {1: 0, 2: 1, 3: 1}

    def test_duplicate_seeds_and_cycle(self, ray_session):
        edges = [(1, 2), (2, 3), (1, 3), (3, 4)]
        assert self._run(edges, [1, 1, 2], 2) == {
            1: 0, 2: 0, 3: 1, 4: 2,
        }

    def test_semi_join_path_matches_broadcast(self, ray_session):
        edges = [(1, 2), (2, 3), (3, 4), (4, 5), (5, 6)]
        a = self._run(edges, [1], 5)
        b = self._run(edges, [1], 5, frontier_broadcast_rows=0)
        assert a == b == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4, 6: 5}


class TestHits:
    """HITS integer e9 scores: broadcast path vs join path vs a
    from-first-principles numpy reference with identical quantization."""

    @staticmethod
    def _numpy_hits(src, dst, iterations=2):
        nodes = np.unique(np.concatenate([src, dst]))
        idx = {int(n): i for i, n in enumerate(nodes)}
        s = np.array([idx[int(v)] for v in src])
        d = np.array([idx[int(v)] for v in dst])
        n = len(nodes)
        hub = np.full(n, 10**9, dtype=np.int64)
        auth = np.zeros(n, dtype=np.int64)

        def step(scores, frm, to):
            raw = np.zeros(n, dtype=np.int64)
            np.add.at(raw, to, scores[frm])
            total = float(raw.sum())
            if total <= 0:
                return np.zeros(n, dtype=np.int64)
            return np.floor(raw.astype(np.float64) * 1e9 / total + 0.5).astype(
                np.int64
            )

        for _ in range(iterations):
            auth = step(hub, s, d)
            hub = step(auth, d, s)
        return nodes, auth, hub

    def _table(self, ds):
        df = ds.to_pandas().sort_values("node").reset_index(drop=True)
        return (
            df["node"].to_numpy(),
            df["auth_e9"].to_numpy(),
            df["hub_e9"].to_numpy(),
        )

    def test_matches_numpy_reference(self, ray_session):
        from ctinexus_ray.ops.graph import hits_scores

        rng = np.random.default_rng(7)
        src = rng.integers(0, 40, 300)
        dst = rng.integers(40, 70, 300)
        got = self._table(hits_scores(_edges(src, dst), iterations=2))
        want = self._numpy_hits(src, dst, iterations=2)
        np.testing.assert_array_equal(got[0], want[0])
        np.testing.assert_array_equal(got[1], want[1])
        np.testing.assert_array_equal(got[2], want[2])

    def test_join_path_matches_broadcast_path(self, ray_session):
        from ctinexus_ray.ops.graph import hits_scores

        rng = np.random.default_rng(11)
        src = rng.integers(0, 50, 400)
        dst = rng.integers(0, 50, 400)
        edges = _edges(src, dst)
        a = self._table(hits_scores(edges, iterations=2))
        b = self._table(hits_scores(edges, iterations=2, broadcast_max=0))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_bipartite_pure_roles(self, ray_session):
        """In a directed bipartite graph sources are pure hubs (auth 0)
        and sinks pure authorities (hub 0)."""
        from ctinexus_ray.ops.graph import hits_scores

        src = np.array([1, 1, 2, 3])
        dst = np.array([10, 11, 10, 11])
        nodes, auth, hub = self._table(hits_scores(_edges(src, dst)))
        is_src = nodes < 10
        assert (auth[is_src] == 0).all() and (hub[~is_src] == 0).all()
        # node 10 and 11 both get mass; hub 1 points at both
        assert auth[~is_src].sum() > 0 and hub[is_src].sum() > 0

    def test_star_authority_dominates(self, ray_session):
        from ctinexus_ray.ops.graph import hits_scores

        # everyone points at node 99; node 1 also points at 50
        src = np.array([1, 2, 3, 4, 1])
        dst = np.array([99, 99, 99, 99, 50])
        nodes, auth, hub = self._table(hits_scores(_edges(src, dst)))
        assert auth[nodes == 99][0] > auth[nodes == 50][0]
        assert hub[nodes == 1][0] >= hub[nodes == 2][0]

    def test_empty_edges(self, ray_session):
        from ctinexus_ray.ops.graph import hits_scores

        ds = hits_scores(_edges([], []), iterations=2)
        # Ray's to_pandas drops columns on zero-block datasets; the
        # schema is the contract here
        assert sorted(ds.schema().names) == ["auth_e9", "hub_e9", "node"]
        assert ds.count() == 0


def _canon_edges(a, b):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "a": pa.array(np.asarray(a, dtype=np.int64)),
                "b": pa.array(np.asarray(b, dtype=np.int64)),
            }
        )
    ).repartition(3)


class TestLinkPrediction:
    def test_square_with_diagonal(self, ray_session):
        """Square 1-2-3-4-1 plus diagonal 1-3 plus pendant 5 on 1:
        hand-computed CN / Adamic-Adar for every non-adjacent pair."""
        from ctinexus_ray.ops.graph import link_prediction

        edges = _canon_edges([1, 2, 3, 1, 1, 1], [2, 3, 4, 4, 3, 5])
        got = link_prediction(edges, top=10, num_partitions=4).take_all()
        rows = {(r["u"], r["v"]): (r["cn"], r["aa_u"]) for r in got}
        # degrees: 1->4, 2->2, 3->3, 4->2, 5->1
        w = lambda d: int(np.floor(1e9 / np.log(float(d)) + 0.5))
        assert rows == {
            (2, 4): (2, w(4) + w(3)),  # shared neighbors {1, 3}
            (2, 5): (1, w(4)),
            (3, 5): (1, w(4)),
            (4, 5): (1, w(4)),
        }
        # ordering: cn desc first
        assert (got[0]["u"], got[0]["v"]) == (2, 4)

    def test_adjacent_pairs_excluded(self, ray_session):
        from ctinexus_ray.ops.graph import link_prediction

        # triangle: every 2-path closes into an existing edge
        edges = _canon_edges([1, 1, 2], [2, 3, 3])
        assert link_prediction(edges, num_partitions=4).count() == 0

    def test_top_limit(self, ray_session):
        from ctinexus_ray.ops.graph import link_prediction

        # star around 0: all leaf pairs are candidates (cn=1)
        leaves = list(range(1, 12))
        edges = _canon_edges([0] * 11, leaves)
        got = link_prediction(edges, top=5, num_partitions=4).take_all()
        assert len(got) == 5
        # deterministic tie-break: (u, v) ascending
        assert [(r["u"], r["v"]) for r in got] == [
            (1, 2), (1, 3), (1, 4), (1, 5), (1, 6)
        ]


class TestLocalClustering:
    def test_square_with_diagonal(self, ray_session):
        from ctinexus_ray.ops.graph import local_clustering

        edges = _canon_edges([1, 2, 3, 1, 1, 1], [2, 3, 4, 4, 3, 5])
        got = {
            r["node"]: (r["tri"], r["deg"])
            for r in local_clustering(edges, num_partitions=4).take_all()
        }
        # triangles: (1,2,3) and (1,3,4); node 5 has deg 1 -> excluded
        assert got == {1: (2, 4), 2: (1, 2), 3: (2, 3), 4: (1, 2)}

    def test_triangle_free(self, ray_session):
        from ctinexus_ray.ops.graph import local_clustering

        # path 1-2-3-4: middle nodes have deg 2, tri 0
        edges = _canon_edges([1, 2, 3], [2, 3, 4])
        got = {
            r["node"]: (r["tri"], r["deg"])
            for r in local_clustering(edges, num_partitions=4).take_all()
        }
        assert got == {2: (0, 2), 3: (0, 2)}


class TestRandomWalks:
    def test_pinned_hash_parity(self, ray_session):
        """Walks follow sorted-neighbors[(w*A + t*B) mod deg] exactly —
        verified against a from-first-principles Python oracle."""
        from ctinexus_ray.ops.graph import _WALK_A, _WALK_B, random_walks

        a = [1, 2, 3, 2, 1]
        b = [2, 3, 4, 4, 4]
        out = random_walks(_canon_edges(a, b), walk_len=4, num_partitions=4)
        got = {
            (r["walk_id"], r["step"]): r["node"] for r in out.take_all()
        }
        sym: dict[int, list[int]] = {}
        for x, y in zip(a, b):
            sym.setdefault(x, []).append(y)
            sym.setdefault(y, []).append(x)
        for k in sym:
            sym[k].sort()
        for w in sym:
            assert got[(w, 0)] == w
            node = w
            for t in range(1, 5):
                nbrs = sym[node]
                node = nbrs[(w * _WALK_A + t * _WALK_B) % len(nbrs)]
                assert got[(w, t)] == node, (w, t)

    def test_walk_counts(self, ray_session):
        from ctinexus_ray.ops.graph import random_walks

        out = random_walks(
            _canon_edges([1, 2], [2, 3]), walk_len=2, num_partitions=4
        )
        # 3 nodes x (1 + 2 steps) rows
        assert out.count() == 9

    def test_id_overflow_guard(self, ray_session):
        import pytest

        from ctinexus_ray.ops.graph import random_walks

        big = 1 << 32
        with pytest.raises(Exception, match="2\\^31"):
            random_walks(
                _canon_edges([big], [big + 1]), walk_len=1, num_partitions=4
            ).materialize()


class TestWedgeOpsBruteForce:
    """link_prediction / local_clustering vs from-first-principles
    oracles on seeded pseudo-random graphs."""

    @staticmethod
    def _random_graph(seed: int, n: int = 18, m: int = 40):
        import hashlib

        edges = set()
        i = 0
        while len(edges) < m:
            h = hashlib.blake2b(f"{seed}:{i}".encode(), digest_size=8).digest()
            a = int.from_bytes(h[:4], "big") % n
            b = int.from_bytes(h[4:], "big") % n
            i += 1
            if a == b:
                continue
            edges.add((min(a, b), max(a, b)))
        return sorted(edges)

    def test_link_prediction_matches_bruteforce(self, ray_session):
        import math

        from ctinexus_ray.ops.graph import link_prediction

        for seed in [1, 2, 3]:
            edges = self._random_graph(seed)
            ds = _canon_edges([a for a, _ in edges], [b for _, b in edges])
            got = {
                (r["u"], r["v"]): (r["cn"], r["aa_u"])
                for r in link_prediction(ds, top=10**6, num_partitions=4).take_all()
            }
            adj: dict[int, set[int]] = {}
            for a, b in edges:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            want = {}
            nodes = sorted(adj)
            for i, u in enumerate(nodes):
                for v in nodes[i + 1 :]:
                    if v in adj[u]:
                        continue
                    common = adj[u] & adj[v]
                    if not common:
                        continue
                    aa = sum(
                        math.floor(1e9 / math.log(float(len(adj[c]))) + 0.5)
                        for c in common
                    )
                    want[(u, v)] = (len(common), aa)
            assert got == want, seed

    def test_local_clustering_matches_bruteforce(self, ray_session):
        from ctinexus_ray.ops.graph import local_clustering

        for seed in [4, 5]:
            edges = self._random_graph(seed)
            ds = _canon_edges([a for a, _ in edges], [b for _, b in edges])
            got = {
                r["node"]: (r["tri"], r["deg"])
                for r in local_clustering(ds, num_partitions=4).take_all()
            }
            adj: dict[int, set[int]] = {}
            eset = set(edges)
            for a, b in edges:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            want = {}
            for v, nb in adj.items():
                if len(nb) < 2:
                    continue
                nbs = sorted(nb)
                tri = sum(
                    1
                    for i, x in enumerate(nbs)
                    for y in nbs[i + 1 :]
                    if (x, y) in eset
                )
                want[v] = (tri, len(nb))
            assert got == want, seed

    def test_link_prediction_center_degree_cap(self, ray_session):
        """The opt-in celebrity cap drops wedges through high-degree
        centers only; default stays exact."""
        from ctinexus_ray.ops.graph import link_prediction

        # hub 0 connected to 1..6 (deg 6); besides, 1-2-3 path (deg<=3)
        a = [0] * 6 + [1, 2]
        b = list(range(1, 7)) + [2, 3]
        ds = _canon_edges(a, b)
        exact = link_prediction(ds, top=10**6, num_partitions=4).take_all()
        capped = link_prediction(
            ds, top=10**6, num_partitions=4, max_center_degree=3
        ).take_all()
        exact_pairs = {(r["u"], r["v"]) for r in exact}
        capped_pairs = {(r["u"], r["v"]) for r in capped}
        # pairs that exist ONLY via hub 0 disappear under the cap
        assert (4, 5) in exact_pairs and (4, 5) not in capped_pairs
        # pair (1, 3) goes via center 2 (deg 3) — survives
        assert (1, 3) in exact_pairs and (1, 3) in capped_pairs
        assert capped_pairs < exact_pairs


class TestBiasedRandomWalks:
    @staticmethod
    def _naive(edges, walk_len, p, q):
        from ctinexus_ray.ops.graph import _WALK_A, _WALK_B

        w_ret, w_mid, w_out = round(1000 / p), 1000, round(1000 / q)
        sym: dict[int, list[int]] = {}
        eset = set()
        for a, b in edges:
            sym.setdefault(a, []).append(b)
            sym.setdefault(b, []).append(a)
            eset.add((min(a, b), max(a, b)))
        for k in sym:
            sym[k].sort()
        out = {}
        for w in sym:
            prev, cur = -1, w
            out[(w, 0)] = w
            for t in range(1, walk_len + 1):
                nbrs = sym[cur]
                if prev == -1:
                    wts = [1] * len(nbrs)
                else:
                    wts = [
                        w_ret
                        if n == prev
                        else w_mid
                        if (min(n, prev), max(n, prev)) in eset
                        else w_out
                        for n in nbrs
                    ]
                total = sum(wts)
                draw = (w * _WALK_A + t * _WALK_B) % total
                acc = 0
                for n, wt in zip(nbrs, wts):
                    acc += wt
                    if acc > draw:
                        pick = n
                        break
                out[(w, t)] = pick
                prev, cur = cur, pick
        return out

    def _run(self, edges, walk_len, p, q):
        from ctinexus_ray.ops.graph import biased_random_walks

        ds = _canon_edges([a for a, _ in edges], [b for _, b in edges])
        got = biased_random_walks(
            ds, walk_len=walk_len, p=p, q=q, num_partitions=4
        ).take_all()
        return {(r["walk_id"], r["step"]): r["node"] for r in got}

    def test_matches_naive_oracle(self, ray_session):
        edges = [(1, 2), (2, 3), (3, 4), (2, 4), (1, 5), (4, 5), (1, 3)]
        for p, q in [(1.0, 1.0), (4.0, 0.25), (0.25, 4.0)]:
            got = self._run(edges, 4, p, q)
            want = self._naive(edges, 4, p, q)
            assert got == want, (p, q)

    def test_seeded_random_graph(self, ray_session):
        edges = TestWedgeOpsBruteForce._random_graph(9, n=14, m=26)
        got = self._run(edges, 3, 2.0, 0.5)
        want = self._naive(edges, 3, 2.0, 0.5)
        assert got == want

    def test_param_validation(self, ray_session):
        import pytest

        from ctinexus_ray.ops.graph import biased_random_walks

        with pytest.raises(ValueError):
            biased_random_walks(_canon_edges([1], [2]), p=0.0)

    def test_extreme_pq_refused(self, ray_session):
        """p/q large enough to zero a milli-weight would silently
        corrupt the vectorized pick (int % 0) — refuse loudly."""
        import pytest

        from ctinexus_ray.ops.graph import biased_random_walks

        with pytest.raises(ValueError, match="<= 2000"):
            biased_random_walks(_canon_edges([1], [2]), p=3000.0)
        with pytest.raises(ValueError, match="<= 2000"):
            biased_random_walks(_canon_edges([1], [2]), q=5000.0)


class TestLpaCommunities:
    def _edges(self, pairs):
        import pyarrow as pa

        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "a": pa.array([p[0] for p in pairs], type=pa.int64()),
                    "b": pa.array([p[1] for p in pairs], type=pa.int64()),
                }
            )
        )

    @staticmethod
    def _brute_lpa(pairs, rounds):
        """From-first-principles synchronous LPA: most-frequent neighbor
        label, tie -> smallest label, all nodes update simultaneously."""
        from collections import Counter, defaultdict

        adj = defaultdict(list)
        for a, b in pairs:
            adj[a].append(b)
            adj[b].append(a)
        labels = {n: n for n in adj}
        for _ in range(rounds):
            new = {}
            for n, nbrs in adj.items():
                cnt = Counter(labels[m] for m in nbrs)
                best = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
                new[n] = best[0]
            labels = new
        return labels

    def _run(self, pairs, rounds):
        from ctinexus_ray.ops.graph import lpa_communities

        out = lpa_communities(
            self._edges(pairs), rounds=rounds, num_partitions=4
        ).take_all()
        return {r["node"]: r["label"] for r in out}

    def test_two_cliques_with_bridge(self, ray_session):
        clique1 = [(0, 1), (0, 2), (1, 2)]
        clique2 = [(10, 11), (10, 12), (11, 12)]
        pairs = clique1 + clique2 + [(2, 10)]
        for rounds in (1, 2, 4):
            assert self._run(pairs, rounds) == self._brute_lpa(pairs, rounds)
        final = self._run(pairs, 4)
        # the two triangles settle into distinct communities
        assert final[0] == final[1] == final[2]
        assert final[10] == final[11] == final[12]
        assert final[0] != final[10]

    def test_random_graph_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(7)
        pairs = set()
        while len(pairs) < 120:
            a, b = rng.randint(0, 40, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        pairs = sorted(pairs)
        for rounds in (1, 3):
            assert self._run(pairs, rounds) == self._brute_lpa(pairs, rounds)

    def test_star_collapses_to_hub_label(self, ray_session):
        # spokes see only the hub; hub sees all spokes (each labeled
        # uniquely round 1 -> tie -> smallest spoke id)
        pairs = [(5, s) for s in (1, 2, 3, 4)]
        got = self._run(pairs, 1)
        assert got == {5: 1, 1: 5, 2: 5, 3: 5, 4: 5}

    def test_empty_edges(self, ray_session):
        from ctinexus_ray.ops.graph import lpa_communities

        assert lpa_communities(self._edges([]), rounds=2).take_all() == []

    def test_hash_join_path_matches_broadcast(self, ray_session):
        # force the streaming path; results must be identical
        from ctinexus_ray.ops.graph import lpa_communities

        pairs = [(0, 1), (0, 2), (1, 2), (10, 11), (2, 10)]
        a = lpa_communities(
            self._edges(pairs), rounds=3, num_partitions=4
        ).take_all()
        b = lpa_communities(
            self._edges(pairs), rounds=3, num_partitions=4,
            label_broadcast_rows=0,
        ).take_all()
        key = lambda rows: sorted((r["node"], r["label"]) for r in rows)
        assert key(a) == key(b)


class TestPersonalizedPagerank:
    @staticmethod
    def _numpy_ppr(src, dst, seeds, damping=0.85, iterations=3):
        nodes = np.unique(np.concatenate([src, dst]))
        idx = {int(n): i for i, n in enumerate(nodes)}
        s = np.array([idx[int(v)] for v in src])
        d = np.array([idx[int(v)] for v in dst])
        n = len(nodes)
        outdeg = np.zeros(n)
        np.add.at(outdeg, s, 1.0)
        p = np.zeros(n)
        for sd in seeds:
            if sd in idx:
                p[idx[sd]] = 1.0 / len(seeds)
        rank = p.copy()
        for _ in range(iterations):
            contrib = np.zeros(n)
            np.add.at(contrib, d, rank[s] / outdeg[s])
            tot = contrib.sum()
            rank = (1 - damping) * p + damping * contrib + (
                damping * (1.0 - tot)
            ) * p
        return nodes, rank

    def test_matches_numpy(self, ray_session):
        from ctinexus_ray.ops.graph import pagerank_joins

        rng = np.random.RandomState(17)
        src = rng.randint(0, 60, 400)
        dst = rng.randint(0, 60, 400)
        keep = src != dst
        src, dst = src[keep], dst[keep]
        seeds = [0, 1, 2, 99]  # 99 absent from the graph: teleport lost
        want_nodes, want = self._numpy_ppr(src, dst, seeds)
        got = pagerank_joins(
            _edges(src, dst), iterations=3, num_partitions=4, seeds=seeds
        ).to_pandas().sort_values("node")
        assert np.array_equal(got["node"].to_numpy(), want_nodes)
        assert np.allclose(got["rank"].to_numpy(), want, rtol=1e-9, atol=1e-12)
        # mass concentrates near seeds: every present seed outranks the median
        med = np.median(want)
        for sd in (0, 1, 2):
            assert got.set_index("node")["rank"][sd] > med

    def test_empty_seeds_rejected(self, ray_session):
        from ctinexus_ray.ops.graph import pagerank_joins

        import pytest

        with pytest.raises(ValueError, match="non-empty"):
            pagerank_joins(_edges([0], [1]), seeds=[])

    def test_duplicate_seeds_rejected(self, ray_session):
        from ctinexus_ray.ops.graph import pagerank_joins

        import pytest

        with pytest.raises(ValueError, match="duplicate"):
            pagerank_joins(_edges([0], [1]), seeds=[3, 3])


class TestBetweennessSampled:
    """k-bounded sampled Brandes vs an independent sequential reference
    with the identical integer floor-division dependency rule."""

    @staticmethod
    def _naive(pairs, sources, max_hops, scale=1_000_000_000):
        from collections import defaultdict

        adj = defaultdict(set)
        for a, b in pairs:
            adj[a].add(b)
            adj[b].add(a)
        out = defaultdict(int)
        for s in sources:
            dist = {s: 0}
            sigma = {s: 1}
            levels = [[s]]
            for d in range(1, max_hops + 1):
                nxt = {}
                for u in levels[d - 1]:
                    for w in adj[u]:
                        if w in dist:
                            continue
                        nxt[w] = nxt.get(w, 0) + sigma[u]
                for w, sg in nxt.items():
                    dist[w] = d
                    sigma[w] = sg
                levels.append(sorted(nxt))
            delta = {}
            for d in range(max_hops - 1, 0, -1):
                for v in levels[d]:
                    acc = 0
                    for w in adj[v]:
                        if dist.get(w) == d + 1:
                            acc += (sigma[v] * (scale + delta.get(w, 0))) // sigma[w]
                    if acc:
                        delta[v] = acc
            for v, dd in dist.items():
                if dd >= 1:
                    out[v] += delta.get(v, 0)
        return dict(out)

    def _run(self, pairs, sources, max_hops):
        import pyarrow as pa

        import ray

        from ctinexus_ray.ops.graph import betweenness_sampled

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([a for a, _ in pairs], type=pa.int64()),
                    "b": pa.array([b for _, b in pairs], type=pa.int64()),
                }
            )
        )
        got = betweenness_sampled(
            edges, sources, max_hops=max_hops, num_partitions=16
        ).take_all()
        return {r["node"]: r["betweenness_u"] for r in got}

    def test_path_graph(self, ray_session):
        # 0-1-2-3-4: from source 0, node 1 and 2 lie on all deeper paths
        pairs = [(0, 1), (1, 2), (2, 3), (3, 4)]
        got = self._run(pairs, [0], 3)
        assert got == self._naive(pairs, [0], 3)
        # node 1 carries dependency from levels 2 and 3
        assert got[1] > got[2] > 0

    def test_diamond_sigma_split(self, ray_session):
        # 0->{1,2}->3: two shortest paths, each mid node gets half
        pairs = [(0, 1), (0, 2), (1, 3), (2, 3)]
        got = self._run(pairs, [0], 3)
        naive = self._naive(pairs, [0], 3)
        assert got == naive
        assert got[1] == got[2] == 500_000_000  # sigma_v/sigma_w = 1/2

    def test_random_graph_multi_source(self, ray_session):
        import random

        rng = random.Random(11)
        nodes = list(range(30))
        pairs = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.choice(nodes), rng.choice(nodes)) for _ in range(60)
                )
                if a != b
            }
        )
        sources = [0, 1, 2]
        got = self._run(pairs, sources, 3)
        assert got == self._naive(pairs, sources, 3)

    def test_distributed_fallback_matches_broadcast(self, ray_session):
        """frontier_broadcast_rows=0 forces the forward join path; the
        result must be identical to the broadcast fast path."""
        import pyarrow as pa

        import ray

        from ctinexus_ray.ops.graph import betweenness_sampled

        pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4), (1, 4)]
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([a for a, _ in pairs], type=pa.int64()),
                    "b": pa.array([b for _, b in pairs], type=pa.int64()),
                }
            )
        )
        fast = {
            (r["node"], r["betweenness_u"])
            for r in betweenness_sampled(edges, [0, 4], max_hops=3).take_all()
        }
        # NOTE: backward pass still requires the broadcast (it refuses
        # loudly above the cap), so only the forward fallback is forced
        slow = {
            (r["node"], r["betweenness_u"])
            for r in betweenness_sampled(
                edges, [0, 4], max_hops=3, frontier_broadcast_rows=9
            ).take_all()
        }
        assert fast == slow

    def test_large_node_ids(self, ray_session):
        """Node ids above 2^19 work (src is the sample index); ids
        above 2^44 refuse loudly."""
        import pyarrow as pa

        import ray

        from ctinexus_ray.ops.graph import betweenness_sampled

        base = 1 << 30
        pairs = [(base, base + 1), (base + 1, base + 2)]
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([a for a, _ in pairs], type=pa.int64()),
                    "b": pa.array([b for _, b in pairs], type=pa.int64()),
                }
            )
        )
        got = {
            r["node"]: r["betweenness_u"]
            for r in betweenness_sampled(edges, [base], max_hops=3).take_all()
        }
        assert got[base + 1] == 1_000_000_000  # sole middle node


class TestSsspBounded:
    """Bounded weighted shortest paths vs a sequential Bellman-Ford."""

    @staticmethod
    def _naive(pairs, sources, rounds):
        import collections

        adj = collections.defaultdict(list)
        for a, b, w in pairs:
            adj[a].append((b, w))
            adj[b].append((a, w))
        per_node = {}
        for si, s in enumerate(sources):
            dist = {s: 0}
            for _ in range(rounds):
                snapshot = dict(dist)
                for u, du in snapshot.items():
                    for v, w in adj[u]:
                        nd = du + w
                        if nd < dist.get(v, nd + 1):
                            dist[v] = nd
            for v, dv in dist.items():
                best, n = per_node.get(v, (None, 0))
                per_node[v] = (dv if best is None else min(best, dv), n + 1)
        return {v: (d, n) for v, (d, n) in per_node.items()}

    def _run(self, pairs, sources, rounds):
        import pyarrow as pa

        import ray

        from ctinexus_ray.ops.graph import sssp_bounded

        edges = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([a for a, _, _ in pairs], type=pa.int64()),
                    "b": pa.array([b for _, b, _ in pairs], type=pa.int64()),
                    "w": pa.array([w for _, _, w in pairs], type=pa.int64()),
                }
            )
        )
        got = sssp_bounded(edges, sources, max_rounds=rounds).take_all()
        return {r["node"]: (r["best_dist"], r["n_sources"]) for r in got}

    def test_weighted_beats_hops(self, ray_session):
        # 0-1-2 with cheap weights vs a heavy direct 0-2 edge
        pairs = [(0, 1, 1), (1, 2, 1), (0, 2, 5)]
        got = self._run(pairs, [0], 3)
        assert got == self._naive(pairs, [0], 3)
        assert got[2][0] == 2  # via two hops, not the weight-5 edge

    def test_round_bound_truncates(self, ray_session):
        # one round cannot see node 2 through 0-1-2
        pairs = [(0, 1, 1), (1, 2, 1)]
        got = self._run(pairs, [0], 1)
        assert 2 not in got
        assert got[1][0] == 1

    def test_random_multi_source(self, ray_session):
        import random

        rng = random.Random(5)
        pairs = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(25), rng.randrange(25)) for _ in range(50)
                )
                if a != b
            }
        )
        pairs = [(a, b, (a * 7 + b) % 5 + 1) for a, b in pairs]
        got = self._run(pairs, [0, 1, 2], 3)
        assert got == self._naive(pairs, [0, 1, 2], 3)

    def test_negative_weight_refuses(self, ray_session):
        import pytest as _pytest

        with _pytest.raises(Exception, match="negative"):
            self._run([(0, 1, -1)], [0], 2)

    def test_join_fallback_matches_broadcast(self, ray_session):
        # drive the distance table past dist_broadcast_rows so every
        # round after the first relaxes via the distributed hash join,
        # and require distances identical to the broadcast path
        import random

        import pyarrow as pa
        import ray

        from ctinexus_ray.ops.graph import sssp_bounded

        rng = random.Random(11)
        pairs = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in (
                    (rng.randrange(30), rng.randrange(30)) for _ in range(70)
                )
                if a != b
            }
        )
        pairs = [(a, b, (a * 3 + b) % 4 + 1) for a, b in pairs]
        edges = ray.data.from_arrow(
            pa.table(
                {
                    "a": pa.array([a for a, _, _ in pairs], type=pa.int64()),
                    "b": pa.array([b for _, b, _ in pairs], type=pa.int64()),
                    "w": pa.array([w for _, _, w in pairs], type=pa.int64()),
                }
            )
        )
        sources = [0, 1, 2, 3]

        def run(cap):
            got = sssp_bounded(
                edges, sources, max_rounds=3, dist_broadcast_rows=cap
            ).take_all()
            return {
                r["node"]: (r["best_dist"], r["n_sources"]) for r in got
            }

        broadcast = run(4_000_000)
        joined = run(2)  # past the cap from round 2 onward
        assert joined == broadcast
        assert joined == self._naive(pairs, sources, 3)
