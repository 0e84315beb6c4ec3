"""Tests for the corpus-level training-data ops (dedup family, similarity
search, text stats, multimodal plumbing) against local DuckDB / numpy
oracles on the driver's sf0.001 tables."""

from __future__ import annotations

import duckdb
import numpy as np
import pytest
import ray.data

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')")
    c.execute(f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')")
    return c


@pytest.fixture(scope="module")
def docs(ray_session):
    return ray.data.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])


@pytest.fixture(scope="module")
def embeddings(ray_session):
    return ray.data.read_parquet(f"{SF}/embeddings.parquet")


class TestExactDedup:
    def test_vs_duckdb(self, docs, con):
        from ctinexus_ray.ops.dedup import exact_dedup_groups

        got = {
            (r["doc_id"], r["n_dups"]) for r in exact_dedup_groups(docs).take_all()
        }
        want = set(
            con.sql(
                "SELECT min(doc_id), count(*) FROM documents GROUP BY text"
            ).fetchall()
        )
        assert got == want


class TestMinHash:
    def test_finds_planted_near_dups(self, ray_session):
        from ctinexus_ray.ops.dedup import minhash_dedup_pairs

        base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliett kilo lima mike november oscar papa quebec romeo")
        rows = [
            {"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base + " sierra"},          # near-dup of 0
            {"doc_id": 2, "text": "completely different words entirely here "
                                   "nothing shared at all with the others ok"},
        ]
        ds = ray.data.from_items(rows)
        pairs = {(r["a"], r["b"]) for r in minhash_dedup_pairs(ds, threshold=0.5).take_all()}
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs

    def test_signature_deterministic(self):
        from ctinexus_ray.ops.dedup import MinHashStage

        stage = MinHashStage()
        a = stage.signature("some text for hashing")
        b = MinHashStage().signature("some text for hashing")
        assert (a == b).all()


class TestSimHash:
    def test_similar_docs_close(self, ray_session):
        from ctinexus_ray.ops.dedup import simhash_signatures

        base = "the quick brown fox jumps over the lazy dog again and again"
        ds = ray.data.from_items(
            [
                {"doc_id": 0, "text": base},
                {"doc_id": 1, "text": base + " daily"},
                {"doc_id": 2, "text": "zebra xylophone quartz jigsaw vortex "
                                       "plasma nebula krypton osmium iridium"},
            ]
        )
        sigs = {r["doc_id"]: r["simhash"] for r in simhash_signatures(ds).take_all()}
        d01 = bin(sigs[0] ^ sigs[1]).count("1")
        d02 = bin(sigs[0] ^ sigs[2]).count("1")
        assert d01 < d02


class TestSimHashPairs:
    def test_banded_hamming_pairs(self, ray_session):
        from ctinexus_ray.ops.dedup import simhash_dup_pairs

        base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliett " * 8).strip()
        ds = ray.data.from_items(
            [
                {"doc_id": 0, "text": base},
                {"doc_id": 1, "text": base + " mike"},       # hamming ~8
                {"doc_id": 2, "text": "unrelated totally different words " * 10},
            ]
        )
        # short word-bag docs sit farther apart in hamming space than real
        # web pages; use fine banding (16 chunks -> guarantee up to 15)
        pairs = {
            (r["a"], r["b"])
            for r in simhash_dup_pairs(ds, max_hamming=10, chunks=16).take_all()
        }
        assert (0, 1) in pairs
        assert (0, 2) not in pairs and (1, 2) not in pairs


class TestNgramJaccard:
    def test_vs_duckdb(self, docs, con):
        from ctinexus_ray.ops.dedup import ngram_jaccard_pairs

        got = {
            (r["a"], r["b"])
            for r in ngram_jaccard_pairs(
                docs, n=3, threshold=0.5, max_posting=10**9
            ).take_all()
        }
        want = set(
            con.sql(
                """
                WITH words AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS w FROM documents),
                eligible AS (SELECT * FROM words WHERE len(w) >= 3),
                shingles AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS shingle
                  FROM eligible CROSS JOIN LATERAL (SELECT unnest(generate_series(1, len(w)-2)) AS i) t),
                sizes AS (SELECT doc_id, count(*) AS sz FROM shingles GROUP BY doc_id),
                inter AS (SELECT s1.doc_id AS a, s2.doc_id AS b, count(*) AS ix
                  FROM shingles s1 JOIN shingles s2 ON s1.shingle = s2.shingle AND s1.doc_id < s2.doc_id
                  GROUP BY 1, 2)
                SELECT a, b FROM inter
                JOIN sizes sa ON sa.doc_id = inter.a JOIN sizes sb ON sb.doc_id = inter.b
                WHERE CAST(ix AS DOUBLE) / (sa.sz + sb.sz - ix) >= 0.5
                """
            ).fetchall()
        )
        assert got == want


class TestEmbeddingOps:
    def test_neardup_vs_numpy(self, embeddings):
        from ctinexus_ray.ops.dedup import embedding_dup_pairs

        rows = embeddings.take_all()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        sims = matn @ matn.T
        want = {
            (int(ids[i]), int(ids[j]))
            for i in range(len(ids))
            for j in range(len(ids))
            if ids[i] < ids[j] and sims[i, j] >= 0.35
        }
        got = {
            (r["a"], r["b"])
            for r in embedding_dup_pairs(embeddings, threshold=0.35).take_all()
        }
        assert got == want

    def test_topk_vs_numpy(self, embeddings):
        from ctinexus_ray.ops.simsearch import self_topk

        rows = embeddings.take_all()
        ids = np.array([r["vec_id"] for r in rows])
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        matn = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        got = {}
        for r in self_topk(embeddings, n_queries=5, k=3).take_all():
            got[(r["query_id"], r["rank"])] = r["neighbor_id"]
        for q in range(5):
            qi = int(np.nonzero(ids == q)[0][0])
            sims = matn[qi] @ matn.T
            order = sorted(
                ((float(sims[j]), int(ids[j])) for j in range(len(ids)) if ids[j] != q),
                key=lambda t: (-t[0], t[1]),
            )[:3]
            for rank, (_, nid) in enumerate(order, 1):
                assert got[(q, rank)] == nid

    def test_lsh_buckets_deterministic(self, embeddings):
        from ctinexus_ray.ops.dedup import embedding_lsh_buckets

        a = {r["vec_id"]: r["bucket"] for r in embedding_lsh_buckets(embeddings).take_all()}
        b = {r["vec_id"]: r["bucket"] for r in embedding_lsh_buckets(embeddings).take_all()}
        assert a == b

    def test_lsh_neardup_subset_of_exact(self, embeddings):
        """Bucketed near-dup (scale path) finds a subset of the exact
        brute-force pairs — approximate, never spurious."""
        from ctinexus_ray.ops.dedup import embedding_dup_pairs, embedding_dup_pairs_lsh

        exact = {
            (r["a"], r["b"])
            for r in embedding_dup_pairs(embeddings, threshold=0.35).take_all()
        }
        approx = {
            (r["a"], r["b"])
            for r in embedding_dup_pairs_lsh(
                embeddings, threshold=0.35, n_planes=4
            ).take_all()
        }
        assert approx <= exact
        assert approx  # finds at least something at 4 planes

    def test_ivf_full_probe_equals_exact(self, embeddings):
        """IVF with n_probe == n_centroids degenerates to brute force."""
        from ctinexus_ray.ops.simsearch import ivf_topk, self_topk

        exact = {
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in self_topk(embeddings, n_queries=5, k=3).take_all()
        }
        full = {
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in ivf_topk(
                embeddings, n_queries=5, k=3, n_centroids=8, n_probe=8
            ).take_all()
        }
        assert full == exact

    def test_ivf_partial_probe_recall(self, embeddings):
        from ctinexus_ray.ops.simsearch import ivf_topk, self_topk

        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in self_topk(embeddings, n_queries=5, k=3).take_all()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in ivf_topk(
                embeddings, n_queries=5, k=3, n_centroids=8, n_probe=3
            ).take_all()
        }
        assert len(exact & approx) / len(exact) >= 0.5

    def test_multi_table_lsh_recall_improves(self, embeddings):
        from ctinexus_ray.ops.simsearch import lsh_topk, self_topk

        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in self_topk(embeddings, n_queries=5, k=3).take_all()
        }
        recalls = []
        for n_tables in (1, 8):
            approx = {
                (r["query_id"], r["neighbor_id"])
                for r in lsh_topk(
                    embeddings, n_queries=5, k=3, n_planes=4, n_tables=n_tables
                ).take_all()
            }
            recalls.append(len(exact & approx) / len(exact))
        assert recalls[1] >= recalls[0]
        assert recalls[1] >= 0.5


class TestTextStats:
    def test_token_counts_vs_duckdb(self, docs, con):
        from ctinexus_ray.ops.textstats import token_count_batch

        got = {
            (r["doc_id"], r["n_tokens"])
            for r in docs.map_batches(token_count_batch, batch_format="pyarrow").take_all()
        }
        want = set(
            con.sql(
                "SELECT doc_id, len(regexp_split_to_array(trim(text), '\\s+')) FROM documents"
            ).fetchall()
        )
        assert got == want

    def test_fingerprints_vs_duckdb(self, docs, con):
        from ctinexus_ray.ops.textstats import fingerprint_batch

        got = {
            (r["doc_id"], r["fp"])
            for r in docs.map_batches(fingerprint_batch, batch_format="pyarrow").take_all()
        }
        want = set(
            con.sql("SELECT doc_id, md5(lower(trim(text))) FROM documents").fetchall()
        )
        assert got == want

    def test_langid_shape(self, docs):
        from ctinexus_ray.ops.textstats import langid_batch

        rows = docs.map_batches(langid_batch, batch_format="pyarrow").take_all()
        assert len(rows) == docs.count()
        assert all(r["lang_pred"] in {"en", "es", "de", "fr", "und"} for r in rows)

    def test_unigram_lm_scores(self, ray_session):
        import math

        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import unigram_lm_scores

        # corpus: "a a b" + "b c" -> counts a=2 b=2 c=1, N=5
        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": [1, 2], "text": ["a a b", "b c"]}
            )
        )
        got = {
            r["doc_id"]: (r["n_tokens"], r["lm_score"])
            for r in unigram_lm_scores(docs).take_all()
        }
        # per-word log-probs quantized to integer micro-nats (see op
        # docstring): sums are exact BIGINTs, mean = one division
        lp = {
            w: math.floor(math.log(c / 5) * 1e6 + 0.5)
            for w, c in {"a": 2, "b": 2, "c": 1}.items()
        }
        assert got[1][0] == 3
        assert got[1][1] == (2 * lp["a"] + lp["b"]) / 1e6 / 3
        assert got[2][0] == 2
        assert got[2][1] == (lp["b"] + lp["c"]) / 1e6 / 2


class TestMultimodal:
    def test_decode_plumbing(self, ray_session):
        from ctinexus_ray.ops.multimodal import decode_features, make_fake_media_table

        media = ray.data.from_arrow(make_fake_media_table(30))
        feats = decode_features(media, fake=True).take_all()
        assert len(feats) == 30
        assert all(len(r["features"]) == 16 for r in feats)

    def test_real_decoder_not_available(self):
        from ctinexus_ray.ops.multimodal import DecodeImageStage

        with pytest.raises(NotImplementedError):
            DecodeImageStage(fake=False)

    def test_frame_sampling(self, ray_session):
        import pyarrow as pa

        from ctinexus_ray.ops.multimodal import FrameSampleStage, make_fake_media_table

        stage = FrameSampleStage(every_ms=1000, fake=True)
        out = stage(make_fake_media_table(30))
        assert isinstance(out, pa.Table)
        # only video rows produce frames
        assert out.num_rows > 0


class TestBpeAndWinnow:
    def test_bpe_counts_vs_duckdb(self, docs, con):
        from ctinexus_ray.ops.textstats import BPE_PATTERN, bpe_token_count_batch

        got = {
            (r["doc_id"], r["n_bpe_tokens"])
            for r in docs.map_batches(
                bpe_token_count_batch, batch_format="pyarrow"
            ).take_all()
        }
        want = set(
            con.execute(
                "SELECT doc_id, len(regexp_extract_all(text, ?)) FROM documents",
                [BPE_PATTERN],
            ).fetchall()
        )
        assert got == want

    def test_winnow_vs_naive_reference(self):
        from ctinexus_ray.ops.textstats import (
            _WINNOW_BASE,
            _WINNOW_MOD,
            winnow_fingerprints,
        )

        def naive(text, k, w):
            data = text.lower().encode()
            h = [
                sum(
                    b * pow(_WINNOW_BASE, k - 1 - j, _WINNOW_MOD)
                    for j, b in enumerate(data[i : i + k])
                )
                % _WINNOW_MOD
                for i in range(len(data) - k + 1)
            ]
            if not h:
                return []
            if len(h) <= w:
                m = min(h)
                return [(max(i for i, v in enumerate(h) if v == m), m)]
            out, last = [], -1
            for s in range(len(h) - w + 1):
                window = h[s : s + w]
                m = min(window)
                pos = s + max(i for i, v in enumerate(window) if v == m)
                if pos != last:
                    out.append((pos, m))
                    last = pos
            return out

        for text in ["", "ab", "aaaaaaaa", "The quick brown fox", "x y z " * 40]:
            assert winnow_fingerprints(text, 5, 4) == naive(text, 5, 4)

    def test_winnow_shift_robust(self):
        """Winnowing guarantee: any shared substring of length >= w+k-1
        contributes at least one common fingerprint."""
        from ctinexus_ray.ops.textstats import winnow_fingerprints

        core = "the quick brown fox jumps over the lazy dog"
        a = {fp for _, fp in winnow_fingerprints("PREFIX " + core)}
        b = {fp for _, fp in winnow_fingerprints(core + " SUFFIX")}
        assert a & b


class TestStarPairMode:
    def test_star_components_match_all_pairs(self, ray_session):
        """Star edges must produce the same union-find components as the
        all-pairs candidate set (they span the same buckets)."""
        from ctinexus_ray.ops.dedup import minhash_candidate_pairs, resolve_dup_groups

        base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliett kilo lima mike november oscar papa quebec romeo")
        rows = [
            {"doc_id": 0, "text": base},
            {"doc_id": 1, "text": base + " sierra"},
            {"doc_id": 2, "text": base + " tango"},
            {"doc_id": 3, "text": "totally different content with nothing "
                                   "shared at all among the other documents"},
        ]
        ds = ray.data.from_items(rows)

        def components(pairs_ds):
            mapping = resolve_dup_groups(pairs_ds)
            return {doc: surv for doc, surv in mapping.items()}

        all_mode = components(minhash_candidate_pairs(ds, pair_mode="all"))
        star_mode = components(minhash_candidate_pairs(ds, pair_mode="star"))
        assert all_mode == star_mode
        assert 3 not in all_mode  # unrelated doc stays out

    def test_star_is_subset_of_all(self, ray_session):
        from ctinexus_ray.ops.dedup import minhash_candidate_pairs

        rows = [
            {"doc_id": i, "text": "common shared text body for everyone here "
                                   "plus suffix " + ("x" * (i % 2))}
            for i in range(6)
        ]
        ds = ray.data.from_items(rows)
        all_pairs = {(r["a"], r["b"]) for r in minhash_candidate_pairs(ds, pair_mode="all").take_all()}
        star = {(r["a"], r["b"]) for r in minhash_candidate_pairs(ds, pair_mode="star").take_all()}
        assert star <= all_pairs


class TestTopkTieBreaks:
    def test_tied_sims_prefer_lower_neighbor_id(self, ray_session):
        """With many identical vectors the k-cut boundary is all ties —
        the (sim desc, neighbor_id asc) rule must pick the lowest ids."""
        import pyarrow as pa

        from ctinexus_ray.ops.simsearch import brute_force_topk, ivf_topk

        vec = [1.0, 0.0, 0.0]
        n = 12
        tbl = pa.Table.from_pydict(
            {
                "vec_id": pa.array(list(range(n)), type=pa.int64()),
                "embedding": pa.array([vec] * n, type=pa.list_(pa.float64())),
            }
        )
        ds = ray.data.from_arrow(tbl).repartition(4)
        import numpy as np

        got = [
            r["neighbor_id"]
            for r in sorted(
                brute_force_topk(ds, [0], np.array([vec]), k=5).take_all(),
                key=lambda r: r["rank"],
            )
        ]
        assert got == [1, 2, 3, 4, 5]

        got_ivf = [
            r["neighbor_id"]
            for r in sorted(
                ivf_topk(ds, n_queries=1, k=5, n_centroids=2, n_probe=2).take_all(),
                key=lambda r: r["rank"],
            )
        ]
        assert got_ivf == [1, 2, 3, 4, 5]


class TestMinHashKeepDistributed:
    def test_keep_matches_driver_union_find(self, ray_session):
        """The fully-distributed keep path (hash-join verify -> distributed
        connected components -> anti-join) must reproduce the driver-side
        union-find survivors exactly."""
        from ctinexus_ray.ops.dedup import (
            minhash_dedup_keep,
            minhash_dedup_pairs,
            resolve_dup_groups,
        )

        base = ("alpha bravo charlie delta echo foxtrot golf hotel india "
                "juliett kilo lima mike november oscar papa quebec romeo")
        rows = []
        for i in range(30):
            fam = i % 5
            text = (
                f"family {fam} " + base + f" suffix{fam}"
                if fam < 3
                else f"unique document {i} with its own words "
                + " ".join(f"tok{i}_{j}" for j in range(20))
            )
            rows.append({"doc_id": i, "text": text})
        ds = ray.data.from_items(rows)

        pairs = minhash_dedup_pairs(ds, threshold=0.5, num_partitions=8)
        mapping = resolve_dup_groups(pairs)
        want = sorted(
            i for i in range(30) if mapping.get(i, i) == i
        )
        got = sorted(
            r["doc_id"]
            for r in minhash_dedup_keep(
                ds, threshold=0.5, num_partitions=8
            ).take_all()
        )
        assert got == want
        assert len(got) < 30  # the planted families actually deduped

    def test_keep_all_unique_corpus(self, ray_session):
        from ctinexus_ray.ops.dedup import minhash_dedup_keep

        rows = [
            {
                "doc_id": i,
                "text": " ".join(f"only{i}word{j}" for j in range(15)),
            }
            for i in range(10)
        ]
        ds = ray.data.from_items(rows)
        got = sorted(
            r["doc_id"]
            for r in minhash_dedup_keep(ds, threshold=0.5, num_partitions=8).take_all()
        )
        assert got == list(range(10))


class TestPMI:
    def test_matches_hand_computation(self, ray_session):
        import math
        from collections import Counter

        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import pmi_top_bigrams

        texts = [
            "a b a b c",
            "a b x y",
            "b c a b",
            "x y x y a b",
        ] * 3
        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"doc_id": list(range(len(texts))), "text": texts})
        ).repartition(3)
        # hand oracle
        wc: Counter = Counter()
        bc: Counter = Counter()
        nt = 0
        npairs = 0
        for t in texts:
            ws = t.split()
            wc.update(ws)
            nt += len(ws)
            for x, y in zip(ws, ws[1:]):
                bc[(x, y)] += 1
                npairs += 1
        expect = []
        for (x, y), n_ab in bc.items():
            if n_ab >= 3:
                pmi = math.log(
                    (n_ab / npairs) / ((wc[x] / nt) * (wc[y] / nt))
                )
                expect.append((f"{x} {y}", n_ab, pmi))
        expect.sort(key=lambda r: (-r[2], r[0]))
        got = [
            (r["bigram"], r["n_ab"], r["pmi"])
            for r in pmi_top_bigrams(ds, min_count=3, top=10)
            .take_all()
        ]
        assert got == expect[:10]

    def test_min_count_filters(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import pmi_top_bigrams

        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"doc_id": [1], "text": ["p q p q r s"]})
        )
        rows = pmi_top_bigrams(ds, min_count=2, top=10).take_all()
        assert [r["bigram"] for r in rows] == ["p q"]


class TestPQ:
    def test_recall_vs_exact(self, embeddings):
        from ctinexus_ray.ops.simsearch import pq_topk, self_topk

        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in self_topk(embeddings, n_queries=10, k=5).take_all()
        }
        approx_rows = pq_topk(
            embeddings, n_queries=10, k=5, m=16, n_codes=64, rerank=64
        ).take_all()
        approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
        # exactly k rows per query, ranks 1..k
        by_q = {}
        for r in approx_rows:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(by_q) == set(range(10))
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
        recall = len(exact & approx) / len(exact)
        # ADC shortlist + exact re-rank: near-perfect on the testdata
        assert recall >= 0.9, recall

    def test_encode_shapes_and_determinism(self, embeddings):
        import ray

        from ctinexus_ray.ops.simsearch import (
            _pq_codebooks,
            pq_encode,
        )

        rows = embeddings.take_all()
        mat = np.array([r["embedding"] for r in rows], dtype=np.float64)
        books = _pq_codebooks(mat[:256], m=8, n_codes=16)
        assert books.shape == (8, 16, 8)
        ref = ray.put(books)
        got1 = {r["vec_id"]: r["codes"] for r in pq_encode(embeddings, ref).take_all()}
        got2 = {r["vec_id"]: r["codes"] for r in pq_encode(embeddings, ref).take_all()}
        assert got1 == got2
        assert all(len(c) == 8 for c in got1.values())

    def test_bad_dim_rejected(self, ray_session):
        import pytest

        from ctinexus_ray.ops.simsearch import _pq_codebooks

        with pytest.raises(ValueError):
            _pq_codebooks(np.ones((4, 10)), m=3, n_codes=2)


class TestSQ:
    def test_recall_vs_exact(self, embeddings):
        from ctinexus_ray.ops.simsearch import self_topk, sq_topk

        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in self_topk(embeddings, n_queries=10, k=5).take_all()
        }
        approx_rows = sq_topk(embeddings, n_queries=10, k=5, rerank=64).take_all()
        approx = {(r["query_id"], r["neighbor_id"]) for r in approx_rows}
        by_q = {}
        for r in approx_rows:
            by_q.setdefault(r["query_id"], []).append(r["rank"])
        assert set(by_q) == set(range(10))
        assert all(sorted(v) == [1, 2, 3, 4, 5] for v in by_q.values())
        # uint8/dim on normalized vectors: the shortlist essentially
        # never misses a true top-5 neighbor on the testdata
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.95, recall

    def test_exact_sims_for_common_pairs(self, embeddings):
        # re-ranked partials carry TRUE cosines: for every (query,
        # neighbor) pair both methods return, sims agree to the last
        # ULPs (BLAS matrix-matrix vs matrix-vector products sum in
        # different orders, so bit-identity is not guaranteed)
        from ctinexus_ray.ops.simsearch import self_topk, sq_topk

        exact = {
            (r["query_id"], r["neighbor_id"]): r["sim"]
            for r in self_topk(embeddings, n_queries=5, k=5).take_all()
        }
        for r in sq_topk(embeddings, n_queries=5, k=5).take_all():
            key = (r["query_id"], r["neighbor_id"])
            if key in exact:
                assert r["sim"] == pytest.approx(exact[key], rel=1e-12)

    def test_encode_bounds_and_degenerate_dim(self, ray_session):
        from ctinexus_ray.ops.simsearch import sq_encode

        mat = np.array([[0.0, 5.0], [1.0, 5.0], [0.5, 5.0]])
        mins = mat.min(axis=0)
        steps = (mat.max(axis=0) - mins) / 255.0
        codes = sq_encode(mat, mins, steps)
        assert codes.dtype == np.uint8
        assert codes[:, 0].tolist() == [0, 255, 128]
        # degenerate dimension (max == min) codes 0 everywhere
        assert codes[:, 1].tolist() == [0, 0, 0]

    def test_train_reshard_stable(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import sq_train

        rng = np.random.default_rng(7)
        mat = rng.normal(size=(40, 8))
        t = pa.table(
            {
                "vec_id": pa.array(range(40), type=pa.int64()),
                "embedding": pa.array(mat.tolist()),
            }
        )
        a = sq_train(ray.data.from_arrow(t))
        b = sq_train(ray.data.from_arrow(t).repartition(7))
        assert np.array_equal(a[0], b[0]) and np.array_equal(a[1], b[1])


class TestMarginBitext:
    @staticmethod
    def _ref(ids, mat, langs, src, dst, k=4, threshold=1.05):
        """Sequential reference: full sim matrix + ratio margin."""
        mat = mat / np.linalg.norm(mat, axis=1, keepdims=True)
        ai = [i for i in range(len(ids)) if langs[i] == src]
        bi = [i for i in range(len(ids)) if langs[i] == dst]
        if not ai or not bi:
            return {}
        A, B = mat[ai], mat[bi]
        a_ids = np.array([ids[i] for i in ai])
        b_ids = np.array([ids[i] for i in bi])
        sims = A @ B.T
        kk_b = min(k, len(ai))
        avg_b = np.sort(sims, axis=0)[::-1][:kk_b].mean(axis=0)
        out = {}
        for q in range(len(ai)):
            row = sims[q]
            order = np.lexsort((b_ids, -row))[: min(k, len(bi))]
            avg_a = row[order].mean()
            margins = row[order] / (avg_a / 2.0 + avg_b[order] / 2.0)
            best = np.lexsort((b_ids[order], -margins))[0]
            if margins[best] >= threshold:
                out[int(a_ids[q])] = (
                    int(b_ids[order][best]),
                    float(margins[best]),
                )
        return out

    def _dataset(self, ids, mat, langs):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array(ids, type=pa.int64()),
                    "embedding": pa.array([list(r) for r in mat]),
                    "lang": langs,
                }
            )
        )

    def test_parity_with_reference(self, ray_session):
        from ctinexus_ray.ops.simsearch import margin_bitext

        rng = np.random.default_rng(11)
        n = 60
        base = rng.normal(size=(n // 2, 16))
        # dst vectors are noisy translations of their src mate
        mat = np.vstack([base, base + rng.normal(scale=0.05, size=base.shape)])
        ids = list(range(n))
        langs = ["en"] * (n // 2) + ["de"] * (n // 2)
        got = {
            r["src_id"]: (r["dst_id"], r["margin"])
            for r in margin_bitext(
                self._dataset(ids, mat, langs), "en", "de", k=4, threshold=1.0
            ).take_all()
        }
        want = self._ref(ids, mat, langs, "en", "de", k=4, threshold=1.0)
        assert set(got) == set(want)
        for a, (b, m) in want.items():
            assert got[a][0] == b
            assert got[a][1] == pytest.approx(m, rel=1e-12)
        # noisy translations: the mate (id + n//2) should dominate
        mined = sum(1 for a, (b, _) in got.items() if b == a + n // 2)
        assert mined >= int(0.9 * len(got)) and len(got) >= int(0.8 * (n // 2))

    def test_reshard_deterministic(self, ray_session):
        from ctinexus_ray.ops.simsearch import margin_bitext

        rng = np.random.default_rng(3)
        mat = rng.normal(size=(40, 8))
        ids = list(range(40))
        langs = ["en" if i % 2 == 0 else "fr" for i in range(40)]
        a = sorted(
            (r["src_id"], r["dst_id"], r["sim"], r["margin"])
            for r in margin_bitext(
                self._dataset(ids, mat, langs), "en", "fr", threshold=0.0
            ).take_all()
        )
        b = sorted(
            (r["src_id"], r["dst_id"], r["sim"], r["margin"])
            for r in margin_bitext(
                self._dataset(ids, mat, langs).repartition(9),
                "en",
                "fr",
                threshold=0.0,
            ).take_all()
        )
        assert a == b

    def test_src_cap_refuses(self, ray_session):
        import pytest

        from ctinexus_ray.ops.simsearch import margin_bitext

        mat = np.eye(4)
        ds = self._dataset([0, 1, 2, 3], mat, ["en", "en", "de", "de"])
        with pytest.raises(ValueError, match="max_src"):
            margin_bitext(ds, "en", "de", max_src=1)

    def test_empty_src_lang(self, ray_session):
        from ctinexus_ray.ops.simsearch import margin_bitext

        mat = np.eye(3)
        ds = self._dataset([0, 1, 2], mat, ["de", "de", "de"])
        assert margin_bitext(ds, "en", "de").count() == 0


class TestDupSpans:
    def test_planted_duplicated_span(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.dedup import dup_span_stats

        span = "one two three four five six seven eight nine ten"
        texts = [
            f"{span} tail{i} filler{i} pad{i} more{i}" for i in range(3)
        ] + ["totally different words " * 5, "short doc"]
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": list(range(len(texts))), "text": texts}
            )
        ).repartition(3)
        got = {
            r["doc_id"]: r["n_dup_grams"]
            for r in dup_span_stats(ds, n=10).take_all()
        }
        # only the 3 docs sharing the 10-gram span appear; each shares
        # exactly the one leading 10-gram (tails diverge)
        assert got == {0: 1, 1: 1, 2: 1}

    def test_no_dups_empty(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.dedup import dup_span_stats

        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": [1, 2],
                    "text": [
                        "a b c d e f g h i j unique",
                        "k l m n o p q r s t other",
                    ],
                }
            )
        )
        assert dup_span_stats(ds, n=10).take_all() == []


class TestRemoveDupSpans:
    def _ds(self, texts):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": list(range(len(texts))), "text": texts}
            )
        ).repartition(3)

    def test_cross_doc_span_removed(self, ray_session):
        from ctinexus_ray.ops.dedup import remove_dup_spans

        span = "one two three four five six seven eight nine ten"
        texts = [
            f"{span} tailA fillerA padA moreA",
            f"prefixB {span} tailB",
            "u1 u2  u3 u4 u5 u6 u7 u8 u9 u10  u11 u12",
        ]
        got = {
            r["doc_id"]: r
            for r in remove_dup_spans(self._ds(texts), n=10).take_all()
        }
        assert got[0]["text"] == "tailA fillerA padA moreA"
        assert got[0]["n_removed"] == 10
        assert got[1]["text"] == "prefixB tailB"
        assert got[1]["n_removed"] == 10
        # eligible doc with no dup grams: whitespace-normalized rebuild
        assert got[2]["n_removed"] == 0
        assert "  " not in got[2]["text"]

    def test_same_doc_repeat_counts(self, ray_session):
        # ExactSubstr rule: a 10-gram repeated WITHIN one doc is dup
        # (dup_span_stats' >=2-docs rule would not fire here)
        from ctinexus_ray.ops.dedup import remove_dup_spans

        span = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
        texts = [f"{span} mid1 mid2 {span} end1"]
        (row,) = remove_dup_spans(self._ds(texts), n=10).take_all()
        assert row["text"] == "mid1 mid2 end1"
        assert row["n_removed"] == 20

    def test_overlapping_spans_merge(self, ray_session):
        from ctinexus_ray.ops.dedup import remove_dup_spans

        # 11 shared words -> two overlapping dup 10-grams; coverage is
        # the union (11 words), not 20
        span11 = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10 a11"
        texts = [f"{span11} uniqX", f"{span11} uniqY"]
        rows = {
            r["doc_id"]: r
            for r in remove_dup_spans(self._ds(texts), n=10).take_all()
        }
        assert rows[0]["text"] == "uniqX"
        assert rows[0]["n_removed"] == 11

    def test_short_and_null_verbatim(self, ray_session):
        from ctinexus_ray.ops.dedup import remove_dup_spans

        texts = ["short  doc   spaces", None]
        rows = {
            r["doc_id"]: r
            for r in remove_dup_spans(self._ds(texts), n=10).take_all()
        }
        # ineligible docs keep their ORIGINAL text (incl. whitespace/NULL)
        assert rows[0]["text"] == "short  doc   spaces"
        assert rows[1]["text"] is None
        assert rows[0]["n_removed"] == 0

    def test_full_removal_empty_string(self, ray_session):
        from ctinexus_ray.ops.dedup import remove_dup_spans

        span = "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10"
        texts = [span, span]
        rows = remove_dup_spans(self._ds(texts), n=10).take_all()
        assert all(r["text"] == "" and r["n_removed"] == 10 for r in rows)


class TestRealMultimodal:
    def test_ppm_roundtrip_exact(self, ray_session):
        from ctinexus_ray.ops.multimodal import _encode_ppm, decode_ppm

        img = decode_ppm(_encode_ppm(20, 11, seed=5))
        assert img.shape == (11, 20, 3)
        # pattern formula reproduced independently
        assert img[3, 7, 1] == (7 * (3 + 5 % 7) + 3 * (5 + 5 % 11) + 5 + 37) % 256

    def test_wav_roundtrip_and_features(self, ray_session):
        from ctinexus_ray.ops.multimodal import (
            DecodeMediaStage,
            _encode_wav,
            decode_wav,
        )

        payload = _encode_wav(freq_hz=440.0, duration_ms=500, rate=8000)
        rate, samples = decode_wav(payload)
        assert rate == 8000 and len(samples) == 4000
        feats = DecodeMediaStage()._features("audio/wav", payload)
        dur, rms, zcr, peak = feats[0], feats[1], feats[2], feats[3]
        assert abs(dur - 0.5) < 1e-9
        assert 7000 < rms < 10000  # sine rms = 12000/sqrt(2) ~ 8485
        # zero-crossing rate of a 440 Hz sine at 8 kHz = 2*440/8000 = 0.11
        assert abs(zcr - 0.11) < 0.01
        assert 11000 < peak <= 12000

    def test_area_resize_matches_block_mean(self, ray_session):
        from ctinexus_ray.ops.multimodal import area_resize_gray

        img = np.arange(4 * 6 * 3, dtype=np.uint8).reshape(4, 6, 3)
        out = area_resize_gray(img, 3, 2)
        gray = img.astype(np.float64).mean(axis=2)
        want = np.array(
            [
                [gray[0:2, 0:2].mean(), gray[0:2, 2:4].mean(), gray[0:2, 4:6].mean()],
                [gray[2:4, 0:2].mean(), gray[2:4, 2:4].mean(), gray[2:4, 4:6].mean()],
            ]
        )
        assert np.allclose(out, want)

    def test_decode_stage_end_to_end(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            decode_real_features,
            make_real_media_table,
        )

        media = ray.data.from_arrow(make_real_media_table(30)).repartition(3)
        rows = decode_real_features(media).take_all()
        assert len(rows) == 30
        kinds = {r["media_id"]: r["kind"] for r in rows}
        # rotation: i%4 -> 0 ppm image, 1 wav audio, 2 png image, 3 bmp image
        assert all(
            kinds[i] == ("audio" if i % 4 == 1 else "image") for i in range(30)
        )
        assert all(len(r["features"]) == 8 for r in rows)

    def test_unsupported_mime_raises(self, ray_session):
        import pytest

        from ctinexus_ray.ops.multimodal import DecodeMediaStage

        # every real codec is in SUPPORTED now; an unknown mime raises
        with pytest.raises(ValueError, match="unsupported mime"):
            DecodeMediaStage()._features("image/tiff", b"II*\x00")
        # a supported mime with a corrupt payload raises the codec error
        with pytest.raises(ValueError, match="JPEG"):
            DecodeMediaStage()._features("image/jpeg", b"\xff\xd8\xff")
        # a supported mime with a corrupt payload raises the codec error
        with pytest.raises(ValueError, match="PNG"):
            DecodeMediaStage()._features("image/png", b"\x89PNG")


class TestDistributedKMeans:
    def test_separates_two_blobs(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import kmeans_fit_predict

        # two well-separated direction blobs on the unit sphere (dim 4)
        base_a, base_b = np.array([1.0, 0, 0, 0]), np.array([0, 0, 0, 1.0])
        vecs, ids = [], []
        for i in range(200):
            base = base_a if i % 2 == 0 else base_b
            jit = np.array(
                [((i * 37 + d * 11) % 17 - 8) / 100.0 for d in range(4)]
            )
            vecs.append((base + jit).tolist())
            ids.append(i)
        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"vec_id": ids, "embedding": vecs})
        ).repartition(5)
        got = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_fit_predict(ds, n_clusters=2, n_iter=5).take_all()
        }
        a_clusters = {got[i] for i in range(0, 200, 2)}
        b_clusters = {got[i] for i in range(1, 200, 2)}
        assert len(a_clusters) == 1 and len(b_clusters) == 1
        assert a_clusters != b_clusters

    def test_deterministic_across_partitionings(self, embeddings):
        from ctinexus_ray.ops.simsearch import kmeans_fit_predict

        a = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_fit_predict(embeddings, 4, 3).take_all()
        }
        b = {
            r["vec_id"]: r["cluster"]
            for r in kmeans_fit_predict(
                embeddings.repartition(11), 4, 3
            ).take_all()
        }
        assert a == b and len(a) == 500


class TestCompressionRatio:
    def test_matches_direct_zlib(self, ray_session):
        import zlib

        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import compression_ratio_batch

        texts = ["abc " * 200, "the quick brown fox", ""]
        ds = ray.data.from_arrow(
            pa.Table.from_pydict({"doc_id": [0, 1, 2], "text": texts})
        )
        got = {
            r["doc_id"]: r["compression_ratio"]
            for r in ds.map_batches(
                compression_ratio_batch, batch_format="pyarrow"
            ).take_all()
        }
        for i, t in enumerate(texts):
            raw = t.encode()
            want = len(zlib.compress(raw, 6)) / len(raw) if raw else 1.0
            assert got[i] == want
        # highly repetitive text compresses far better than prose
        assert got[0] < 0.05 < got[1]


class TestPngBmpCodecs:
    def _random_img(self, rng, h, w, c):
        a = rng.randint(0, 256, size=(h, w, c)).astype("uint8")
        return a[:, :, 0] if c == 1 else a

    def test_png_roundtrip_all_filters_and_channels(self):
        import numpy as np

        from ctinexus_ray.ops.multimodal import decode_png, encode_png

        rng = np.random.RandomState(11)
        for c in (1, 3, 4):
            for h, w in ((1, 1), (2, 2), (5, 7), (16, 9)):
                img = self._random_img(rng, h, w, c)
                # per-row filter cycle exercises every unfilter path
                filters = [(y % 5) for y in range(h)]
                out = decode_png(encode_png(img, row_filters=filters))
                want = img[:, :, None] if img.ndim == 2 else img
                assert out.shape == want.shape
                assert np.array_equal(out, want), (c, h, w)

    def test_png_filters_match_spec_reference(self):
        """Independent check: forward-filter a tiny image with a pure-
        Python implementation written straight from the PNG spec
        (RFC 2083 §6), wrap it in chunks, and require decode_png to
        invert it — guards against a shared encoder/decoder bug."""
        import struct
        import zlib

        import numpy as np

        from ctinexus_ray.ops.multimodal import _PNG_SIG, _png_chunk, decode_png

        img = np.array(
            [[[10, 200, 30], [250, 5, 127]],
             [[0, 255, 64], [90, 90, 90]],
             [[17, 34, 51], [68, 85, 102]]],
            dtype=np.uint8,
        )
        h, w, bpp = 3, 2, 3

        def paeth(a, b, c):
            p = a + b - c
            pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
            if pa_ <= pb_ and pa_ <= pc_:
                return a
            return b if pb_ <= pc_ else c

        scan = bytearray()
        prev = [0] * (w * bpp)
        for y, f in zip(range(h), (3, 4, 1)):  # average, paeth, sub rows
            row = [int(v) for v in img[y].reshape(-1)]
            filt = []
            for i in range(len(row)):
                left = row[i - bpp] if i >= bpp else 0
                up = prev[i]
                ul = prev[i - bpp] if i >= bpp else 0
                if f == 3:
                    filt.append((row[i] - (left + up) // 2) % 256)
                elif f == 4:
                    filt.append((row[i] - paeth(left, up, ul)) % 256)
                else:
                    filt.append((row[i] - left) % 256)
            scan.append(f)
            scan.extend(filt)
            prev = row
        ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
        payload = (
            _PNG_SIG
            + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(bytes(scan)))
            + _png_chunk(b"IEND", b"")
        )
        assert np.array_equal(decode_png(payload), img)

    def test_png_unsupported_shapes_raise(self):
        import pytest

        from ctinexus_ray.ops.multimodal import decode_png

        with pytest.raises(ValueError, match="not a PNG"):
            decode_png(b"JFIF....")

    def test_bmp_roundtrip_with_row_padding(self):
        import numpy as np

        from ctinexus_ray.ops.multimodal import decode_bmp, encode_bmp

        rng = np.random.RandomState(5)
        for h, w in ((1, 1), (3, 3), (4, 5), (7, 6)):  # w=5: padded rows
            img = rng.randint(0, 256, size=(h, w, 3)).astype("uint8")
            assert np.array_equal(decode_bmp(encode_bmp(img)), img)

    def test_decode_stage_handles_png_and_bmp(self, ray_session):
        import numpy as np

        from ctinexus_ray.ops.multimodal import (
            decode_real_features,
            make_real_media_table,
        )

        table = make_real_media_table(12)
        mimes = set(table.column("mime").to_pylist())
        assert {"image/png", "image/bmp", "image/x-portable-pixmap",
                "image/jpeg", "audio/wav"} <= mimes
        rows = decode_real_features(
            ray.data.from_arrow(table)
        ).take_all()
        assert len(rows) == 12
        by_id = {r["media_id"]: r for r in rows}
        # PNG/BMP/JPEG rows encode the same deterministic pattern family
        # as PPM: features must be finite and width/height-consistent
        for i, r in by_id.items():
            assert all(np.isfinite(v) for v in r["features"])
        # image rows (PNG at 2/10, JPEG at 4/6): feature[0]/[1] = dims
        meta = {m["media_id"]: m for m in table.to_pylist()}
        for i in (2, 4, 6, 10):
            assert by_id[i]["features"][0] == float(meta[i]["width"])
            assert by_id[i]["features"][1] == float(meta[i]["height"])
        assert meta[4]["mime"] == meta[6]["mime"] == "image/jpeg"


class TestListColToMatrix:
    def test_list_and_fixed_size_list_and_slices(self):
        import numpy as np
        import pyarrow as pa

        from ctinexus_ray.ops.dedup import list_col_to_matrix

        data = [[1.0, 2.0], [3.0, 4.0], [5.0, 6.0]]
        want = np.array(data)
        # plain list<float64>
        col = pa.array(data, type=pa.list_(pa.float64()))
        assert np.array_equal(list_col_to_matrix(col), want)
        # chunked
        chunked = pa.chunked_array([col[:1], col[1:]])
        assert np.array_equal(list_col_to_matrix(chunked), want)
        # sliced view (nonzero offset)
        assert np.array_equal(list_col_to_matrix(col.slice(1, 2)), want[1:])
        # fixed_size_list, including a sliced view
        fsl = pa.array(data, type=pa.list_(pa.float64(), 2))
        assert np.array_equal(list_col_to_matrix(fsl), want)
        assert np.array_equal(list_col_to_matrix(fsl.slice(1, 2)), want[1:])
        # float32 values upcast
        f32 = pa.array(data, type=pa.list_(pa.float32()))
        assert list_col_to_matrix(f32).dtype == np.float64
        # empty
        assert list_col_to_matrix(col.slice(0, 0)).shape == (0, 0)

    def test_ragged_and_null_inputs_raise(self):
        import pyarrow as pa
        import pytest

        from ctinexus_ray.ops.dedup import list_col_to_matrix

        ragged = pa.array([[1.0], [2.0, 3.0]], type=pa.list_(pa.float64()))
        with pytest.raises(ValueError, match="ragged"):
            list_col_to_matrix(ragged)
        nulls = pa.array([[1.0, 2.0], None], type=pa.list_(pa.float64()))
        with pytest.raises(ValueError, match="null"):
            list_col_to_matrix(nulls)


class TestEmbeddingBroadcastRefusal:
    def test_oversized_matrix_defers_to_lsh(self, embeddings):
        import pytest

        from ctinexus_ray.ops.dedup import embedding_dup_pairs

        with pytest.raises(ValueError, match="embedding_dup_pairs_lsh"):
            embedding_dup_pairs(
                embeddings, threshold=0.9, max_broadcast_bytes=64
            ).take_all()


class TestBM25:
    def _docs(self):
        import pyarrow as pa
        import ray.data

        texts = [
            "hash join beats sort merge join on small tables",      # 0
            "vector scan with hash probe",                          # 1
            "the quick brown fox",                                  # 2
            "hash hash hash join vector vector",                    # 3
            "sort merge only here",                                 # 4
        ]
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {"doc_id": list(range(len(texts))), "text": texts}
            )
        ).repartition(3)

    def test_matches_brute_force(self, ray_session):
        import math

        from ctinexus_ray.ops.textstats import bm25_topk_docs

        terms = ["hash", "join", "vector"]
        out = bm25_topk_docs(self._docs(), terms, k=5, k1=1.5, b=0.75)
        got = {r["doc_id"]: r["score_micro"] for r in out.to_pylist()}

        # brute force over the same 5 docs
        texts = {
            0: "hash join beats sort merge join on small tables",
            1: "vector scan with hash probe",
            2: "the quick brown fox",
            3: "hash hash hash join vector vector",
            4: "sort merge only here",
        }
        toks = {i: t.split() for i, t in texts.items()}
        n = len(texts)
        avgdl = float(sum(len(v) for v in toks.values())) / n
        df = {w: sum(1 for v in toks.values() if w in v) for w in terms}
        want: dict[int, int] = {}
        for i, v in toks.items():
            total = 0
            matched = False
            for w in terms:
                tf = v.count(w)
                if tf == 0:
                    continue
                matched = True
                idf = math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
                s = idf * (tf * 2.5) / (tf + 1.5 * (0.25 + (0.75 * len(v)) / avgdl))
                total += math.floor(s * 1e6 + 0.5)
            if matched:
                want[i] = total
        assert got == want
        # doc 2 and 4 match no term: absent from the ranking
        assert 2 not in got and 4 not in got
        # ranking is by score desc
        rows = out.to_pylist()
        scores = [r["score_micro"] for r in rows]
        assert scores == sorted(scores, reverse=True)
        assert [r["rn"] for r in rows] == list(range(1, len(rows) + 1))

    def test_k_cut_and_tiebreak(self, ray_session):
        from ctinexus_ray.ops.textstats import bm25_topk_docs

        out = bm25_topk_docs(self._docs(), ["hash"], k=2)
        assert out.num_rows == 2
        rows = out.to_pylist()
        assert rows[0]["score_micro"] >= rows[1]["score_micro"]

    def test_empty_terms_raise(self, ray_session):
        import pytest as _pytest

        from ctinexus_ray.ops.textstats import bm25_topk_docs

        with _pytest.raises(ValueError, match="query_terms"):
            bm25_topk_docs(self._docs(), [])

    def test_no_matches_returns_empty(self, ray_session):
        from ctinexus_ray.ops.textstats import bm25_topk_docs

        out = bm25_topk_docs(self._docs(), ["zzzmissing"], k=5)
        assert out.num_rows == 0


class TestDsirScores:
    def test_vs_duckdb(self, ray_session, con):
        from ctinexus_ray.ops.textstats import dsir_scores

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        got = {
            (r["doc_id"], r["n_tokens"], r["dsir_score_u"])
            for r in dsir_scores(docs).take_all()
        }
        want = set(
            con.sql(
                r"""
                WITH words AS (SELECT doc_id, lang,
                  unnest(regexp_split_to_array(trim(text), '\s+')) AS w
                  FROM documents),
                b AS (SELECT doc_id, lang,
                  CAST(concat('0x', substr(md5(w),1,8)) AS UBIGINT) % 1024 AS bk
                  FROM words),
                raw AS (SELECT bk, count(*) AS cr FROM b GROUP BY bk),
                tgt AS (SELECT bk, count(*) AS ct FROM b WHERE lang='en' GROUP BY bk),
                tr AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b),
                tt AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM b WHERE lang='en'),
                lr AS (SELECT raw.bk, CAST(FLOOR((
                  ln((coalesce(tgt.ct,0)+1) / (tt.n + 1024)) -
                  ln((raw.cr+1) / (tr.n + 1024))) * 1e6 + 0.5) AS BIGINT) AS lr_u
                  FROM raw LEFT JOIN tgt ON raw.bk = tgt.bk, tr, tt)
                SELECT b.doc_id, count(*), CAST(sum(lr.lr_u) AS BIGINT)
                FROM b JOIN lr ON b.bk = lr.bk GROUP BY b.doc_id
                """
            ).fetchall()
        )
        assert got == want

    def test_target_scores_highest(self, ray_session):
        """The target slice must out-score the rest on average — the
        importance-resampling signal DSIR exists to produce."""
        from ctinexus_ray.ops.textstats import dsir_scores

        docs = ray.data.read_parquet(
            f"{SF}/documents.parquet", columns=["doc_id", "text", "lang"]
        )
        langs = {
            r["doc_id"]: r["lang"]
            for r in docs.select_columns(["doc_id", "lang"]).take_all()
        }
        scores = dsir_scores(docs).take_all()
        en = [r["dsir_score"] for r in scores if langs[r["doc_id"]] == "en"]
        rest = [r["dsir_score"] for r in scores if langs[r["doc_id"]] != "en"]
        assert en and rest
        assert sum(en) / len(en) > sum(rest) / len(rest)


class TestParagraphDedup:
    def test_vs_duckdb(self, docs, con):
        from ctinexus_ray.ops.dedup import paragraph_dedup

        got = {
            (r["doc_id"], r["n_kept"], r["new_text"])
            for r in paragraph_dedup(docs, words_per_chunk=20).take_all()
        }
        want = set(
            con.sql(
                r"""
                WITH w AS (SELECT doc_id,
                  regexp_split_to_array(trim(text), '\s+') AS ws FROM documents),
                ch AS (SELECT doc_id, CAST(t.i AS BIGINT) AS chunk_idx,
                  array_to_string(ws[(t.i*20+1):(t.i*20+20)], ' ') AS chunk
                  FROM w, UNNEST(range(CAST(ceil(len(ws)/20.0) AS BIGINT))) AS t(i)),
                win AS (SELECT chunk, min(doc_id*1000000 + chunk_idx) AS ord
                  FROM ch GROUP BY chunk)
                SELECT ord // 1000000 AS doc_id, CAST(count(*) AS BIGINT),
                  string_agg(chunk, ' ' ORDER BY ord % 1000000)
                FROM win GROUP BY 1
                """
            ).fetchall()
        )
        assert got == want

    def test_drops_repeated_chunks(self, ray_session):
        """A doc made of another doc's chunks vanishes; a half-dup doc
        keeps only its novel half, rebuilt in order."""
        from ctinexus_ray.ops.dedup import paragraph_dedup

        a = "one two three four"       # 2 chunks of 2 words
        b = "one two three four"       # pure dup of a -> vanishes
        c = "one two five six"         # chunk1 dup, chunk2 novel
        ds = ray.data.from_items(
            [
                {"doc_id": 0, "text": a},
                {"doc_id": 1, "text": b},
                {"doc_id": 2, "text": c},
            ]
        )
        rows = {
            r["doc_id"]: (r["n_kept"], r["new_text"])
            for r in paragraph_dedup(ds, words_per_chunk=2).take_all()
        }
        assert rows == {0: (2, "one two three four"), 2: (1, "five six")}

    def test_empty_text_is_one_empty_chunk(self, ray_session):
        from ctinexus_ray.ops.dedup import paragraph_dedup

        ds = ray.data.from_items(
            [{"doc_id": 5, "text": ""}, {"doc_id": 9, "text": ""}]
        )
        rows = {
            r["doc_id"]: (r["n_kept"], r["new_text"])
            for r in paragraph_dedup(ds, words_per_chunk=3).take_all()
        }
        assert rows == {5: (1, "")}


class TestKnBigramLM:
    def test_probabilities_normalize_per_context(self, ray_session):
        """Interpolated KN is a proper distribution: for every context w1,
        sum over the OBSERVED continuations of (C-D)/Ctot plus the
        reserved mass D*N1f/Ctot (spread over Pcont, which sums to 1 over
        the full vocab) must equal 1 when summed over all bigram types
        with that context -- check the reserved-mass identity directly
        from the broadcast table the op builds."""
        import math
        from collections import Counter

        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import (
            _tokens,
            kn_bigram_scores,
        )

        texts = [
            "the cat sat on the mat",
            "the cat ate the fish",
            "a dog sat on a log",
            "the dog ate a bone",
        ]
        t = pa.Table.from_pydict(
            {"doc_id": list(range(len(texts))), "text": texts}
        )
        ds = ray.data.from_arrow(t).repartition(2)
        got = {
            r["doc_id"]: r for r in kn_bigram_scores(ds).take_all()
        }
        # independent reference: pure-python KN over the same corpus
        D = 0.75
        bg = Counter()
        for txt in texts:
            toks = _tokens(txt)
            bg.update(zip(toks, toks[1:]))
        ctot, n1f, n1b = Counter(), Counter(), Counter()
        for (w1, w2), c in bg.items():
            ctot[w1] += c
            n1f[w1] += 1
            n1b[w2] += 1
        B = len(bg)
        for i, txt in enumerate(texts):
            toks = _tokens(txt)
            u = sum(
                math.floor(
                    math.log(
                        (bg[(a, b)] - D + D * n1f[a] * (n1b[b] / B))
                        / ctot[a]
                    )
                    * 1e6
                    + 0.5
                )
                for a, b in zip(toks, toks[1:])
            )
            assert got[i]["kn_score_u"] == u
            assert got[i]["n_bigrams"] == len(toks) - 1
        # distribution check: per context the total prob over the full
        # vocabulary is 1 (observed mass + reserved mass * sum(Pcont)=1)
        vocab = set(n1b)
        for w1 in ctot:
            total = sum(
                (bg.get((w1, w2), 0) - D if (w1, w2) in bg else 0.0)
                / ctot[w1]
                + D * n1f[w1] / ctot[w1] * (n1b[w2] / B)
                for w2 in vocab
            )
            assert abs(total - 1.0) < 1e-9

    def test_short_docs_emit_no_row(self, ray_session):
        import pyarrow as pa
        import ray.data

        t = pa.Table.from_pydict(
            {"doc_id": [0, 1, 2], "text": ["one two three", "solo", ""]}
        )
        from ctinexus_ray.ops.textstats import kn_bigram_scores

        rows = kn_bigram_scores(ray.data.from_arrow(t)).take_all()
        assert sorted(r["doc_id"] for r in rows) == [0]


class TestNaiveBayes:
    def _corpus(self):
        import pyarrow as pa

        texts = [
            "the cat sat on the mat",
            "the dog ate the bone",
            "a dog and a cat",
            "el gato y el perro",
            "el perro come la carne",
            "la casa de el gato",
        ]
        langs = ["en", "en", "en", "es", "es", "es"]
        return pa.Table.from_pydict(
            {"doc_id": list(range(len(texts))), "text": texts, "lang": langs}
        )

    def test_matches_pure_python_nb(self, ray_session):
        """Predictions and integer scores equal an independent pure-python
        multinomial NB (Laplace alpha=1 over V+1 outcomes, micro-nat
        quantization before the sum, smallest-label tie-break)."""
        import math
        from collections import Counter

        import ray.data

        from ctinexus_ray.ops.textstats import _tokens, naive_bayes_predict

        t = self._corpus()
        ds = ray.data.from_arrow(t).repartition(3)
        got = {
            r["doc_id"]: (r["pred_label"], r["score_u"])
            for r in naive_bayes_predict(ds).take_all()
        }

        texts = t.column("text").to_pylist()
        langs = t.column("lang").to_pylist()
        cnt: Counter = Counter()
        vocab = set()
        for txt, lab in zip(texts, langs):
            for w in _tokens(txt):
                cnt[(lab, w)] += 1
                vocab.add(w)
        tot = Counter()
        for (lab, _w), c in cnt.items():
            tot[lab] += c
        labels = sorted(tot)
        nd = Counter(langs)
        v1 = len(vocab) + 1
        for i, txt in enumerate(texts):
            best_lab, best_s = None, None
            for lab in labels:
                s = math.floor(
                    math.log(nd[lab] / len(texts)) * 1e6 + 0.5
                )
                for w in _tokens(txt):
                    c = cnt.get((lab, w), 0)
                    s += math.floor(
                        math.log((c + 1) / (tot[lab] + v1)) * 1e6 + 0.5
                    )
                if best_s is None or s > best_s:  # first max = asc label
                    best_lab, best_s = lab, s
            assert got[i] == (best_lab, best_s), f"doc {i}"

    def test_self_training_separates_langs(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.textstats import naive_bayes_predict

        ds = ray.data.from_arrow(self._corpus())
        rows = naive_bayes_predict(ds).take_all()
        langs = self._corpus().column("lang").to_pylist()
        assert all(r["pred_label"] == langs[r["doc_id"]] for r in rows)

    def test_hashed_variant_matches_exact_without_collisions(
        self, ray_session
    ):
        """hash_buckets large enough to be collision-free on this tiny
        vocabulary gives the same predictions (the model is then an exact
        reparameterization, with V+1 replaced by buckets+1 — scores shift
        by the smoothing denominator, so compare labels only, plus
        determinism across runs)."""
        import ray.data

        from ctinexus_ray.ops.textstats import naive_bayes_predict

        ds = ray.data.from_arrow(self._corpus())
        exact = {
            r["doc_id"]: r["pred_label"]
            for r in naive_bayes_predict(ds).take_all()
        }
        h1 = {
            r["doc_id"]: (r["pred_label"], r["score_u"])
            for r in naive_bayes_predict(
                ds, hash_buckets=1 << 20
            ).take_all()
        }
        h2 = {
            r["doc_id"]: (r["pred_label"], r["score_u"])
            for r in naive_bayes_predict(
                ds, hash_buckets=1 << 20
            ).take_all()
        }
        assert h1 == h2  # deterministic
        assert {k: v[0] for k, v in h1.items()} == exact


class TestNaiveBayesNullLabel:
    def test_null_label_rows_score_but_do_not_train(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import naive_bayes_predict

        t = pa.Table.from_pydict(
            {
                "doc_id": [1, 2, 3],
                "text": ["the cat", "el gato", "the dog"],
                "lang": ["en", "es", None],
            }
        )
        rows = naive_bayes_predict(ray.data.from_arrow(t)).take_all()
        got = {r["doc_id"]: r["pred_label"] for r in rows}
        assert len(got) == 3  # NULL-labeled doc still scored
        assert got[1] == "en" and got[2] == "es"
        assert got[3] in ("en", "es")  # model has only trained labels


class TestProbeMedia:
    def test_probe_matches_ground_truth_dims(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            make_real_media_table,
            probe_media,
        )

        t = make_real_media_table(64)
        truth = {
            mid: (k, w, h)
            for mid, k, w, h in zip(
                t.column("media_id").to_pylist(),
                t.column("kind").to_pylist(),
                t.column("width").to_pylist(),
                t.column("height").to_pylist(),
            )
        }
        got = probe_media(
            ray.data.from_arrow(t).repartition(4)
        ).take_all()
        assert len(got) == 64
        for r in got:
            kind, w, h = truth[r["media_id"]]
            if kind == "image":
                assert r["fmt"] in ("png", "gif", "bmp", "ppm", "jpeg")
                assert (r["width"], r["height"]) == (w, h), r
            else:
                assert r["fmt"] == "wav"
                assert r["sample_rate"] and r["channels"] >= 1
                assert r["n_frames"] and r["n_frames"] > 0

    def test_unknown_and_truncated_payloads_never_raise(self, ray_session):
        from ctinexus_ray.ops.multimodal import probe_media_bytes

        for p in (b"", b"\xff\xd8", b"P6 9", b"RIFFxxxxWAVE",
                  b"\x89PNG\r\n\x1a\n\x00", b"garbage" * 3):
            out = probe_media_bytes(p)
            assert out["fmt"] in ("unknown", "wav", "jpeg", "png", "ppm")
            # truncated headers yield no dims rather than raising


class TestProbeEdgeCases:
    def test_wav_subbyte_bits_no_crash(self):
        import struct

        from ctinexus_ray.ops.multimodal import probe_media_bytes

        fmt = struct.pack("<HHIIHH", 17, 1, 8000, 4000, 1, 4)  # 4-bit
        payload = (
            b"RIFF" + struct.pack("<I", 36) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", 8) + b"\x00" * 8
        )
        out = probe_media_bytes(payload)
        assert out["fmt"] == "wav" and out["n_frames"] is None

    def test_jpeg_fill_bytes_before_sof(self):
        import numpy as np

        from ctinexus_ray.ops.jpeg import encode_jpeg
        from ctinexus_ray.ops.multimodal import probe_media_bytes

        img = np.zeros((6, 9, 3), dtype=np.uint8)
        payload = encode_jpeg(img, quality=90)
        # inject spec-valid 0xFF fill bytes after SOI
        padded = payload[:2] + b"\xff\xff" + payload[2:]
        out = probe_media_bytes(padded)
        assert (out["fmt"], out["width"], out["height"]) == ("jpeg", 9, 6)


class TestEnsureDocIdGuards:
    def test_null_or_empty_url_refused(self, ray_session):
        import pytest
        import ray.data

        from ctinexus_ray.sources.documents import ensure_doc_id

        ds = ray.data.from_items(
            [{"url": "https://a", "text": "x"}, {"url": None, "text": "y"}]
        )
        with pytest.raises(Exception, match="NULL/empty url"):
            ensure_doc_id(ds).take_all()

    def test_distinct_urls_distinct_ids(self, ray_session):
        import ray.data

        from ctinexus_ray.sources.documents import ensure_doc_id

        ds = ray.data.from_items(
            [{"url": f"https://site/{i}", "text": "x"} for i in range(50)]
        )
        ids = [r["doc_id"] for r in ensure_doc_id(ds).take_all()]
        assert len(set(ids)) == 50


class TestGramMatrix:
    def test_matches_direct_quantized_product(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import gram_matrix

        rng = np.random.default_rng(11)
        x = rng.normal(size=(37, 5)).astype(np.float32)
        t = pa.Table.from_pydict(
            {"embedding": [row.tolist() for row in x]}
        )
        got = {
            (r["i"], r["j"]): r["g_nano"]
            for r in gram_matrix(
                ray.data.from_arrow(t).repartition(4)
            ).take_all()
        }
        x64 = x.astype(np.float64)
        for i in range(5):
            for j in range(i, 5):
                want = int(
                    np.floor(x64[:, i] * x64[:, j] * 1e9 + 0.5)
                    .astype(np.int64)
                    .sum()
                )
                assert got[(i + 1, j + 1)] == want, (i, j)
        assert len(got) == 15  # upper triangle of d=5

    def test_reshard_invariant(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import gram_matrix

        rng = np.random.default_rng(3)
        x = rng.normal(size=(64, 4)).astype(np.float32)
        t = pa.Table.from_pydict(
            {"embedding": [row.tolist() for row in x]}
        )
        a = sorted(
            map(tuple, (
                (r["i"], r["j"], r["g_nano"])
                for r in gram_matrix(ray.data.from_arrow(t)).take_all()
            ))
        )
        b = sorted(
            map(tuple, (
                (r["i"], r["j"], r["g_nano"])
                for r in gram_matrix(
                    ray.data.from_arrow(t).repartition(9)
                ).take_all()
            ))
        )
        assert a == b


class TestPcaProject:
    def test_matches_numpy_pca(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import pca_project

        rng = np.random.default_rng(5)
        # anisotropic cloud: PC1 along a known direction
        base = rng.normal(size=(200, 6)).astype(np.float32)
        base[:, 0] *= 10.0
        t = pa.Table.from_pydict(
            {
                "vec_id": list(range(200)),
                "embedding": [r.tolist() for r in base],
            }
        )
        got = {
            r["vec_id"]: (r["pc1"], r["pc2"])
            for r in pca_project(
                ray.data.from_arrow(t).repartition(5), k=2
            ).take_all()
        }
        x = base.astype(np.float64)
        mu = x.mean(axis=0)
        cov = (x - mu).T @ (x - mu) / len(x)
        vals, vecs = np.linalg.eigh(cov)
        w = vecs[:, np.argsort(vals)[::-1][:2]]
        for c in range(2):
            lead = np.argmax(np.abs(w[:, c]))
            if w[lead, c] < 0:
                w[:, c] = -w[:, c]
        want = (x - mu) @ w
        for i in range(200):
            assert abs(got[i][0] - want[i, 0]) < 1e-5
            assert abs(got[i][1] - want[i, 1]) < 1e-5
        # PC1 dominated by the stretched axis
        assert abs(w[0, 0]) > 0.99

    def test_deterministic_across_resharding(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import pca_project

        rng = np.random.default_rng(9)
        t = pa.Table.from_pydict(
            {
                "vec_id": list(range(80)),
                "embedding": [
                    r.tolist()
                    for r in rng.normal(size=(80, 4)).astype(np.float32)
                ],
            }
        )
        a = sorted(
            (r["vec_id"], r["pc1"])
            for r in pca_project(ray.data.from_arrow(t), k=1).take_all()
        )
        b = sorted(
            (r["vec_id"], r["pc1"])
            for r in pca_project(
                ray.data.from_arrow(t).repartition(7), k=1
            ).take_all()
        )
        assert a == b  # integer-quantized stats -> bit-stable model


class TestLinearProbe:
    def _blobs(self, rng, n_per=40, d=6):
        import numpy as np

        centers = np.eye(3, d) * 6.0
        xs, ys = [], []
        for c in range(3):
            xs.append(
                centers[c] + rng.normal(size=(n_per, d)).astype(np.float64)
            )
            ys.extend([c] * n_per)
        return np.concatenate(xs).astype(np.float32), ys

    def test_matches_quantized_numpy_twin_and_separates(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import linear_probe

        rng = np.random.default_rng(2)
        x, y = self._blobs(rng)
        t = pa.Table.from_pydict(
            {
                "vec_id": list(range(len(y))),
                "embedding": [r.tolist() for r in x],
                "label": y,
            }
        )
        got = {
            r["vec_id"]: r["pred_label"]
            for r in linear_probe(
                ray.data.from_arrow(t).repartition(5), iters=10, lr=1.0
            ).take_all()
        }
        # numpy twin with the SAME quantized full-batch updates
        x64 = x.astype(np.float64)
        xb = np.concatenate([x64, np.ones((len(y), 1))], axis=1)
        yv = np.array(y)
        w = np.zeros((x.shape[1] + 1, 3))
        for _ in range(10):
            logits = xb @ w
            logits -= logits.max(axis=1, keepdims=True)
            e = np.exp(logits)
            p = e / e.sum(axis=1, keepdims=True)
            p[np.arange(len(yv)), yv] -= 1.0
            contrib = xb[:, :, None] * p[:, None, :]
            g = np.floor(contrib * 1e9 + 0.5).astype(np.int64).sum(0) / 1e9
            w = w - 1.0 * g / len(yv)
        want = np.argmax(xb @ w, axis=1)
        assert all(got[i] == want[i] for i in range(len(yv)))
        acc = float(np.mean(want == yv))
        assert acc > 0.95  # separable blobs: the probe must separate

    def test_reshard_deterministic(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import linear_probe

        rng = np.random.default_rng(4)
        x, y = self._blobs(rng, n_per=20)
        t = pa.Table.from_pydict(
            {
                "vec_id": list(range(len(y))),
                "embedding": [r.tolist() for r in x],
                "label": y,
            }
        )
        a = sorted(
            (r["vec_id"], r["pred_label"])
            for r in linear_probe(
                ray.data.from_arrow(t), iters=5
            ).take_all()
        )
        b = sorted(
            (r["vec_id"], r["pred_label"])
            for r in linear_probe(
                ray.data.from_arrow(t).repartition(9), iters=5
            ).take_all()
        )
        assert a == b


class TestQuantizedOverflowGuard:
    def test_gram_raises_when_sums_could_wrap(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import pytest
        import ray.data

        from ctinexus_ray.ops.simsearch import gram_matrix

        # huge values at full nano scale push the abs-sum tracker past
        # the int64 ceiling within one batch
        x = np.full((4, 3), 1e7, dtype=np.float32)
        t = pa.Table.from_pydict({"embedding": [r.tolist() for r in x]})
        with pytest.raises(Exception, match="int64 safety"):
            gram_matrix(ray.data.from_arrow(t)).take_all()


class TestRrfFuse:
    """Reciprocal-rank fusion: pure-integer scoring, leg union, ordering."""

    @staticmethod
    def _leg(ids, ranks, id_col="doc_id", rank_col="rn"):
        import pyarrow as pa

        return (
            pa.Table.from_pydict(
                {
                    id_col: pa.array(ids, type=pa.int64()),
                    rank_col: pa.array(ranks, type=pa.int64()),
                }
            ),
            id_col,
            rank_col,
        )

    def test_single_leg_preserves_order(self):
        from ctinexus_ray.ops.textstats import rrf_fuse

        out = rrf_fuse([self._leg([5, 3, 9], [1, 2, 3])], k=10).to_pydict()
        assert out["doc_id"] == [5, 3, 9]
        assert out["rn"] == [1, 2, 3]
        assert out["rrf_score"] == [
            10**12 // 61, 10**12 // 62, 10**12 // 63
        ]
        assert out["n_legs"] == [1, 1, 1]

    def test_doc_in_both_legs_wins(self):
        from ctinexus_ray.ops.textstats import rrf_fuse

        # doc 7: rank 3 lexically + rank 2 semantically beats doc 1 at
        # rank 1 in one leg only (1/63 + 1/62 > 1/61)
        lex = self._leg([1, 2, 7], [1, 2, 3])
        sem = self._leg([4, 7, 5], [1, 2, 3], "neighbor_id", "rank")
        out = rrf_fuse([lex, sem], k=10).to_pydict()
        assert out["doc_id"][0] == 7
        assert out["n_legs"][0] == 2
        assert out["rrf_score"][0] == 10**12 // 63 + 10**12 // 62

    def test_tie_breaks_by_doc_id(self):
        from ctinexus_ray.ops.textstats import rrf_fuse

        lex = self._leg([9, 2], [1, 2])
        sem = self._leg([2, 9], [1, 2], "neighbor_id", "rank")
        out = rrf_fuse([lex, sem], k=10).to_pydict()
        # identical scores -> ascending doc_id
        assert out["doc_id"] == [2, 9]
        assert out["rrf_score"][0] == out["rrf_score"][1]

    def test_k_cuts(self):
        from ctinexus_ray.ops.textstats import rrf_fuse

        out = rrf_fuse(
            [self._leg(list(range(50)), list(range(1, 51)))], k=5
        ).to_pydict()
        assert len(out["doc_id"]) == 5
        assert out["rn"] == [1, 2, 3, 4, 5]

    def test_bad_rank_raises(self):
        import pytest

        from ctinexus_ray.ops.textstats import rrf_fuse

        with pytest.raises(ValueError):
            rrf_fuse([self._leg([1], [0])])
        with pytest.raises(ValueError):
            rrf_fuse([])


class TestSvdTopk:
    def test_matches_numpy_svd(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import svd_topk

        rng = np.random.default_rng(5)
        base = rng.normal(size=(300, 6)).astype(np.float32)
        base[:, 0] *= 10.0  # separated spectrum -> fast subspace converge
        base[:, 1] *= 4.0
        t = pa.Table.from_pydict(
            {
                "vec_id": list(range(300)),
                "embedding": [r.tolist() for r in base],
            }
        )
        got = svd_topk(ray.data.from_arrow(t).repartition(5), k=2).take_all()
        _u, s, vt = np.linalg.svd(base.astype(np.float64), full_matrices=False)
        assert [r["j"] for r in got] == [1, 2]
        for r in got:
            j = r["j"]
            assert abs(r["sigma"] - s[j - 1]) < 1e-6 * s[j - 1] + 1e-6
            want = vt[j - 1]
            lead = int(np.argmax(np.abs(want)))
            if want[lead] < 0:
                want = -want
            assert np.abs(np.array(r["v"]) - want).max() < 1e-4

    def test_deterministic_across_resharding(self, ray_session):
        import numpy as np
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.simsearch import svd_topk

        rng = np.random.default_rng(9)
        t = pa.Table.from_pydict(
            {
                "vec_id": list(range(80)),
                "embedding": [
                    r.tolist()
                    for r in rng.normal(size=(80, 4)).astype(np.float32)
                ],
            }
        )
        a = svd_topk(ray.data.from_arrow(t), k=2).take_all()
        b = svd_topk(ray.data.from_arrow(t).repartition(7), k=2).take_all()
        assert a == b  # integer-quantized partials -> bit-stable panels

    def test_bad_k_and_empty(self, ray_session):
        import pyarrow as pa
        import pytest as _pytest
        import ray.data

        from ctinexus_ray.ops.simsearch import svd_topk

        t = pa.Table.from_pydict(
            {"vec_id": [0], "embedding": [[1.0, 2.0, 3.0]]}
        )
        with _pytest.raises(ValueError, match="k"):
            svd_topk(ray.data.from_arrow(t), k=4)
        empty = pa.Table.from_pydict(
            {
                "vec_id": pa.array([], type=pa.int64()),
                "embedding": pa.array([], type=pa.list_(pa.float64())),
            }
        )
        with _pytest.raises(ValueError, match="empty"):
            svd_topk(ray.data.from_arrow(empty), k=1)


class TestPhraseSearch:
    @staticmethod
    def _docs(texts):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array(range(len(texts)), type=pa.int64()),
                    "text": texts,
                }
            )
        ).repartition(2)

    def test_basic_counts(self, ray_session):
        from ctinexus_ray.ops.textstats import phrase_match_counts

        ds = self._docs(
            [
                "a b c a b",        # "a b" twice
                "b a",              # zero (wrong order)
                "x a b y a b a b",  # three
                "",                 # empty
                "a",                # shorter than phrase
            ]
        )
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_match_counts(ds, ["a", "b"], num_partitions=4).take_all()
        }
        assert got == {0: 2, 2: 3}

    def test_repeated_word_phrase(self, ray_session):
        from ctinexus_ray.ops.textstats import phrase_match_counts

        # "x x" in "x x x" matches at anchors 0 and 1
        ds = self._docs(["x x x", "x y x", "x x"])
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_match_counts(ds, ["x", "x"], num_partitions=4).take_all()
        }
        assert got == {0: 2, 2: 1}

    def test_three_word_phrase(self, ray_session):
        from ctinexus_ray.ops.textstats import phrase_match_counts

        ds = self._docs(["a b c d a b c", "a b x c", "c b a"])
        got = {
            r["doc_id"]: r["n_matches"]
            for r in phrase_match_counts(
                ds, ["a", "b", "c"], num_partitions=4
            ).take_all()
        }
        assert got == {0: 2}

    def test_validation(self, ray_session):
        import pytest

        from ctinexus_ray.ops.textstats import phrase_match_counts

        ds = self._docs(["a b"])
        with pytest.raises(ValueError):
            phrase_match_counts(ds, [])
        with pytest.raises(ValueError):
            phrase_match_counts(ds, ["a b"])
        with pytest.raises(ValueError):
            phrase_match_counts(ds, [""])


class TestGroupedArgExtremum:
    @staticmethod
    def _ds(rows):
        import pyarrow as pa
        import ray.data

        k, o, t, v = zip(*rows)
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "k": pa.array(k, type=pa.int64()),
                    "o": pa.array(o, type=pa.int64()),
                    "tie": pa.array(t, type=pa.int64()),
                    "v": list(v),
                }
            )
        ).repartition(3)

    def _run(self, ds):
        from ctinexus_ray.ops.groupagg import grouped_arg_extremum

        out = grouped_arg_extremum(
            ds, keys=["k"], order_col="o", tie_col="tie",
            payload_cols=["v"], num_partitions=4,
        ).take_all()
        return {
            r["k"]: (r["first_o"], r["first_v"], r["last_o"], r["last_v"])
            for r in out
        }

    def test_basic_first_last(self, ray_session):
        got = self._run(
            self._ds(
                [
                    (1, 10, 1, "a"),
                    (1, 30, 2, "c"),
                    (1, 20, 3, "b"),
                    (2, 5, 4, "x"),
                ]
            )
        )
        assert got == {1: (10, "a", 30, "c"), 2: (5, "x", 5, "x")}

    def test_ties_break_by_tie_col(self, ray_session):
        # same order value on both ends: smallest tie wins on BOTH
        got = self._run(
            self._ds(
                [
                    (1, 10, 5, "late-tie"),
                    (1, 10, 2, "early-tie"),
                    (1, 99, 7, "hi-late"),
                    (1, 99, 3, "hi-early"),
                ]
            )
        )
        assert got == {1: (10, "early-tie", 99, "hi-early")}

    def test_merge_across_many_blocks(self, ray_session):
        import pyarrow as pa
        import ray.data

        n = 5000
        rows = [(i % 7, (i * 37) % 1009, i, f"v{i}") for i in range(n)]
        ds = self._ds(rows).repartition(16)
        got = self._run(ds)
        # brute-force oracle
        import collections

        by_k = collections.defaultdict(list)
        for k, o, t, v in rows:
            by_k[k].append((o, t, v))
        for k, items in by_k.items():
            fo, ft, fv = min(items)
            lo_sorted = sorted(items, key=lambda x: (-x[0], x[1]))
            lo, lt, lv = lo_sorted[0]
            assert got[k] == (fo, fv, lo, lv), k


class TestTokenEntropy:
    def test_known_values(self, ray_session):
        import math

        import pyarrow as pa

        from ctinexus_ray.ops.textstats import token_entropy_batch

        batch = pa.Table.from_pydict(
            {
                "doc_id": pa.array([1, 2, 3], type=pa.int64()),
                "text": ["a a a a", "a b c d", "a a b b"],
            }
        )
        out = {
            r["doc_id"]: (r["n_tokens"], r["entropy_u"])
            for r in token_entropy_batch(batch).to_pylist()
        }
        # uniform single token -> 0 entropy
        assert out[1] == (4, 0)
        # 4 distinct tokens: each term = 1 * floor(1e9*ln(4)+0.5)
        t4 = math.floor(1e9 * math.log(4.0) + 0.5)
        assert out[2] == (4, 4 * t4)
        # two tokens twice each: 2 * floor(1e9*ln(2)+0.5) per token
        t2 = math.floor(1e9 * math.log(2.0) + 0.5)
        assert out[3] == (4, 4 * t2)

    def test_empty_text_matches_sql_edge(self, ray_session):
        # trim('') splits to [''] on both sides -> one token, entropy 0
        import pyarrow as pa

        from ctinexus_ray.ops.textstats import token_entropy_batch

        batch = pa.Table.from_pydict(
            {"doc_id": pa.array([1], type=pa.int64()), "text": [""]}
        )
        row = token_entropy_batch(batch).to_pylist()[0]
        assert (row["n_tokens"], row["entropy_u"]) == (1, 0)

    def test_payload_equals_tie_col(self, ray_session):
        """tie_col doubling as the payload (the grouped-MODE shape) must
        not duplicate columns."""
        from ctinexus_ray.ops.groupagg import grouped_arg_extremum

        ds = TestGroupedArgExtremum._ds(
            [
                (1, 3, 10, "_"),
                (1, 3, 5, "_"),
                (1, 1, 7, "_"),
            ]
        )
        out = grouped_arg_extremum(
            ds, keys=["k"], order_col="o", tie_col="tie",
            payload_cols=["tie"], num_partitions=4,
        ).take_all()
        assert len(out) == 1
        r = out[0]
        # max o = 3 twice; smallest tie (5) wins the "last" end
        assert (r["last_o"], r["last_tie"]) == (3, 5)
        assert (r["first_o"], r["first_tie"]) == (1, 7)


class TestTfidfCosinePairs:
    def test_known_geometry(self, ray_session):
        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import tfidf_cosine_pairs

        # docs 0 and 1 identical (cos 1.0); doc 2 disjoint terms from
        # both (cos 0 with them); "common" appears everywhere -> idf 0
        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": [
                        "alpha beta common",
                        "alpha beta common",
                        "gamma delta common",
                    ],
                }
            )
        ).repartition(2)
        got = {
            (r["doc_a"], r["doc_b"]): r["cos_u"]
            for r in tfidf_cosine_pairs(
                docs, threshold_u=500_000, num_partitions=4
            ).take_all()
        }
        # identical docs at exactly 1e6; disjoint pairs absent
        assert got == {(0, 1): 1_000_000}

    def test_partial_overlap_value(self, ray_session):
        import math

        import pyarrow as pa
        import ray.data

        from ctinexus_ray.ops.textstats import tfidf_cosine_pairs

        # three docs; a & b share one of their two informative terms
        docs = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "doc_id": pa.array([0, 1, 2], type=pa.int64()),
                    "text": ["x y", "x z", "q r"],
                }
            )
        ).repartition(2)
        got = {
            (r["doc_a"], r["doc_b"]): r["cos_u"]
            for r in tfidf_cosine_pairs(
                docs, threshold_u=100_000, num_partitions=4
            ).take_all()
        }
        # every term has df 1 except x (df 2): weights w_x = floor(1e6*ln(3/2)+.5),
        # w_y = w_z = floor(1e6*ln(3)+.5); cos(0,1) = w_x^2/(w_x^2+w_y^2)
        wx = math.floor(1e6 * math.log(3.0 / 2.0) + 0.5)
        wy = math.floor(1e6 * math.log(3.0) + 0.5)
        # engine computes sqrt(na)*sqrt(nb) with na == nb
        want = math.floor(
            1e6
            * (wx * wx)
            / (
                math.sqrt(float(wx * wx + wy * wy))
                * math.sqrt(float(wx * wx + wy * wy))
            )
            + 0.5
        )
        assert got == {(0, 1): want}


class TestNswTopk:
    """Graph-based ANN (per-block navigable-small-world)."""

    def test_exhaustive_ef_equals_brute_force(self, embeddings):
        """With ef >= block rows and one block, beam search visits the
        whole graph -> exactly the brute-force result."""
        from ctinexus_ray.ops.simsearch import nsw_topk, self_topk

        one_block = embeddings.repartition(1)
        n = one_block.count()
        exact = {
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in self_topk(one_block, n_queries=5, k=3).take_all()
        }
        full = {
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in nsw_topk(one_block, n_queries=5, k=3, m=8, ef=n).take_all()
        }
        assert full == exact

    def test_recall_at_realistic_ef(self, embeddings):
        from ctinexus_ray.ops.simsearch import nsw_topk, self_topk

        exact = {
            (r["query_id"], r["neighbor_id"])
            for r in self_topk(embeddings, n_queries=5, k=3).take_all()
        }
        approx = {
            (r["query_id"], r["neighbor_id"])
            for r in nsw_topk(embeddings, n_queries=5, k=3, m=8, ef=48).take_all()
        }
        assert len(exact & approx) / len(exact) >= 0.8

    def test_reshard_determinism_per_blocking(self, embeddings):
        """Same blocking -> identical output across runs (build and
        search are RNG-free); per the documented partitioning
        assumption, recall may vary ACROSS blockings but each is
        deterministic."""
        from ctinexus_ray.ops.simsearch import nsw_topk

        ds = embeddings.repartition(4).materialize()
        a = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in nsw_topk(ds, n_queries=5, k=3).take_all()
        )
        b = sorted(
            (r["query_id"], r["rank"], r["neighbor_id"])
            for r in nsw_topk(ds, n_queries=5, k=3).take_all()
        )
        assert a == b

    def test_degree_cap_and_connectivity(self):
        """Build invariants across seeds: the degree cap is SOFT (each
        node's spine back-edge is pruning-exempt, so total edges are
        bounded by n*2m + (n-1) spine edges) and — the theorem behind
        the exhaustive-ef guarantee — every node reachable from entry
        node 0 via the spine forest, for EVERY seed, including
        clustered data where naive pruning orphans cluster cores."""
        import numpy as np

        from ctinexus_ray.ops.simsearch import _normalize, _nsw_build

        for seed in range(5):
            rng = np.random.default_rng(seed)
            # half random, half one tight cluster (the orphaning shape)
            a = rng.normal(size=(100, 16))
            b = rng.normal(size=(1, 16)) + rng.normal(size=(100, 16)) * 0.01
            mat = _normalize(np.vstack([a, b]))
            n = len(mat)
            m = 4
            adj = _nsw_build(mat, m=m, ef=16)
            assert sum(len(nbrs) for nbrs in adj) <= n * 2 * m + (n - 1)
            seen, stack = {0}, [0]
            while stack:
                for nb in adj[stack.pop()]:
                    if nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
            assert len(seen) == n, f"seed {seed}: orphaned nodes"


class TestImagePhash:
    def test_same_pixels_any_container_collide(self, ray_session):
        from ctinexus_ray.ops.multimodal import (
            _encode_ppm,
            decode_image_any,
            decode_ppm,
            encode_bmp,
            encode_png,
            phash64_image,
        )

        img = decode_ppm(_encode_ppm(24, 20, 3))
        h0 = phash64_image(img)
        assert 0 <= h0 < 2**63
        assert phash64_image(decode_image_any("image/png", encode_png(img))) == h0
        assert phash64_image(decode_image_any("image/bmp", encode_bmp(img))) == h0

    def test_lossy_reencode_is_near(self, ray_session):
        from ctinexus_ray.ops.jpeg import encode_jpeg
        from ctinexus_ray.ops.multimodal import (
            _encode_ppm,
            decode_image_any,
            decode_ppm,
            phash64_image,
        )

        img = decode_ppm(_encode_ppm(24, 20, 1))
        other = decode_ppm(_encode_ppm(24, 20, 101))
        h = phash64_image(img)
        hj = phash64_image(decode_image_any("image/jpeg", encode_jpeg(img, quality=90)))
        ho = phash64_image(other)
        assert bin(h ^ hj).count("1") <= 6
        assert bin(h ^ ho).count("1") > 6

    def test_planted_corpus_pairs(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import image_phash_dups, make_phash_corpus

        media = ray.data.from_arrow(make_phash_corpus(12)).repartition(3)
        pairs = {
            (r["a"], r["b"])
            for r in image_phash_dups(media, max_hamming=6).take_all()
        }
        # every planted (png, bmp) twin collides at distance 0
        for i in range(12):
            assert (3 * i, 3 * i + 1) in pairs
        # no cross-base pair survives the verify
        for a, b in pairs:
            assert a // 3 == b // 3

    def test_audio_rows_ignored(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            image_phash_signatures,
            make_real_media_table,
        )

        media = ray.data.from_arrow(make_real_media_table(32)).repartition(2)
        sigs = image_phash_signatures(media).take_all()
        n_images = sum(1 for r in make_real_media_table(32).to_pylist() if r["kind"] == "image")
        assert len(sigs) == n_images


class TestAudioFingerprint:
    def test_scale_invariance_and_separation(self, ray_session):
        import numpy as np

        from ctinexus_ray.ops.multimodal import (
            _encode_wav,
            audio_spectral_hash,
            decode_wav,
        )

        _, s1 = decode_wav(_encode_wav(320.0, 400))
        _, s2 = decode_wav(_encode_wav(730.0, 400))
        n = min(len(s1), len(s2))
        base = (s1[:n] * 0.6 + s2[:n] * 0.4).astype(np.int16)
        h = audio_spectral_hash(base)
        assert 0 <= h < 2**63
        # a bit-exact copy collides exactly
        assert audio_spectral_hash(base.copy()) == h
        # amplitude re-level: signs hold up to int16 re-quantization
        # noise in near-zero cells — within the pairing threshold
        for scale in (0.5, 0.13):
            hs = audio_spectral_hash((base * scale).astype(np.int16))
            assert bin(h ^ hs).count("1") <= 3
        # different pitches occupy different linear bands
        _, o1 = decode_wav(_encode_wav(320.0 + 95, 400))
        _, o2 = decode_wav(_encode_wav(730.0 + 268, 400))
        m = min(len(o1), len(o2))
        other = (o1[:m] * 0.6 + o2[:m] * 0.4).astype(np.int16)
        d = bin(h ^ audio_spectral_hash(other)).count("1")
        assert d > 3

    def test_short_clip_hashes_zero(self, ray_session):
        import numpy as np

        from ctinexus_ray.ops.multimodal import audio_spectral_hash

        assert audio_spectral_hash(np.zeros(3, dtype=np.int16)) == 0

    def test_planted_corpus_pairs(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            audio_hash_dups,
            make_audio_dup_corpus,
        )

        media = ray.data.from_arrow(make_audio_dup_corpus(10)).repartition(3)
        pairs = {
            (r["a"], r["b"])
            for r in audio_hash_dups(media, max_hamming=3).take_all()
        }
        for i in range(10):
            assert (3 * i, 3 * i + 1) in pairs  # re-levelled twin
        for a, b in pairs:
            assert a // 3 == b // 3  # no cross-base pair


class TestMediaDedupKeep:
    def test_image_keep_path(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            image_phash_dups,
            make_phash_corpus,
            media_dedup_keep,
        )

        media = ray.data.from_arrow(make_phash_corpus(8)).repartition(3)
        pairs = image_phash_dups(media, max_hamming=6)
        kept = media_dedup_keep(media, pairs)
        ids = sorted(r["media_id"] for r in kept.select_columns(["media_id"]).take_all())
        # each planted triple collapses to its smallest id (3i); any
        # jpeg falling outside the threshold survives alone
        assert all(3 * i in ids for i in range(8))
        assert all(i % 3 != 1 for i in ids)  # the bmp twin always drops
        # survivors keep their payload column
        row = kept.take(1)[0]
        assert isinstance(row["payload"], bytes) and len(row["payload"]) > 0

    def test_audio_keep_path(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            audio_hash_dups,
            make_audio_dup_corpus,
            media_dedup_keep,
        )

        media = ray.data.from_arrow(make_audio_dup_corpus(6)).repartition(2)
        pairs = audio_hash_dups(media, max_hamming=3)
        kept = media_dedup_keep(media, pairs)
        ids = sorted(r["media_id"] for r in kept.select_columns(["media_id"]).take_all())
        # re-levelled twins (3i+1) always collapse into 3i; the
        # different-mix rows (3i+2) always survive
        assert ids == sorted([3 * i for i in range(6)] + [3 * i + 2 for i in range(6)])


class TestVideoFingerprint:
    def test_reencode_near_different_far(self, ray_session):
        from ctinexus_ray.ops.multimodal import (
            make_video_dup_corpus,
            video_grid_signature,
        )

        rows = make_video_dup_corpus(4).to_pylist()
        sigs = [video_grid_signature(r["payload"]) for r in rows]
        for i in range(4):
            assert 0 <= sigs[3 * i] < 2**63
            # q70 re-encode of the same frames: within the threshold
            assert bin(sigs[3 * i] ^ sigs[3 * i + 1]).count("1") <= 6
            # a different video: far outside it
            assert bin(sigs[3 * i] ^ sigs[3 * i + 2]).count("1") > 6

    def test_non_mjpeg_refuses(self, ray_session):
        import numpy as np
        import pytest

        from ctinexus_ray.ops.mp4 import build_mp4
        from ctinexus_ray.ops.multimodal import video_grid_signature

        payload = build_mp4(
            0, timescale=1000, frame_delta=100,
            frames=[b"\x00" * 64], codec=b"avc1", width=8, height=8,
        )
        with pytest.raises(NotImplementedError, match="avc1"):
            video_grid_signature(payload)

    def test_planted_corpus_pairs(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            make_video_dup_corpus,
            video_hash_dups,
        )

        media = ray.data.from_arrow(make_video_dup_corpus(6)).repartition(2)
        pairs = {
            (r["a"], r["b"])
            for r in video_hash_dups(media, max_hamming=6).take_all()
        }
        for i in range(6):
            assert (3 * i, 3 * i + 1) in pairs  # the re-encoded twin
        for a, b in pairs:
            assert a // 3 == b // 3  # no cross-video pair
