"""auc_rank (ops/mleval.py) vs a from-first-principles O(n^2) pair count."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from ctinexus_ray.ops.mleval import auc_rank


def _ds(scores, labels):
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "s": pa.array(scores, type=pa.int64()),
                "y": pa.array(labels, type=pa.int64()),
            }
        )
    )


def _brute_auc(scores, labels):
    s = np.asarray(scores, dtype=np.int64)
    y = np.asarray(labels, dtype=np.int64)
    pos, neg = s[y == 1], s[y == 0]
    num = 0
    for p in pos:
        num += 2 * int((p > neg).sum()) + int((p == neg).sum())
    return len(pos), len(neg), num, 2 * len(pos) * len(neg)


def _run(scores, labels, **kw):
    row = auc_rank(_ds(scores, labels), "s", "y", **kw).take_all()[0]
    return (row["n_pos"], row["n_neg"], row["auc_num"], row["auc_den"])


class TestAucRank:
    def test_random_matches_brute_force(self, ray_session):
        rng = np.random.RandomState(5)
        scores = rng.randint(0, 50, 400).tolist()  # heavy ties
        labels = rng.randint(0, 2, 400).tolist()
        assert _run(scores, labels) == _brute_auc(scores, labels)

    def test_perfect_separation(self, ray_session):
        n_pos, n_neg, num, den = _run([10, 11, 12, 1, 2, 3], [1, 1, 1, 0, 0, 0])
        assert (n_pos, n_neg) == (3, 3)
        assert num == den  # AUC = 1.0

    def test_all_tied_is_half(self, ray_session):
        n_pos, n_neg, num, den = _run([7] * 6, [1, 0, 1, 0, 1, 0])
        assert num * 2 == den  # AUC = 0.5

    def test_null_label_counts_as_negative(self, ray_session):
        ds = ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "s": pa.array([5, 9], type=pa.int64()),
                    "y": pa.array([None, 1], type=pa.int64()),
                }
            )
        )
        row = auc_rank(ds, "s", "y").take_all()[0]
        assert (row["n_pos"], row["n_neg"]) == (1, 1)
        assert row["auc_num"] == row["auc_den"]  # 9 > 5

    def test_negative_score_raises(self, ray_session):
        with pytest.raises(Exception, match="non-negative"):
            auc_rank(_ds([-1, 2], [0, 1]), "s", "y").take_all()

    def test_non_binary_label_raises(self, ray_session):
        with pytest.raises(Exception, match="0/1"):
            auc_rank(_ds([1, 2], [0, 2]), "s", "y").take_all()

    def test_small_range_size_matches(self, ray_session):
        rng = np.random.RandomState(9)
        scores = rng.randint(0, 1000, 300).tolist()
        labels = rng.randint(0, 2, 300).tolist()
        assert _run(scores, labels, range_size=16) == _brute_auc(
            scores, labels
        )


class TestChi2Terms:
    """chi2_terms (ops/textstats.py) vs a from-first-principles
    contingency computation."""

    def _docs(self, rows):
        return ray.data.from_arrow(
            pa.Table.from_pydict(
                {
                    "lang": pa.array([r[0] for r in rows], type=pa.string()),
                    "text": pa.array([r[1] for r in rows], type=pa.string()),
                }
            )
        )

    @staticmethod
    def _brute(rows, k):
        import math
        from collections import defaultdict

        # N spans ALL docs (a NULL-lang doc counts as "not containing"
        # on the d diagonal); the (lang, word) cells exclude NULL lang —
        # mirrors the engine/oracle contract
        n = len(rows)
        rows = [(la, t) for la, t in rows if la is not None]
        docs = [(la, set((t or "").strip().split())) for la, t in rows]
        nl = defaultdict(int)
        for la, _ in docs:
            nl[la] += 1
        a = defaultdict(int)
        for la, ws in docs:
            for w in ws:
                a[(la, w)] += 1
        df = defaultdict(int)
        for (la, w), v in a.items():
            df[w] += v
        out = defaultdict(list)
        for (la, w), av in a.items():
            if df[w] >= n or nl[la] >= n:
                continue
            b = df[w] - av
            c = nl[la] - av
            d = n - df[w] - c
            diff = float(av * d - b * c)
            num = float(n) * (diff * diff)
            den = (
                (float(av + b) * float(c + d)) * float(av + c)
            ) * float(b + d)
            out[la].append((int(math.floor((1e6 * num) / den + 0.5)), w))
        ranked = {}
        for la, terms in out.items():
            terms.sort(key=lambda t: (-t[0], t[1]))
            ranked[la] = [
                (i + 1, w, s) for i, (s, w) in enumerate(terms[:k])
            ]
        return ranked

    def test_matches_brute_force(self, ray_session):
        from ctinexus_ray.ops.textstats import chi2_terms

        rng = np.random.RandomState(13)
        vocab = [f"w{i}" for i in range(12)]
        rows = []
        for i in range(80):
            la = ("aa", "bb", "cc")[i % 3]
            words = list(rng.choice(vocab, size=6))
            if la == "aa":
                words.append("shibboleth")  # planted discriminative term
            rows.append((la, " ".join(words)))
        got = {}
        for r in chi2_terms(self._docs(rows), k=5, num_partitions=4).take_all():
            got.setdefault(r["lang"], []).append(
                (r["rn"], r["word"], r["chi2_micro"])
            )
        for la in got:
            got[la].sort()
        assert got == self._brute(rows, 5)
        assert got["aa"][0][1] == "shibboleth"

    def test_null_lang_excluded(self, ray_session):
        from ctinexus_ray.ops.textstats import chi2_terms

        rows = [("aa", "x y"), ("bb", "y z"), (None, "x z q")]
        out = chi2_terms(self._docs(rows), k=10, num_partitions=4).take_all()
        assert {r["lang"] for r in out} == {"aa", "bb"}
        assert self._brute(rows, 10) == {
            la: sorted(
                [
                    (r["rn"], r["word"], r["chi2_micro"])
                    for r in out
                    if r["lang"] == la
                ]
            )
            for la in ("aa", "bb")
        }
