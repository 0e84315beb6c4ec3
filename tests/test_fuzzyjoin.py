"""FastSS deletion-neighborhood edit-distance self-join semantics."""

from __future__ import annotations

import itertools

import pyarrow as pa
import pytest

import ray.data

from ctinexus_ray.ops.fuzzyjoin import (
    deletion_variants,
    edit_distance_pairs,
    levenshtein_within,
)


def _lev_ref(a: str, b: str) -> int:
    """Unbounded reference Levenshtein (full DP)."""
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[lb]


def _names(rows: list[tuple[int, str | None]]) -> ray.data.Dataset:
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "id": pa.array([r[0] for r in rows], type=pa.int64()),
                "name": pa.array([r[1] for r in rows], type=pa.string()),
            }
        )
    )


class TestLevenshteinWithin:
    def test_matches_reference_exhaustively(self):
        alphabet = "ab"
        words = [
            "".join(w)
            for n in range(4)
            for w in itertools.product(alphabet, repeat=n)
        ]
        for a in words:
            for b in words:
                true = _lev_ref(a, b)
                for d in (0, 1, 2):
                    got = levenshtein_within(a, b, d)
                    assert got == (true if true <= d else None), (a, b, d)

    def test_classic_cases(self):
        assert levenshtein_within("kitten", "sitting", 3) == 3
        assert levenshtein_within("kitten", "sitting", 2) is None
        assert levenshtein_within("", "abc", 3) == 3


class TestDeletionVariants:
    def test_depth_one(self):
        assert deletion_variants("abc", 1) == {"abc", "bc", "ac", "ab"}

    def test_blocking_is_complete(self):
        # FastSS soundness: every pair within distance d shares a variant
        words = ["abcd", "abxd", "abd", "abcde", "zzzz"]
        for a in words:
            for b in words:
                d = _lev_ref(a, b)
                if d <= 2:
                    assert deletion_variants(a, 2) & deletion_variants(b, 2), (a, b)


class TestEditDistancePairs:
    def _pairs(self, ds, **kw):
        return {
            (r["id_a"], r["id_b"]): r["dist"]
            for r in edit_distance_pairs(ds, "id", "name", **kw).take_all()
        }

    def test_substitution_insert_delete(self, ray_session):
        ds = _names(
            [
                (0, "carol"),
                (1, "carl"),   # deletion: dist 1 from carol? c-a-r-o-l vs c-a-r-l = 1
                (2, "karol"),  # substitution vs carol
                (3, "xxxxx"),
            ]
        )
        got = self._pairs(ds, max_dist=1)
        assert got == {(0, 1): 1, (0, 2): 1}

    def test_exhaustive_vs_reference(self, ray_session):
        names = ["aa", "ab", "ba", "abc", "abd", "bc", "a", "", "zz", "az"]
        ds = _names(list(enumerate(names)))
        got = self._pairs(ds, max_dist=2)
        want = {
            (i, j): _lev_ref(a, b)
            for (i, a), (j, b) in itertools.combinations(enumerate(names), 2)
            if _lev_ref(a, b) <= 2
        }
        assert got == want

    def test_identical_strings_are_dist_zero(self, ray_session):
        ds = _names([(0, "same"), (1, "same"), (2, "same")])
        got = self._pairs(ds, max_dist=1)
        assert got == {(0, 1): 0, (0, 2): 0, (1, 2): 0}

    def test_null_names_skipped(self, ray_session):
        ds = _names([(0, "abc"), (1, None), (2, "abd")])
        assert self._pairs(ds, max_dist=1) == {(0, 2): 1}

    def test_max_bucket_engages_and_logs(self, ray_session, caplog):
        ds = _names([(i, "dup") for i in range(8)])
        got = self._pairs(ds, max_dist=1, max_bucket=2)
        # capped to the 2 smallest ids per block -> only (0, 1) survives
        assert got == {(0, 1): 0}
