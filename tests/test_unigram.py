"""Unigram-LM tokenizer training (ops/unigram.py) — parity against an
independent single-process reference with the identical quantization,
plus semantic invariants (single-char floor, prune monotonicity,
Viterbi encode)."""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa
import pytest

import ray

from ctinexus_ray.ops.unigram import (
    _MICRO,
    UnigramEncodeStage,
    _expected_counts_word,
    _logprobs,
    _prune,
    _viterbi_score,
    unigram_encode,
    unigram_train,
)

DOCS = [
    "the quick brown fox jumps over the lazy dog",
    "the quick dog runs over the lazy fox",
    "lazy lazy lazy dogs and foxes run quick",
    "over and over the quick brown foxes jump",
    "dogs run and foxes jump over lazy dogs",
] * 3


def _docs_table():
    return pa.table(
        {"doc_id": list(range(len(DOCS))), "text": DOCS}
    )


# ---------------------------------------------------------------------------
# independent single-process reference (sequential dicts end-to-end)
# ---------------------------------------------------------------------------


def _ref_train(texts, vocab_size, seed_size, max_piece_len, em_iters, shrink):
    words = Counter()
    for t in texts:
        for w in t.strip().split():
            words[w] += 1

    seeds = Counter()
    for w, n in words.items():
        for i in range(len(w)):
            for j in range(i + 1, min(i + max_piece_len, len(w)) + 1):
                seeds[w[i:j]] += n
    ranked = sorted(seeds.items(), key=lambda t: (-t[1], t[0]))
    counts = dict(ranked[:seed_size])
    counts.update({p: n for p, n in seeds.items() if len(p) == 1})

    def em(counts):
        logp = _logprobs(counts)
        acc = Counter()
        for w, n in words.items():
            for piece, e in _expected_counts_word(w, logp, max_piece_len).items():
                acc[piece] += int(e * n * _MICRO + 0.5)
        new = {p: v for p, v in acc.items() if v > 0}
        for p in counts:
            if len(p) == 1 and p not in new:
                new[p] = 1
        return new

    n_multi = sum(1 for p in counts if len(p) > 1)
    while True:
        for _ in range(em_iters):
            counts = em(counts)
        if n_multi <= vocab_size:
            break
        target = max(vocab_size, int(n_multi * shrink))
        if target >= n_multi:
            target = vocab_size
        counts = _prune(counts, target, max_piece_len)
        n_multi = sum(1 for p in counts if len(p) > 1)
    return counts


@pytest.mark.usefixtures("ray_session")
class TestUnigramTrain:
    PARAMS = dict(
        vocab_size=24, seed_size=96, max_piece_len=6, em_iters=2, shrink=0.75
    )

    def _train_df(self):
        ds = ray.data.from_arrow(_docs_table())
        return unigram_train(ds, **self.PARAMS).to_pandas()

    def test_matches_sequential_reference(self):
        got = self._train_df()
        ref = _ref_train(DOCS, **self.PARAMS)
        ref_rows = sorted(ref.items(), key=lambda t: (-t[1], t[0]))
        assert list(got["piece"]) == [p for p, _ in ref_rows]
        assert list(got["micro"]) == [n for _, n in ref_rows]
        total = float(sum(ref.values()))
        assert list(got["logprob_nano"]) == [
            int(math.floor(math.log(n / total) * 1e9 + 0.5)) for _, n in ref_rows
        ]

    def test_single_chars_survive_and_vocab_bounded(self):
        got = self._train_df()
        pieces = set(got["piece"])
        chars = {c for t in DOCS for c in t if c != " "}
        assert chars <= pieces
        n_multi = sum(1 for p in pieces if len(p) > 1)
        assert n_multi <= self.PARAMS["vocab_size"]

    def test_reshard_stability(self):
        ds = ray.data.from_arrow(_docs_table()).repartition(7)
        got = unigram_train(ds, **self.PARAMS).to_pandas()
        base = self._train_df()
        assert list(got["piece"]) == list(base["piece"])
        assert list(got["micro"]) == list(base["micro"])


class TestLattice:
    def test_expected_counts_sum_to_lattice_mass(self):
        # E[#pieces used] per position: sum over pieces of expected
        # counts, weighted by piece length, equals the word length
        logp = _logprobs({"a": 5, "b": 3, "ab": 2, "ba": 1})
        e = _expected_counts_word("abab", logp, 4)
        mass = sum(len(p) * v for p, v in e.items())
        assert abs(mass - 4.0) < 1e-9

    def test_viterbi_skip(self):
        logp = _logprobs({"a": 2, "b": 2, "ab": 4})
        with_ab = _viterbi_score("ab", logp, 4)
        without = _viterbi_score("ab", logp, 4, skip="ab")
        assert with_ab > without  # removing 'ab' forces 'a'+'b'

    def test_prune_keeps_high_loss(self):
        counts = {"a": 10, "b": 10, "c": 10, "ab": 50, "bc": 1}
        kept = _prune(counts, keep=1, max_piece_len=4)
        assert "ab" in kept and "bc" not in kept
        assert {"a", "b", "c"} <= set(kept)


@pytest.mark.usefixtures("ray_session")
class TestEncode:
    def test_encode_counts(self):
        counts = {"th": 5, "e": 5, "t": 2, "h": 2, "qu": 3, "ick": 3,
                  "q": 1, "u": 1, "i": 1, "c": 1, "k": 1}
        ds = ray.data.from_arrow(
            pa.table({"doc_id": [0, 1], "text": ["the quick", None]})
        )
        out = unigram_encode(ds, counts, max_piece_len=4, concurrency=1)
        df = out.to_pandas().sort_values("doc_id")
        # 'the' -> th|e (2), 'quick' -> qu|ick (2)
        assert list(df["n_pieces"]) == [4, 0]

    def test_unseen_chars_count_one_each(self):
        stage = UnigramEncodeStage({"a": 1}, max_piece_len=4)
        assert stage.n_pieces("xyz") == 3


@pytest.mark.usefixtures("ray_session")
class TestSeedSingles:
    def test_rare_single_char_survives_tiny_seed(self):
        """The never-pruned single-char invariant must hold even when
        the top-k cut is smaller than the substring competition: 'q'
        appears once among high-count multi-char pieces."""
        import ray

        from ctinexus_ray.ops.bpe import _word_table
        from ctinexus_ray.ops.unigram import seed_pieces

        docs = ["abab abab abab baba abab"] * 20 + ["q"]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": list(range(len(docs))), "text": docs})
        )
        words = _word_table(ds)
        pieces = seed_pieces(words, seed_size=3, max_piece_len=4)
        assert "q" in pieces
        assert {"a", "b"} <= set(pieces)
