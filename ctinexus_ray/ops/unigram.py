"""Distributed unigram-LM subword tokenizer training (SentencePiece).

Kudo (2018), *Subword Regularization: Improving Neural Network
Translation Models with Multiple Subword Candidates* (arXiv:1804.10959)
— the OTHER mainstream subword algorithm beside BPE (``ops/bpe.py``):
start from a large seed vocabulary of frequent substrings, fit piece
probabilities with EM over the segmentation lattice, and repeatedly
prune the pieces whose removal costs the corpus likelihood least,
until the target vocabulary size is reached.

Scale shape (mirrors ``bpe_train``): the corpus is scanned ONCE into
the distinct-word count table (vocabulary-sized, orders of magnitude
smaller than the corpus); seeding is one substring-count combine +
hash-partitioned agg + top-k cut; every EM iteration is a single
``map_batches`` over the word table with the piece table broadcast as
a constructor-sized dict (pieces are bounded by ``seed_size``), and
the expected counts come back as per-batch-combined integer partials.
Pruning runs on the driver over the PIECE table only (seed-sized by
construction, never corpus-sized).

Determinism (the engine-wide bit-exactness rule): per-word
forward/backward runs in a fixed loop order, and each word's expected
piece counts are quantized to INTEGER micro-units BEFORE any cross-word
summation — so the distributed reduce is an order-independent int64
sum and training is bit-stable across reshards, worker counts, and
runs. Iterative EM is not SQL-expressible -> the driver queries are
rows-only; parity is pinned by a test against an independent
single-process reference implementation with the identical
quantization.

Reference parity note: the reference CTINexus tool consumes pretrained
tokenizers (litellm counts tokens server-side,
/root/reference/ctinexus/llm_processor.py:1229-1272); a corpus-scale
engine must TRAIN them, so the contract here is Kudo's published
algorithm, not a reference file.
"""

from __future__ import annotations

import math
from collections import Counter

import pyarrow as pa

import ray
import ray.data

_MICRO = 1_000_000  # expected-count quantization (integer micro-units)


# ---------------------------------------------------------------------------
# seeding
# ---------------------------------------------------------------------------


def _substring_partials(max_piece_len: int):
    def fn(batch: pa.Table):
        c: Counter = Counter()
        words = batch.column("word").to_pylist()
        ns = batch.column("n").to_pylist()
        for w, n in zip(words, ns):
            if not w:
                continue
            L = len(w)
            for i in range(L):
                for j in range(i + 1, min(i + max_piece_len, L) + 1):
                    c[w[i:j]] += n
        if not c:
            return
        yield pa.Table.from_pydict(
            {
                "piece": pa.array(list(c.keys()), type=pa.string()),
                "n": pa.array(list(c.values()), type=pa.int64()),
            }
        )

    return fn


def seed_pieces(
    words: ray.data.Dataset, seed_size: int = 2048, max_piece_len: int = 8
) -> dict[str, int]:
    """Seed vocabulary: the ``seed_size`` most frequent substrings (count
    weighted by word frequency; ties broken lexicographically) UNION all
    single characters (which are never pruned — they guarantee every
    word stays segmentable). Returns {piece: raw count}."""
    from .groupagg import partitioned_agg

    totals = partitioned_agg(
        words.map_batches(
            _substring_partials(max_piece_len), batch_format="pyarrow"
        ),
        keys=["piece"],
        named_aggs={"n": ("n", "sum")},
    )
    totals = totals.materialize()  # consumed by two cuts below

    # top-k cut: batch-local top-k partials, tiny driver merge — the
    # established no-corpus-sort shape (ops/shards.py samplers)
    def local_cut(batch: pa.Table):
        import pyarrow.compute as pc

        k = min(seed_size, batch.num_rows)
        idx = pc.select_k_unstable(
            batch, k, [("n", "descending"), ("piece", "ascending")]
        )
        yield batch.take(idx)

    # single chars ride their OWN filter, not the top-k survivors: a
    # rare character must survive even when its partition holds
    # seed_size higher-count pieces, or words containing it become
    # unsegmentable (the never-pruned invariant). Alphabet-sized pull.
    def singles_only(batch: pa.Table):
        import pyarrow.compute as pc

        mask = pc.equal(pc.utf8_length(batch.column("piece")), 1)
        t = batch.filter(mask)
        if t.num_rows:
            yield t

    rows = totals.map_batches(local_cut, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (-r["n"], r["piece"]))
    singles = {
        r["piece"]: int(r["n"])
        for r in totals.map_batches(
            singles_only, batch_format="pyarrow"
        ).take_all()
    }
    pieces: dict[str, int] = {}
    for r in rows:
        if len(pieces) >= seed_size:
            break
        pieces[r["piece"]] = int(r["n"])
    pieces.update(singles)  # single chars always in, beyond the cap
    return pieces


# ---------------------------------------------------------------------------
# EM
# ---------------------------------------------------------------------------


def _logprobs(counts: dict[str, int]) -> dict[str, float]:
    """Piece log-probabilities from integer counts. Computed identically
    (same dict iteration over the same broadcast ints, same libm) on
    every worker — bit-stable."""
    total = float(sum(counts.values()))
    return {p: math.log(n / total) for p, n in counts.items()}


def _expected_counts_word(
    w: str, logp: dict[str, float], max_piece_len: int
) -> dict[str, float]:
    """Forward-backward over the segmentation lattice of one word:
    E[count of piece spanning (j, i)] = exp(a[j] + logp + b[i] - a[n]).
    Fixed loop order -> deterministic floats."""
    n = len(w)
    NEG = -1e30
    a = [NEG] * (n + 1)
    a[0] = 0.0
    for i in range(1, n + 1):
        acc = None
        for j in range(max(0, i - max_piece_len), i):
            lp = logp.get(w[j:i])
            if lp is None or a[j] <= NEG / 2:
                continue
            s = a[j] + lp
            acc = s if acc is None else (
                max(acc, s) + math.log1p(math.exp(-abs(acc - s)))
            )
        if acc is not None:
            a[i] = acc
    if a[n] <= NEG / 2:
        return {}
    b = [NEG] * (n + 1)
    b[n] = 0.0
    for j in range(n - 1, -1, -1):
        acc = None
        for i in range(j + 1, min(j + max_piece_len, n) + 1):
            lp = logp.get(w[j:i])
            if lp is None or b[i] <= NEG / 2:
                continue
            s = lp + b[i]
            acc = s if acc is None else (
                max(acc, s) + math.log1p(math.exp(-abs(acc - s)))
            )
        if acc is not None:
            b[j] = acc
    out: dict[str, float] = {}
    for j in range(n):
        for i in range(j + 1, min(j + max_piece_len, n) + 1):
            piece = w[j:i]
            lp = logp.get(piece)
            if lp is None or a[j] <= NEG / 2 or b[i] <= NEG / 2:
                continue
            e = math.exp(a[j] + lp + b[i] - a[n])
            if e > 0.0:
                out[piece] = out.get(piece, 0.0) + e
    return out


class _EStage:
    """Actor-pool E-step: piece log-probs are built ONCE per actor from
    the broadcast integer counts (constructor arg — never per batch);
    the lattice runs once per DISTINCT word because the input is the
    word-count table, not the corpus."""

    def __init__(self, counts: dict[str, int], max_piece_len: int):
        self.logp = _logprobs(counts)
        self.max_piece_len = max_piece_len

    def __call__(self, batch: pa.Table):
        c: Counter = Counter()
        words = batch.column("word").to_pylist()
        ns = batch.column("n").to_pylist()
        for w, n in zip(words, ns):
            if not w:
                continue
            for piece, e in _expected_counts_word(
                w, self.logp, self.max_piece_len
            ).items():
                # quantize PER WORD before any cross-word sum: the
                # distributed reduce is then an order-independent int add
                c[piece] += int(e * n * _MICRO + 0.5)
        if not c:
            return
        yield pa.Table.from_pydict(
            {
                "piece": pa.array(list(c.keys()), type=pa.string()),
                "micro": pa.array(list(c.values()), type=pa.int64()),
            }
        )


def _em_step(
    words: ray.data.Dataset,
    counts: dict[str, int],
    max_piece_len: int,
    concurrency: int = 2,
) -> dict[str, int]:
    """One distributed E+M step: expected integer micro-counts per piece.
    Pieces absent from every lattice drop to 0 and are removed (except
    single chars, floored at 1 so words never become unsegmentable)."""
    from .groupagg import partitioned_agg

    agg = partitioned_agg(
        words.map_batches(
            _EStage,
            fn_constructor_args=(counts, max_piece_len),
            batch_format="pyarrow",
            # the E-step actor pool: size to the word table, not the
            # corpus — at web scale (billions of distinct words) raise
            # this with the cluster
            concurrency=concurrency,
        ),
        keys=["piece"],
        named_aggs={"micro": ("micro", "sum")},
    )
    new: dict[str, int] = {}
    for row in agg.take_all():  # piece table: seed-sized by construction
        if row["micro"] > 0:
            new[row["piece"]] = int(row["micro"])
    for p in counts:
        if len(p) == 1 and p not in new:
            new[p] = 1
    return new


# ---------------------------------------------------------------------------
# pruning (driver-side, piece table only)
# ---------------------------------------------------------------------------


def _viterbi_score(
    s: str, logp: dict[str, float], max_piece_len: int, skip: str | None = None
) -> float | None:
    """Best segmentation log-prob of ``s``; ``skip`` excludes one piece
    (the removal-cost probe). None if unsegmentable without it."""
    n = len(s)
    NEG = -1e30
    best = [NEG] * (n + 1)
    best[0] = 0.0
    for i in range(1, n + 1):
        for j in range(max(0, i - max_piece_len), i):
            piece = s[j:i]
            if piece == skip:
                continue
            lp = logp.get(piece)
            if lp is None or best[j] <= NEG / 2:
                continue
            if best[j] + lp > best[i]:
                best[i] = best[j] + lp
    return None if best[n] <= NEG / 2 else best[n]


def _prune(
    counts: dict[str, int], keep: int, max_piece_len: int
) -> dict[str, int]:
    """Keep the ``keep`` multi-char pieces whose removal costs the
    likelihood most (loss = freq x (own logprob - best alternative
    segmentation)), plus every single char. Ties: larger count, then
    lexicographic — fully deterministic."""
    logp = _logprobs(counts)
    scored: list[tuple[float, int, str]] = []
    for p, n in counts.items():
        if len(p) == 1:
            continue
        alt = _viterbi_score(p, logp, max_piece_len, skip=p)
        loss = float("inf") if alt is None else n * (logp[p] - alt)
        scored.append((loss, n, p))
    scored.sort(key=lambda t: (-t[0], -t[1], t[2]))
    kept = {p: counts[p] for _, _, p in scored[:keep]}
    kept.update({p: n for p, n in counts.items() if len(p) == 1})
    return kept


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def unigram_train(
    docs: ray.data.Dataset,
    vocab_size: int = 512,
    seed_size: int = 2048,
    max_piece_len: int = 8,
    em_iters: int = 2,
    shrink: float = 0.75,
    em_concurrency: int = 2,
) -> ray.data.Dataset:
    """Train a unigram-LM subword vocabulary (Kudo 2018 / SentencePiece
    shape): seed -> [EM x em_iters -> prune to shrink x size] until at
    most ``vocab_size`` multi-char pieces remain, then a final EM pass.

    Output: (piece, micro [int64 expected micro-count], logprob_nano
    [int64, ln(p) x 1e9, floor(x+0.5) of a deterministically computed
    double]) sorted by (micro desc, piece asc).
    """
    from .bpe import _word_table

    words = _word_table(docs).materialize()
    counts = seed_pieces(words, seed_size=seed_size, max_piece_len=max_piece_len)
    n_multi = sum(1 for p in counts if len(p) > 1)
    while True:
        for _ in range(em_iters):
            counts = _em_step(
                words, counts, max_piece_len, concurrency=em_concurrency
            )
        if n_multi <= vocab_size:
            break
        target = max(vocab_size, int(n_multi * shrink))
        if target >= n_multi:
            target = vocab_size
        counts = _prune(counts, target, max_piece_len)
        n_multi = sum(1 for p in counts if len(p) > 1)

    total = float(sum(counts.values()))
    rows = sorted(counts.items(), key=lambda t: (-t[1], t[0]))
    return ray.data.from_arrow(
        pa.Table.from_pydict(
            {
                "piece": pa.array([p for p, _ in rows], type=pa.string()),
                "micro": pa.array([n for _, n in rows], type=pa.int64()),
                "logprob_nano": pa.array(
                    [
                        int(math.floor(math.log(n / total) * 1e9 + 0.5))
                        for _, n in rows
                    ],
                    type=pa.int64(),
                ),
            }
        )
    )


class UnigramEncodeStage:
    """Actor-pool Viterbi encoder: piece log-probs + a word -> piece-count
    memo built once per actor (same memoization argument as
    ``BpeEncodeStage`` — distinct words, not tokens, pay the lattice)."""

    def __init__(self, counts: dict[str, int], max_piece_len: int = 8):
        self.logp = _logprobs(counts)
        self.max_piece_len = max_piece_len
        self._memo: dict[str, int] = {}

    def n_pieces(self, w: str) -> int:
        hit = self._memo.get(w)
        if hit is not None:
            return hit
        n = len(w)
        NEG = -1e30
        best = [NEG] * (n + 1)
        nseg = [0] * (n + 1)
        best[0] = 0.0
        for i in range(1, n + 1):
            for j in range(max(0, i - self.max_piece_len), i):
                lp = self.logp.get(w[j:i])
                if lp is None or best[j] <= NEG / 2:
                    continue
                if best[j] + lp > best[i]:
                    best[i] = best[j] + lp
                    nseg[i] = nseg[j] + 1
        # single chars are always in the vocab (training invariant), so
        # unsegmentable means chars unseen at training time: count them 1:1
        out = nseg[n] if best[n] > NEG / 2 else n
        self._memo[w] = out
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .textstats import _tokens

        counts = []
        for t in batch.column("text").to_pylist():
            if t is None:
                counts.append(0)
                continue
            counts.append(sum(self.n_pieces(w) for w in _tokens(t)))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "n_pieces": pa.array(counts, type=pa.int64()),
            }
        )


def unigram_encode(
    docs: ray.data.Dataset,
    counts: dict[str, int],
    max_piece_len: int = 8,
    concurrency: int = 4,
) -> ray.data.Dataset:
    """Per-document subword counts under a trained unigram vocabulary.
    The piece table is vocabulary-sized and ships once per actor as a
    constructor arg. Output: (doc_id, n_pieces)."""
    return docs.map_batches(
        UnigramEncodeStage,
        fn_constructor_args=(counts, max_piece_len),
        batch_format="pyarrow",
        concurrency=concurrency,
    )
