"""Text analysis operators over a documents table: token counting, quality
metrics, language ID, fingerprinting.

All are stateless vectorizable ``map_batches`` stages over Arrow batches.
Semantics are chosen to be exactly reproducible in ANSI SQL (DuckDB) so the
driver's oracle can verify them value-for-value:

  * tokens   = regexp_split_to_array(trim(text), '\\s+')  (empty -> [''])
  * fp       = md5(lower(trim(text)))
"""

from __future__ import annotations

import hashlib
import re

import pyarrow as pa
import pyarrow.compute as pc

_WS_SPLIT_RE = re.compile(r"\s+")
_PUNCT_RE = re.compile(r"[^\w\s]")

# Tiny per-language stopword profiles for the n-gram/stopword language-ID
# heuristic (deterministic, dependency-free).
LANG_PROFILES: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to in is that it for on with as are was at by this be from or an have not".split()),
    "es": frozenset("el la de que y en los del se las por un para con una su al es lo como mas pero sus le".split()),
    "de": frozenset("der die und in den von zu das mit sich des auf fur ist im dem nicht ein eine als auch es an".split()),
    "fr": frozenset("le de la et les des en un du une que est pour qui dans par sur au plus pas avec ne se ce".split()),
}


def _tokens(text: str) -> list[str]:
    """SQL-compatible tokenization: split trimmed text on whitespace runs.
    Matches DuckDB regexp_split_to_array(trim(text), '\\s+') including the
    empty-string -> [''] edge case."""
    return _WS_SPLIT_RE.split(text.strip())


def token_count_batch(batch: pa.Table) -> pa.Table:
    texts = batch.column("text").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pa.array([len(_tokens(t or "")) for t in texts], type=pa.int64()),
        }
    )


def quality_batch(batch: pa.Table) -> pa.Table:
    """Integer quality metrics (SQL-mirrorable): char/word/distinct-word/
    punctuation counts. Downstream filters threshold on these."""
    texts = batch.column("text").to_pylist()
    n_chars, n_words, n_unique, n_punct = [], [], [], []
    for t in texts:
        t = t or ""
        toks = _tokens(t)
        n_chars.append(len(t))
        n_words.append(len(toks))
        n_unique.append(len({w.lower() for w in toks}))
        n_punct.append(len(_PUNCT_RE.findall(t)))
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_unique_words": pa.array(n_unique, type=pa.int64()),
            "n_punct": pa.array(n_punct, type=pa.int64()),
        }
    )


def gopher_quality_batch(
    batch: pa.Table,
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 10.0,
    min_alpha_ratio: float = 0.6,
) -> pa.Table:
    """Gopher-style document quality rules (Rae et al. 2021, public
    heuristics): word-count bounds, mean word length bounds, and
    alphabetic-character ratio, reduced to a ``keep`` flag.

    Fully vectorized Arrow kernels (no per-row Python), with every
    metric SQL-mirrorable so the oracle matches value-for-value:

      * n_words       = len(regexp_split_to_array(trim(text), '\\s+'))
      * mean_word_len = (len(trim) - whitespace chars in trim) / n_words
        (identical to averaging the word lengths; n_words >= 1 always
        because splitting '' yields [''])
      * alpha_ratio   = [A-Za-z] chars / total chars (0.0 for empty text)
    """
    text = batch.column("text")
    trimmed = pc.utf8_trim_whitespace(text)
    n_words = pc.cast(
        pc.list_value_length(pc.split_pattern_regex(trimmed, pattern=r"\s+")),
        pa.int64(),
    )
    word_chars = pc.subtract(
        pc.utf8_length(trimmed), pc.count_substring_regex(trimmed, r"\s")
    )
    mean_wl = pc.divide(
        pc.cast(word_chars, pa.float64()), pc.cast(n_words, pa.float64())
    )
    n_chars = pc.utf8_length(text)
    alpha = pc.count_substring_regex(text, "[A-Za-z]")
    alpha_ratio = pc.if_else(
        pc.equal(n_chars, 0),
        pa.scalar(0.0, type=pa.float64()),
        pc.divide(pc.cast(alpha, pa.float64()), pc.cast(n_chars, pa.float64())),
    )
    keep = pc.and_(
        pc.and_(
            pc.and_(
                pc.greater_equal(n_words, min_words),
                pc.less_equal(n_words, max_words),
            ),
            pc.and_(
                pc.greater_equal(mean_wl, min_mean_word_len),
                pc.less_equal(mean_wl, max_mean_word_len),
            ),
        ),
        pc.greater(alpha_ratio, min_alpha_ratio),
    )
    return pa.Table.from_arrays(
        [batch.column("doc_id"), n_words, mean_wl, alpha_ratio, keep],
        names=["doc_id", "n_words", "mean_word_len", "alpha_ratio", "keep"],
    )


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Document fingerprint: md5 of lower(trim(text)) — matches DuckDB
    ``md5(lower(trim(text)))`` for the oracle check."""
    texts = batch.column("text").to_pylist()
    fps = [
        hashlib.md5((t or "").strip().lower().encode("utf-8")).hexdigest()
        for t in texts
    ]
    return pa.Table.from_pydict(
        {"doc_id": batch.column("doc_id"), "fp": pa.array(fps, type=pa.string())}
    )


def langid_batch(batch: pa.Table) -> pa.Table:
    """Stopword-profile language ID. Deterministic argmax with fixed
    profile order (en, es, de, fr) breaking ties; 'und' when no hits."""
    texts = batch.column("text").to_pylist()
    preds, hits_out = [], []
    for t in texts:
        toks = [w.lower() for w in _tokens(t or "")]
        best_lang, best_hits = "und", 0
        for lang, profile in LANG_PROFILES.items():
            hits = sum(1 for w in toks if w in profile)
            if hits > best_hits:
                best_lang, best_hits = lang, hits
        preds.append(best_lang)
        hits_out.append(best_hits)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "lang_pred": pa.array(preds, type=pa.string()),
            "stopword_hits": pa.array(hits_out, type=pa.int64()),
        }
    )


def bigram_explode_batch(batch: pa.Table) -> pa.Table:
    """Explode documents into adjacent word-pair rows with per-batch
    combine: returns (bigram, n) partial counts — feed into a
    hash-partitioned sum like ``word_explode_batch``. Bigram = two
    consecutive whitespace tokens joined by one space; docs with < 2
    tokens contribute nothing."""
    from collections import Counter

    counter: Counter = Counter()
    for t in batch.column("text").to_pylist():
        toks = _tokens(t or "")
        counter.update(
            f"{a} {b}" for a, b in zip(toks, toks[1:])
        )
    grams = list(counter.keys())
    return pa.Table.from_pydict(
        {
            "bigram": pa.array(grams, type=pa.string()),
            "n": pa.array([counter[g] for g in grams], type=pa.int64()),
        }
    )


def doc_term_freq_batch(batch: pa.Table) -> pa.Table:
    """Explode documents into (doc_id, word, tf) rows — per-document term
    frequencies, the map side of TF-IDF. Output rows are unique per
    (doc_id, word), so a per-word count downstream IS the document
    frequency."""
    from collections import Counter

    ids, words, tfs = [], [], []
    for doc_id, t in zip(
        batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
    ):
        c = Counter(_tokens(t or ""))
        for w, tf in c.items():
            ids.append(doc_id)
            words.append(w)
            tfs.append(tf)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "word": pa.array(words, type=pa.string()),
            "tf": pa.array(tfs, type=pa.int64()),
        }
    )


def tfidf_top_terms(docs, k: int = 5, num_partitions: int = 64):
    """Top-k TF-IDF terms per document, fully distributed:

      1. explode to (doc_id, word, tf) partials (``doc_term_freq_batch``)
      2. document frequency per word via a hash-partitioned count —
         vocabulary grows with the corpus, so no built-in per-key groupby
         and no driver-side vocab
      3. (doc_id, word, tf) JOIN (word, df) with the two-large-sides
         ``hash_join`` — the vocabulary table can itself be corpus-scale,
         so the side is NOT broadcast
      4. score = tf * ln(N/df) (libm ``math.log`` memoized per distinct
         df so the doubles match a SQL ``ln`` bit-for-bit)
      5. top-k per doc via the distributed row_number window
         (``ops.relational.grouped_topn``)

    Returns (doc_id, rn, word, score), rn = 1..k by (score desc, word)."""
    import math

    from ctinexus_ray.ops.distjoin import hash_join
    from ctinexus_ray.ops.groupagg import partitioned_agg
    from ctinexus_ray.ops.relational import grouped_topn

    n_docs = docs.count()
    exploded = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_term_freq_batch, batch_format="pyarrow"
    )
    df = partitioned_agg(
        exploded.select_columns(["word"]),
        keys=["word"],
        named_aggs={"df": ("word", "size")},
        num_partitions=num_partitions,
    )
    joined = hash_join(
        exploded,
        df,
        on=["word"],
        num_partitions=num_partitions,
        left_types={"word": pa.string(), "doc_id": pa.int64(), "tf": pa.int64()},
        right_types={"word": pa.string(), "df": pa.int64()},
    )

    def score_batch(batch: pa.Table) -> pa.Table:
        idf_memo: dict[int, float] = {}
        dfs = batch.column("df").to_pylist()
        tfs = batch.column("tf").to_pylist()
        scores = []
        for d, tf in zip(dfs, tfs):
            idf = idf_memo.get(d)
            if idf is None:
                idf = math.log(n_docs / d)
                idf_memo[d] = idf
            scores.append(tf * idf)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "word": batch.column("word"),
                "score": pa.array(scores, type=pa.float64()),
            }
        )

    scored = joined.map_batches(score_batch, batch_format="pyarrow")
    return grouped_topn(
        scored,
        group_key="doc_id",
        order_col="score",
        n=k,
        tiebreak_col="word",
        num_partitions=num_partitions,
    )


def word_explode_batch(batch: pa.Table) -> pa.Table:
    """Explode documents into (word) rows with per-batch combine: returns
    (word, n) partial counts — feed into groupby('word').sum('n')."""
    from collections import Counter

    counter: Counter = Counter()
    for t in batch.column("text").to_pylist():
        counter.update(_tokens(t or ""))
    words = list(counter.keys())
    return pa.Table.from_pydict(
        {
            "word": pa.array(words, type=pa.string()),
            "n": pa.array([counter[w] for w in words], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# BPE-ish regex tokenization (subword-pretokenizer word counting)
# ---------------------------------------------------------------------------

# GPT-2-style pretokenizer, simplified to an RE2-compatible subset (no
# lookahead, ASCII classes) so DuckDB's regexp_extract_all computes the
# identical token stream and the oracle can verify counts value-for-value.
BPE_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"
_BPE_RE = re.compile(BPE_PATTERN)


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_bpe_tokens): count of BPE-pretokenizer matches."""
    texts = batch.column("text").to_pylist()
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_bpe_tokens": pa.array(
                [len(_BPE_RE.findall(t or "")) for t in texts], type=pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# winnowing fingerprints (rolling-hash document fingerprinting)
# ---------------------------------------------------------------------------

_WINNOW_BASE = 257
_WINNOW_MOD = (1 << 31) - 1  # Mersenne prime; keeps products in int64


def _kgram_rolling_hashes(text: str, k: int) -> "np.ndarray":
    """Karp-Rabin k-gram hashes for every position, vectorized as k
    shifted modular adds (each add spans all positions at once — the
    only Python loop is over the k byte offsets, and k is small)."""
    import numpy as np

    codes = np.frombuffer(text.encode("utf-8", "surrogatepass"), dtype=np.uint8)
    n = len(codes) - k + 1
    if n <= 0:
        return np.zeros(0, dtype=np.int64)
    c = codes.astype(np.int64)
    # powers B^0..B^(k-1) mod M (k is small)
    pw = np.empty(k, dtype=np.int64)
    pw[0] = 1
    for i in range(1, k):
        pw[i] = (pw[i - 1] * _WINNOW_BASE) % _WINNOW_MOD
    # h[i] = sum_{j<k} c[i+j] * B^(k-1-j) via k shifted adds (k tiny, each
    # add is vectorized over all positions)
    h = np.zeros(n, dtype=np.int64)
    for j in range(k):
        h = (h + c[j : j + n] * pw[k - 1 - j]) % _WINNOW_MOD
    return h


def winnow_fingerprints(text: str, k: int = 5, w: int = 4) -> list[tuple[int, int]]:
    """Winnowing (Schleimer/Wilkerson/Aiken): take the MINIMUM rolling
    k-gram hash in every window of ``w`` consecutive hashes, rightmost
    occurrence on ties; consecutive duplicate selections collapse.
    Returns [(pos, fingerprint)] — a sparse, shift-robust document
    signature for plagiarism/near-dup detection."""
    import numpy as np

    h = _kgram_rolling_hashes((text or "").lower(), k)
    n = len(h)
    if n == 0:
        return []
    if n <= w:
        pos = int(np.flatnonzero(h == h.min())[-1])
        return [(pos, int(h[pos]))]
    # sliding-window min via stride tricks (windows × w view, vectorized)
    win = np.lib.stride_tricks.sliding_window_view(h, w)
    mins = win.min(axis=1)
    # rightmost index of the min within each window
    rev_arg = w - 1 - np.argmin(win[:, ::-1], axis=1)
    picks = rev_arg + np.arange(len(win))
    out: list[tuple[int, int]] = []
    last = -1
    for p, m in zip(picks.tolist(), mins.tolist()):
        if p != last:
            out.append((p, int(m)))
            last = p
    return out


def winnow_batch(batch: pa.Table, k: int = 5, w: int = 4) -> pa.Table:
    """(doc_id, pos, fp) — exploded winnowing fingerprints per document."""
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_doc, out_pos, out_fp = [], [], []
    for doc_id, text in zip(doc_ids, texts):
        for pos, fp in winnow_fingerprints(text or "", k, w):
            out_doc.append(doc_id)
            out_pos.append(pos)
            out_fp.append(fp)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(out_doc, type=pa.int64()),
            "pos": pa.array(out_pos, type=pa.int64()),
            "fp": pa.array(out_fp, type=pa.int64()),
        }
    )


def _doc_ngrams(text: str, n: int) -> set:
    toks = _tokens(text or "")
    if len(toks) < n:
        return set()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def decontaminate(
    docs: "ray.data.Dataset",
    benchmark: "ray.data.Dataset",
    n: int = 8,
) -> "ray.data.Dataset":
    """Benchmark decontamination: flag every training document sharing any
    word n-gram with the benchmark/eval set (the GPT-3/PaLM 13-gram
    style check; n=8 here to fit short synthetic docs).

    Shape: the benchmark side is SMALL by construction (eval suites are
    thousands of documents, not billions), so its distinct n-grams are
    reduced distributedly, collected once, and broadcast via ``ray.put``
    — every train task then runs a pure set-membership filter with NO
    shuffle of the training corpus. Tokenization is the SQL-compatible
    whitespace split (``_tokens``), so the oracle joins the identical
    n-gram strings. If the benchmark n-gram set ever outgrew a broadcast
    (it should not), the fallback is an explode + ``distjoin.hash_join``
    on the n-gram string.

    Output: (doc_id, contaminated bool) for every doc in ``docs``.
    """
    import ray as _ray

    bench_sets = benchmark.map_batches(
        lambda b: pa.Table.from_pydict(
            {
                "g": pa.array(
                    list(set().union(*[_doc_ngrams(t, n) for t in
                                       b.column("text").to_pylist()]) or set()),
                    type=pa.string(),
                )
            }
        ),
        batch_format="pyarrow",
    )
    grams = set()
    for batch in bench_sets.iter_batches(batch_format="pyarrow"):
        grams.update(batch.column("g").to_pylist())
    grams_ref = _ray.put(grams)

    class FlagStage:
        def __init__(self, grams_ref):
            self.grams = _ray.get(grams_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            flags = [
                not self.grams.isdisjoint(_doc_ngrams(t, n))
                for t in batch.column("text").to_pylist()
            ]
            return pa.Table.from_pydict(
                {
                    "doc_id": batch.column("doc_id"),
                    "contaminated": pa.array(flags, type=pa.bool_()),
                }
            )

    return docs.map_batches(
        FlagStage,
        fn_constructor_kwargs={"grams_ref": grams_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def unigram_lm_scores(docs: "ray.data.Dataset") -> "ray.data.Dataset":
    """Per-document unigram language-model score: the mean token
    log-probability ``avg(ln(count(w) / N))`` under the corpus's own
    unigram distribution — the classic cheap fluency/quality signal
    (low score = rare-word soup; CCNet/Gopher use an LM perplexity
    filter of exactly this shape).

    Two passes: (1) global word counts via per-batch combine
    (``word_explode_batch``) + map-side-combined groupby — the moved
    data is vocabulary-sized, not corpus-sized; (2) the (word -> ln p)
    table broadcast once via ``ray.put`` and every document scored with
    a pure lookup pass, NO shuffle of the corpus. At 100 TB the full
    vocabulary may exceed a broadcast; the documented fallback is
    thresholding rare words into a single OOV probability class (count
    < k), which bounds the table at the head vocabulary. ln is libm —
    bit-identical to DuckDB's.

    Per-word log-probs are quantized to integer MICRO-NATS
    (``floor(ln(p) * 1e6 + 0.5)``) before the per-doc sum: a float sum
    is summation-order-dependent (measured 2.7e-15 drift vs the SQL
    avg()), so the per-doc aggregate is an exact BIGINT sum and the
    mean is one double division of two exact integers — hash-stable vs
    the oracle. Output: (doc_id, n_tokens, lm_score_u, lm_score).
    """
    import math

    import ray as _ray

    freq = (
        docs.map_batches(word_explode_batch, batch_format="pyarrow")
        .groupby("word")
        .sum("n")
    )
    counts: dict[str, int] = {}
    for batch in freq.iter_batches(batch_format="pyarrow"):
        counts.update(
            zip(batch.column("word").to_pylist(),
                batch.column("sum(n)").to_pylist())
        )
    total = sum(counts.values())
    logp = {
        w: math.floor(math.log(c / total) * 1e6 + 0.5)
        for w, c in counts.items()
    }
    logp_ref = _ray.put(logp)

    class ScoreStage:
        def __init__(self, logp_ref):
            self.logp = _ray.get(logp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, ns, usums = [], [], []
            lp = self.logp
            for doc_id, t in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("text").to_pylist()):
                toks = _tokens(t or "")
                ids.append(doc_id)
                ns.append(len(toks))
                usums.append(sum(lp[w] for w in toks))
            scores = [u / 1e6 / n for u, n in zip(usums, ns)]
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_tokens": pa.array(ns, type=pa.int64()),
                    "lm_score_u": pa.array(usums, type=pa.int64()),
                    "lm_score": pa.array(scores, type=pa.float64()),
                }
            )

    return docs.map_batches(
        ScoreStage,
        fn_constructor_kwargs={"logp_ref": logp_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def repetition_stats_batch(batch: pa.Table) -> pa.Table:
    """Gopher-style within-document repetition signals (Rae et al. 2021
    use duplicate-line and top-n-gram character fractions to drop
    boilerplate/spam; this corpus has no newlines, so the word-level
    analogues): duplicate-word fraction ``1 - distinct/total`` and the
    character fraction of the single most frequent word (ties break to
    the lexicographically smallest word, mirroring the SQL
    ``ORDER BY c DESC, w ASC`` window). Pure per-batch map — no shuffle,
    embarrassingly parallel at any corpus size. Output: (doc_id,
    n_words, n_distinct, dup_word_frac, top_word, top_word_frac).
    Float expressions evaluate in the same operation order as the
    DuckDB oracle so value hashes match bit-for-bit."""
    from collections import Counter

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    n_words, n_distinct, dup_frac, top_words, top_frac = [], [], [], [], []
    for t in texts:
        toks = _tokens(t or "")
        n = len(toks)  # >= 1: empty text tokenizes to ['']
        cnt = Counter(toks)
        nd = len(cnt)
        top_w, top_c = min(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
        char_total = sum(len(w) * c for w, c in cnt.items())
        n_words.append(n)
        n_distinct.append(nd)
        dup_frac.append(1.0 - nd / n)
        top_words.append(top_w)
        top_frac.append(
            (top_c * len(top_w)) / char_total if char_total else 0.0
        )
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_words": pa.array(n_words, type=pa.int64()),
            "n_distinct": pa.array(n_distinct, type=pa.int64()),
            "dup_word_frac": pa.array(dup_frac, type=pa.float64()),
            "top_word": pa.array(top_words, type=pa.string()),
            "top_word_frac": pa.array(top_frac, type=pa.float64()),
        }
    )


def pmi_top_bigrams(
    docs: "ray.data.Dataset",
    min_count: int = 5,
    top: int = 100,
    num_partitions: int = 64,
) -> "ray.data.Dataset":
    """Top bigrams by pointwise mutual information
    ``pmi = ln(P(w1,w2) / (P(w1) P(w2)))`` — the collocation-mining shape
    (Church & Hanks 1990) over a web corpus, fully distributed:

      1. bigram counts: per-batch combined partials
         (``bigram_explode_batch``) -> hash-partitioned sum (distinct
         bigrams grow with the corpus — no built-in per-key aggregate,
         no driver vocab)
      2. unigram counts: same shape via ``word_explode_batch``
      3. the two totals (token count, bigram count) are single scalars
         read off the aggregated datasets (both are materialized once —
         into the distributed object store, never the driver — because
         they are also join inputs)
      4. bigrams with ``n_ab >= min_count`` JOIN unigram counts on w1
         then on w2 with the two-large-sides ``hash_join`` (the
         vocabulary can itself be corpus-scale, so neither side is
         broadcast)
      5. pmi via libm ``math.log`` with the division order written
         exactly as the SQL oracle's expression, so doubles match
         bit-for-bit

    Returns (bigram, n_ab, pmi) — the ``top`` rows by (pmi desc, bigram).
    """
    import math

    from ctinexus_ray.ops.distjoin import hash_join
    from ctinexus_ray.ops.groupagg import partitioned_agg

    bi_partials = docs.select_columns(["text"]).map_batches(
        bigram_explode_batch, batch_format="pyarrow"
    )
    bc = partitioned_agg(
        bi_partials,
        keys=["bigram"],
        named_aggs={"n_ab": ("n", "sum")},
        num_partitions=num_partitions,
    ).materialize()
    w_partials = docs.select_columns(["text"]).map_batches(
        word_explode_batch, batch_format="pyarrow"
    )
    wc = partitioned_agg(
        w_partials,
        keys=["word"],
        named_aggs={"n": ("n", "sum")},
        num_partitions=num_partitions,
    ).materialize()
    n_tokens = wc.sum("n")
    n_pairs = bc.sum("n_ab")  # totals BEFORE the min_count filter

    def split_w1(batch: pa.Table):
        t = batch.filter(pc.greater_equal(batch.column("n_ab"), min_count))
        if t.num_rows == 0:
            return
        # tokens are whitespace-split, so a bigram has exactly one space
        parts = pc.split_pattern(t.column("bigram"), " ", max_splits=1)
        yield pa.Table.from_pydict(
            {
                "word": pc.list_element(parts, 0).cast(pa.string()),
                "w2": pc.list_element(parts, 1).cast(pa.string()),
                "n_ab": t.column("n_ab").cast(pa.int64()),
            }
        )

    def rename_n(to: str):
        # Dataset.rename_columns chokes on pandas-backed blocks (the
        # partitioned_agg output) — rename through an Arrow batch map
        def fn(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(
                [to if c == "n" else c for c in batch.column_names]
            )

        return fn

    filtered = bc.map_batches(split_w1, batch_format="pyarrow")
    j1 = hash_join(
        filtered,
        wc.map_batches(rename_n("na"), batch_format="pyarrow"),
        on=["word"],
        num_partitions=num_partitions,
        left_types={"word": pa.string(), "w2": pa.string(), "n_ab": pa.int64()},
        right_types={"word": pa.string(), "na": pa.int64()},
    )

    def rekey_w2(batch: pa.Table) -> pa.Table:
        return pa.Table.from_pydict(
            {
                "w1": batch.column("word"),
                "word": batch.column("w2"),
                "n_ab": batch.column("n_ab"),
                "na": batch.column("na"),
            }
        )

    j2 = hash_join(
        j1.map_batches(rekey_w2, batch_format="pyarrow"),
        wc.map_batches(rename_n("nb"), batch_format="pyarrow"),
        on=["word"],
        num_partitions=num_partitions,
        left_types={
            "word": pa.string(),
            "w1": pa.string(),
            "n_ab": pa.int64(),
            "na": pa.int64(),
        },
        right_types={"word": pa.string(), "nb": pa.int64()},
    )

    def score(batch: pa.Table):
        w1 = batch.column("w1").to_pylist()
        w2 = batch.column("word").to_pylist()
        n_ab = batch.column("n_ab").to_pylist()
        na = batch.column("na").to_pylist()
        nb = batch.column("nb").to_pylist()
        # expression order mirrors the SQL oracle exactly (bit-equal ln)
        pmi = [
            math.log((ab / n_pairs) / ((a / n_tokens) * (b / n_tokens)))
            for ab, a, b in zip(n_ab, na, nb)
        ]
        yield pa.Table.from_pydict(
            {
                "bigram": pa.array(
                    [f"{a} {b}" for a, b in zip(w1, w2)], type=pa.string()
                ),
                "n_ab": pa.array(n_ab, type=pa.int64()),
                "pmi": pa.array(pmi, type=pa.float64()),
            }
        )

    scored = j2.map_batches(score, batch_format="pyarrow")
    return scored.sort(["pmi", "bigram"], descending=[True, False]).limit(top)


def compression_ratio_batch(batch: pa.Table, level: int = 6) -> pa.Table:
    """Per-document zlib compression ratio (compressed/raw bytes) — the
    classic cheap redundancy signal for web text (low ratio = boilerplate
    / repeated templates; used alongside the Gopher rules to drop
    machine-generated spam). Stateless map, stdlib zlib, deterministic
    for a fixed level. Not SQL-expressible -> rows-only; values pinned
    against direct zlib in tests."""
    import zlib

    ids = batch.column("doc_id").to_pylist()
    out = []
    for t in batch.column("text").to_pylist():
        raw = (t or "").encode("utf-8")
        if not raw:
            out.append(1.0)
            continue
        out.append(len(zlib.compress(raw, level)) / len(raw))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "compression_ratio": pa.array(out, type=pa.float64()),
        }
    )


def bm25_topk_docs(
    docs: "ray.data.Dataset",
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.5,
    b: float = 0.75,
) -> "pa.Table":
    """BM25 ranked retrieval for ONE query over the corpus, distributed.

    Okapi BM25 with the Robertson/Lucene idf
    ``ln(1 + (N - df + 0.5)/(df + 0.5))``. Shape (100-TB-safe):

      1. one corpus pass explodes each doc to (doc_id, term, tf, dl)
         for the QUERY TERMS ONLY — the term set rides in the task
         closure (tiny), so the corpus never shuffles on vocabulary;
         the same pass emits one sentinel row per batch carrying
         (n_docs, total_len) combiners for N and avgdl
      2. per-term df = tiny hash-partitioned distinct-doc count
         (|query| rows, collected to the driver)
      3. per (doc_id, term) score, micro-quantized to int64
         (``floor(score * 1e6 + 0.5)``) so the cross-term per-doc sum
         is order-independent and bit-exact vs a SQL oracle
      4. per-doc integer sum via a hash-partitioned reduce, then
         global top-k as batch-local cuts merged on the driver
         (<= blocks x k partial rows — never the whole score table)

    Returns an arrow table (rn, doc_id, score_micro), rn = 1..k ordered
    by (score desc, doc_id) — the same order a SQL ``row_number``
    window over (score DESC, doc_id) produces.
    """
    import math

    import numpy as np
    import ray.data

    from ctinexus_ray.ops.groupagg import partitioned_agg

    terms = sorted(set(query_terms))
    if not terms:
        raise ValueError("query_terms must be non-empty")
    term_set = frozenset(terms)

    def explode_query_terms(batch: pa.Table) -> pa.Table:
        from collections import Counter

        ids, words, tfs, dls = [], [], [], []
        stat_docs, stat_len = 0, 0
        for doc_id, t in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        ):
            toks = _tokens(t or "")
            stat_docs += 1
            stat_len += len(toks)
            c = Counter(tok for tok in toks if tok in term_set)
            for w, tf in c.items():
                ids.append(doc_id)
                words.append(w)
                tfs.append(tf)
                dls.append(len(toks))
        # one sentinel row per batch (word NULL): tf = docs, dl = tokens
        ids.append(-1)
        words.append(None)
        tfs.append(stat_docs)
        dls.append(stat_len)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "word": pa.array(words, type=pa.string()),
                "tf": pa.array(tfs, type=pa.int64()),
                "dl": pa.array(dls, type=pa.int64()),
            }
        )

    # consumed twice (stats+df, scores): materialize the pruned explode,
    # whose size is bounded by docs-matching-query, not corpus text
    exploded = (
        docs.select_columns(["doc_id", "text"])
        .map_batches(explode_query_terms, batch_format="pyarrow")
        .materialize()
    )

    sentinel = exploded.map_batches(
        lambda t: t.filter(pc.is_null(t.column("word"))),
        batch_format="pyarrow",
    )
    stats = sentinel.aggregate(
        ray.data.aggregate.Sum("tf", alias_name="n_docs"),
        ray.data.aggregate.Sum("dl", alias_name="total_len"),
    )
    n_docs = int(stats["n_docs"] or 0)
    if n_docs == 0:  # empty corpus: empty ranking, not a crash
        return pa.Table.from_pydict(
            {
                "rn": pa.array([], type=pa.int64()),
                "doc_id": pa.array([], type=pa.int64()),
                "score_micro": pa.array([], type=pa.int64()),
            }
        )
    avgdl = float(stats["total_len"]) / n_docs  # single division: bit-stable

    matches = exploded.map_batches(
        lambda t: t.filter(pc.is_valid(t.column("word"))),
        batch_format="pyarrow",
    )
    return bm25_rank_postings(matches, n_docs, avgdl, k=k, k1=k1, b=b)


def bm25_rank_postings(
    matches: "ray.data.Dataset",
    n_docs: int,
    avgdl: float,
    k: int = 20,
    k1: float = 1.5,
    b: float = 0.75,
) -> "pa.Table":
    """The ranking half of ``bm25_topk_docs``, shared with the persisted
    inverted index (``ops/textindex.py``): rank (doc_id, word, tf, dl)
    posting rows under given corpus stats. df per word is computed FROM
    the postings (one row per (word, doc) by construction), so an index
    scan that pruned correctly produces identical scores to the full
    corpus pass — the exactness argument ``text_index_search`` pins.
    Returns (rn, doc_id, score_micro) exactly like ``bm25_topk_docs``."""
    import math

    import numpy as np
    import ray.data  # noqa: F401

    from ctinexus_ray.ops.groupagg import partitioned_agg

    df_rows = partitioned_agg(
        matches.select_columns(["word"]),
        keys=["word"],
        named_aggs={"df": ("word", "size")},
        num_partitions=16,
    ).take_all()
    idf = {
        r["word"]: math.log(1.0 + (n_docs - int(r["df"]) + 0.5) / (int(r["df"]) + 0.5))
        for r in df_rows
    }

    k1_ = float(k1)
    b_ = float(b)

    def score_batch(batch: pa.Table) -> pa.Table:
        words = batch.column("word").to_pylist()
        tfs = batch.column("tf").to_numpy()
        dls = batch.column("dl").to_numpy()
        micros = np.empty(len(words), dtype=np.int64)
        for i, (w, tf, dl) in enumerate(zip(words, tfs, dls)):
            # expression order mirrors the SQL oracle exactly (IEEE-stable)
            s = idf[w] * (tf * (k1_ + 1.0)) / (
                tf + k1_ * ((1.0 - b_) + (b_ * dl) / avgdl)
            )
            micros[i] = math.floor(s * 1e6 + 0.5)
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "score_micro": pa.array(micros, type=pa.int64()),
            }
        )

    per_doc = partitioned_agg(
        matches.map_batches(score_batch, batch_format="pyarrow"),
        keys=["doc_id"],
        named_aggs={"score_micro": ("score_micro", "sum")},
        num_partitions=16,
    )

    def batch_topk(batch: pa.Table) -> pa.Table:
        t = batch.sort_by(
            [("score_micro", "descending"), ("doc_id", "ascending")]
        )
        return t.slice(0, k)

    partials = per_doc.map_batches(batch_topk, batch_format="pyarrow").take_all()
    partials.sort(key=lambda r: (-r["score_micro"], r["doc_id"]))
    top = partials[:k]
    return pa.Table.from_pydict(
        {
            "rn": pa.array(range(1, len(top) + 1), type=pa.int64()),
            "doc_id": pa.array([r["doc_id"] for r in top], type=pa.int64()),
            "score_micro": pa.array(
                [r["score_micro"] for r in top], type=pa.int64()
            ),
        }
    )


# ---------------------------------------------------------------------------
# DSIR: Data Selection via Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------


def _md5_bucket(word: str, n_buckets: int) -> int:
    """SQL-compatible feature hash: first 8 hex digits of md5(word) as an
    unsigned int, mod n_buckets — identical to DuckDB's
    ``CAST(concat('0x', substr(md5(w),1,8)) AS UBIGINT) % n``."""
    return int(hashlib.md5(word.encode("utf-8")).hexdigest()[:8], 16) % n_buckets


def _bucket_count_batch(
    batch: pa.Table, n_buckets: int, target_col: str, target_value: str
) -> pa.Table:
    """Per-batch combiner: FIXED-SIZE (n_buckets-row) partial counts of
    hashed-word features for the raw corpus and the target slice. The
    moved data per batch is O(n_buckets) regardless of batch text volume
    — the same combiner shape as the k-means partials."""
    import numpy as np

    raw = np.zeros(n_buckets, dtype=np.int64)
    tgt = np.zeros(n_buckets, dtype=np.int64)
    memo: dict[str, int] = {}
    texts = batch.column("text").to_pylist()
    flags = pc.equal(batch.column(target_col), pa.scalar(target_value))
    for t, is_tgt in zip(texts, flags.to_pylist()):
        for w in _tokens(t or ""):
            bk = memo.get(w)
            if bk is None:
                bk = memo[w] = _md5_bucket(w, n_buckets)
            raw[bk] += 1
            if is_tgt:
                tgt[bk] += 1
    nz = np.nonzero(raw)[0]
    return pa.Table.from_pydict(
        {
            "bk": pa.array(nz, type=pa.int64()),
            "cr": pa.array(raw[nz], type=pa.int64()),
            "ct": pa.array(tgt[nz], type=pa.int64()),
        }
    )


def dsir_scores(
    docs: "ray.data.Dataset",
    target_col: str = "lang",
    target_value: str = "en",
    n_buckets: int = 1024,
) -> "ray.data.Dataset":
    """DSIR importance weights (Xie et al. 2023, *Data Selection for
    Language Models via Importance Resampling*): score every document by
    the log-likelihood ratio of a TARGET hashed-ngram distribution (here:
    the ``target_col == target_value`` slice of the corpus itself; in a
    real run, a high-quality reference corpus) against the RAW corpus
    distribution. High scores = documents that look like the target;
    resampling by these weights steers a pretraining mixture toward the
    target domain.

    Feature space is ``n_buckets`` hashed unigram buckets (md5-based so
    the DuckDB oracle computes the identical hash). Two passes over the
    corpus, neither of which shuffles it:

      1. bucket counts: per-batch FIXED-SIZE combiners (O(n_buckets) per
         batch, not O(tokens)) -> one vocabulary-independent groupby of
         at most ``n_buckets * num_blocks`` tiny rows -> a driver-side
         table of exactly ``n_buckets`` rows. Unlike a word-level LM,
         the broadcast is O(n_buckets) BY CONSTRUCTION — no head-vocab
         fallback needed at 100 TB.
      2. scoring: the quantized log-ratio array (micro-nats, exact
         BIGINT per-doc sums — summation-order-independent, hash-stable
         vs SQL) broadcast once via ``ray.put``; every doc scored by a
         lookup pass with per-batch md5 memoization over distinct words.

    Smoothing is add-1 over the bucket universe:
    ``lr[b] = ln((ct[b]+1)/(Tt+B)) - ln((cr[b]+1)/(Tr+B))``, computed in
    exactly the operation order the SQL oracle uses (libm ln on both
    sides) so quantized values match bit-for-bit.

    Output: (doc_id, n_tokens, dsir_score_u, dsir_score).
    """
    import math

    import numpy as np
    import ray as _ray

    partials = docs.map_batches(
        _bucket_count_batch,
        fn_kwargs={
            "n_buckets": n_buckets,
            "target_col": target_col,
            "target_value": target_value,
        },
        batch_format="pyarrow",
    )
    cr = np.zeros(n_buckets, dtype=np.int64)
    ct = np.zeros(n_buckets, dtype=np.int64)
    for b in (
        partials.groupby("bk").sum(["cr", "ct"]).iter_batches(batch_format="pyarrow")
    ):
        idx = b.column("bk").to_numpy()
        cr[idx] = b.column("sum(cr)").to_numpy()
        ct[idx] = b.column("sum(ct)").to_numpy()
    tr = float(cr.sum())
    tt = float(ct.sum())
    lr_u = np.zeros(n_buckets, dtype=np.int64)
    for bk in np.nonzero(cr)[0]:
        # same op order as the SQL: int+1 -> double divide -> ln -> diff
        v = math.log((int(ct[bk]) + 1) / (tt + n_buckets)) - math.log(
            (int(cr[bk]) + 1) / (tr + n_buckets)
        )
        lr_u[bk] = math.floor(v * 1e6 + 0.5)
    lr_ref = _ray.put(lr_u)

    class DsirScoreStage:
        def __init__(self, lr_ref, n_buckets):
            self.lr = _ray.get(lr_ref)
            self.n_buckets = n_buckets
            self.memo: dict[str, int] = {}  # actor-lifetime md5 memo

        def __call__(self, batch: pa.Table) -> pa.Table:
            lr, memo, nb = self.lr, self.memo, self.n_buckets
            ids, ns, usums = [], [], []
            for doc_id, t in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                toks = _tokens(t or "")
                u = 0
                for w in toks:
                    bk = memo.get(w)
                    if bk is None:
                        bk = memo[w] = _md5_bucket(w, nb)
                    u += int(lr[bk])
                ids.append(doc_id)
                ns.append(len(toks))
                usums.append(u)
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_tokens": pa.array(ns, type=pa.int64()),
                    "dsir_score_u": pa.array(usums, type=pa.int64()),
                    "dsir_score": pa.array(
                        [u / 1e6 / n for u, n in zip(usums, ns)],
                        type=pa.float64(),
                    ),
                }
            )

    return docs.map_batches(
        DsirScoreStage,
        fn_constructor_kwargs={"lr_ref": lr_ref, "n_buckets": n_buckets},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def kn_bigram_scores(
    docs: "ray.data.Dataset", discount: float = 0.75
) -> "ray.data.Dataset":
    """Per-document interpolated Kneser-Ney BIGRAM language-model score —
    the next step up from ``unigram_lm_scores`` toward the KenLM-style
    fluency filters CCNet uses:

        P(w2|w1) = (C(w1,w2) - D + D * N1+(w1.) * Pcont(w2)) / C(w1.)
        Pcont(w2) = N1+(.w2) / |distinct bigram types|

    (no max(.,0) clamp needed: the model is trained on the corpus it
    scores, so every scored bigram has C >= 1 > D).

    Scale shape: ONE bigram-explode pass with per-batch combine (moved
    data is bigram-vocabulary-sized, not corpus-sized); the count table
    is collected once on the driver, where the context totals /
    continuation counts / type count all derive locally, and the
    (bigram -> micro-nat log-prob) table broadcasts via ``ray.put``;
    scoring is a pure lookup pass, NO corpus shuffle. At 100 TB the
    bigram vocabulary may exceed a broadcast — the documented fallback
    is thresholding rare bigrams into an OOV class (count < k) exactly
    as for the unigram LM, or keeping counts distributed and scoring
    via two hash joins on (w1, w2).

    Log-probs quantize to integer MICRO-NATS before the per-doc sum
    (order-independent BIGINT sum; the mean is one double division of
    exact integers — hash-stable vs the SQL oracle writing the identical
    IEEE expression). Docs with < 2 tokens have no bigrams and emit no
    row (matching the SQL per-doc GROUP BY). Output: (doc_id,
    n_bigrams, kn_score_u, kn_score)."""
    import math

    import ray as _ray

    freq = (
        docs.map_batches(bigram_explode_batch, batch_format="pyarrow")
        .groupby("bigram")
        .sum("n")
    )
    counts: dict[str, int] = {}
    for batch in freq.iter_batches(batch_format="pyarrow"):
        counts.update(
            zip(
                batch.column("bigram").to_pylist(),
                batch.column("sum(n)").to_pylist(),
            )
        )
    ctot: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1b: dict[str, int] = {}
    for bg, c in counts.items():
        w1, _, w2 = bg.partition(" ")
        ctot[w1] = ctot.get(w1, 0) + c
        n1f[w1] = n1f.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    btypes = len(counts)
    logp = {
        bg: math.floor(
            math.log(
                (
                    c
                    - discount
                    + discount
                    * n1f[(w := bg.partition(" "))[0]]
                    * (n1b[w[2]] / btypes)
                )
                / ctot[w[0]]
            )
            * 1e6
            + 0.5
        )
        for bg, c in counts.items()
    }
    logp_ref = _ray.put(logp)

    class KnScoreStage:
        def __init__(self, logp_ref):
            self.logp = _ray.get(logp_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, ns, usums = [], [], []
            lp = self.logp
            for doc_id, t in zip(
                batch.column("doc_id").to_pylist(),
                batch.column("text").to_pylist(),
            ):
                toks = _tokens(t or "")
                if len(toks) < 2:
                    continue
                ids.append(doc_id)
                ns.append(len(toks) - 1)
                usums.append(
                    sum(lp[f"{a} {b}"] for a, b in zip(toks, toks[1:]))
                )
            scores = [u / 1e6 / n for u, n in zip(usums, ns)]
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "n_bigrams": pa.array(ns, type=pa.int64()),
                    "kn_score_u": pa.array(usums, type=pa.int64()),
                    "kn_score": pa.array(scores, type=pa.float64()),
                }
            )

    return docs.map_batches(
        KnScoreStage,
        fn_constructor_kwargs={"logp_ref": logp_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def naive_bayes_predict(
    docs: "ray.data.Dataset",
    label_col: str = "lang",
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    hash_buckets: int | None = None,
) -> "ray.data.Dataset":
    """Multinomial Naive Bayes text classifier, trained on the corpus's
    own labels and applied back to every document — the fasttext-style
    linear classifier shape web-corpus pipelines use for language ID and
    quality filtering (CCNet trains exactly this kind of model; the
    reference pipeline has no classifier, this is corpus-scale new
    capability like ``dsir_scores``).

    Train = ONE hash-partitioned (label, word) count reduce (per-batch
    Counter combine first, so moved data is vocabulary-sized ×
    #labels, never corpus-sized) plus an O(#labels) prior count.
    Score = the (word -> per-label log-prob vector) model broadcast
    once via ``ray.put``, then a pure lookup pass over the corpus — NO
    shuffle of the documents. Laplace-smoothed with alpha=1 over
    V+1 outcomes (V seen words + one unseen/UNK class).

    Bit-exactness contract (same discipline as ``unigram_lm_scores``):
    per-(label, word) log-probs quantize to integer MICRO-NATS
    (``floor(ln((c+1)/(t+V+1)) * 1e6 + 0.5)``, libm ln == DuckDB ln)
    BEFORE the per-document sum, so the distributed BIGINT sums are
    summation-order-independent and the argmax is exact. Prediction
    ties break to the lexicographically smallest label (oracle:
    ``ORDER BY score_u DESC, label ASC``).

    ``hash_buckets=N`` is the 100-TB path: words fold into N buckets
    via the vectorized polynomial hash (``hash64_strings``), making the
    model a fixed-size (N × #labels) int64 array independent of
    vocabulary growth — same plan shape, no driver-side vocabulary.
    (No SQL twin for the hashed variant; pin it against the exact
    variant on a collision-free fixture.)

    Output: (doc_id, pred_label, score_u) — one row per document,
    score_u = the winning label's integer micro-nat log-posterior.
    NULL-labeled rows contribute nothing to training (SQL count(col)
    semantics) but are still scored like every other document.
    """
    import math
    from collections import Counter

    import numpy as np
    import ray as _ray

    from ctinexus_ray.ops.groupagg import partitioned_agg

    if hash_buckets is not None:
        from ctinexus_ray.ops.dedup import hash64_strings

    def fold(words: list[str]) -> list:
        if hash_buckets is None:
            return words
        h = hash64_strings(pa.array(words, type=pa.string()))
        return (h % np.uint64(hash_buckets)).astype(np.int64).tolist()

    def explode(batch: pa.Table):
        cnt: Counter = Counter()
        for lab, t in zip(
            batch.column(label_col).to_pylist(),
            batch.column(text_col).to_pylist(),
        ):
            if lab is None:  # NULL labels train nothing — SQL count(col)
                continue  # semantics, same rule as grouped_misra_gries
            toks = _tokens(t or "")
            for w, k in zip(fold(toks), [lab] * len(toks)):
                cnt[(k, w)] += 1
        if not cnt:
            return
        labs = [k for (k, _w) in cnt]
        words = [w for (_k, w) in cnt]
        word_type = pa.string() if hash_buckets is None else pa.int64()
        yield pa.Table.from_pydict(
            {
                "label": pa.array(labs, type=pa.string()),
                "word": pa.array(words, type=word_type),
                "n": pa.array(list(cnt.values()), type=pa.int64()),
            }
        )

    counts = partitioned_agg(
        docs.map_batches(explode, batch_format="pyarrow"),
        keys=["label", "word"],
        named_aggs={"c": ("n", "sum")},
    )

    def label_only(batch: pa.Table):
        col = batch.column(label_col)
        col = col.filter(pc.is_valid(col))
        if len(col) == 0:
            return
        yield pa.Table.from_pydict({"label": col})

    doc_counts = partitioned_agg(
        docs.map_batches(label_only, batch_format="pyarrow"),
        keys=["label"],
        named_aggs={"nd": ("label", "size")},
        num_partitions=16,
    )

    # model collect: vocabulary × #labels rows — the documented 100-TB
    # fallback is hash_buckets (fixed-size model) or head-vocabulary
    # thresholding, same as unigram_lm_scores
    model: dict = {}
    label_tot: dict[str, int] = {}
    vocab = set()
    for batch in counts.iter_batches(batch_format="pyarrow"):
        for lab, w, c in zip(
            batch.column("label").to_pylist(),
            batch.column("word").to_pylist(),
            batch.column("c").to_pylist(),
        ):
            model[(lab, w)] = c
            label_tot[lab] = label_tot.get(lab, 0) + c
            vocab.add(w)
    n_docs_by_label = {
        r["label"]: r["nd"] for r in doc_counts.take_all()
    }  # O(#labels) rows
    labels = sorted(label_tot)
    n_docs = sum(n_docs_by_label.values())
    v_plus_1 = (hash_buckets if hash_buckets is not None else len(vocab)) + 1

    priors = np.array(
        [
            math.floor(
                math.log(n_docs_by_label[lab] / n_docs) * 1e6 + 0.5
            )
            for lab in labels
        ],
        dtype=np.int64,
    )
    unk = np.array(
        [
            math.floor(
                math.log(1 / (label_tot[lab] + v_plus_1)) * 1e6 + 0.5
            )
            for lab in labels
        ],
        dtype=np.int64,
    )
    label_index = {lab: i for i, lab in enumerate(labels)}
    lp: dict = {}
    for (lab, w), c in model.items():
        vec = lp.get(w)
        if vec is None:
            vec = lp[w] = unk.copy()
        vec[label_index[lab]] = math.floor(
            math.log((c + 1) / (label_tot[lab] + v_plus_1)) * 1e6 + 0.5
        )
    del model  # counts now live in lp; halve peak driver memory
    model_ref = _ray.put((labels, priors, unk, lp))

    class NbScoreStage:
        def __init__(self, model_ref):
            self.labels, self.priors, self.unk, self.lp = _ray.get(model_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            ids, preds, scores = [], [], []
            lp, unk, priors, labels = self.lp, self.unk, self.priors, self.labels
            for doc_id, t in zip(
                batch.column(doc_id_col).to_pylist(),
                batch.column(text_col).to_pylist(),
            ):
                total = priors.copy()
                for w in fold(_tokens(t or "")):
                    total += lp.get(w, unk)
                best = int(np.argmax(total))  # labels sorted asc: first
                ids.append(doc_id)  # max == smallest label on ties
                preds.append(labels[best])
                scores.append(int(total[best]))
            return pa.Table.from_pydict(
                {
                    "doc_id": pa.array(ids, type=pa.int64()),
                    "pred_label": pa.array(preds, type=pa.string()),
                    "score_u": pa.array(scores, type=pa.int64()),
                }
            )

    return docs.map_batches(
        NbScoreStage,
        fn_constructor_kwargs={"model_ref": model_ref},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )


def rrf_fuse(
    legs: list[tuple["pa.Table", str, str]],
    k_rrf: int = 60,
    k: int = 20,
) -> "pa.Table":
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009) of ranked
    retrieval legs — the standard hybrid-search combiner (BM25 leg +
    embedding leg, each ranked independently, fused by rank position
    only so score scales never need calibration).

    ``legs`` is a list of ``(table, id_col, rank_col)`` — each table a
    TOP-K RESULT (driver-small BY CONSTRUCTION: every leg is the k-row
    output of a distributed ranker like ``bm25_topk_docs`` or
    ``brute_force_topk``, so fusion is O(sum of leg sizes), never
    corpus-sized). Pure integer scoring keeps the SQL twin bit-exact:
    each appearance contributes ``10^12 // (k_rrf + rank)`` points
    (integer floor division — no floats anywhere), summed per doc.

    Returns (rn, doc_id, rrf_score, n_legs) ordered by
    (rrf_score desc, doc_id), rn = 1..k — the same order a SQL
    ``row_number`` window produces.
    """
    import numpy as np

    ids_all, pts_all = [], []
    for table, id_col, rank_col in legs:
        ids = np.asarray(table.column(id_col)).astype(np.int64)
        ranks = np.asarray(table.column(rank_col)).astype(np.int64)
        if (ranks < 1).any():
            raise ValueError("ranks must be 1-based positive integers")
        ids_all.append(ids)
        pts_all.append(10**12 // (k_rrf + ranks))
    if not ids_all:
        raise ValueError("at least one leg required")
    ids = np.concatenate(ids_all)
    pts = np.concatenate(pts_all)
    uniq, inv = np.unique(ids, return_inverse=True)
    score = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(score, inv, pts)
    n_legs = np.zeros(len(uniq), dtype=np.int64)
    np.add.at(n_legs, inv, 1)
    order = np.lexsort((uniq, -score))[:k]
    return pa.Table.from_pydict(
        {
            "rn": pa.array(
                np.arange(1, len(order) + 1, dtype=np.int64), type=pa.int64()
            ),
            "doc_id": pa.array(uniq[order], type=pa.int64()),
            "rrf_score": pa.array(score[order], type=pa.int64()),
            "n_legs": pa.array(n_legs[order], type=pa.int64()),
        }
    )


def phrase_match_counts(
    docs: ray.data.Dataset,
    words: list[str],
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Exact phrase search over a (doc_id, text) corpus: documents
    containing the K-word phrase ``words`` as consecutive whitespace
    tokens, with per-document match counts — (doc_id, n_matches).

    Plan (ONE posting volume, zero self-joins, any K): each document
    emits only the positions of the K phrase words (pruned at the
    tokenizer — the rest of the corpus never leaves the map), each as
    (doc_id, anchor = pos - k, 1 << k). A phrase instance at anchor a
    has every slot k occupied, and a position can emit a given k at
    most once, so SUM(bit k) over (doc_id, anchor) equals 2^K - 1
    exactly on full matches — one hash-partitioned bitmask sum + one
    per-doc count instead of K-1 positional joins. Works verbatim for
    phrases with repeated words.

    At 100 TB: posting volume is occurrences-of-phrase-words, not
    corpus tokens; both reduces are hash-partitioned; nothing
    corpus-sized shuffles."""
    if not words or any(not w or w != w.strip() or " " in w for w in words):
        raise ValueError("words must be non-empty single tokens")
    K = len(words)
    if K > 62:
        raise ValueError("phrase too long for the int64 bitmask plan")
    full = (1 << K) - 1
    # word -> [slots] (a repeated word occupies several k's)
    slots: dict[str, list[int]] = {}
    for k, w in enumerate(words):
        slots.setdefault(w, []).append(k)

    from ctinexus_ray.ops.groupagg import partitioned_agg

    def postings(batch: pa.Table) -> pa.Table:
        import numpy as np

        ids = batch.column("doc_id").to_pylist()
        texts = batch.column("text").to_pylist()
        docs_, anchors_, bits_ = [], [], []
        for doc_id, t in zip(ids, texts):
            toks = np.array((t or "").split(), dtype=object)
            if len(toks) < K:
                continue
            for w, ks in slots.items():
                pos = np.flatnonzero(toks == w)
                for k in ks:
                    a = pos - k
                    a = a[(a >= 0) & (a <= len(toks) - K)]
                    if len(a):
                        docs_.append(np.full(len(a), doc_id, dtype=np.int64))
                        anchors_.append(a.astype(np.int64))
                        bits_.append(np.full(len(a), 1 << k, dtype=np.int64))
        i64 = pa.int64()
        empty = np.zeros(0, dtype=np.int64)
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(
                    np.concatenate(docs_) if docs_ else empty, type=i64
                ),
                "anchor": pa.array(
                    np.concatenate(anchors_) if anchors_ else empty, type=i64
                ),
                "bit": pa.array(
                    np.concatenate(bits_) if bits_ else empty, type=i64
                ),
            }
        )

    anchors = partitioned_agg(
        docs.select_columns(["doc_id", "text"]).map_batches(
            postings, batch_format="pyarrow"
        ),
        keys=["doc_id", "anchor"],
        named_aggs={"mask": ("bit", "sum")},
        num_partitions=num_partitions,
    )
    hits = anchors.filter(expr=f"mask == {full}")
    return partitioned_agg(
        hits.select_columns(["doc_id"]),
        keys=["doc_id"],
        named_aggs={"n_matches": ("doc_id", "size")},
        num_partitions=num_partitions,
    )


def token_entropy_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_tokens, entropy_u) — Shannon entropy of each
    document's token distribution in integer NANO-nats:
    sum over distinct tokens w of n_w * FLOOR(1e9 * ln(N / n_w) + 0.5),
    all divisions/logs in float64 with a pinned expression order, the
    cross-term sum in int64 — order-independent, so a SQL twin computes
    the identical value (divide by 1e9 * N for nats). Low entropy =
    repetitive/templated text; a standard corpus quality signal.
    Stateless map; nothing shuffles."""
    import numpy as np
    from collections import Counter

    ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    out_n, out_e = [], []
    for t in texts:
        counts = Counter(_tokens(t or ""))
        if not counts:
            out_n.append(0)
            out_e.append(0)
            continue
        n = np.array(list(counts.values()), dtype=np.int64)
        total = int(n.sum())
        # pinned operand order — must mirror the SQL twin exactly
        term = np.floor(
            1e9 * np.log(np.float64(total) / n.astype(np.float64)) + 0.5
        ).astype(np.int64)
        out_n.append(total)
        out_e.append(int((n * term).sum()))
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, type=pa.int64()),
            "n_tokens": pa.array(out_n, type=pa.int64()),
            "entropy_u": pa.array(out_e, type=pa.int64()),
        }
    )


def tfidf_cosine_pairs(
    docs: ray.data.Dataset,
    threshold_u: int = 900_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """All-pairs WEIGHTED similarity join (Bayardo et al. 2007 shape):
    document pairs whose TF-IDF cosine similarity clears ``threshold_u``
    micro-units — the weighted sibling of ``ngram_jaccard_pairs`` (sets
    -> weighted vectors). Everything that crosses a row boundary is an
    int64: per-term weight w = tf * FLOOR(1e6 * ln(N/df) + 0.5),
    norms = SUM(w^2), dots = SUM(w_a * w_b), and the final
    cos_u = FLOOR(1e6 * dot / (sqrt(na) * sqrt(nb)) + 0.5) is a pinned
    per-row float expression over two exact integers — bit-exact vs a
    SQL twin. Terms with zero weight (df == N) are dropped engine-side;
    they contribute nothing to dots or norms, so results are identical.

    Plan: (doc, term, tf) explode -> term-partitioned df count ->
    df join -> ONE term-keyed self hash-join emits pairwise products
    (the triangle_count plan over postings; hot-term fan-out is
    posting^2 — IDF filtering already removes the hottest terms, cap
    df upstream for adversarial corpora) -> (a, b)-partitioned dot
    reduce -> two norm joins -> threshold. Output (doc_a, doc_b,
    cos_u), doc_a < doc_b."""
    import numpy as np

    from ctinexus_ray.ops.distjoin import hash_join
    from ctinexus_ray.ops.groupagg import partitioned_agg

    i64 = pa.int64()
    n_docs = docs.count()
    exploded = docs.select_columns(["doc_id", "text"]).map_batches(
        doc_term_freq_batch, batch_format="pyarrow"
    )
    df = partitioned_agg(
        exploded.select_columns(["word"]),
        keys=["word"],
        named_aggs={"df": ("word", "size")},
        num_partitions=num_partitions,
    )
    joined = hash_join(
        exploded,
        df,
        on=["word"],
        num_partitions=num_partitions,
        left_types={"word": pa.string(), "doc_id": i64, "tf": i64},
        right_types={"word": pa.string(), "df": i64},
    )

    def weigh(batch: pa.Table) -> pa.Table:
        dfv = batch.column("df").to_numpy(zero_copy_only=False)
        tfv = batch.column("tf").to_numpy(zero_copy_only=False)
        # pinned operand order — must mirror the SQL twin exactly
        idf_u = np.floor(
            1e6 * np.log(np.float64(n_docs) / dfv.astype(np.float64)) + 0.5
        ).astype(np.int64)
        w = tfv * idf_u
        t = pa.Table.from_pydict(
            {
                "word": batch.column("word"),
                "doc_id": batch.column("doc_id"),
                "w": pa.array(w, type=i64),
            }
        )
        return t.filter(pa.array(w != 0))

    weighted = joined.map_batches(weigh, batch_format="pyarrow").materialize()

    norms = partitioned_agg(
        weighted.map_batches(
            lambda b: pa.Table.from_pydict(
                {
                    "doc_id": b.column("doc_id"),
                    "w2": pa.array(
                        b.column("w").to_numpy(zero_copy_only=False) ** 2,
                        type=pa.int64(),
                    ),
                }
            ),
            batch_format="pyarrow",
        ),
        keys=["doc_id"],
        named_aggs={"n2": ("w2", "sum")},
        num_partitions=num_partitions,
    )

    def rename(ds: ray.data.Dataset, names: list[str]) -> ray.data.Dataset:
        def do(batch: pa.Table) -> pa.Table:
            return batch.rename_columns(names)

        return ds.map_batches(do, batch_format="pyarrow")

    pairs = hash_join(
        rename(weighted, ["word", "a", "wa"]),
        rename(weighted, ["word", "b", "wb"]),
        on=["word"],
        num_partitions=num_partitions,
        left_types={"word": pa.string(), "a": i64, "wa": i64},
        right_types={"word": pa.string(), "b": i64, "wb": i64},
    )

    def products(batch: pa.Table) -> pa.Table:
        a = batch.column("a").to_numpy(zero_copy_only=False)
        b = batch.column("b").to_numpy(zero_copy_only=False)
        keep = a < b
        t = batch.filter(pa.array(keep))
        p = t.column("wa").to_numpy(zero_copy_only=False) * t.column(
            "wb"
        ).to_numpy(zero_copy_only=False)
        return pa.Table.from_pydict(
            {
                "a": t.column("a"),
                "b": t.column("b"),
                "p": pa.array(p, type=i64),
            }
        )

    dots = partitioned_agg(
        pairs.map_batches(products, batch_format="pyarrow"),
        keys=["a", "b"],
        named_aggs={"dot": ("p", "sum")},
        num_partitions=num_partitions,
    )
    with_na = hash_join(
        dots,
        rename(norms, ["a", "na"]),
        on=["a"],
        num_partitions=num_partitions,
        left_types={"a": i64, "b": i64, "dot": i64},
        right_types={"a": i64, "na": i64},
    )
    with_nb = hash_join(
        with_na,
        rename(norms, ["b", "nb"]),
        on=["b"],
        num_partitions=num_partitions,
        left_types={"b": i64, "a": i64, "dot": i64, "na": i64},
        right_types={"b": i64, "nb": i64},
    )

    def finalize(batch: pa.Table) -> pa.Table:
        dot = batch.column("dot").to_numpy(zero_copy_only=False)
        na = batch.column("na").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        nb = batch.column("nb").to_numpy(zero_copy_only=False).astype(
            np.float64
        )
        # pinned operand order — must mirror the SQL twin exactly
        cos_u = np.floor(
            1e6 * dot.astype(np.float64) / (np.sqrt(na) * np.sqrt(nb)) + 0.5
        ).astype(np.int64)
        t = pa.Table.from_pydict(
            {
                "doc_a": batch.column("a"),
                "doc_b": batch.column("b"),
                "cos_u": pa.array(cos_u, type=pa.int64()),
            }
        )
        return t.filter(pa.array(cos_u >= threshold_u))

    return with_nb.map_batches(finalize, batch_format="pyarrow")


def chi2_terms(
    docs, k: int = 20, num_partitions: int = 64
) -> "ray.data.Dataset":
    """Chi-square feature selection: the k terms most associated with
    each language by the presence-based 2x2 contingency test — the
    classic "which words give this class away" primitive behind
    fasttext-style classifier feature pruning and corpus-contamination
    triage. For each (lang, word):

        a = docs of lang containing word     b = other docs containing it
        c = docs of lang without it          d = other docs without it
        chi2 = N * (ad - bc)^2 / ((a+b)(c+d)(a+c)(b+d))

    Scale shape: per-batch presence combine -> ONE hash-partitioned
    (lang, word) count reduce (the corpus shuffles once, as partials);
    per-word document frequency re-aggregates the (lang, word) table
    (vocabulary-sized, never the corpus); per-lang doc counts are a
    tiny broadcast dict. Scores are micro-quantized with a pinned IEEE
    expression order so the SQL twin matches bit-for-bit; exact while
    a*d fits int64 (~3e9 docs per class — beyond that, sample).

    Rows with NULL lang are EXCLUDED (SQL inner-join-on-lang
    semantics); words present in every doc and langs covering every
    doc are excluded (zero denominator). Output:
    (lang, rn, word, chi2_micro), rn = 1..k by (chi2_micro DESC, word).
    """
    from collections import Counter

    import numpy as np
    import ray

    from ctinexus_ray.ops.distjoin import hash_join
    from ctinexus_ray.ops.groupagg import partitioned_agg
    from ctinexus_ray.ops.relational import grouped_topn

    n_total = docs.count()
    lang_counts = {
        r["lang"]: int(r["n"])
        for r in partitioned_agg(
            docs.select_columns(["lang"]),
            keys=["lang"],
            named_aggs={"n": ("lang", "size")},
            num_partitions=16,
        ).take_all()
        if r["lang"] is not None
    }
    lc_ref = ray.put(lang_counts)

    def presence(batch: pa.Table) -> pa.Table:
        cnt: Counter = Counter()
        for lang, text in zip(
            batch.column("lang").to_pylist(), batch.column("text").to_pylist()
        ):
            if lang is None:
                continue
            for w in set(_tokens(text or "")):
                cnt[(lang, w)] += 1
        keys = list(cnt.keys())
        return pa.Table.from_pydict(
            {
                "lang": pa.array([kk[0] for kk in keys], type=pa.string()),
                "word": pa.array([kk[1] for kk in keys], type=pa.string()),
                "pn": pa.array([cnt[kk] for kk in keys], type=pa.int64()),
            }
        )

    part = docs.select_columns(["lang", "text"]).map_batches(
        presence, batch_format="pyarrow"
    )
    a_tab = partitioned_agg(
        part,
        keys=["lang", "word"],
        named_aggs={"a": ("pn", "sum")},
        num_partitions=num_partitions,
    )
    df_tab = partitioned_agg(
        a_tab.select_columns(["word", "a"]),
        keys=["word"],
        named_aggs={"df": ("a", "sum")},
        num_partitions=num_partitions,
    )
    joined = hash_join(
        a_tab,
        df_tab,
        on=["word"],
        num_partitions=num_partitions,
        left_types={"word": pa.string(), "lang": pa.string(), "a": pa.int64()},
        right_types={"word": pa.string(), "df": pa.int64()},
    )

    def score(batch: pa.Table) -> pa.Table:
        lc = ray.get(lc_ref)
        a = batch.column("a").to_numpy(zero_copy_only=False).astype(np.int64)
        df = batch.column("df").to_numpy(zero_copy_only=False).astype(np.int64)
        langs = batch.column("lang").to_pylist()
        nl = np.array([lc[la] for la in langs], dtype=np.int64)
        b = df - a
        c = nl - a
        d = n_total - df - c
        keep = (df < n_total) & (nl < n_total)
        a, b, c, d = a[keep], b[keep], c[keep], d[keep]
        # pinned IEEE order — mirrors the SQL twin term for term
        diff = (a * d - b * c).astype(np.float64)
        num = np.float64(n_total) * (diff * diff)
        den = (
            ((a + b).astype(np.float64) * (c + d).astype(np.float64))
            * (a + c).astype(np.float64)
        ) * (b + d).astype(np.float64)
        chi2 = np.floor((1e6 * num) / den + 0.5).astype(np.int64)
        return pa.Table.from_pydict(
            {
                "lang": pa.array(
                    [la for la, kp in zip(langs, keep) if kp],
                    type=pa.string(),
                ),
                "word": batch.column("word").filter(pa.array(keep)),
                "chi2_micro": pa.array(chi2, type=pa.int64()),
            }
        )

    scored = joined.map_batches(score, batch_format="pyarrow")
    return grouped_topn(
        scored,
        group_key="lang",
        order_col="chi2_micro",
        n=k,
        tiebreak_col="word",
        num_partitions=num_partitions,
    )
