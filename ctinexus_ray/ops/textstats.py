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
