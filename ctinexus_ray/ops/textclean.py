"""Text-hygiene operators: PII redaction, Unicode script mix, NFC
normalization / mojibake detection.

The training-data-cleaning staples that sit between raw crawl text and
anything model-facing. All three are stateless zero-shuffle
``map_batches`` stages; the regex paths run on Arrow's RE2 kernels
(``pc.count_substring_regex`` / ``pc.replace_substring_regex``) — the
SAME regex engine DuckDB uses, so the driver oracle can mirror every
pattern byte-for-byte with ``regexp_replace(..., 'g')`` /
``len(regexp_extract_all(...))``. NFC has no Arrow kernel; that stage
is a per-string ``unicodedata.normalize`` pass (the string op IS the
kernel), mirrored by DuckDB's ``nfc_normalize``.

Scale notes (100 TB): every op here reads (id, text) and emits
fixed-width columns plus at most one string column — no shuffle, no
driver state, linear in input bytes. RE2 runs in C, one kernel call
per pattern per batch.

Reference parity note: the reference repo has no corpus-hygiene pass
(single-document CTI tool, `/root/reference/ctinexus/llm_processor.py`
normalizes one report at a time); these ops exist for the SURVEY's
corpus-scale cleaning requirement, so the contract is the documented
patterns below, pinned by the DuckDB oracle twins.
"""

from __future__ import annotations

import unicodedata

import pyarrow as pa
import pyarrow.compute as pc

# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Applied strictly IN THIS ORDER (later patterns see earlier redactions,
# so e.g. the digits inside an already-redacted IP can't re-match as a
# phone). RE2 syntax only — the oracle replays the identical strings.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
)


def pii_redact_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Redact PII spans and count them per document.

    Output: (id, text [redacted], n_email, n_ipv4, n_ssn, n_phone).
    Counts are of NON-OVERLAPPING matches at the moment each pattern
    runs (i.e. over the text as already redacted by earlier patterns) —
    exactly what nested ``regexp_replace`` + ``regexp_extract_all``
    compute in SQL. SSN runs before phone: the two shapes (3-2-4 vs
    3-3-4 digit groups) are disjoint, but pinning the order keeps the
    contract unambiguous.
    """
    text = batch.column(text_col)
    cols: dict[str, pa.ChunkedArray | pa.Array] = {id_col: batch.column(id_col)}
    counts: dict[str, pa.Array] = {}
    for name, pat, repl in PII_PATTERNS:
        counts[f"n_{name}"] = pc.count_substring_regex(text, pat).cast(pa.int64())
        text = pc.replace_substring_regex(text, pat, repl)
    cols[text_col] = text
    cols.update(counts)
    return pa.Table.from_pydict(cols)


def pii_redact(
    ds, text_col: str = "text", id_col: str = "doc_id"
):
    """Dataset-level PII redaction: see ``pii_redact_batch``."""
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: pii_redact_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# Unicode script mix
# ---------------------------------------------------------------------------

# RE2 script classes — one single-char match per codepoint of the
# script. DuckDB's regexp_extract_all uses RE2 too, so counts agree
# exactly. "other" = everything not matched by the listed scripts and
# not ASCII (digits/punct/space count as neither).
SCRIPT_CLASSES: tuple[str, ...] = (
    "Latin", "Cyrillic", "Greek", "Han", "Arabic", "Hebrew", "Hangul",
)


def script_mix_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """Per-document Unicode script histogram.

    Output: (id, n_chars, n_latin, n_cyrillic, n_greek, n_han,
    n_arabic, n_hebrew, n_hangul). ``n_chars`` is codepoints (not
    bytes). The dominant-script decision and mixed-script anomaly flag
    (a phishing / spam-infill signal) are downstream threshold queries
    over these integer columns.
    """
    text = batch.column(text_col)
    cols: dict = {
        id_col: batch.column(id_col),
        "n_chars": pc.utf8_length(text).cast(pa.int64()),
    }
    for script in SCRIPT_CLASSES:
        cols[f"n_{script.lower()}"] = pc.count_substring_regex(
            text, rf"\p{{{script}}}"
        ).cast(pa.int64())
    return pa.Table.from_pydict(cols)


def script_mix(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: script_mix_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )


# ---------------------------------------------------------------------------
# NFC normalization + mojibake detection
# ---------------------------------------------------------------------------

# UTF-8 bytes re-decoded as Latin-1/cp1252 leave 'Ã'/'Â' followed by a
# continuation-range codepoint (U+0080–U+00BF), plus cp1252's 'â€x'
# triple for punctuation. Counting these is the standard cheap
# mojibake screen (what ftfy calls "UTF-8 mojibake").
MOJIBAKE_PATTERN = "[\u00c3\u00c2][\\x80-\\xbf]|\u00e2\u20ac."


def nfc_stats_batch(
    batch: pa.Table, text_col: str = "text", id_col: str = "doc_id"
) -> pa.Table:
    """NFC-normalize text and report what changed.

    Output: (id, text [NFC], changed, n_chars_before, n_chars_after,
    n_mojibake). ``changed`` is exact string inequality vs the input;
    decomposed sequences (e + U+0301) collapse, so ``n_chars_after <=
    n_chars_before``. ``n_mojibake`` counts UTF-8-as-Latin-1 artifact
    spans (see ``MOJIBAKE_PATTERN``) in the ORIGINAL text — detection
    only; re-decoding is a lossy judgment call left to callers.
    """
    raw = batch.column(text_col)
    texts = raw.to_pylist()
    fixed = [
        None if t is None else unicodedata.normalize("NFC", t) for t in texts
    ]
    fixed_arr = pa.array(fixed, type=pa.string())
    return pa.Table.from_pydict(
        {
            id_col: batch.column(id_col),
            text_col: fixed_arr,
            "changed": pc.not_equal(raw, fixed_arr),
            "n_chars_before": pc.utf8_length(raw).cast(pa.int64()),
            "n_chars_after": pc.utf8_length(fixed_arr).cast(pa.int64()),
            "n_mojibake": pc.count_substring_regex(
                raw, MOJIBAKE_PATTERN
            ).cast(pa.int64()),
        }
    )


def nfc_stats(ds, text_col: str = "text", id_col: str = "doc_id"):
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: nfc_stats_batch(b, text_col, id_col),
        batch_format="pyarrow",
    )


def c4_clean_batch(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 2,
) -> pa.Table:
    """C4's line-level cleaning rules (Raffel et al. 2020, the public
    recipe behind the C4 corpus), applied per page:

      * a LINE is kept iff its trimmed text ends in terminal
        punctuation (``.``, ``!``, ``?``, ``"``), has at least
        ``min_words`` whitespace-separated words, and does not contain
        ``javascript`` (case-insensitive);
      * the PAGE is kept iff at least ``min_lines`` lines survive AND
        the raw text contains neither ``lorem ipsum``
        (case-insensitive) nor a ``{`` (code fragment tell);
      * ``clean_text`` is the surviving lines re-joined with newlines
        (empty when the page is dropped — dropped pages still emit a
        row so corpus accounting stays row-stable).

    Vectorized: one pandas line explode + string-kernel predicates +
    one grouped re-join per batch; zero shuffle, linear in bytes. The
    rule set is frozen — the SQL twin replays it expression for
    expression."""
    import numpy as np
    import pandas as pd

    ids = batch.column(id_col).to_pandas()
    text = batch.column(text_col).to_pandas().fillna("")
    raw_flag_ok = ~(
        text.str.lower().str.contains("lorem ipsum", regex=False)
        | text.str.contains("{", regex=False)
    )
    df = pd.DataFrame({"i": np.arange(len(ids)), "line": text.str.split("\n")})
    ex = df.explode("line", ignore_index=True)
    t = ex["line"].fillna("").str.strip()
    kept = (
        t.str.endswith((".", "!", "?", '"'))
        & (t.str.count(r"\S+") >= min_words)
        & ~t.str.lower().str.contains("javascript", regex=False)
    )
    ex = ex.assign(keep_line=kept, t=t)
    grouped = ex[ex["keep_line"]].groupby("i", sort=False)["t"]
    joined = grouped.agg("\n".join)
    counts = grouped.size()
    n_kept = pd.Series(0, index=np.arange(len(ids))).add(counts, fill_value=0)
    clean = pd.Series("", index=np.arange(len(ids))).astype(object)
    clean.update(joined)
    keep = raw_flag_ok.to_numpy() & (n_kept.to_numpy() >= min_lines)
    clean = clean.where(pd.Series(keep), "")
    return pa.Table.from_pydict(
        {
            id_col: batch.column(id_col),
            "clean_text": pa.array(clean.tolist(), type=pa.string()),
            "n_kept_lines": pa.array(
                n_kept.to_numpy().astype("int64"), type=pa.int64()
            ),
            "keep": pa.array(keep, type=pa.bool_()),
        }
    )


def c4_clean(
    ds,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words: int = 5,
    min_lines: int = 2,
):
    """Dataset form of ``c4_clean_batch`` — stateless map, no shuffle."""
    return ds.select_columns([id_col, text_col]).map_batches(
        lambda b: c4_clean_batch(b, text_col, id_col, min_words, min_lines),
        batch_format="pyarrow",
    )
