"""Extraction stage (S1 + E0-E3 fused): html -> extracted/normalized/focused
text, as a STATELESS ``map_batches`` task over zero-copy Arrow batches.

This is the byte-identity stage: output columns are pure functions of the
input row, so the extracted text per url is identical across runs, workers
and cluster sizes. The wide ``html`` column is dropped here — immediately
after its only consumer — so downstream blocks stay small
(SURVEY §4.2 "object spilling").
"""

from __future__ import annotations

import pyarrow as pa

from ctinexus_ray.functions.extract import extract_hybrid_content
from ctinexus_ray.functions.text import build_cti_focus_text, normalize_text


def extract_batch(batch: pa.Table) -> pa.Table:
    """(url, warc_ts, html, text, lang) -> + (extracted_text, title, cti_text),
    minus html.

    Per row: if ``html`` is present run the hybrid extractor (E1, already
    normalize_text'd per candidate); else fall back to the ``text`` column
    normalized (E2). Then apply the CTI focus filter (E3). The row loop is
    unavoidable (each row is one document through a regex state machine);
    all regexes are precompiled at module import.
    """
    html_col = batch.column("html").to_pylist() if "html" in batch.column_names else [None] * batch.num_rows
    text_col = batch.column("text").to_pylist() if "text" in batch.column_names else [None] * batch.num_rows

    extracted: list[str] = []
    titles: list[str | None] = []
    focused: list[str] = []
    for html, text in zip(html_col, text_col):
        if html:
            if isinstance(html, bytes):
                html = html.decode("utf-8", errors="replace")
            result = extract_hybrid_content(html)
            ext, title = result["text"], result["title"]
        else:
            ext, title = normalize_text(text or ""), None
        extracted.append(ext)
        titles.append(title)
        focused.append(build_cti_focus_text(ext))

    out = batch.drop_columns([c for c in ("html",) if c in batch.column_names])
    out = out.append_column("extracted_text", pa.array(extracted, type=pa.string()))
    out = out.append_column("title", pa.array(titles, type=pa.string()))
    out = out.append_column("cti_text", pa.array(focused, type=pa.string()))
    return out
