"""Document-table readers and adapters.

The engine's native input is the Common-Crawl shape of BASELINE.json's
input_hint: ``(url, warc_ts, html, text, lang)``. The driver's synthetic
test tables (`TESTDATA.md`) carry ``(doc_id, text, lang, source, n_chars)``
instead; ``read_testdata_as_cc`` adapts them on the fly — streaming, one
deterministic HTML render per row — so the KG pipeline always runs over
the exact input_hint schema.
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import ray.data

from ctinexus_ray.sources.synth import CC_SCHEMA, make_cc_row


def read_cc(paths: str | list[str]) -> ray.data.Dataset:
    """Column-complete read of a Common-Crawl-shaped parquet corpus."""
    return ray.data.read_parquet(paths, columns=list(CC_SCHEMA.names))


def _adapt_batch(batch: pa.Table) -> pa.Table:
    rows = [
        make_cc_row(int(doc_id), text or "")
        for doc_id, text in zip(
            batch.column("doc_id").to_pylist(), batch.column("text").to_pylist()
        )
    ]
    return pa.Table.from_pylist(rows, schema=CC_SCHEMA)


def read_testdata_as_cc(sf_dir: str | Path) -> ray.data.Dataset:
    """Stream the driver's documents.parquet into the Common-Crawl shape
    (deterministic synthetic html wrapped around each text)."""
    path = str(Path(sf_dir) / "documents.parquet")
    ds = ray.data.read_parquet(path, columns=["doc_id", "text"])
    return ds.map_batches(_adapt_batch, batch_format="pyarrow")


def read_testdata_documents(sf_dir: str | Path, columns: list[str] | None = None) -> ray.data.Dataset:
    return ray.data.read_parquet(
        str(Path(sf_dir) / "documents.parquet"), columns=columns
    )


def read_testdata_embeddings(sf_dir: str | Path) -> ray.data.Dataset:
    return ray.data.read_parquet(str(Path(sf_dir) / "embeddings.parquet"))
