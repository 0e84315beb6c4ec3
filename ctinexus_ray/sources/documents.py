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


def conform_schema(
    ds: ray.data.Dataset, schema: pa.Schema = CC_SCHEMA
) -> ray.data.Dataset:
    """Coerce every batch to exactly ``schema``: present columns CAST to
    the declared type, missing columns appended as typed nulls, extras
    dropped, column order pinned. The ingestion guard for heterogeneous
    crawl shards — at 10^12 docs the corpus WILL contain shards written
    by different crawler versions, and one stray ``large_string`` or
    missing column otherwise breaks a downstream union/join with a
    schema-mismatch mid-run."""

    def conform(batch: pa.Table):
        if batch.num_rows == 0:
            return
        yield _conform_table(batch, schema)

    return ds.map_batches(conform, batch_format="pyarrow")


def _conform_table(batch: pa.Table, schema: pa.Schema) -> pa.Table:
    """One-table cast/fill/drop/reorder (shared by ``conform_schema`` and
    ``read_cc_jsonl`` so the ingestion-guard logic has one source of
    truth)."""
    arrays = []
    for f in schema:
        if f.name in batch.column_names:
            arrays.append(batch.column(f.name).cast(f.type))
        else:
            arrays.append(pa.nulls(batch.num_rows, type=f.type))
    return pa.Table.from_arrays(arrays, schema=schema)


def _normalize_text_encodings(batch: pa.Table) -> pa.Table:
    """Text-format normalization shared by the JSONL/CSV readers: ISO
    timestamp strings -> UTC timestamp[us], utf-8 html strings ->
    binary. Parquet shards skip this (already typed)."""
    if "warc_ts" in batch.column_names and pa.types.is_string(
        batch.column("warc_ts").type
    ):
        import pyarrow.compute as pc

        idx = batch.column_names.index("warc_ts")
        batch = batch.set_column(
            idx,
            "warc_ts",
            pc.assume_timezone(
                pc.strptime(
                    batch.column("warc_ts"),
                    format="%Y-%m-%dT%H:%M:%S",
                    unit="us",
                ),
                "UTC",
            ),
        )
    if "html" in batch.column_names and pa.types.is_string(
        batch.column("html").type
    ):
        idx = batch.column_names.index("html")
        batch = batch.set_column(
            idx, "html", batch.column("html").cast(pa.binary())
        )
    return batch


def read_cc_jsonl(paths: str | list[str]) -> ray.data.Dataset:
    """Common-Crawl-shaped corpus from JSONL shards (the other wire format
    web corpora ship in): ``ray.data.read_json`` streams the lines, then
    ``conform_schema`` pins the CC table shape — ``warc_ts`` accepts ISO
    strings, ``html`` accepts base64-free utf-8 payloads (JSON has no
    binary type).

    Parquet remains the preferred format (column pruning + row-group
    filters never leave storage with JSONL); this reader exists so a raw
    crawl drop can enter the engine without a pre-conversion job."""

    def adapt(batch: pa.Table):
        if batch.num_rows == 0:
            return
        yield _conform_table(_normalize_text_encodings(batch), CC_SCHEMA)

    return ray.data.read_json(paths).map_batches(adapt, batch_format="pyarrow")


def read_cc_csv(paths: str | list[str]) -> ray.data.Dataset:
    """Common-Crawl-shaped corpus from CSV shards (legacy exports):
    ``ray.data.read_csv`` streams, then the same JSON-style
    normalization (ISO timestamp strings, utf-8 html) + the shared
    ``_conform_table`` ingestion guard pin the CC schema. Prefer parquet
    (typed, column-prunable); this exists so a CSV drop can enter the
    engine without a pre-conversion job."""

    def adapt(batch: pa.Table):
        if batch.num_rows == 0:
            return
        yield _conform_table(_normalize_text_encodings(batch), CC_SCHEMA)

    return ray.data.read_csv(paths).map_batches(adapt, batch_format="pyarrow")


def read_cc_orc(paths: str | list[str]) -> ray.data.Dataset:
    """Common-Crawl-shaped corpus from ORC shards (the Hive-ecosystem
    columnar format some crawl archives publish): one task per file,
    streamed STRIPE by stripe (an ORC stripe is the format's row-group
    analogue, typically 64 MB — each yields its own arrow table so a
    multi-GB shard never materializes whole), then the shared
    ``_conform_table`` ingestion guard pins the CC schema. Prefer
    parquet where there is a choice; this exists so an ORC drop can
    enter the engine without a pre-conversion job."""

    def parse(batch: pa.Table):
        import io

        from pyarrow import orc

        for data in batch.column("bytes").to_pylist():
            f = orc.ORCFile(io.BytesIO(data))
            for i in range(f.nstripes):
                stripe = f.read_stripe(i)
                table = (
                    pa.Table.from_batches([stripe])
                    if isinstance(stripe, pa.RecordBatch)
                    else stripe
                )
                if table.num_rows:
                    yield _conform_table(
                        _normalize_text_encodings(table), CC_SCHEMA
                    )

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


def write_cc_orc(out_dir: str | Path, n_docs: int,
                 rows_per_file: int = 10000) -> list[Path]:
    """Deterministic synthetic corpus as ORC shards (the ORC twin of
    ``synth.write_cc_corpus``, for tests and ingestion drills)."""
    from pyarrow import orc

    from ctinexus_ray.sources.synth import make_cc_table

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths: list[Path] = []
    for start in range(0, n_docs, rows_per_file):
        count = min(rows_per_file, n_docs - start)
        path = out / f"part-{start // rows_per_file:05d}.orc"
        orc.write_table(make_cc_table(count, start_id=start), path)
        paths.append(path)
    return paths


def ensure_doc_id(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Accept BOTH corpus shapes at a job boundary: the documents table
    (doc_id:int64) passes through; the url-keyed Common-Crawl corpus of
    input_hint gains a stable int64 ``doc_id`` derived from the url's
    vectorized 63-bit hash. At 10^12 docs the birthday bound puts ~50k
    hash collisions (~5e-8 of the corpus), each of which could merge two
    distinct urls' identities — acceptable for lossy dedup / ranking
    jobs, NOT for exact-identity joins (use the parquet doc_id path
    there)."""
    names = ds.schema().names
    if "doc_id" in names:
        return ds
    if "url" not in names:
        raise ValueError(
            "corpus has neither doc_id nor url; cannot key documents"
        )
    import numpy as np
    import pyarrow.compute as pc

    def add_id(batch: pa.Table) -> pa.Table:
        from ctinexus_ray.ops.dedup import hash64_strings

        col = batch.column("url")
        # NULL or empty urls would all hash to ONE doc_id, silently
        # collapsing distinct documents into a single dedup identity —
        # refuse loudly instead (pre-filter or pre-key such shards)
        bad = pc.sum(
            pc.cast(
                pc.or_kleene(
                    pc.is_null(col), pc.equal(col, pa.scalar(""))
                ),
                pa.int64(),
            )
        ).as_py()
        if bad:
            raise ValueError(
                f"{bad} rows have NULL/empty url; cannot derive a "
                "document key — filter them or supply doc_id"
            )
        h = (hash64_strings(col) >> np.uint64(1)).view(np.int64)
        return batch.append_column("doc_id", pa.array(h))

    return ds.map_batches(add_id, batch_format="pyarrow")
