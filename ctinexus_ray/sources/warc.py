"""WARC (ISO 28500) reader — the wire format web crawls actually ship in.

Common Crawl publishes ``.warc.gz`` files: a stream of WARC records, each
independently gzip-compressed (multi-member gzip), each record a header
block plus a Content-Length-delimited body; ``response`` records carry a
full HTTP response whose body is the crawled HTML. This module parses
that format with stdlib ``zlib`` + bytes slicing, and exposes it as a
Ray Data source producing the engine's Common-Crawl table shape
(``CC_SCHEMA``: url, warc_ts, html, text, lang — text/lang NULL at
ingest; extraction/langid fill them downstream).

Distribution shape: one task per WARC file (``read_binary_files`` ->
``flat_map`` over records). Common Crawl caps segment files at ~1 GiB
precisely so a whole file fits a worker — records are not splittable
mid-file without an index, so per-file tasks ARE the standard
parallelism unit for this format; set small batch sizes downstream.

Scope (honest boundary): WARC/1.0 and 1.1, uncompressed or gzip
(per-record members or whole-file); ``response``/``resource``/
``conversion`` records yield rows, others (warcinfo, request, metadata)
are skipped; chunked transfer-encoding bodies are de-chunked; truncated
records raise ``ValueError``.
"""

from __future__ import annotations

import datetime
import zlib
from pathlib import Path

import pyarrow as pa
import ray.data

from ctinexus_ray.sources.synth import CC_SCHEMA

_CRLF = b"\r\n"
_YIELDING_TYPES = ("response", "resource", "conversion")


def gunzip_members(data: bytes) -> bytes:
    """Decompress a (possibly multi-member) gzip stream; passthrough if
    not gzip. Common Crawl gzips each record as its own member."""
    if data[:2] != b"\x1f\x8b":
        return data
    out = bytearray()
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        out.extend(d.decompress(data[pos:]))
        out.extend(d.flush())
        tail = d.unused_data
        if not tail:
            break
        pos = len(data) - len(tail)
    return bytes(out)


def _parse_headers(block: bytes) -> dict[str, str]:
    """Case-insensitive header dict from a CRLF header block (the first
    line — WARC/1.0 or HTTP/1.1 200 — is skipped). Folded continuation
    lines are appended per RFC."""
    headers: dict[str, str] = {}
    last = None
    for line in block.split(_CRLF)[1:]:
        if not line:
            continue
        if line[:1] in (b" ", b"\t") and last is not None:
            headers[last] += " " + line.strip().decode("latin-1")
            continue
        key, _, value = line.partition(b":")
        last = key.strip().decode("latin-1").lower()
        headers[last] = value.strip().decode("latin-1")
    return headers


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP chunked transfer-encoding body."""
    out = bytearray()
    pos = 0
    while pos < len(body):
        eol = body.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("truncated chunked body (missing size line)")
        size_token = body[pos:eol].split(b";")[0].strip()
        size = int(size_token, 16)
        if size == 0:
            break
        start = eol + 2
        out.extend(body[start : start + size])
        pos = start + size + 2  # skip chunk CRLF
    return bytes(out)


def iter_warc_records(data: bytes):
    """Yield ``(warc_headers, payload_bytes)`` per record from a
    decompressed WARC stream. ``payload_bytes`` is the raw record block
    (for response records: status line + HTTP headers + body)."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLF padding
        while pos < n and data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"malformed WARC record at byte {pos}")
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("truncated WARC header block")
        headers = _parse_headers(data[pos:head_end])
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length") from None
        body_start = head_end + 4
        body_end = body_start + length
        if body_end > n:
            raise ValueError("truncated WARC record body")
        yield headers, data[body_start:body_end]
        pos = body_end


def _http_body(payload: bytes) -> tuple[bytes, dict[str, str]]:
    """Split an HTTP response payload into (body, http_headers)."""
    head_end = payload.find(_CRLF + _CRLF)
    if head_end < 0 or not payload.startswith(b"HTTP/"):
        return payload, {}  # identity payload (resource/conversion)
    headers = _parse_headers(payload[:head_end])
    body = payload[head_end + 4 :]
    if headers.get("transfer-encoding", "").lower() == "chunked":
        body = _dechunk(body)
    return body, headers


def _warc_ts(value: str | None) -> datetime.datetime | None:
    """WARC-Date (ISO-8601 Z) -> aware UTC datetime; None if absent/bad."""
    if not value:
        return None
    try:
        return datetime.datetime.fromisoformat(
            value.replace("Z", "+00:00")
        ).astimezone(datetime.timezone.utc)
    except ValueError:
        return None


def parse_warc_file(data: bytes) -> pa.Table:
    """One WARC file (raw bytes, gz or plain) -> a CC_SCHEMA arrow table:
    one row per response/resource/conversion record."""
    urls, tss, htmls = [], [], []
    for headers, payload in iter_warc_records(gunzip_members(data)):
        if headers.get("warc-type") not in _YIELDING_TYPES:
            continue
        body, _http = _http_body(payload)
        urls.append(headers.get("warc-target-uri"))
        tss.append(_warc_ts(headers.get("warc-date")))
        htmls.append(body)
    return pa.Table.from_arrays(
        [
            pa.array(urls, type=pa.string()),
            pa.array(tss, type=pa.timestamp("us", tz="UTC")),
            pa.array(htmls, type=pa.binary()),
            pa.nulls(len(urls), type=pa.string()),  # text: extraction fills
            pa.nulls(len(urls), type=pa.string()),  # lang: langid fills
        ],
        schema=CC_SCHEMA,
    )


def read_warc(paths: str | list[str]) -> ray.data.Dataset:
    """Common-Crawl-shaped Dataset from ``.warc`` / ``.warc.gz`` files —
    one parse task per file (the format's natural split unit)."""

    def parse(batch: pa.Table):
        for data in batch.column("bytes").to_pylist():
            table = parse_warc_file(data)
            if table.num_rows:
                yield table

    return ray.data.read_binary_files(paths).map_batches(
        parse, batch_format="pyarrow", batch_size=1
    )


# ---------------------------------------------------------------------------
# writer — test/bench generator (and a usable archival sink)
# ---------------------------------------------------------------------------


def _gzip_member(data: bytes) -> bytes:
    c = zlib.compressobj(6, zlib.DEFLATED, 31)
    return c.compress(data) + c.flush()


def build_warc(
    records: list[dict],
    *,
    per_record_gzip: bool = True,
    chunked_every: int = 0,
) -> bytes:
    """Serialize ``records`` (dicts with url / date / html, optional
    warc_type) as a WARC/1.0 byte stream. ``per_record_gzip`` emits the
    Common-Crawl one-gzip-member-per-record layout; ``chunked_every > 0``
    makes every Nth record's HTTP body chunked-transfer-encoded (decoder
    exercise)."""
    out = bytearray()
    info_body = b"software: ctinexus-ray-warc/1.0\r\n"
    blocks = [_record_block("warcinfo", {}, info_body)]
    for i, rec in enumerate(records):
        body = rec["html"] if isinstance(rec["html"], bytes) else rec["html"].encode()
        if chunked_every and i % chunked_every == chunked_every - 1:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Transfer-Encoding: chunked\r\n\r\n"
            )
            mid = max(1, len(body) // 2)
            chunks = b""
            for part in (body[:mid], body[mid:]):
                if part:
                    chunks += f"{len(part):x}".encode() + _CRLF + part + _CRLF
            chunks += b"0" + _CRLF + _CRLF
            payload = http + chunks
        else:
            http = (
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Length: {len(body)}\r\n\r\n".encode()
            )
            payload = http + body
        blocks.append(
            _record_block(
                rec.get("warc_type", "response"),
                {
                    "WARC-Target-URI": rec["url"],
                    "WARC-Date": rec["date"],
                    "Content-Type": "application/http; msgtype=response",
                },
                payload,
            )
        )
    for block in blocks:
        out.extend(_gzip_member(block) if per_record_gzip else block)
    return bytes(out)


def _record_block(warc_type: str, extra: dict[str, str], payload: bytes) -> bytes:
    head = [f"WARC/1.0", f"WARC-Type: {warc_type}"]
    head += [f"{k}: {v}" for k, v in extra.items()]
    head.append(f"Content-Length: {len(payload)}")
    return (
        _CRLF.join(s.encode() for s in head)
        + _CRLF + _CRLF
        + payload
        + _CRLF + _CRLF
    )


def write_warc_corpus(
    out_dir: str | Path, n_docs: int, records_per_file: int = 100
) -> list[Path]:
    """Deterministic synthetic crawl as ``.warc.gz`` shards (the WARC
    twin of ``synth.write_cc_corpus``)."""
    from ctinexus_ray.sources.synth import make_cc_row

    out = Path(out_dir)
    out.mkdir(parents=True, exist_ok=True)
    paths: list[Path] = []
    for start in range(0, n_docs, records_per_file):
        count = min(records_per_file, n_docs - start)
        rows = [make_cc_row(i) for i in range(start, start + count)]
        data = build_warc(
            [
                {
                    "url": r["url"],
                    "date": r["warc_ts"].strftime("%Y-%m-%dT%H:%M:%SZ"),
                    "html": r["html"],
                }
                for r in rows
            ],
            chunked_every=7,
        )
        path = out / f"part-{start // records_per_file:05d}.warc.gz"
        path.write_bytes(data)
        paths.append(path)
    return paths
