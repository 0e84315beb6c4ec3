"""ISO-BMFF (MP4) sample-table parsing — stdlib + numpy only.

Real video frame-sampling support for the multimodal stage: a frame
sampler does NOT need a video codec — it needs the container's sample
tables (``stts`` timestamps, ``stsz`` sizes, ``stsc``/``stco`` chunk
layout) to locate each frame's bytes and presentation time, exactly what
a pipeline computes before handing frame payloads to a GPU decoder.
This module implements that from the public ISO/IEC 14496-12 box
format: ``parse_mp4_samples`` returns one record per sample (offset,
size, pts, duration), and ``sample_frames_every`` picks the frame
covering each wall-clock tick.

Scope (honest boundary — unsupported inputs raise ``ValueError``):
fragmented MP4 (``moof``/``trun``), edit lists, ``ctts`` composition
offsets (pts == dts here), and codec decode of the frame payloads
(the extracted bytes are compressed codec data, passed through opaque).

``build_mp4`` constructs a minimal valid progressive MP4 (ftyp + mdat +
moov) with deterministic fake frame payloads — the test/benchs' media
generator, and a real exercise of multi-run ``stts`` and multi-sample
``stsc`` chunking on the parse side.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FULLBOX_HEADER = 4  # version (1) + flags (3)


def _box(typ: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", len(payload) + 8) + typ + payload


def _fullbox(typ: bytes, body: bytes, version: int = 0) -> bytes:
    return _box(typ, struct.pack(">B3x", version) + body)


def build_mp4(
    n_frames: int,
    timescale: int = 30000,
    frame_delta: int = 1001,
    seed: int = 0,
    frames_per_chunk: int = 3,
    variable_rate: bool = True,
    use_co64: bool = False,
    frames: list[bytes] | None = None,
    codec: bytes = b"mp4v",
    width: int = 64,
    height: int = 64,
) -> bytes:
    """Minimal progressive MP4 with ``n_frames`` deterministic fake video
    samples. ``variable_rate`` emits a two-run ``stts`` (second half at
    double the frame duration) so parsers must walk run-length entries.

    ``frames`` (optional) supplies the real sample payloads instead of
    the deterministic fakes — with ``codec=b"jpeg"`` this writes a
    motion-JPEG track (each sample an independently-decodable JPEG, the
    QuickTime/ISO 'jpeg' visual sample entry) that ``DecodeVideoStage``
    can fully decode with the pure-numpy baseline codec in
    ``ops/jpeg.py``.
    """
    if frames is not None:
        if not frames:
            raise ValueError("frames must be non-empty when provided")
        n_frames = len(frames)
        sizes = [len(f) for f in frames]
    else:
        if n_frames < 1:
            raise ValueError("n_frames must be >= 1")
        sizes = []
        frames = []
        for i in range(n_frames):
            digest = hashlib.blake2b(
                f"frame:{seed}:{i}".encode(), digest_size=16
            ).digest()
            size = 64 + digest[0] % 192
            frames.append((digest * ((size + 15) // 16))[:size])
            sizes.append(size)
    if len(codec) != 4:
        raise ValueError("codec must be a 4-byte fourcc")

    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isomiso2mp41")
    # mdat directly after ftyp: chunk offsets are absolute file offsets
    mdat_header_at = len(ftyp)
    mdat_body = b"".join(frames)
    mdat = _box(b"mdat", mdat_body)

    # chunking: frames_per_chunk samples per chunk, last chunk partial
    chunk_offsets = []
    chunk_sample_counts = []
    off = mdat_header_at + 8
    i = 0
    while i < n_frames:
        take = min(frames_per_chunk, n_frames - i)
        chunk_offsets.append(off)
        chunk_sample_counts.append(take)
        off += sum(sizes[i : i + take])
        i += take

    # stts: one or two runs
    half = n_frames // 2
    if variable_rate and half and n_frames - half:
        stts_entries = [(half, frame_delta), (n_frames - half, frame_delta * 2)]
    else:
        stts_entries = [(n_frames, frame_delta)]
    duration = sum(c * d for c, d in stts_entries)

    stts = _fullbox(
        b"stts",
        struct.pack(">I", len(stts_entries))
        + b"".join(struct.pack(">II", c, d) for c, d in stts_entries),
    )
    # stsc runs: collapse consecutive chunks with equal sample counts
    stsc_runs = []
    for idx, count in enumerate(chunk_sample_counts):
        if not stsc_runs or stsc_runs[-1][1] != count:
            stsc_runs.append((idx + 1, count))  # first_chunk is 1-based
    stsc = _fullbox(
        b"stsc",
        struct.pack(">I", len(stsc_runs))
        + b"".join(struct.pack(">III", fc, n, 1) for fc, n in stsc_runs),
    )
    stsz = _fullbox(
        b"stsz",
        struct.pack(">II", 0, n_frames)
        + b"".join(struct.pack(">I", s) for s in sizes),
    )
    if use_co64:
        stco = _fullbox(
            b"co64",
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">Q", o) for o in chunk_offsets),
        )
    else:
        stco = _fullbox(
            b"stco",
            struct.pack(">I", len(chunk_offsets))
            + b"".join(struct.pack(">I", o) for o in chunk_offsets),
        )
    # minimal visual sample entry (codec fourcc shell; payload opacity
    # depends on the fourcc — 'jpeg' samples are decodable JPEGs)
    sample_entry = _box(
        codec,
        b"\x00" * 6 + struct.pack(">H", 1)  # reserved + data_reference_index
        + b"\x00" * 16
        + struct.pack(">HH", width, height)
        + struct.pack(">II", 0x00480000, 0x00480000)  # 72 dpi
        + struct.pack(">I", 0)
        + struct.pack(">H", 1)  # frame count
        + b"\x00" * 32  # compressor name
        + struct.pack(">Hh", 24, -1),  # depth, color table id
    )
    stsd = _fullbox(b"stsd", struct.pack(">I", 1) + sample_entry)
    stbl = _box(b"stbl", stsd + stts + stsc + stsz + stco)
    dinf = _box(b"dinf", _fullbox(b"dref", struct.pack(">I", 1) + _box(b"url ", struct.pack(">B3B", 0, 0, 0, 1))))
    vmhd = _fullbox(b"vmhd", struct.pack(">HHHH", 0, 0, 0, 0), version=0)
    minf = _box(b"minf", vmhd + dinf + stbl)
    hdlr = _fullbox(b"hdlr", struct.pack(">I", 0) + b"vide" + b"\x00" * 12 + b"video\x00")
    mdhd = _fullbox(
        b"mdhd", struct.pack(">IIII", 0, 0, timescale, duration) + struct.pack(">HH", 0x55C4, 0)
    )
    mdia = _box(b"mdia", mdhd + hdlr + minf)
    # version-0 tkhd: creation, modification, track_ID (1-based, 0 is
    # forbidden), reserved, duration — then 8 reserved bytes,
    # layer/alt-group/volume/reserved, the identity matrix, width/height
    tkhd = _fullbox(
        b"tkhd",
        struct.pack(">IIIII", 0, 0, 1, 0, duration)
        + b"\x00" * 8
        + struct.pack(">HHHH", 0, 0, 0, 0)
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + struct.pack(">II", width << 16, height << 16),
        version=0,
    )
    trak = _box(b"trak", tkhd + mdia)
    mvhd = _fullbox(
        b"mvhd",
        struct.pack(">IIII", 0, 0, timescale, duration)
        + struct.pack(">IHH", 0x00010000, 0x0100, 0)
        + b"\x00" * 8
        + struct.pack(">9I", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        + b"\x00" * 24
        + struct.pack(">I", 2),
    )
    moov = _box(b"moov", mvhd + trak)
    return ftyp + mdat + moov


def _iter_boxes(data: bytes, start: int, end: int):
    """Yield (type, payload_start, payload_end) for the boxes in a span."""
    pos = start
    while pos + 8 <= end:
        (size,) = struct.unpack(">I", data[pos : pos + 4])
        typ = data[pos + 4 : pos + 8]
        header = 8
        if size == 1:  # 64-bit largesize
            if pos + 16 > end:
                raise ValueError("truncated MP4 largesize box")
            (size,) = struct.unpack(">Q", data[pos + 8 : pos + 16])
            header = 16
        elif size == 0:  # box extends to end of file
            size = end - pos
        if size < header or pos + size > end:
            raise ValueError(f"malformed MP4 box {typ!r} (size {size})")
        yield typ, pos + header, pos + size
        pos += size


def _find_box(data: bytes, start: int, end: int, path: list[bytes]):
    """(payload_start, payload_end) of the first box at a nested path."""
    for typ, s, e in _iter_boxes(data, start, end):
        if typ == path[0]:
            if len(path) == 1:
                return s, e
            return _find_box(data, s, e, path[1:])
    return None


def parse_mp4_samples(payload: bytes) -> dict:
    """Decode the first video track's sample tables.

    Returns ``{"timescale": int, "duration_ms": float, "offsets",
    "sizes", "pts", "durations"}`` where the last four are int64 numpy
    arrays, one entry per sample; ``pts``/``durations`` are in media
    timescale units. Raises ``ValueError`` for fragmented files, edit
    lists, ctts, or a missing video track.
    """
    if len(payload) < 12 or payload[4:8] != b"ftyp":
        raise ValueError("not an MP4 payload (missing ftyp)")
    end = len(payload)
    for typ, _s, _e in _iter_boxes(payload, 0, end):
        if typ == b"moof":
            raise ValueError("fragmented MP4 (moof) not supported")
    moov = _find_box(payload, 0, end, [b"moov"])
    if moov is None:
        raise ValueError("MP4 missing moov box")

    for typ, ts, te in _iter_boxes(payload, *moov):
        if typ != b"trak":
            continue
        hdlr = _find_box(payload, ts, te, [b"mdia", b"hdlr"])
        if hdlr is None or payload[hdlr[0] + 8 : hdlr[0] + 12] != b"vide":
            continue
        if _find_box(payload, ts, te, [b"edts"]) is not None:
            raise ValueError("MP4 edit lists (edts) not supported")
        mdhd = _find_box(payload, ts, te, [b"mdia", b"mdhd"])
        stbl = _find_box(payload, ts, te, [b"mdia", b"minf", b"stbl"])
        if mdhd is None or stbl is None:
            raise ValueError("MP4 video track missing mdhd/stbl")
        version = payload[mdhd[0]]
        if version == 1:
            timescale, duration = struct.unpack(
                ">IQ", payload[mdhd[0] + 20 : mdhd[0] + 32]
            )
        else:
            timescale, duration = struct.unpack(
                ">II", payload[mdhd[0] + 12 : mdhd[0] + 20]
            )
        boxes = {t: (s, e) for t, s, e in _iter_boxes(payload, *stbl)}
        # stsd -> first visual sample entry's codec fourcc + coded dims
        codec = None
        coded_w = coded_h = 0
        if b"stsd" in boxes:
            s, e = boxes[b"stsd"]
            s += _FULLBOX_HEADER + 4  # version/flags + entry_count
            if s + 8 <= e:
                codec = payload[s + 4 : s + 8].decode("latin-1")
                # visual sample entry: 8 header + 6 reserved + 2 dri +
                # 16 predefined/reserved, then u16 width, u16 height
                if s + 36 <= e:
                    coded_w, coded_h = struct.unpack(
                        ">HH", payload[s + 32 : s + 36]
                    )
        if b"ctts" in boxes:
            raise ValueError("MP4 composition offsets (ctts) not supported")
        for need in (b"stts", b"stsz", b"stsc"):
            if need not in boxes:
                raise ValueError(f"MP4 stbl missing {need.decode()}")
        if b"stco" not in boxes and b"co64" not in boxes:
            raise ValueError("MP4 stbl missing stco/co64")

        def full(name: bytes) -> tuple[int, int]:
            s, e = boxes[name]
            return s + _FULLBOX_HEADER, e

        # stts -> per-sample durations and cumulative pts (dts == pts)
        s, _e = full(b"stts")
        (n_runs,) = struct.unpack(">I", payload[s : s + 4])
        runs = np.frombuffer(
            payload, dtype=">u4", count=2 * n_runs, offset=s + 4
        ).reshape(n_runs, 2)
        durations = np.repeat(
            runs[:, 1].astype(np.int64), runs[:, 0].astype(np.int64)
        )
        n_samples_t = len(durations)
        pts = np.concatenate([[0], np.cumsum(durations)[:-1]])

        # stsz -> sizes
        s, _e = full(b"stsz")
        fixed, count = struct.unpack(">II", payload[s : s + 8])
        if fixed:
            sizes = np.full(count, fixed, dtype=np.int64)
        else:
            sizes = np.frombuffer(
                payload, dtype=">u4", count=count, offset=s + 8
            ).astype(np.int64)
        if count != n_samples_t:
            raise ValueError("MP4 stsz/stts sample count mismatch")

        # stco / co64 -> chunk offsets
        if b"stco" in boxes:
            s, _e = full(b"stco")
            (n_chunks,) = struct.unpack(">I", payload[s : s + 4])
            chunk_off = np.frombuffer(
                payload, dtype=">u4", count=n_chunks, offset=s + 4
            ).astype(np.int64)
        else:
            s, _e = full(b"co64")
            (n_chunks,) = struct.unpack(">I", payload[s : s + 4])
            chunk_off = np.frombuffer(
                payload, dtype=">u8", count=n_chunks, offset=s + 4
            ).astype(np.int64)

        # stsc -> samples-per-chunk for every chunk (run-length expand)
        s, _e = full(b"stsc")
        (n_sc,) = struct.unpack(">I", payload[s : s + 4])
        sc = np.frombuffer(
            payload, dtype=">u4", count=3 * n_sc, offset=s + 4
        ).reshape(n_sc, 3)
        per_chunk = np.empty(n_chunks, dtype=np.int64)
        for i in range(n_sc):
            first = int(sc[i, 0]) - 1
            last = int(sc[i + 1, 0]) - 1 if i + 1 < n_sc else n_chunks
            per_chunk[first:last] = int(sc[i, 1])
        if per_chunk.sum() != n_samples_t:
            raise ValueError("MP4 stsc/stsz sample count mismatch")

        # per-sample offsets: chunk base + cumulative size within chunk
        chunk_of_sample = np.repeat(np.arange(n_chunks), per_chunk)
        csum = np.concatenate([[0], np.cumsum(sizes)[:-1]])
        chunk_first = np.concatenate([[0], np.cumsum(per_chunk)[:-1]])
        within = csum - csum[chunk_first[chunk_of_sample]]
        offsets = chunk_off[chunk_of_sample] + within

        return {
            "timescale": int(timescale),
            "duration_ms": float(duration) * 1000.0 / timescale,
            "offsets": offsets,
            "sizes": sizes,
            "pts": pts,
            "durations": durations,
            "codec": codec,
            "coded_width": int(coded_w),
            "coded_height": int(coded_h),
        }
    raise ValueError("MP4 has no video (vide) track")


def sample_frames_every(payload: bytes, every_ms: int) -> list[dict]:
    """One record per ``every_ms`` tick: the sample whose presentation
    interval covers the tick, with its real byte payload sliced out of
    ``mdat``. Ticks run [0, duration)."""
    info = parse_mp4_samples(payload)
    scale = info["timescale"]
    pts_ms = info["pts"].astype(np.float64) * 1000.0 / scale
    out = []
    # tick range comes from the stts sample durations, NOT the mdhd
    # duration: writers leave mdhd at 0 (no ticks despite full sample
    # tables) or the 0xFFFFFFFF unknown sentinel (~572k spurious ticks
    # per video at every_ms=250 — a worker OOM with frame bytes attached)
    total_ms = float(info["durations"].sum()) * 1000.0 / scale
    ticks = np.arange(0, total_ms, float(every_ms))
    # frame covering tick t: last sample with pts <= t
    idx = np.searchsorted(pts_ms, ticks, side="right") - 1
    idx = np.clip(idx, 0, len(pts_ms) - 1)
    for t, i in zip(ticks, idx):
        off, size = int(info["offsets"][i]), int(info["sizes"][i])
        out.append(
            {
                "tick_ms": float(t),
                "frame_index": int(i),
                "pts_ms": float(pts_ms[i]),
                "offset": off,
                "size": size,
                "data": payload[off : off + size],
            }
        )
    return out
