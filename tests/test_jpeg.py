"""Baseline JPEG codec tests (ops/jpeg.py) — roundtrip tolerance,
table integrity, marker-level structure, and honest-boundary errors."""

import numpy as np
import pytest

from ctinexus_ray.ops.jpeg import (
    AC_CHROMA_BITS,
    AC_CHROMA_VALS,
    AC_LUMA_BITS,
    AC_LUMA_VALS,
    DC_CHROMA_BITS,
    DC_LUMA_BITS,
    UNZIGZAG,
    ZIGZAG,
    _canonical_codes,
    decode_jpeg,
    encode_jpeg,
    encode_jpeg_progressive,
)


def _gradient(h: int, w: int) -> np.ndarray:
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    return np.stack(
        [
            np.clip(x * 2 + y, 0, 255) + 0 * y,
            np.clip(255 - x - y * 2, 0, 255) + 0 * y,
            np.clip(x + y, 0, 255) + 0 * y,
        ],
        axis=2,
    ).astype(np.uint8)


class TestTables:
    def test_huffman_table_sizes(self):
        assert sum(DC_LUMA_BITS[1:]) == 12
        assert sum(DC_CHROMA_BITS[1:]) == 12
        assert sum(AC_LUMA_BITS[1:]) == len(AC_LUMA_VALS) == 162
        assert sum(AC_CHROMA_BITS[1:]) == len(AC_CHROMA_VALS) == 162

    def test_canonical_codes_prefix_free(self):
        codes = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
        assert len(codes) == 162
        # canonical codes are prefix-free: no code is a prefix of another
        as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
        assert len(as_bits) == 162
        for a in as_bits:
            for b in as_bits:
                if a is not b and len(a) < len(b):
                    assert not b.startswith(a)

    def test_zigzag_is_permutation(self):
        assert sorted(ZIGZAG.tolist()) == list(range(64))
        assert np.array_equal(ZIGZAG[UNZIGZAG], np.arange(64))


class TestRoundtrip:
    @pytest.mark.parametrize(
        "quality,subsampling,tol",
        [(95, "4:4:4", 6), (85, "4:4:4", 12), (90, "4:2:0", 14)],
    )
    def test_smooth_rgb(self, quality, subsampling, tol):
        img = _gradient(37, 53)  # non-multiple-of-8/16 dims exercise padding
        out = decode_jpeg(encode_jpeg(img, quality=quality, subsampling=subsampling))
        assert out.shape == img.shape
        assert np.abs(out.astype(int) - img.astype(int)).max() <= tol

    def test_noise_q100_near_lossless(self):
        rng = np.random.RandomState(7)
        img = rng.randint(0, 256, size=(24, 31, 3)).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        # q100 quantizes by ~1: error bounded by DCT round-trip rounding
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 3

    def test_grayscale_single_component(self):
        x = np.arange(53)[None, :]
        y = np.arange(37)[:, None]
        g = np.clip(x + 2 * y, 0, 255).astype(np.uint8)
        out = decode_jpeg(encode_jpeg(g, quality=95))
        assert out.shape == (37, 53, 1)
        assert np.abs(out[:, :, 0].astype(int) - g.astype(int)).max() <= 2

    def test_tiny_and_odd_dims(self):
        for h, w in ((1, 1), (8, 8), (9, 17), (16, 16), (15, 1)):
            img = _gradient(h, w)
            out = decode_jpeg(encode_jpeg(img, quality=90))
            assert out.shape == img.shape

    def test_420_odd_dims(self):
        # odd dims with subsampled chroma: crop/pad path both directions
        for h, w in ((9, 9), (17, 15), (16, 17)):
            img = _gradient(h, w)
            out = decode_jpeg(encode_jpeg(img, quality=90, subsampling="4:2:0"))
            assert out.shape == img.shape
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 20

    def test_deterministic_bytes(self):
        img = _gradient(12, 20)
        a = encode_jpeg(img, quality=80)
        b = encode_jpeg(img, quality=80)
        assert a == b
        assert a[:2] == b"\xff\xd8" and a[-2:] == b"\xff\xd9"

    def test_byte_stuffing_roundtrips(self):
        # flat mid-gray blocks produce long EOB/1-bit runs -> stuffed 0xFF
        img = np.full((32, 32, 3), 128, dtype=np.uint8)
        payload = encode_jpeg(img, quality=50)
        out = decode_jpeg(payload)
        assert np.abs(out.astype(int) - 128).max() <= 2


class TestStructure:
    def test_markers_present(self):
        payload = encode_jpeg(_gradient(16, 16), quality=85)
        for marker in (b"\xff\xd8", b"\xff\xe0", b"\xff\xdb", b"\xff\xc0",
                       b"\xff\xc4", b"\xff\xda", b"\xff\xd9"):
            assert marker in payload
        assert b"JFIF\x00" in payload

    def test_sof_dimensions(self):
        import struct

        payload = encode_jpeg(_gradient(19, 23), quality=85)
        at = payload.index(b"\xff\xc0")
        _len, prec, h, w, nc = struct.unpack(">HBHHB", payload[at + 2 : at + 10])
        assert (prec, h, w, nc) == (8, 19, 23, 3)


class TestHonestBoundary:
    def test_not_jpeg(self):
        with pytest.raises(ValueError, match="SOI"):
            decode_jpeg(b"\x89PNG\r\n")

    def test_truncated_scan(self):
        payload = encode_jpeg(_gradient(16, 16), quality=85)
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) // 2])

    def test_malformed_progressive_scan_rejected(self):
        # A baseline stream whose SOF0 is rewritten to SOF2 carries a
        # baseline scan header (Ss=0, Se=63) that is invalid for
        # progressive: DC and AC may not share a scan.
        payload = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
        at = payload.index(b"\xff\xc0")
        payload[at + 1] = 0xC2  # rewrite SOF0 -> SOF2 (progressive)
        with pytest.raises(ValueError, match="Se=0"):
            decode_jpeg(bytes(payload))

    def test_lossless_sof_rejected(self):
        payload = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
        at = payload.index(b"\xff\xc0")
        payload[at + 1] = 0xC3  # SOF3: lossless sequential
        with pytest.raises(ValueError, match="SOF3"):
            decode_jpeg(bytes(payload))

    def test_missing_restart_marker_rejected(self):
        # a DRI header promising restarts the scan doesn't contain must
        # raise, not silently desync (16x16 4:4:4 = 4 MCUs, Ri=2 -> one
        # RST expected after MCU 2)
        payload = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
        at = payload.index(b"\xff\xdb")
        dri = b"\xff\xdd\x00\x04\x00\x02"
        payload[at:at] = dri
        with pytest.raises(ValueError, match="restart"):
            decode_jpeg(bytes(payload))

    def test_bad_quality(self):
        with pytest.raises(ValueError, match="quality"):
            encode_jpeg(_gradient(8, 8), quality=0)

    def test_bad_subsampling(self):
        with pytest.raises(ValueError, match="subsampling"):
            encode_jpeg(_gradient(8, 8), subsampling="4:1:1")


class TestReviewRegressions:
    def test_fill_bytes_before_marker(self):
        """T.81 B.1.1.2: 0xFF fill padding before a marker must parse."""
        img = _gradient(16, 16)
        payload = bytearray(encode_jpeg(img, quality=85))
        at = payload.index(b"\xff\xdb")
        payload[at:at] = b"\xff\xff\xff"  # fill bytes, then the real DQT
        out = decode_jpeg(bytes(payload))
        assert out.shape == img.shape

    def test_multi_scan_rejected_clearly(self):
        """A 1-component SOS inside a 3-component frame must raise the
        unsupported-feature error, not decode garbage."""
        payload = bytearray(encode_jpeg(_gradient(16, 16), quality=85))
        at = payload.index(b"\xff\xda")
        # SOS segment: len(2) ns(1) [cid, tbls]*ns ss se ah/al
        payload[at + 2 : at + 14] = bytes(
            [0, 8, 1, 1, 0x00, 0x00, 0x3F, 0x00]
        ) + payload[at + 10 : at + 14]
        with pytest.raises(ValueError, match="multi-scan"):
            decode_jpeg(bytes(payload))


class TestProgressive:
    """Progressive (SOF2) codec: spectral selection + successive
    approximation must reconstruct bit-identical pixels to the baseline
    codec at the same quality/subsampling (both share the coefficient
    front half)."""

    @pytest.mark.parametrize(
        "shape,subsampling",
        [
            ((16, 16), "4:4:4"),
            ((19, 23), "4:4:4"),
            ((19, 23), "4:2:0"),
            ((64, 48), "4:2:0"),
            ((8, 8), "4:4:4"),
        ],
    )
    def test_matches_baseline_exactly(self, shape, subsampling):
        img = _gradient(*shape)
        base = decode_jpeg(encode_jpeg(img, quality=85, subsampling=subsampling))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsampling=subsampling)
        )
        assert np.array_equal(base, prog)

    @pytest.mark.parametrize("quality", [5, 30, 85, 95, 100])
    def test_noise_all_qualities(self, quality):
        rng = np.random.default_rng(41)
        img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=quality, subsampling="4:2:0"))
        prog = decode_jpeg(
            encode_jpeg_progressive(img, quality=quality, subsampling="4:2:0")
        )
        assert np.array_equal(base, prog)

    def test_grayscale(self):
        rng = np.random.default_rng(42)
        img = rng.integers(0, 256, (33, 41)).astype(np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=70))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=70))
        assert np.array_equal(base, prog)

    def test_flat_image_long_eob_runs(self):
        # every AC band is zero -> the EOBRUN path covers whole scans
        img = np.full((48, 48, 3), 128, dtype=np.uint8)
        base = decode_jpeg(encode_jpeg(img, quality=50))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=50))
        assert np.array_equal(base, prog)

    def test_structure_sof2_and_multiple_scans(self):
        payload = encode_jpeg_progressive(_gradient(32, 32), quality=85)
        assert b"\xff\xc2" in payload and b"\xff\xc0" not in payload
        assert payload.count(b"\xff\xda") >= 6  # libjpeg default scan script
        assert payload[:2] == b"\xff\xd8" and payload[-2:] == b"\xff\xd9"

    def test_smaller_than_baseline_on_typical_content(self):
        # per-scan optimal Huffman tables should beat fixed Annex K tables
        img = _gradient(128, 128)
        assert len(encode_jpeg_progressive(img, quality=85)) < len(
            encode_jpeg(img, quality=85)
        )

    def test_truncated_progressive_raises(self):
        payload = encode_jpeg_progressive(_gradient(32, 32), quality=85)
        with pytest.raises(ValueError):
            decode_jpeg(payload[: len(payload) // 3])

    def test_optimal_table_is_valid_prefix_code(self):
        from ctinexus_ray.ops.jpeg import _optimal_table

        bits, vals = _optimal_table({0: 1000, 1: 500, 0xF0: 3, 0x71: 1})
        assert sum(bits[1:]) == len(vals) == 4
        codes = _canonical_codes(bits, vals)
        as_bits = {format(c, f"0{ln}b") for c, ln in codes.values()}
        assert len(as_bits) == 4
        for a in as_bits:
            for b in as_bits:
                if a != b:
                    assert not b.startswith(a)

    def test_optimal_table_single_symbol(self):
        from ctinexus_ray.ops.jpeg import _optimal_table

        bits, vals = _optimal_table({0: 7})
        codes = _canonical_codes(bits, vals)
        assert 0 in codes  # a lone EOB symbol still gets a real code


class TestRestartIntervals:
    """DRI/RSTn markers: decode must byte-align, validate marker sequence,
    and reset DC predictors (and EOB runs in progressive scans) — pixels
    must be identical with and without restarts."""

    @pytest.mark.parametrize("ri", [1, 3, 7, 100])
    def test_baseline_dri_roundtrip(self, ri):
        img = _gradient(64, 48)
        plain = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0"))
        with_dri = decode_jpeg(
            encode_jpeg(img, quality=85, subsampling="4:2:0", restart_interval=ri)
        )
        assert np.array_equal(plain, with_dri)

    @pytest.mark.parametrize("ri", [1, 4])
    def test_progressive_dri_roundtrip(self, ri):
        img = _gradient(64, 48)
        plain = decode_jpeg(
            encode_jpeg_progressive(img, quality=85, subsampling="4:2:0")
        )
        with_dri = decode_jpeg(
            encode_jpeg_progressive(
                img, quality=85, subsampling="4:2:0", restart_interval=ri
            )
        )
        assert np.array_equal(plain, with_dri)

    def test_noise_dri_roundtrip(self):
        rng = np.random.default_rng(43)
        img = rng.integers(0, 256, (40, 56, 3)).astype(np.uint8)
        for enc in (encode_jpeg, encode_jpeg_progressive):
            plain = decode_jpeg(enc(img, quality=90))
            with_dri = decode_jpeg(enc(img, quality=90, restart_interval=2))
            assert np.array_equal(plain, with_dri)

    def test_dri_markers_present(self):
        payload = encode_jpeg(_gradient(64, 64), quality=85, restart_interval=4)
        assert b"\xff\xdd" in payload
        assert b"\xff\xd0" in payload and b"\xff\xd1" in payload

    def test_out_of_sequence_restart_rejected(self):
        payload = bytearray(
            encode_jpeg(_gradient(64, 64), quality=85, restart_interval=4)
        )
        at = payload.index(b"\xff\xd0")
        payload[at + 1] = 0xD5  # wrong RSTn ordinal
        with pytest.raises(ValueError, match="out of sequence"):
            decode_jpeg(bytes(payload))
