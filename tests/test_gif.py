"""GIF codec tests (ops/gif.py): LZW roundtrip incl. code-size growth
and dictionary-reset paths, interlacing, palettes, honest boundaries."""

import numpy as np
import pytest

from ctinexus_ray.ops.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _pattern(h: int, w: int, colors: int) -> np.ndarray:
    """(h, w, 3) image drawing from exactly `colors` distinct colors."""
    x = np.arange(w)[None, :]
    y = np.arange(h)[:, None]
    idx = (x * 3 + y * 7) % colors
    palette = np.stack(
        [
            (np.arange(colors) * 37) % 256,
            (np.arange(colors) * 91 + 13) % 256,
            (np.arange(colors) * 53 + 200) % 256,
        ],
        axis=1,
    ).astype(np.uint8)
    return palette[idx]


class TestLZW:
    @pytest.mark.parametrize("min_code", [2, 4, 8])
    def test_roundtrip_structured(self, min_code):
        n = 1 << min_code
        rng = np.random.RandomState(min_code)
        # runs + noise exercise both dict hits and growth
        runs = np.repeat(rng.randint(0, n, 300), rng.randint(1, 9, 300))
        out = _lzw_decode(min_code, _lzw_encode(min_code, runs), len(runs))
        assert np.array_equal(out, runs)

    def test_roundtrip_dictionary_overflow(self):
        # enough distinct phrases to hit the 4096-entry cap -> clear/reset
        rng = np.random.RandomState(7)
        data = rng.randint(0, 256, 60000).astype(np.uint8)
        out = _lzw_decode(8, _lzw_encode(8, data), len(data))
        assert np.array_equal(out, data)

    def test_roundtrip_single_pixel(self):
        data = np.array([3], dtype=np.uint8)
        assert np.array_equal(_lzw_decode(2, _lzw_encode(2, data), 1), data)

    def test_truncated_stream_raises(self):
        data = np.arange(16, dtype=np.uint8) % 4
        enc = _lzw_encode(2, data)
        with pytest.raises(ValueError):
            _lzw_decode(2, enc[:2], len(data))


class TestGifRoundtrip:
    @pytest.mark.parametrize("colors", [2, 5, 16, 200])
    def test_exact_roundtrip(self, colors):
        img = _pattern(23, 31, colors)
        out = decode_gif(encode_gif(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)  # palette formats are lossless

    def test_interlaced_roundtrip(self):
        img = _pattern(29, 17, 7)
        payload = encode_gif(img, interlace=True)
        assert np.array_equal(decode_gif(payload), img)

    def test_header_and_trailer(self):
        payload = encode_gif(_pattern(8, 8, 4))
        assert payload[:6] == b"GIF89a" and payload[-1:] == b"\x3b"

    def test_extension_blocks_skipped(self):
        payload = bytearray(encode_gif(_pattern(8, 8, 4)))
        at = payload.index(0x2C, 13)  # first image descriptor
        # splice a Graphic Control Extension before the image
        payload[at:at] = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
        img = decode_gif(bytes(payload))
        assert np.array_equal(img, _pattern(8, 8, 4))

    def test_deterministic_bytes(self):
        img = _pattern(12, 12, 9)
        assert encode_gif(img) == encode_gif(img)


class TestHonestBoundary:
    def test_not_gif(self):
        with pytest.raises(ValueError, match="GIF"):
            decode_gif(b"\x89PNG\r\n")

    def test_too_many_colors(self):
        rng = np.random.RandomState(0)
        img = rng.randint(0, 256, size=(32, 32, 3)).astype(np.uint8)
        with pytest.raises(ValueError, match="palette"):
            encode_gif(img)

    def test_no_image_frame(self):
        with pytest.raises(ValueError, match="no image frame"):
            decode_gif(b"GIF89a" + bytes(7) + b"\x3b")

    def test_early_data_end(self):
        payload = bytearray(encode_gif(_pattern(16, 16, 4)))
        at = payload.index(0x2C, 13)
        # overstate the image height so pixels run out
        import struct

        struct.pack_into("<H", payload, at + 7, 64)
        with pytest.raises(ValueError):
            decode_gif(bytes(payload))


class TestGifInMediaStage:
    def test_decode_stage_handles_gif(self, ray_session):
        import ray.data

        from ctinexus_ray.ops.multimodal import (
            decode_real_features,
            make_real_media_table,
        )

        table = make_real_media_table(24)  # ids 8 (interlace varies) + ...
        mimes = {m["media_id"]: m["mime"] for m in table.to_pylist()}
        assert mimes[8] == "image/gif"
        rows = decode_real_features(
            ray.data.from_arrow(table).repartition(3)
        ).take_all()
        assert len(rows) == 24
        by_id = {r["media_id"]: r for r in rows}
        meta = {m["media_id"]: m for m in table.to_pylist()}
        assert by_id[8]["features"][0] == float(meta[8]["width"])
        assert by_id[8]["features"][1] == float(meta[8]["height"])


class TestGifTruncation:
    def test_truncated_extension_raises_valueerror(self):
        import numpy as np
        import pytest

        from ctinexus_ray.ops.gif import decode_gif, encode_gif

        img = np.zeros((4, 4, 3), dtype=np.uint8)
        payload = encode_gif(img)
        # cut inside the image data sub-block chain
        for cut in (len(payload) - 2, len(payload) // 2):
            with pytest.raises(ValueError):
                decode_gif(payload[:cut])
