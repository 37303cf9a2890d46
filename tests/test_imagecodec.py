"""Pure-python image codec tests (operators/imagecodec.py): PNG/PPM
round-trips, all five PNG scanline filter types, malformed-input errors.

No Spark session needed — this is driver-side library code executed inside
mapInPandas tasks by the multimodal operators.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from aws_genaric_datapipeline_spark.operators.imagecodec import (
    ImageFormatError,
    decode_image,
    decode_png,
    decode_ppm,
    detect_format,
    encode_png,
    encode_ppm,
    resize_nearest,
)


def _gradient(h, w, c=3, seed=1):
    return ((np.arange(h * w * c).reshape(h, w, c) * seed + seed) % 256).astype(np.uint8)


class TestPngRoundTrip:
    @pytest.mark.parametrize("shape", [(1, 1, 3), (7, 5, 3), (12, 16, 3), (33, 9, 3)])
    def test_rgb_roundtrip(self, shape):
        img = _gradient(*shape)
        assert np.array_equal(decode_png(encode_png(img)), img)

    def test_grayscale_roundtrip(self, shape=(9, 11)):
        img = (np.arange(99).reshape(9, 11) % 256).astype(np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == (9, 11, 1)
        assert np.array_equal(out[:, :, 0], img)

    def test_detect_format(self):
        img = _gradient(4, 4)
        assert detect_format(encode_png(img)) == "png"
        assert detect_format(encode_ppm(img)) == "ppm"
        assert detect_format(b"not an image") is None


def _png_with_filters(img: np.ndarray, filter_types: list[int]) -> bytes:
    """Assemble a PNG whose scanlines use the given filter types — exercises
    decode paths our own encoder (always filter 0) never produces."""
    h, w, c = img.shape
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = img[y].reshape(-1).astype(np.int32)
        ft = filter_types[y % len(filter_types)]
        raw.append(ft)
        enc = np.zeros(w * c, dtype=np.int32)
        for x in range(w * c):
            a = int(line[x - c]) if x >= c else 0
            b = int(prev[x])
            cc = int(prev[x - c]) if x >= c else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            enc[x] = (int(line[x]) - pred) & 0xFF
        raw.extend(enc.astype(np.uint8).tobytes())
        prev = line

    def chunk(ctype, data):
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    sig = b"\x89PNG\r\n\x1a\n"
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return sig + chunk(b"IHDR", ihdr) + chunk(b"IDAT", zlib.compress(bytes(raw))) + chunk(b"IEND", b"")


class TestPngFilters:
    @pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
    def test_all_filter_types_decode(self, filters):
        img = _gradient(10, 7, seed=13)
        blob = _png_with_filters(img, filters)
        assert np.array_equal(decode_png(blob), img)


class TestPpm:
    def test_roundtrip(self):
        img = _gradient(6, 8)
        assert np.array_equal(decode_ppm(encode_ppm(img)), img)

    def test_comment_in_header(self):
        img = _gradient(3, 4)
        blob = encode_ppm(img).replace(b"P6\n", b"P6\n# a comment\n", 1)
        assert np.array_equal(decode_ppm(blob), img)


class TestErrors:
    def test_garbage_rejected(self):
        with pytest.raises(ImageFormatError):
            decode_image(b"garbage bytes that are no image at all")

    def test_truncated_png_rejected(self):
        blob = encode_png(_gradient(8, 8))
        with pytest.raises((ImageFormatError, zlib.error)):
            decode_png(blob[:40])

    def test_16bit_png_rejected(self):
        sig = b"\x89PNG\r\n\x1a\n"
        ihdr = struct.pack(">IIBBBBB", 4, 4, 16, 2, 0, 0, 0)
        chunk = struct.pack(">I", len(ihdr)) + b"IHDR" + ihdr + struct.pack(
            ">I", zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF
        )
        with pytest.raises(ImageFormatError):
            decode_png(sig + chunk)


class TestResize:
    def test_identity(self):
        img = _gradient(5, 6)
        assert np.array_equal(resize_nearest(img, 6, 5), img)

    def test_downsample_picks_grid_pixels(self):
        img = _gradient(8, 8)
        out = resize_nearest(img, 4, 4)
        assert out.shape == (4, 4, 3)
        assert np.array_equal(out, img[::2, ::2])
