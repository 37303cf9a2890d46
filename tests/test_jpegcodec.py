"""Unit tests for the pure-numpy baseline JPEG codec
(operators/jpegcodec.py): bit-exact block-constant roundtrip (the oracle
corpus regime), lossy-roundtrip PSNR, subsampling, odd dimensions,
malformed-input rejection, and dispatcher integration."""

from __future__ import annotations

import numpy as np
import pytest

from aws_genaric_datapipeline_spark.operators.jpegcodec import (
    JpegFormatError,
    decode_jpeg,
    encode_jpeg,
    quality_tables,
)


def _psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    return 10 * np.log10(255.0**2 / max(mse, 1e-12))


class TestRoundtrip:
    def test_block_constant_gray_q100_bit_exact(self):
        """The regime multimodal_jpeg_phash's oracle depends on: every
        8x8 block constant + all-ones quant tables => decode returns the
        input exactly (DC integer, AC noise quantizes to zero)."""
        rng = np.random.RandomState(11)
        tile = rng.randint(0, 256, (12, 16)).astype(np.uint8)
        img = np.kron(tile, np.ones((8, 8), dtype=np.uint8))
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)

    def test_gray_gradient_high_psnr(self):
        x = np.linspace(0, 255, 64)
        img = (np.add.outer(x, x) / 2).astype(np.uint8)
        assert _psnr(img, decode_jpeg(encode_jpeg(img, quality=90))) > 40

    def test_color_444_roundtrip(self):
        rng = np.random.RandomState(3)
        base = rng.randint(0, 256, (10, 14, 3)).astype(np.uint8)
        img = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)
        out = decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == img.shape
        assert _psnr(img, out) > 28

    def test_color_420_odd_dims(self):
        """4:2:0 subsampling with non-multiple-of-16 dims: shape is
        preserved and quality stays reasonable."""
        rng = np.random.RandomState(5)
        base = rng.randint(0, 256, (10, 14, 3)).astype(np.uint8)
        img = np.repeat(np.repeat(base, 4, axis=0), 4, axis=1)[:37, :51]
        out = decode_jpeg(encode_jpeg(img, quality=85, subsampling="4:2:0"))
        assert out.shape == img.shape
        assert _psnr(img, out) > 24

    def test_quality_orders_error(self):
        """Lower quality => more distortion (sanity on the quant scaling)."""
        x = np.linspace(0, 255, 48)
        img = (np.add.outer(x, np.sin(x / 9) * 60 + 90) / 2).astype(np.uint8)
        p90 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=90)))
        p20 = _psnr(img, decode_jpeg(encode_jpeg(img, quality=20)))
        assert p90 > p20

    def test_tiny_image_single_block(self):
        img = np.full((3, 5), 77, dtype=np.uint8)
        assert np.array_equal(decode_jpeg(encode_jpeg(img, quality=100)), img)


class TestFormat:
    def test_quality_100_tables_are_ones(self):
        ql, qc = quality_tables(100)
        assert (ql == 1).all() and (qc == 1).all()

    def test_quality_bounds(self):
        with pytest.raises(ValueError):
            quality_tables(0)
        with pytest.raises(ValueError):
            quality_tables(101)

    def test_bad_soi_rejected(self):
        with pytest.raises(JpegFormatError):
            decode_jpeg(b"\x00\x01not a jpeg")

    def test_truncated_rejected(self):
        img = np.full((16, 16), 50, dtype=np.uint8)
        payload = encode_jpeg(img)
        with pytest.raises((JpegFormatError, ValueError)):
            decode_jpeg(payload[: len(payload) // 3])

    def test_progressive_rejected(self):
        """A SOF2 marker must produce a clear unsupported error, not a
        garbage decode."""
        img = np.full((8, 8), 90, dtype=np.uint8)
        payload = bytearray(encode_jpeg(img))
        idx = payload.find(b"\xff\xc0")
        payload[idx + 1] = 0xC2
        with pytest.raises(JpegFormatError, match="baseline"):
            decode_jpeg(bytes(payload))

    def test_bad_input_shapes(self):
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4, 2), dtype=np.uint8))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4), dtype=np.int32))
        with pytest.raises(ValueError):
            encode_jpeg(np.zeros((4, 4), dtype=np.uint8), subsampling="4:1:1")


class TestDispatcher:
    def test_decode_image_sniffs_jpeg(self):
        from aws_genaric_datapipeline_spark.operators.imagecodec import (
            decode_image,
            detect_format,
        )

        img = np.full((16, 24), 133, dtype=np.uint8)
        payload = encode_jpeg(img, quality=100)
        assert detect_format(payload) == "jpeg"
        assert np.array_equal(decode_image(payload), img)
