"""Y4M codec unit tests + the real video frame-sampling path end to end.

Reference parity note: the reference pipeline has no media path at all
(glue src/ is 3-column string ETL); this is engine surface for the
SURVEY.md §2b multimodal row.
"""

from __future__ import annotations

import numpy as np
import pytest

from aws_genaric_datapipeline_spark.operators.videocodec import (
    VideoFormatError,
    decode_y4m_frame,
    detect_format,
    encode_y4m_mono,
    encode_y4m_rgb,
    parse_y4m,
)


def _gray(level: int, h: int = 8, w: int = 12) -> np.ndarray:
    return np.full((h, w), level, dtype=np.uint8)


class TestY4MCodec:
    def test_header_roundtrip_and_frame_count(self):
        payload = encode_y4m_mono([_gray(30), _gray(60), _gray(90)], fps_num=25)
        assert detect_format(payload) == "y4m"
        info = parse_y4m(payload)
        assert (info["width"], info["height"]) == (12, 8)
        assert (info["fps_num"], info["fps_den"]) == (25, 1)
        assert info["n_frames"] == 3
        assert info["colorspace"] == "Cmono"

    def test_mono_decode_is_bt601_halfup(self):
        """Decoded gray must be floor(1.164383*(Y-16) + 0.5) exactly — the
        bit-reproducible contract the SQL oracle recomputes."""
        for level in (16, 17, 100, 200, 215):
            img = decode_y4m_frame(encode_y4m_mono([_gray(level)]), 0)
            expect = int(np.floor(1.164383 * (level - 16) + 0.5))
            assert img.shape == (8, 12, 3)
            assert (img == expect).all(), (level, img[0, 0])

    def test_frame_seek_returns_distinct_frames(self):
        payload = encode_y4m_mono([_gray(20), _gray(120), _gray(215)])
        vals = [int(decode_y4m_frame(payload, i)[0, 0, 0]) for i in range(3)]
        assert vals == sorted(set(vals)), vals
        with pytest.raises(VideoFormatError):
            decode_y4m_frame(payload, 3)

    def test_rgb_roundtrip_within_rounding(self):
        rng = np.random.default_rng(7)
        frame = rng.integers(0, 256, size=(6, 10, 3), dtype=np.uint8)
        out = decode_y4m_frame(encode_y4m_rgb([frame]), 0)
        assert np.abs(out.astype(int) - frame.astype(int)).max() <= 3

    def test_truncated_and_garbage_payloads_raise(self):
        good = encode_y4m_mono([_gray(50)])
        with pytest.raises(VideoFormatError):
            parse_y4m(good[:-5])
        with pytest.raises(VideoFormatError):
            parse_y4m(b"not a video at all")


class TestSampleFramesReal:
    def test_y4m_end_to_end(self, spark):
        """media table with Y4M payloads → sample_frames real path →
        PNG-decode the emitted frames and recover the exact gray levels."""
        import pyspark.sql.functions as F

        from aws_genaric_datapipeline_spark.operators.imagecodec import decode_image
        from aws_genaric_datapipeline_spark.operators.multimodal import sample_frames

        levels = {1: [20, 70], 2: [120, 160, 200]}
        rows = [
            (
                did,
                bytearray(encode_y4m_mono([_gray(v) for v in vals], fps_num=1)),
                {"kind": "video", "mime": "video/x-yuv4mpeg", "width": 12,
                 "height": 8, "duration_ms": 1000 * len(vals)},
            )
            for did, vals in levels.items()
        ]
        from aws_genaric_datapipeline_spark.operators.multimodal import MEDIA_SCHEMA

        media = spark.createDataFrame(rows, MEDIA_SCHEMA)
        frames = sample_frames(media, every_ms=1000, max_frames=4).orderBy(
            "doc_id", "frame_idx"
        )
        got = frames.select("doc_id", "frame_idx", "ts_ms", "frame").collect()
        assert [(r["doc_id"], r["frame_idx"], r["ts_ms"]) for r in got] == [
            (1, 0, 0), (1, 1, 1000),
            (2, 0, 0), (2, 1, 1000), (2, 2, 2000),
        ]
        for r in got:
            img = decode_image(bytes(r["frame"]))
            level = levels[r["doc_id"]][r["frame_idx"]]
            expect = int(np.floor(1.164383 * (level - 16) + 0.5))
            assert (img == expect).all()

    def test_non_y4m_payload_raises(self, spark):
        from aws_genaric_datapipeline_spark.operators.multimodal import (
            MEDIA_SCHEMA,
            sample_frames,
        )

        media = spark.createDataFrame(
            [(1, bytearray(b"plain text bytes"), None)], MEDIA_SCHEMA
        )
        with pytest.raises(Exception, match="YUV4MPEG2|VideoFormatError"):
            sample_frames(media, fake=False).collect()
