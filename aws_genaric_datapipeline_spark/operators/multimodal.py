"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract is real and tested — schema, Arrow batch shape,
partitioning, mapInPandas signatures.  IMAGE decoding is real: the engine
carries a pure numpy/stdlib PNG + PPM codec (operators/imagecodec.py), so
``decode_media`` / ``resize_media`` operate on actual pixels with no image
library in the container.  VIDEO frame sampling is real for Y4M
(YUV4MPEG2) payloads via the pure numpy parser (operators/videocodec.py):
``sample_frames`` seeks by offset arithmetic, decodes YUV→RGB and emits
PNG frames; compressed containers (mp4/webm) would need ffmpeg and raise
VideoFormatError.  ``fake=True`` keeps the deterministic byte-statistics
stand-in for opaque payloads and determinism tests.

Schema convention for a media table::

    doc_id   bigint
    media    binary                      -- opaque encoded payload
    media_meta struct<kind:string, mime:string, width:int, height:int,
                      duration_ms:int>   -- typed, filterable metadata

Metadata lives OUTSIDE the blob so partition pruning / predicate pushdown
work without touching bytes (e.g. filter kind='image' scans only the meta
column in parquet).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame

MEDIA_META_TYPE = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.IntegerType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("media", T.BinaryType()),
        T.StructField("media_meta", MEDIA_META_TYPE),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("kind", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feature", T.ArrayType(T.DoubleType())),
    ]
)


def attach_media(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Build a media table from a text table by encoding text as the payload
    (the container has no real media files; the bytes are opaque to the
    engine either way, which is the point)."""
    payload = F.encode(F.col(text_col), "utf-8")
    meta = F.struct(
        F.lit("image").alias("kind"),
        F.lit("application/octet-stream").alias("mime"),
        (F.octet_length(payload) % 640).cast("int").alias("width"),
        (F.octet_length(payload) % 480).cast("int").alias("height"),
        F.lit(0).alias("duration_ms"),
    )
    return df.select(F.col(id_col).alias("doc_id"), payload.alias("media"), meta.alias("media_meta"))


def _fake_feature(payload: bytes, dim: int = 8) -> list[float]:
    """Deterministic stand-in for a real decoder+model: per-stripe byte means.

    Replace with PIL/torchvision/ffmpeg decode in a real deployment — the
    batch shape and return contract stay identical.
    """
    if not payload:
        return [0.0] * dim
    stripe = max(1, len(payload) // dim)
    out = []
    for i in range(dim):
        chunk = payload[i * stripe : (i + 1) * stripe] or payload[-stripe:]
        out.append(round(sum(chunk) / len(chunk) / 255.0, 6))
    return out


def _pixel_feature(img, dim: int) -> list[float]:
    """Per-stripe mean luminance over ``dim`` horizontal stripes of the
    decoded pixel array — a real (if simple) visual feature: deterministic,
    resolution-independent, and sensitive to vertical image structure."""
    import numpy as np

    lum = img.astype(np.float64).mean(axis=2) if img.ndim == 3 else img.astype(np.float64)
    h = lum.shape[0]
    out = []
    for i in range(dim):
        lo = i * h // dim
        hi = max(lo + 1, (i + 1) * h // dim)
        out.append(round(float(lum[lo:hi].mean()) / 255.0, 6))
    return out


def decode_media(
    df: DataFrame,
    fake: bool = False,
    feature_dim: int = 8,
    batch_hint: int = 256,
) -> DataFrame:
    """Decode/feature-extract media blobs via mapInPandas (Arrow-batched).

    mapInPandas (not a scalar pandas_udf) because decoders (a) want control
    of batch size for memory (media rows are MBs), and (b) may emit a
    different row count (frame sampling).  ``batch_hint`` caps rows per Arrow
    batch via spark.sql.execution.arrow.maxRecordsPerBatch on the session.

    Default path: REAL image decode (PNG/PPM via operators/imagecodec.py)
    with per-stripe luminance features over the decoded pixels.  A payload
    that is not a decodable image raises ImageFormatError inside the task —
    pass ``fake=True`` for the byte-statistics stand-in when payloads are
    opaque non-image bytes (and for determinism tests).
    """

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_genaric_datapipeline_spark.operators.imagecodec import decode_image

        for pdf in batches:
            feats = []
            for b in pdf["media"]:
                if fake:
                    feats.append(_fake_feature(b or b"", feature_dim))
                else:
                    feats.append(_pixel_feature(decode_image(bytes(b)), feature_dim))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "kind": [m["kind"] if m is not None else None for m in pdf["media_meta"]],
                    "n_bytes": [len(b) if b is not None else 0 for b in pdf["media"]],
                    "feature": feats,
                }
            )

    from aws_genaric_datapipeline_spark.operators.partitioning import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(extract, schema=FEATURE_SCHEMA)


def perceptual_hash_media(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    width: int = 10,
    height: int = 7,
) -> DataFrame:
    """Perceptual difference-hash (dHash) per media blob — the standard
    image-dedup fingerprint: decode → nearest-neighbor downscale to
    (height, width) → integer luminance → one bit per horizontally
    adjacent pixel pair (gray[r][c] > gray[r][c+1]) → packed bigint.

    Every step is INTEGER arithmetic (luminance = (299R+587G+114B)//1000,
    resize = pure index selection), so the hash is bit-reproducible across
    engines and replayable by a SQL oracle — no float resampling anywhere.
    height·(width-1) must stay ≤ 63 so the packed hash fits a signed
    bigint (default 7·9 = 63 bits).

    Scale shape: one mapInPandas pass over the media column (Arrow
    batches), then dedup is a plain groupBy on the 8-byte hash — the 100 TB
    image corpus never shuffles, only (id, phash) pairs do.  Near-dup
    (Hamming ≤ k) extends it with the same banded-bits join the SimHash
    path uses (operators/dedup.py simhash_pairs)."""
    if height * (width - 1) > 63:
        raise ValueError("height*(width-1) must be <= 63 to fit a signed bigint")

    def _hash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        from aws_genaric_datapipeline_spark.operators.imagecodec import (
            decode_image,
            resize_nearest,
        )

        idx = np.arange(height * (width - 1), dtype=np.int64).reshape(
            height, width - 1
        )
        for pdf in batches:
            out = []
            for b in pdf[media_col]:
                img = resize_nearest(decode_image(bytes(b)), width, height)
                px = img.astype(np.int64)
                if px.ndim == 3:
                    gray = (299 * px[:, :, 0] + 587 * px[:, :, 1] + 114 * px[:, :, 2]) // 1000
                else:
                    gray = px
                bits = (gray[:, :-1] > gray[:, 1:]).astype(np.int64)
                out.append(int((bits << idx).sum()))
            yield pd.DataFrame({id_col: pdf[id_col], "phash": out})

    from aws_genaric_datapipeline_spark.operators.partitioning import (
        ensure_parallelism,
    )

    return ensure_parallelism(df.select(id_col, media_col)).mapInPandas(
        _hash, schema=f"{id_col} long, phash long"
    )


def resize_media(
    df: DataFrame,
    width: int,
    height: int,
    fake: bool = False,
) -> DataFrame:
    """Resize image payloads to (width, height) — 1-in-1-out mapInPandas
    that rewrites BOTH the blob and its typed metadata, so downstream
    metadata filters see the new dimensions without decoding.

    Default path: REAL resample — decode (PNG/PPM), nearest-neighbor
    resize, re-encode as PNG (operators/imagecodec.py).  ``fake=True``
    keeps the deterministic byte-stride stand-in for opaque payloads.
    """
    n_out = max(1, width * height)

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_genaric_datapipeline_spark.operators.imagecodec import (
            decode_image,
            encode_png,
            resize_nearest,
        )

        for pdf in batches:
            blobs = []
            metas = []
            for b, m in zip(pdf["media"], pdf["media_meta"]):
                b = b or b""
                if fake:
                    step = max(1, len(b) // n_out)
                    blobs.append(bytes(b[::step][:n_out]))
                    new_mime = None
                else:
                    img = resize_nearest(decode_image(bytes(b)), width, height)
                    if img.ndim == 3 and img.shape[2] not in (1, 3):
                        img = img[:, :, :3]  # drop alpha for the RGB encoder
                    blobs.append(encode_png(img))
                    new_mime = "image/png"
                m = dict(m) if m is not None else {}
                m["width"], m["height"] = width, height
                if new_mime:
                    m["mime"] = new_mime
                metas.append(m)
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": blobs, "media_meta": metas})

    from aws_genaric_datapipeline_spark.operators.partitioning import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(_resize, schema=MEDIA_SCHEMA)


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("ts_ms", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    max_frames: int = 8,
    fake: bool = False,
) -> DataFrame:
    """Sample frames from video payloads — the 1-in-N-out shape that is WHY
    these operators use mapInPandas instead of a scalar pandas_udf: each
    input row emits a variable number of frame rows (bounded by
    ``max_frames``), and the output schema is unrelated to the input's.

    Default path: REAL decode for Y4M (YUV4MPEG2) payloads via the pure
    numpy parser (operators/videocodec.py) — frame seeking is offset
    arithmetic over the fixed frame size, sampled timestamps map to frame
    indexes through the stream's own frame rate, and each emitted ``frame``
    is the decoded RGB frame re-encoded as PNG (operators/imagecodec.py).
    A payload that is not a Y4M stream raises VideoFormatError inside the
    task (no ffmpeg in the container for compressed containers —
    mp4/webm would slot in here behind the same interface).  ``fake=True``
    keeps the deterministic chunk-sampling stand-in for opaque payloads:
    one byte-stripe per sampled timestamp up to media_meta.duration_ms.
    """

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from aws_genaric_datapipeline_spark.operators.imagecodec import encode_png
        from aws_genaric_datapipeline_spark.operators.videocodec import (
            decode_y4m_frame,
            parse_y4m,
        )

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "ts_ms": [], "frame": []}
            for did, b, m in zip(pdf["doc_id"], pdf["media"], pdf["media_meta"]):
                b = b or b""
                if fake:
                    duration = (m or {}).get("duration_ms") or 0
                    n = min(max_frames, max(1, duration // every_ms + 1)) if b else 0
                    for i in range(n):
                        stripe = max(1, len(b) // max(n, 1))
                        out["doc_id"].append(did)
                        out["frame_idx"].append(i)
                        out["ts_ms"].append(i * every_ms)
                        out["frame"].append(bytes(b[i * stripe : (i + 1) * stripe] or b[-stripe:]))
                    continue
                if not b:
                    continue
                info = parse_y4m(bytes(b))
                for i in range(max_frames):
                    ts = i * every_ms
                    src = ts * info["fps_num"] // (1000 * info["fps_den"])
                    if src >= info["n_frames"]:
                        break
                    out["doc_id"].append(did)
                    out["frame_idx"].append(i)
                    out["ts_ms"].append(ts)
                    out["frame"].append(encode_png(decode_y4m_frame(bytes(b), src, info)))
            yield pd.DataFrame(out)

    from aws_genaric_datapipeline_spark.operators.partitioning import ensure_parallelism

    return ensure_parallelism(df).mapInPandas(_sample, schema=FRAME_SCHEMA)
