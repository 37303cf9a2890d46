"""Pure numpy/stdlib image codec: PNG (zlib) and binary PPM (P6).

The container ships no image library (no PIL/libvips), but PNG's format is
fully specified and its only compression is stdlib zlib — so the engine
carries its own decoder rather than stubbing the decode path.  Supports
what a training-data pipeline meets in practice for PNG: 8-bit depth,
grayscale / RGB / RGBA / gray+alpha, non-interlaced, all five scanline
filter types.  The encoder emits filter-0 RGB (or grayscale) PNGs, so
engine-written images decode on the fast path.

Everything returns/accepts ``np.ndarray`` of shape (H, W, C) uint8 —
the exchange format the multimodal operators (operators/multimodal.py)
feed to feature extraction and resampling.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"

# colortype → samples per pixel
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class ImageFormatError(ValueError):
    pass


def detect_format(payload: bytes) -> str | None:
    """'png' | 'ppm' | 'jpeg' | None by magic bytes."""
    if payload.startswith(_PNG_SIG):
        return "png"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:2] == b"\xff\xd8":
        return "jpeg"
    return None


# ----------------------------------------------------------------------- PNG
def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, height: int, stride: int, bpp: int) -> np.ndarray:
    """Reverse PNG scanline filtering → (height, stride) uint8."""
    out = np.zeros((height, stride), dtype=np.uint8)
    pos = 0
    for y in range(height):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw, dtype=np.uint8, count=stride, offset=pos).copy()
        pos += stride
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up — vectorizable (no intra-line dependency)
            cur = line + prev  # uint8 wraparound is the spec'd mod-256
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth — sequential in x
            cur = np.empty(stride, dtype=np.uint8)
            li, pv, cu = line.tolist(), prev.tolist(), [0] * stride
            for x in range(stride):
                a = cu[x - bpp] if x >= bpp else 0
                b = pv[x]
                if ftype == 1:
                    v = li[x] + a
                elif ftype == 3:
                    v = li[x] + ((a + b) >> 1)
                else:
                    c = pv[x - bpp] if x >= bpp else 0
                    v = li[x] + _paeth(a, b, c)
                cu[x] = v & 0xFF
            cur = np.asarray(cu, dtype=np.uint8)
        else:
            raise ImageFormatError(f"PNG filter type {ftype} invalid")
        out[y] = cur
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """Decode an 8-bit non-interlaced PNG → (H, W, C) uint8."""
    if not payload.startswith(_PNG_SIG):
        raise ImageFormatError("not a PNG (bad signature)")
    pos = len(_PNG_SIG)
    width = height = None
    channels = bpp = 0
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ImageFormatError(f"PNG bit depth {depth} unsupported (only 8)")
            if color not in _PNG_CHANNELS:
                raise ImageFormatError(f"PNG color type {color} unsupported")
            if interlace != 0:
                raise ImageFormatError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color]
            bpp = channels
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ImageFormatError("PNG missing IHDR/IDAT")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ImageFormatError("PNG data length mismatch")
    flat = _unfilter(raw, height, stride, bpp)
    return flat.reshape(height, width, channels)


def encode_png(img: np.ndarray) -> bytes:
    """Encode (H, W, C) uint8 (C ∈ {1, 3}) → filter-0 PNG bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    if c not in (1, 3):
        raise ImageFormatError(f"encode supports 1 or 3 channels, got {c}")
    color = 0 if c == 1 else 2
    raw = bytearray()
    for y in range(h):
        raw.append(0)  # filter type 0
        raw.extend(img[y].tobytes())

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + chunk(b"IEND", b"")
    )


# ----------------------------------------------------------------------- PPM
def decode_ppm(payload: bytes) -> np.ndarray:
    """Decode binary PPM (P6, maxval 255) → (H, W, 3) uint8."""
    if payload[:2] != b"P6":
        raise ImageFormatError("not a P6 PPM")
    # header: magic, width, height, maxval — whitespace/comment separated
    fields: list[int] = []
    pos = 2
    while len(fields) < 3 and pos < len(payload):
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ImageFormatError(f"PPM maxval {maxval} unsupported")
    data = np.frombuffer(payload, dtype=np.uint8, count=h * w * 3, offset=pos)
    return data.reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = np.repeat(img[:, :, None], 3, axis=2)
    h, w, c = img.shape
    if c != 3:
        raise ImageFormatError("PPM is RGB only")
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_image(payload: bytes) -> np.ndarray:
    """Decode by magic-byte sniffing → (H, W, C) uint8."""
    fmt = detect_format(payload)
    if fmt == "png":
        return decode_png(payload)
    if fmt == "ppm":
        return decode_ppm(payload)
    if fmt == "jpeg":
        from aws_genaric_datapipeline_spark.operators.jpegcodec import decode_jpeg

        return decode_jpeg(payload)
    raise ImageFormatError(
        "unrecognized image format (supported: PNG, PPM/P6, JPEG)"
    )


def resize_nearest(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample to (height, width) — pure index arithmetic."""
    h, w = img.shape[:2]
    ys = (np.arange(height) * h // height).clip(0, h - 1)
    xs = (np.arange(width) * w // width).clip(0, w - 1)
    return img[ys][:, xs]
