"""Pure numpy/stdlib video codec: Y4M (YUV4MPEG2).

The container ships no ffmpeg, but Y4M is the container-free raw-video
interchange format (what ffmpeg/mjpegtools pipe between stages): an ASCII
stream header, then per-frame ``FRAME\\n`` markers followed by fixed-size
raw planar YUV.  Fixed frame size means frame seeking is OFFSET ARITHMETIC
— the property real video indexes (keyframe tables) approximate — so the
engine carries its own parser rather than stubbing the video path.

Supports what the sampling operator needs in practice: C420 (2x2
subsampled chroma, the Y4M default), C444 (full chroma) and Cmono
(grayscale) at 8-bit depth.  YUV→RGB is limited-range BT.601 with
half-up rounding (floor(x + 0.5)) so decoded values are bit-reproducible
across engines — the multimodal_video_frames oracle recomputes them in
SQL from the same double constants.

Everything returns/accepts ``np.ndarray`` of shape (H, W, 3) uint8 (RGB),
the same exchange format as operators/imagecodec.py.
"""

from __future__ import annotations

import numpy as np

_Y4M_SIG = b"YUV4MPEG2"

# limited-range BT.601 (the Y4M default colorimetry)
_KY, _KRV, _KGU, _KGV, _KBU = 1.164383, 1.596027, 0.391762, 0.812968, 2.017232


class VideoFormatError(ValueError):
    pass


def detect_format(payload: bytes) -> str | None:
    """'y4m' | None by magic bytes."""
    return "y4m" if payload.startswith(_Y4M_SIG) else None


def _plane_sizes(width: int, height: int, colorspace: str) -> tuple[int, int]:
    """(luma_bytes, chroma_bytes_per_plane) for one frame."""
    if colorspace.startswith("C420") or colorspace == "":
        if width % 2 or height % 2:
            raise VideoFormatError(f"C420 needs even dimensions, got {width}x{height}")
        return width * height, (width // 2) * (height // 2)
    if colorspace == "C444":
        return width * height, width * height
    if colorspace == "Cmono":
        return width * height, 0
    raise VideoFormatError(f"unsupported Y4M colorspace {colorspace!r}")


def parse_y4m(payload: bytes) -> dict:
    """Parse the stream header.  Returns {width, height, fps_num, fps_den,
    colorspace, header_len, frame_size, n_frames} — enough to seek any
    frame by offset arithmetic."""
    if not payload.startswith(_Y4M_SIG):
        raise VideoFormatError("not a YUV4MPEG2 stream")
    eol = payload.find(b"\n")
    if eol < 0:
        raise VideoFormatError("truncated Y4M header")
    width = height = 0
    fps_num, fps_den = 25, 1
    colorspace = ""
    for tok in payload[len(_Y4M_SIG) : eol].split(b" "):
        tok = tok.decode("ascii", "replace")
        if not tok:
            continue
        if tok[0] == "W":
            width = int(tok[1:])
        elif tok[0] == "H":
            height = int(tok[1:])
        elif tok[0] == "F":
            num, den = tok[1:].split(":")
            fps_num, fps_den = int(num), int(den)
        elif tok[0] == "C":
            colorspace = tok
    if width <= 0 or height <= 0:
        raise VideoFormatError("Y4M header missing W/H")
    if fps_num <= 0 or fps_den <= 0:
        raise VideoFormatError("Y4M header has non-positive frame rate")
    luma, chroma = _plane_sizes(width, height, colorspace)
    frame_size = luma + 2 * chroma
    header_len = eol + 1
    # every frame = b"FRAME...\n" marker + planes; tolerate marker params
    n_frames = 0
    pos = header_len
    while pos < len(payload):
        if not payload.startswith(b"FRAME", pos):
            raise VideoFormatError(f"bad FRAME marker at offset {pos}")
        m_eol = payload.find(b"\n", pos)
        if m_eol < 0 or m_eol + 1 + frame_size > len(payload):
            raise VideoFormatError("truncated Y4M frame")
        n_frames += 1
        pos = m_eol + 1 + frame_size
    return {
        "width": width,
        "height": height,
        "fps_num": fps_num,
        "fps_den": fps_den,
        "colorspace": colorspace or "C420",
        "header_len": header_len,
        "frame_size": frame_size,
        "n_frames": n_frames,
    }


def _yuv_to_rgb(y: np.ndarray, u: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Limited-range BT.601 with half-up rounding — floor(x + 0.5) so the
    same double arithmetic is reproducible in SQL (numpy's default rint is
    half-even, which SQL round() is not)."""
    c = y.astype(np.float64) - 16.0
    d = u.astype(np.float64) - 128.0
    e = v.astype(np.float64) - 128.0
    rgb = np.stack(
        [
            _KY * c + _KRV * e,
            _KY * c - _KGU * d - _KGV * e,
            _KY * c + _KBU * d,
        ],
        axis=-1,
    )
    return np.clip(np.floor(rgb + 0.5), 0, 255).astype(np.uint8)


def decode_y4m_frame(payload: bytes, index: int, info: dict | None = None) -> np.ndarray:
    """Decode frame ``index`` to (H, W, 3) RGB uint8.  Seeking is pure
    offset arithmetic over the fixed frame size — no scan of prior frames
    (markers are validated once in parse_y4m)."""
    info = info or parse_y4m(payload)
    if not 0 <= index < info["n_frames"]:
        raise VideoFormatError(f"frame {index} out of range 0..{info['n_frames'] - 1}")
    w, h = info["width"], info["height"]
    luma, chroma = _plane_sizes(w, h, info["colorspace"])
    pos = info["header_len"]
    # frame markers may carry parameters, so marker length is per-frame;
    # hop marker-by-marker (frame payload hops are still O(1) arithmetic)
    for _ in range(index):
        pos = payload.find(b"\n", pos) + 1 + info["frame_size"]
    pos = payload.find(b"\n", pos) + 1
    yp = np.frombuffer(payload, np.uint8, luma, pos).reshape(h, w)
    if info["colorspace"] == "Cmono":
        u = np.full((h, w), 128, np.uint8)
        v = u
    elif info["colorspace"] == "C444":
        u = np.frombuffer(payload, np.uint8, chroma, pos + luma).reshape(h, w)
        v = np.frombuffer(payload, np.uint8, chroma, pos + luma + chroma).reshape(h, w)
    else:  # C420*: nearest-neighbor chroma upsample
        ch, cw = h // 2, w // 2
        u = np.frombuffer(payload, np.uint8, chroma, pos + luma).reshape(ch, cw)
        v = np.frombuffer(payload, np.uint8, chroma, pos + luma + chroma).reshape(ch, cw)
        u = u.repeat(2, axis=0).repeat(2, axis=1)
        v = v.repeat(2, axis=0).repeat(2, axis=1)
    return _yuv_to_rgb(yp, u, v)


def encode_y4m_mono(frames: list[np.ndarray], fps_num: int = 1, fps_den: int = 1) -> bytes:
    """Encode grayscale (H, W) uint8 frames as a Cmono Y4M stream — the
    fixture builder for tests and the deterministic video queries."""
    if not frames:
        raise VideoFormatError("need at least one frame")
    h, w = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 Cmono\n".encode()]
    for fr in frames:
        if fr.shape != (h, w):
            raise VideoFormatError("all frames must share dimensions")
        out.append(b"FRAME\n")
        out.append(np.ascontiguousarray(fr, dtype=np.uint8).tobytes())
    return b"".join(out)


def encode_y4m_rgb(frames: list[np.ndarray], fps_num: int = 1, fps_den: int = 1) -> bytes:
    """Encode (H, W, 3) RGB uint8 frames as a C444 Y4M stream (inverse
    limited-range BT.601, half-up rounding) — round-trips through
    decode_y4m_frame within ±2/channel (the forward+inverse rounding)."""
    if not frames:
        raise VideoFormatError("need at least one frame")
    h, w, _ = frames[0].shape
    out = [f"YUV4MPEG2 W{w} H{h} F{fps_num}:{fps_den} Ip A1:1 C444\n".encode()]
    for fr in frames:
        r = fr[:, :, 0].astype(np.float64)
        g = fr[:, :, 1].astype(np.float64)
        b = fr[:, :, 2].astype(np.float64)
        y = 16.0 + 0.256788 * r + 0.504129 * g + 0.097906 * b
        u = 128.0 - 0.148223 * r - 0.290993 * g + 0.439216 * b
        v = 128.0 + 0.439216 * r - 0.367788 * g - 0.071427 * b
        out.append(b"FRAME\n")
        for plane in (y, u, v):
            out.append(
                np.clip(np.floor(plane + 0.5), 0, 255).astype(np.uint8).tobytes()
            )
    return b"".join(out)
