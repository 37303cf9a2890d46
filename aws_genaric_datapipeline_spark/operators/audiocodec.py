"""Pure numpy/stdlib audio codec: WAV (RIFF/WAVE, PCM 16-bit).

Completes the multimodal codec trio (operators/imagecodec.py: PNG,
operators/videocodec.py: Y4M) with the audio leg.  The container ships
no soundfile/librosa, but canonical WAV is the container-free PCM
interchange format: a RIFF chunk walk to the ``fmt `` and ``data``
chunks, then fixed-size little-endian samples — so sample seeking is
offset arithmetic, the same property the Y4M path exploits for frames.

Supports PCM 16-bit mono/stereo (format tag 1), skipping unknown chunks
(LIST/INFO metadata etc.) the way real encoders emit them.  Everything
returns/accepts ``np.ndarray`` of shape (n_samples, channels) int16 —
integer samples in, integer samples out, so downstream features built on
integer arithmetic (windowed energy sums) are bit-reproducible across
engines; the multimodal_audio_features oracle replays them in SQL.
"""

from __future__ import annotations

import struct

import numpy as np


class AudioFormatError(ValueError):
    pass


def detect_format(payload: bytes) -> str | None:
    """'wav' | None by magic bytes."""
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


def parse_wav(payload: bytes) -> dict:
    """Walk the RIFF chunks.  Returns {sample_rate, channels, bits,
    n_samples, data_offset, data_len} — enough to seek any sample by
    offset arithmetic without touching the data chunk."""
    if detect_format(payload) != "wav":
        raise AudioFormatError("not a RIFF/WAVE stream")
    fmt = None
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        (clen,) = struct.unpack_from("<I", payload, pos + 4)
        body = pos + 8
        if cid == b"fmt ":
            if clen < 16:
                raise AudioFormatError(f"fmt chunk too short ({clen})")
            tag, channels, rate, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", payload, body
            )
            if tag != 1:
                raise AudioFormatError(f"only PCM supported, format tag {tag}")
            if bits != 16:
                raise AudioFormatError(f"only 16-bit PCM supported, got {bits}")
            if channels not in (1, 2):
                raise AudioFormatError(f"unsupported channel count {channels}")
            fmt = {"sample_rate": rate, "channels": channels, "bits": bits}
        elif cid == b"data":
            if fmt is None:
                raise AudioFormatError("data chunk before fmt chunk")
            if body + clen > len(payload):
                raise AudioFormatError("truncated data chunk")
            frame = fmt["channels"] * 2
            return {
                **fmt,
                "n_samples": clen // frame,
                "data_offset": body,
                "data_len": clen,
            }
        # chunks are word-aligned: odd sizes carry a pad byte
        pos = body + clen + (clen & 1)
    raise AudioFormatError("no data chunk found")


def decode_wav(payload: bytes) -> np.ndarray:
    """Decode to int16 samples of shape (n_samples, channels)."""
    info = parse_wav(payload)
    raw = payload[
        info["data_offset"] : info["data_offset"] + info["data_len"]
    ]
    flat = np.frombuffer(raw, dtype="<i2")
    usable = (len(flat) // info["channels"]) * info["channels"]
    return flat[:usable].reshape(-1, info["channels"])


def encode_wav(samples: np.ndarray, sample_rate: int = 8000) -> bytes:
    """Encode int16 samples — shape (n,) mono or (n, channels) — as a
    canonical 44-byte-header PCM WAV."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    if arr.ndim != 2 or arr.shape[1] not in (1, 2):
        raise AudioFormatError(f"unsupported sample shape {arr.shape}")
    channels = arr.shape[1]
    data = arr.tobytes()
    byte_rate = sample_rate * channels * 2
    header = (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<IHHIIHH", 16, 1, channels, sample_rate, byte_rate, channels * 2, 16)
        + b"data"
        + struct.pack("<I", len(data))
    )
    return header + data


def window_energy(samples: np.ndarray, window: int = 256) -> list[tuple[int, int, int]]:
    """Integer windowed energy: for each window of ``window`` samples
    (first channel), (win_idx, n_samples, sum of squared samples).
    Pure int64 arithmetic — no float, so the result is bit-identical to
    any engine that replays the same integers."""
    x = samples[:, 0].astype(np.int64)
    out = []
    for w in range(0, len(x), window):
        seg = x[w : w + window]
        out.append((w // window, len(seg), int(np.dot(seg, seg))))
    return out
