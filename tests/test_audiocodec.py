"""WAV (RIFF/WAVE PCM-16) codec: pure-numpy parse/decode/encode and the
integer windowed-energy feature — no Spark needed."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from aws_genaric_datapipeline_spark.operators.audiocodec import (
    AudioFormatError,
    decode_wav,
    detect_format,
    encode_wav,
    parse_wav,
    window_energy,
)


class TestWavCodec:
    def test_round_trip_mono(self):
        x = np.arange(-500, 500, dtype=np.int16)
        payload = encode_wav(x, sample_rate=8000)
        assert detect_format(payload) == "wav"
        info = parse_wav(payload)
        assert info["sample_rate"] == 8000
        assert info["channels"] == 1
        assert info["n_samples"] == 1000
        got = decode_wav(payload)
        assert got.shape == (1000, 1)
        assert (got[:, 0] == x).all()

    def test_round_trip_stereo(self):
        x = np.stack(
            [np.arange(100, dtype=np.int16), -np.arange(100, dtype=np.int16)],
            axis=1,
        )
        got = decode_wav(encode_wav(x, sample_rate=44100))
        assert got.shape == (100, 2)
        assert (got == x).all()

    def test_skips_unknown_chunks(self):
        """Real encoders put LIST/INFO chunks between fmt and data; the
        chunk walk must skip them (including odd-length pad bytes)."""
        x = np.arange(10, dtype=np.int16)
        payload = encode_wav(x, sample_rate=8000)
        # splice an odd-sized junk chunk after fmt (offset 12..36 = fmt)
        junk = b"LIST" + struct.pack("<I", 5) + b"abcde" + b"\x00"  # pad
        spliced = payload[:36] + junk + payload[36:]
        # fix RIFF size
        spliced = (
            spliced[:4]
            + struct.pack("<I", len(spliced) - 8)
            + spliced[8:]
        )
        got = decode_wav(spliced)
        assert (got[:, 0] == x).all()

    def test_rejects_non_wav_and_truncated(self):
        with pytest.raises(AudioFormatError):
            parse_wav(b"NOT A WAVE FILE AT ALL......")
        payload = encode_wav(np.arange(100, dtype=np.int16))
        with pytest.raises(AudioFormatError):
            parse_wav(payload[:60])  # data chunk truncated

    def test_rejects_unsupported_formats(self):
        payload = bytearray(encode_wav(np.arange(4, dtype=np.int16)))
        payload[20:22] = struct.pack("<H", 3)  # IEEE float tag
        with pytest.raises(AudioFormatError):
            parse_wav(bytes(payload))


class TestWindowEnergy:
    def test_energy_windows_exact(self):
        x = np.array([[1], [2], [3], [-4]], dtype=np.int16)
        got = window_energy(x, window=2)
        assert got == [(0, 2, 5), (1, 2, 25)]

    def test_tail_window_partial(self):
        x = np.ones((5, 1), dtype=np.int16)
        got = window_energy(x, window=2)
        assert got == [(0, 2, 2), (1, 2, 2), (2, 1, 1)]

    def test_stereo_uses_first_channel(self):
        x = np.array([[2, 100], [2, 100]], dtype=np.int16)
        assert window_energy(x, window=2) == [(0, 2, 8)]
