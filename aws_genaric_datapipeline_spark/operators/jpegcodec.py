"""Pure numpy/stdlib baseline JPEG codec (JFIF, SOF0).

Real image corpora are overwhelmingly JPEG; the container ships no image
library, so — same decision as the PNG/PPM codec (imagecodec.py) — the
engine carries its own decoder instead of stubbing the decode path.

Supported:
- decode: baseline sequential DCT (SOF0), 8-bit, grayscale or YCbCr,
  any sampling factors up to 2x2 (4:4:4, 4:2:2, 4:2:0), multiple
  DQT/DHT segments, restart intervals (DRI/RSTn), 0xFF00 byte
  unstuffing.  Progressive (SOF2) and arithmetic coding are rejected
  with a clear error.
- encode: SOF0, quality-scaled Annex-K quantization tables, standard
  Annex-K Huffman tables, 4:4:4 or 4:2:0, grayscale or RGB.

Arithmetic notes (what the oracle leans on): the DCT is the exact
orthonormal float64 matrix transform.  For a BLOCK-CONSTANT input at
quality 100 (all-ones quant tables) the roundtrip is BIT-EXACT: the DC
coefficient is 8*(v-128) (integer), every AC magnitude is float noise
~1e-13 which quantizes to zero, and the IDCT of a DC-only block is the
constant back.  multimodal_jpeg_phash builds its corpus this way, which
is what lets a SQL oracle replay a LOSSY codec's output bit-for-bit.
For general images the roundtrip is approximate — PSNR-graded in
tests/test_jpegcodec.py.

Everything returns/accepts ``np.ndarray`` uint8, (H, W) or (H, W, 3) —
the exchange format operators/multimodal.py feeds to feature extraction.
"""

from __future__ import annotations

import struct

import numpy as np


class JpegFormatError(ValueError):
    pass


# ------------------------------------------------------------- constant tables
# Zigzag index order: ZIGZAG[k] = (row, col) flattened index of the k-th
# coefficient in scan order.
def _zigzag_order() -> np.ndarray:
    order = sorted(
        ((r, c) for r in range(8) for c in range(8)),
        key=lambda rc: (rc[0] + rc[1], rc[1] if (rc[0] + rc[1]) % 2 else rc[0]),
    )
    return np.array([r * 8 + c for r, c in order], dtype=np.int64)


ZIGZAG = _zigzag_order()
UNZIGZAG = np.argsort(ZIGZAG)

# ITU-T T.81 Annex K quantization tables (luminance, chrominance).
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
).reshape(8, 8)

# Annex K Huffman table specs: (bits[1..16] counts, values).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA,
]

# Orthonormal 8-point DCT-II matrix: block DCT is C @ f @ C.T.
def _dct_matrix() -> np.ndarray:
    k = np.arange(8)
    c = np.sqrt(2.0 / 8.0) * np.cos((2 * k[None, :] + 1) * k[:, None] * np.pi / 16)
    c[0, :] = np.sqrt(1.0 / 8.0)
    return c


DCT_M = _dct_matrix()


def quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """libjpeg quality scaling of the Annex-K tables; quality 100 =>
    all-ones (the lossless-DC regime the oracle corpus uses)."""
    if not 1 <= quality <= 100:
        raise ValueError("quality must be in 1..100")
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    ql = np.clip((QUANT_LUMA * scale + 50) // 100, 1, 255)
    qc = np.clip((QUANT_CHROMA * scale + 50) // 100, 1, 255)
    return ql.astype(np.int64), qc.astype(np.int64)


# ------------------------------------------------------------ Huffman helpers
def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) canonical Huffman assignment (T.81 C.2)."""
    codes: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup for decoding."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            table[(length, code)] = vals[k]
            code += 1
            k += 1
        code <<= 1
    return table


def _magnitude(v: int) -> tuple[int, int]:
    """JPEG magnitude coding: value -> (size, size-bit code)."""
    if v == 0:
        return 0, 0
    a = abs(v)
    size = a.bit_length()
    code = v if v > 0 else v + (1 << size) - 1
    return size, code


def _extend(code: int, size: int) -> int:
    """Inverse of _magnitude: size-bit code -> signed value."""
    if size == 0:
        return 0
    if code < (1 << (size - 1)):
        return code - (1 << size) + 1
    return code


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


class _BitReader:
    """Entropy-segment bit reader with 0xFF00 unstuffing; stops cleanly
    at any non-stuffing marker (RSTn handled by the caller)."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise JpegFormatError("truncated entropy data")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else None
            if nxt == 0x00:
                self.pos += 2
            else:
                raise JpegFormatError("marker inside entropy data")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, table: dict[tuple[int, int], int]) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.get((length, code))
            if sym is not None:
                return sym
        raise JpegFormatError("invalid Huffman code")

    def align(self) -> None:
        self.nbits = 0

    def at_marker(self) -> int | None:
        """Peek a marker byte pair at the current byte position."""
        d = self.data
        if self.pos + 1 < len(d) and d[self.pos] == 0xFF and d[self.pos + 1] != 0x00:
            return d[self.pos + 1]
        return None


# ------------------------------------------------------------------- encoder
def _encode_blocks(
    plane: np.ndarray, q: np.ndarray
) -> tuple[np.ndarray, int, int]:
    """DCT + quantize every 8x8 block of a (H, W) float plane (already
    level-shifted).  Returns (n_blocks, 64) zigzagged int coefficients
    plus block grid dims."""
    h, w = plane.shape
    bh, bw = (h + 7) // 8, (w + 7) // 8
    padded = np.pad(plane, ((0, bh * 8 - h), (0, bw * 8 - w)), mode="edge")
    blocks = padded.reshape(bh, 8, bw, 8).transpose(0, 2, 1, 3).reshape(-1, 8, 8)
    coeffs = np.einsum("ij,njk,lk->nil", DCT_M, blocks, DCT_M)
    quant = np.round(coeffs / q[None, :, :]).astype(np.int64)
    zz = quant.reshape(-1, 64)[:, ZIGZAG]
    return zz, bh, bw


def _huff_block(
    writer: _BitWriter,
    zz: np.ndarray,
    pred_dc: int,
    dc_codes: dict[int, tuple[int, int]],
    ac_codes: dict[int, tuple[int, int]],
) -> int:
    """Entropy-code one zigzagged block; returns the new DC predictor."""
    dc = int(zz[0])
    size, mag = _magnitude(dc - pred_dc)
    code, length = dc_codes[size]
    writer.write(code, length)
    if size:
        writer.write(mag, size)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if zz[k] != 0:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        size, mag = _magnitude(v)
        code, length = ac_codes[(run << 4) | size]
        writer.write(code, length)
        writer.write(mag, size)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return dc


def encode_jpeg(
    img: np.ndarray, quality: int = 75, subsampling: str = "4:4:4"
) -> bytes:
    """Baseline JFIF encode of a (H, W) grayscale or (H, W, 3) RGB uint8
    array.  subsampling: '4:4:4' or '4:2:0' (color only)."""
    if img.dtype != np.uint8 or img.ndim not in (2, 3):
        raise ValueError("expected uint8 (H,W) or (H,W,3)")
    if img.ndim == 3 and img.shape[2] != 3:
        raise ValueError("expected 3 channels for color")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be '4:4:4' or '4:2:0'")
    h, w = img.shape[:2]
    ql, qc = quality_tables(quality)
    gray = img.ndim == 2

    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
        qtabs = [ql]
        qids = [0]
    else:
        f = img.astype(np.float64)
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b - 128.0
        cb = -0.168735892 * r - 0.331264108 * g + 0.5 * b
        cr = 0.5 * r - 0.418687589 * g - 0.081312411 * b
        if subsampling == "4:2:0":
            ph, pw = (h + 1) // 2 * 2, (w + 1) // 2 * 2
            cbp = np.pad(cb, ((0, ph - h), (0, pw - w)), mode="edge")
            crp = np.pad(cr, ((0, ph - h), (0, pw - w)), mode="edge")
            cb = cbp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            cr = crp.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            samp = [(1, 1), (1, 1), (1, 1)]
        planes = [y, cb, cr]
        qtabs = [ql, qc, qc]
        qids = [0, 1, 1]

    # Per-component zigzag coefficient grids.
    comp_zz: list[np.ndarray] = []
    comp_dims: list[tuple[int, int]] = []
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    for plane, q, (sh, sv) in zip(planes, qtabs, samp):
        # pad each plane so its block grid is a multiple of its MCU share
        ph = ((h * sv + vmax - 1) // vmax + 7) // 8 * 8
        pw = ((w * sh + hmax - 1) // hmax + 7) // 8 * 8
        pl = np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )
        zz, bh, bw = _encode_blocks(pl, q)
        comp_zz.append(zz)
        comp_dims.append((bh, bw))

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    huff = [(dc_l, ac_l)] + [(dc_c, ac_c)] * (len(planes) - 1)

    writer = _BitWriter()
    preds = [0] * len(planes)
    mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            for ci, (sh, sv) in enumerate(samp):
                bh, bw = comp_dims[ci]
                for by in range(sv):
                    for bx in range(sh):
                        row = min(my * sv + by, bh - 1)
                        col = min(mx * sh + bx, bw - 1)
                        zz = comp_zz[ci][row * bw + col]
                        preds[ci] = _huff_block(
                            writer, zz, preds[ci], huff[ci][0], huff[ci][1]
                        )
    entropy = writer.flush()

    # ---- assemble segments
    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(
        0xE0, b"JFIF\x00\x01\x01\x00" + struct.pack(">HHBB", 1, 1, 0, 0)
    )
    # DQT
    out += seg(0xDB, bytes([0x00]) + bytes(int(v) for v in ql.reshape(64)[ZIGZAG]))
    if not gray:
        out += seg(
            0xDB, bytes([0x01]) + bytes(int(v) for v in qc.reshape(64)[ZIGZAG])
        )
    # SOF0
    sof = struct.pack(">BHHB", 8, h, w, len(planes))
    for ci, (sh, sv) in enumerate(samp):
        sof += bytes([ci + 1, (sh << 4) | sv, qids[ci]])
    out += seg(0xC0, sof)
    # DHT
    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals)

    dht_payload = dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS) + dht(
        1, 0, AC_LUMA_BITS, AC_LUMA_VALS
    )
    if not gray:
        dht_payload += dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS) + dht(
            1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS
        )
    out += seg(0xC4, dht_payload)
    # SOS
    sos = bytes([len(planes)])
    for ci in range(len(planes)):
        tid = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (tid << 4) | tid])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)
    out += entropy
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ------------------------------------------------------------------- decoder
def decode_jpeg(payload: bytes) -> np.ndarray:
    """Decode a baseline JFIF JPEG -> (H, W) or (H, W, 3) uint8."""
    try:
        return _decode_jpeg(payload)
    except (IndexError, struct.error) as exc:  # truncated / garbled stream
        raise JpegFormatError(f"corrupt JPEG stream: {exc}") from exc


def _decode_jpeg(payload: bytes) -> np.ndarray:
    if payload[:2] != b"\xff\xd8":
        raise JpegFormatError("not a JPEG (bad SOI)")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
    restart_interval = 0
    frame = None  # (h, w, comps) with comps = [(cid, sh, sv, qid)]
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise JpegFormatError("expected marker")
        marker = payload[pos + 1]
        if marker == 0xD9:  # EOI
            break
        (seglen,) = struct.unpack(">H", payload[pos + 2 : pos + 4])
        data = payload[pos + 4 : pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0x0F
                p += 1
                if pq != 0:
                    raise JpegFormatError("16-bit quant tables unsupported")
                t = np.zeros(64, dtype=np.int64)
                t[ZIGZAG] = np.frombuffer(data[p : p + 64], dtype=np.uint8)
                qtables[tq] = t.reshape(8, 8)
                p += 64
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(data):
                cls, tid = data[p] >> 4, data[p] & 0x0F
                bits = list(data[p + 1 : p + 17])
                nv = sum(bits)
                vals = list(data[p + 17 : p + 17 + nv])
                htables[(cls, tid)] = _decode_table(bits, vals)
                p += 17 + nv
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nc = struct.unpack(">BHHB", data[:6])
            if prec != 8:
                raise JpegFormatError("only 8-bit precision supported")
            comps = []
            for ci in range(nc):
                cid, sf, qid = data[6 + 3 * ci : 9 + 3 * ci]
                comps.append((cid, sf >> 4, sf & 0x0F, qid))
            frame = (fh, fw, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise JpegFormatError("only baseline (SOF0) JPEG supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", data[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegFormatError("SOS before SOF")
            ns = data[0]
            scan = []
            for si in range(ns):
                cid, tids = data[1 + 2 * si], data[2 + 2 * si]
                scan.append((cid, tids >> 4, tids & 0x0F))
            return _decode_scan(
                payload, pos, frame, scan, qtables, htables, restart_interval
            )
        # APPn/COM/others: skip
    raise JpegFormatError("no scan data found")


def _decode_scan(
    payload: bytes,
    pos: int,
    frame: tuple,
    scan: list[tuple[int, int, int]],
    qtables: dict[int, np.ndarray],
    htables: dict,
    restart_interval: int,
) -> np.ndarray:
    h, w, comps = frame
    by_id = {c[0]: c for c in comps}
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_rows = (h + 8 * vmax - 1) // (8 * vmax)
    mcu_cols = (w + 8 * hmax - 1) // (8 * hmax)

    # per component: coefficient store (bh, bw, 64)
    store: dict[int, np.ndarray] = {}
    dims: dict[int, tuple[int, int]] = {}
    for cid, sh, sv, _qid in comps:
        bh, bw = mcu_rows * sv, mcu_cols * sh
        store[cid] = np.zeros((bh * bw, 64), dtype=np.int64)
        dims[cid] = (bh, bw)

    reader = _BitReader(payload, pos)
    preds = {cid: 0 for cid, _, _ in ((c[0], 0, 0) for c in comps)}
    mcu_count = 0
    for my in range(mcu_rows):
        for mx in range(mcu_cols):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                reader.align()
                m = reader.at_marker()
                if m is not None and 0xD0 <= m <= 0xD7:
                    reader.pos += 2
                    preds = {cid: 0 for cid in preds}
                else:
                    raise JpegFormatError("expected restart marker")
            for cid, dc_tid, ac_tid in scan:
                _, sh, sv, _qid = by_id[cid]
                dc_table = htables.get((0, dc_tid))
                ac_table = htables.get((1, ac_tid))
                if dc_table is None or ac_table is None:
                    raise JpegFormatError("missing Huffman table")
                bh, bw = dims[cid]
                for by in range(sv):
                    for bx in range(sh):
                        zz = np.zeros(64, dtype=np.int64)
                        size = reader.decode_symbol(dc_table)
                        diff = _extend(reader.read_bits(size), size)
                        preds[cid] += diff
                        zz[0] = preds[cid]
                        k = 1
                        while k < 64:
                            sym = reader.decode_symbol(ac_table)
                            if sym == 0x00:  # EOB
                                break
                            run, size = sym >> 4, sym & 0x0F
                            if size == 0:
                                if run != 15:
                                    raise JpegFormatError("bad AC symbol")
                                k += 16  # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise JpegFormatError("AC run overflow")
                            zz[k] = _extend(reader.read_bits(size), size)
                            k += 1
                        row = my * sv + by
                        col = mx * sh + bx
                        store[cid][row * bw + col] = zz
            mcu_count += 1

    # Dequantize + batch IDCT per component, then upsample and stack.
    planes: dict[int, np.ndarray] = {}
    for cid, sh, sv, qid in comps:
        q = qtables.get(qid)
        if q is None:
            raise JpegFormatError("missing quant table")
        bh, bw = dims[cid]
        zz = store[cid]
        coeff = np.zeros((zz.shape[0], 64), dtype=np.float64)
        coeff[:, ZIGZAG] = zz  # de-zigzag
        coeff = coeff.reshape(-1, 8, 8) * q[None, :, :]
        pix = np.einsum("ji,njk,kl->nil", DCT_M, coeff, DCT_M) + 128.0
        grid = (
            pix.reshape(bh, bw, 8, 8).transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8)
        )
        # upsample to full resolution (pixel replication)
        if sh != hmax or sv != vmax:
            grid = np.repeat(np.repeat(grid, vmax // sv, axis=0), hmax // sh, axis=1)
        planes[cid] = grid[:h, :w]

    arrs = [planes[c[0]] for c in comps]
    if len(arrs) == 1:
        out = arrs[0]
    elif len(arrs) == 3:
        y, cb, cr = arrs
        r = y + 1.402 * (cr - 128.0)
        g = y - 0.344136286 * (cb - 128.0) - 0.714136286 * (cr - 128.0)
        b = y + 1.772 * (cb - 128.0)
        out = np.stack([r, g, b], axis=2)
    else:
        raise JpegFormatError(f"{len(arrs)}-component JPEG unsupported")
    return np.clip(np.round(out), 0, 255).astype(np.uint8)
