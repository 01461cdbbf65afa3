"""Pure-python baseline JPEG codec (ITU-T T.81 / JFIF subset).

Decoder (`parse_jpeg`): REAL entropy decode for baseline sequential
JPEGs — marker walk, DQT/DHT/SOF0/SOS parsing, canonical Huffman
decode of the byte-stuffed entropy stream (interleaved MCUs, per-
component DC prediction, h/v sampling factors 1-2 with replicate
upsample), dequantization, zigzag de-scan, float64 matrix IDCT, level
shift and JFIF YCbCr→RGB. No external codec libraries.

Encoder (`encode_jpeg`): the matching writer (standard Annex K
quantization + Huffman tables, 4:4:4 or 4:2:0) used to build test
fixtures whose pixel content can only be recovered by actually
running the decode path.

Determinism contract shared with the DuckDB oracles: every lossy
rounding step is ``floor(x + 0.5)`` (after a 6dp stabilization round
where the exact value is a multiple of 1/8, so float noise can never
flip a half-boundary), which both numpy and SQL reproduce bit-for-bit
— making even the DCT quantization arithmetic value-checkable for
flat blocks.

Progressive (SOF2), arithmetic coding, and restart markers are out of
scope and rejected explicitly.
"""

from __future__ import annotations

import struct

import numpy as np

# ITU-T T.81 Annex K.1 — standard quantization tables (quality 50).
QUANT_LUMA = np.array(
    [
        [16, 11, 10, 16, 24, 40, 51, 61],
        [12, 12, 14, 19, 26, 58, 60, 55],
        [14, 13, 16, 24, 40, 57, 69, 56],
        [14, 17, 22, 29, 51, 87, 80, 62],
        [18, 22, 37, 56, 68, 109, 103, 77],
        [24, 35, 55, 64, 81, 104, 113, 92],
        [49, 64, 78, 87, 103, 121, 120, 101],
        [72, 92, 95, 98, 112, 100, 103, 99],
    ],
    dtype=np.int32,
)
QUANT_CHROMA = np.array(
    [
        [17, 18, 24, 47, 99, 99, 99, 99],
        [18, 21, 26, 66, 99, 99, 99, 99],
        [24, 26, 56, 99, 99, 99, 99, 99],
        [47, 66, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
        [99, 99, 99, 99, 99, 99, 99, 99],
    ],
    dtype=np.int32,
)

# Annex K.3 — standard Huffman table specs: (BITS[1..16], HUFFVAL).
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41, 0x06,
    0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24, 0x33, 0x62, 0x72,
    0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44, 0x45,
    0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75,
    0x76, 0x77, 0x78, 0x79, 0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12, 0x41,
    0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15, 0x62, 0x72, 0xD1,
    0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38, 0x39, 0x3A, 0x43, 0x44,
    0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74,
    0x75, 0x76, 0x77, 0x78, 0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A,
    0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2, 0xF3, 0xF4,
    0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]

_ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ]
)


def _dct_matrix() -> np.ndarray:
    a = np.zeros((8, 8))
    for u in range(8):
        c = np.sqrt(0.125) if u == 0 else 0.5
        for x in range(8):
            a[u, x] = c * np.cos((2 * x + 1) * u * np.pi / 16.0)
    return a


_DCT = _dct_matrix()


def _round_half_up(x):
    """floor(x + 0.5) after a 6dp stabilization round — the shared
    lossy-rounding contract (see module docstring)."""
    return np.floor(np.round(np.asarray(x, dtype=np.float64), 6) + 0.5)


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length) per T.81 C.2 canonical assignment."""
    out: dict[int, tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> value lookup for the decoder."""
    return {
        (length, code): v for v, (code, length) in _canonical_codes(bits, vals).items()
    }


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, code: int, length: int) -> None:
        self._acc = (self._acc << length) | (code & ((1 << length) - 1))
        self._nbits += length
        while self._nbits >= 8:
            byte = (self._acc >> (self._nbits - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._nbits -= 8
        self._acc &= (1 << self._nbits) - 1

    def flush(self) -> bytes:
        if self._nbits:
            pad = 8 - self._nbits
            self.write((1 << pad) - 1, pad)  # 1-fill per spec
        return bytes(self.out)


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self.data = data
        self.pos = 0
        self._acc = 0
        self._nbits = 0

    def read_bit(self) -> int:
        if self._nbits == 0:
            if self.pos >= len(self.data):
                raise ValueError("entropy stream truncated")
            byte = self.data[self.pos]
            self.pos += 1
            if byte == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("dangling 0xFF in entropy stream")
                marker = self.data[self.pos]
                self.pos += 1
                if marker != 0x00:
                    raise ValueError(f"unexpected marker 0xFF{marker:02X} mid-scan")
            self._acc = byte
            self._nbits = 8
        self._nbits -= 1
        return (self._acc >> self._nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _magnitude(value: int) -> tuple[int, int]:
    """(category, raw bits) for a DC diff / AC value per T.81 F.1.2."""
    if value == 0:
        return 0, 0
    mag = abs(value)
    cat = mag.bit_length()
    bits = value if value >= 0 else value + (1 << cat) - 1
    return cat, bits


def _extend(bits: int, cat: int) -> int:
    if cat == 0:
        return 0
    return bits if bits >= (1 << (cat - 1)) else bits - (1 << cat) + 1


def _quantize(coeffs: np.ndarray, q: np.ndarray) -> np.ndarray:
    # stabilized half-up (see module docstring): the DCT's float noise
    # must never flip a ratio that is exactly k + 0.5
    ratio = np.abs(coeffs) / q
    return (np.sign(coeffs) * _round_half_up(ratio)).astype(np.int32)


def rgb_to_ycbcr(r, g, b):
    """JFIF forward color transform with the shared rounding contract."""
    r = np.asarray(r, dtype=np.float64)
    g = np.asarray(g, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    y = _round_half_up(0.299 * r + 0.587 * g + 0.114 * b)
    cb = _round_half_up(-0.168736 * r - 0.331264 * g + 0.5 * b + 128)
    cr = _round_half_up(0.5 * r - 0.418688 * g - 0.081312 * b + 128)
    clip = lambda v: np.clip(v, 0, 255)  # noqa: E731
    return clip(y), clip(cb), clip(cr)


def _encode_block(
    writer: _BitWriter,
    block: np.ndarray,
    q: np.ndarray,
    dc_codes: dict,
    ac_codes: dict,
    pred: int,
) -> int:
    coeffs = _DCT @ (block.astype(np.float64) - 128.0) @ _DCT.T
    zz = _quantize(coeffs, q).flatten()[_ZIGZAG]
    diff = int(zz[0]) - pred
    cat, bits = _magnitude(diff)
    code, length = dc_codes[cat]
    writer.write(code, length)
    if cat:
        writer.write(bits, cat)
    run = 0
    last_nz = 0
    for i in range(1, 64):
        if zz[i] != 0:
            last_nz = i
    for i in range(1, last_nz + 1):
        v = int(zz[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, length = ac_codes[0xF0]  # ZRL
            writer.write(code, length)
            run -= 16
        cat, bits = _magnitude(v)
        code, length = ac_codes[(run << 4) | cat]
        writer.write(code, length)
        writer.write(bits, cat)
        run = 0
    if last_nz < 63:
        code, length = ac_codes[0x00]  # EOB
        writer.write(code, length)
    return int(zz[0])


def encode_jpeg(pixels: np.ndarray, subsampling: str = "444") -> bytes:
    """Baseline JFIF encoder for an (H, W, 3) uint8 RGB array.

    ``subsampling``: '444' (1×1 chroma) or '420' (2×2, chroma reduced
    by floor-mean). Dimensions pad to the MCU grid by edge replication;
    the decoded image crops back to (H, W).
    """
    h, w = pixels.shape[:2]
    y, cb, cr = rgb_to_ycbcr(
        pixels[..., 0], pixels[..., 1], pixels[..., 2]
    )
    if subsampling == "444":
        hs = vs = 1
    elif subsampling == "420":
        hs = vs = 2
    else:
        raise ValueError(f"subsampling must be 444|420, got {subsampling!r}")
    mcu_w, mcu_h = 8 * hs, 8 * vs

    def pad(plane, ph, pw):
        return np.pad(
            plane,
            ((0, ph - plane.shape[0]), (0, pw - plane.shape[1])),
            mode="edge",
        )

    ph = -(-h // mcu_h) * mcu_h
    pw = -(-w // mcu_w) * mcu_w
    y = pad(y, ph, pw)
    if hs == 2:
        cbp = pad(cb, ph, pw)
        crp = pad(cr, ph, pw)
        cb = np.floor(
            (cbp[0::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 0::2] + cbp[1::2, 1::2])
            / 4.0
        )
        cr = np.floor(
            (crp[0::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 0::2] + crp[1::2, 1::2])
            / 4.0
        )
    else:
        cb = pad(cb, ph, pw)
        cr = pad(cr, ph, pw)

    dc_l = _canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS)
    ac_l = _canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS)
    dc_c = _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)
    ac_c = _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)
    writer = _BitWriter()
    preds = [0, 0, 0]
    for my in range(0, ph, mcu_h):
        for mx in range(0, pw, mcu_w):
            for by in range(vs):
                for bx in range(hs):
                    blk = y[
                        my + 8 * by : my + 8 * by + 8,
                        mx + 8 * bx : mx + 8 * bx + 8,
                    ]
                    preds[0] = _encode_block(
                        writer, blk, QUANT_LUMA, dc_l, ac_l, preds[0]
                    )
            cy, cx = my // vs, mx // hs
            preds[1] = _encode_block(
                writer, cb[cy : cy + 8, cx : cx + 8], QUANT_CHROMA, dc_c, ac_c, preds[1]
            )
            preds[2] = _encode_block(
                writer, cr[cy : cy + 8, cx : cx + 8], QUANT_CHROMA, dc_c, ac_c, preds[2]
            )
    entropy = writer.flush()

    def seg(marker: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload

    def dqt(tid: int, table: np.ndarray) -> bytes:
        return seg(
            0xDB, bytes([tid]) + bytes(int(v) for v in table.flatten()[_ZIGZAG])
        )

    def dht(cls: int, tid: int, bits: list[int], vals: list[int]) -> bytes:
        return seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) + bytes(vals))

    sof = seg(
        0xC0,
        struct.pack(">BHHB", 8, h, w, 3)
        + bytes([1, (hs << 4) | vs, 0])
        + bytes([2, 0x11, 1])
        + bytes([3, 0x11, 1]),
    )
    sos = seg(
        0xDA,
        bytes([3, 1, 0x00, 2, 0x11, 3, 0x11, 0, 63, 0]),
    )
    jfif = seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")
    return (
        b"\xff\xd8"
        + jfif
        + dqt(0, QUANT_LUMA)
        + dqt(1, QUANT_CHROMA)
        + sof
        + dht(0, 0, DC_LUMA_BITS, DC_LUMA_VALS)
        + dht(1, 0, AC_LUMA_BITS, AC_LUMA_VALS)
        + dht(0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS)
        + dht(1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)
        + sos
        + entropy
        + b"\xff\xd9"
    )


def _decode_block(
    reader: _BitReader,
    q: np.ndarray,
    dc_tab: dict,
    ac_tab: dict,
    pred: int,
) -> tuple[np.ndarray, int]:
    def read_huff(tab):
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            if (length, code) in tab:
                return tab[(length, code)]
        raise ValueError("invalid Huffman code")

    zz = np.zeros(64, dtype=np.int32)
    cat = read_huff(dc_tab)
    diff = _extend(reader.read_bits(cat), cat)
    dc = pred + diff
    zz[0] = dc
    i = 1
    while i < 64:
        rs = read_huff(ac_tab)
        run, cat = rs >> 4, rs & 0x0F
        if cat == 0:
            if run == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += run
        if i > 63:
            raise ValueError("AC run past end of block")
        zz[i] = _extend(reader.read_bits(cat), cat)
        i += 1
    coeffs = np.zeros(64, dtype=np.float64)
    coeffs[_ZIGZAG] = zz * q.flatten()[_ZIGZAG]
    block = _DCT.T @ coeffs.reshape(8, 8) @ _DCT
    return block, dc


def parse_jpeg(content: bytes) -> dict | None:
    """Decode a baseline sequential JPEG. Returns
    {width, height, n_components, pixels} with ``pixels`` an
    (H, W, 3) uint8 RGB array (or (H, W) for grayscale), or None for
    malformed input. Raises nothing; progressive/arithmetic files
    return None."""
    try:
        return _parse_jpeg_strict(content)
    except (ValueError, struct.error, IndexError, KeyError):
        return None


def _parse_jpeg_strict(content: bytes) -> dict | None:
    if len(content) < 4 or content[:2] != b"\xff\xd8":
        return None
    pos = 2
    quant: dict[int, np.ndarray] = {}
    huff_dc: dict[int, dict] = {}
    huff_ac: dict[int, dict] = {}
    frame = None
    scan = None
    while pos + 4 <= len(content):
        if content[pos] != 0xFF:
            return None
        marker = content[pos + 1]
        if marker == 0xFF:
            # spec-legal fill byte (T.81 B.1.1.2): optional 0xFF
            # padding precedes any marker
            pos += 1
            continue
        if marker == 0xD9:
            return None  # EOI before SOS
        if marker == 0x01 or 0xD0 <= marker <= 0xD7:
            # TEM / RSTn are length-less markers
            pos += 2
            continue
        size = struct.unpack(">H", content[pos + 2 : pos + 4])[0]
        payload = content[pos + 4 : pos + 2 + size]
        pos += 2 + size
        if marker == 0xDB:
            p = 0
            while p < len(payload):
                pq, tq = payload[p] >> 4, payload[p] & 0x0F
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tab = np.zeros(64, dtype=np.int32)
                tab[_ZIGZAG] = np.frombuffer(
                    payload[p + 1 : p + 65], dtype=np.uint8
                ).astype(np.int32)
                quant[tq] = tab.reshape(8, 8)
                p += 65
        elif marker == 0xC4:
            p = 0
            while p < len(payload):
                cls, tid = payload[p] >> 4, payload[p] & 0x0F
                bits = list(payload[p + 1 : p + 17])
                n = sum(bits)
                vals = list(payload[p + 17 : p + 17 + n])
                (huff_dc if cls == 0 else huff_ac)[tid] = _decode_table(bits, vals)
                p += 17 + n
        elif marker == 0xC0:
            precision, height, width, nc = struct.unpack(">BHHB", payload[:6])
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nc):
                cid, hv, tq = payload[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (width, height, comps)
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB):
            raise ValueError("non-baseline SOF unsupported")
        elif marker == 0xDD:
            raise ValueError("restart intervals unsupported")
        elif marker == 0xDA:
            ns = payload[0]
            scan = [(payload[1 + 2 * i], payload[2 + 2 * i]) for i in range(ns)]
            break
    if frame is None or scan is None:
        return None
    width, height, comps = frame
    if width == 0 or height == 0:
        return None
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-width // mcu_w)
    mcus_y = -(-height // mcu_h)
    # strip trailing EOI for the bit reader
    data = content[pos:]
    if data.endswith(b"\xff\xd9"):
        data = data[:-2]
    reader = _BitReader(data)
    planes = {}
    for cid, ch, cv, _tq in comps:
        planes[cid] = np.zeros((mcus_y * cv * 8, mcus_x * ch * 8))
    scan_tabs = {cid: (td >> 4, td & 0x0F) for cid, td in scan}
    preds = {cid: 0 for cid, *_ in comps}
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for cid, ch, cv, tq in comps:
                td, ta = scan_tabs[cid]
                for by in range(cv):
                    for bx in range(ch):
                        block, preds[cid] = _decode_block(
                            reader,
                            quant[tq],
                            huff_dc[td],
                            huff_ac[ta],
                            preds[cid],
                        )
                        y0 = (my * cv + by) * 8
                        x0 = (mx * ch + bx) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = block
    out_planes = []
    for cid, ch, cv, _tq in comps:
        plane = np.clip(_round_half_up(planes[cid] + 128.0), 0, 255)
        # replicate upsample to full resolution, crop to image size
        plane = np.repeat(np.repeat(plane, vmax // cv, axis=0), hmax // ch, axis=1)
        out_planes.append(plane[:height, :width])
    if len(out_planes) == 1:
        pixels = out_planes[0].astype(np.uint8)
    else:
        y, cb, cr = out_planes[:3]
        r = _round_half_up(y + 1.402 * (cr - 128))
        g = _round_half_up(y - 0.344136 * (cb - 128) - 0.714136 * (cr - 128))
        b = _round_half_up(y + 1.772 * (cb - 128))
        pixels = np.stack(
            [np.clip(p, 0, 255) for p in (r, g, b)], axis=-1
        ).astype(np.uint8)
    return {
        "width": width,
        "height": height,
        "n_components": len(comps),
        "pixels": pixels,
    }
