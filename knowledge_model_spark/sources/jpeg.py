"""Baseline JPEG codec with zero new dependencies (pure numpy/stdlib).

Closes the last image-codec seam the container allows: REAL decode for
baseline sequential JFIF (SOF0, Huffman, 8-bit, any chroma subsampling,
restart markers) — the encoding virtually all non-progressive photos
use — plus a baseline encoder (4:4:4, Annex-K-style tables) so tests
can round-trip pixels without Pillow.  Progressive (SOF2) and
arithmetic-coded JPEGs return None and stay on the declared Pillow
seam.

Conformance anchors (tests/test_sources.py):
- the decoder takes Huffman and quantization tables FROM THE FILE
  (DHT/DQT), so table constants cannot desynchronize encode/decode;
- hand-authored single-coefficient fixtures pin the IDCT normalization
  and zigzag order against spec arithmetic computed independently in
  the test (a mirrored encoder/decoder bug cannot hide there);
- external JPEGs from the container's stdlib test data (written by
  libjpeg, not by this repo) decode to the right dimensions with
  plausible content;
- encoder→decoder round-trip is gated on PSNR.

Scale note: this codec exists so `image_features`/`perceptual_hash`
REAL mode covers real-world payloads in-container and so content-level
tests exist; at 100 TB a C codec library on the executors is still the
right hot path, exactly as with the PNG/GIF/PDF decoders.
"""

from __future__ import annotations

import struct

import numpy as np

# scan position k -> raster index (row*8+col), ITU-T T.81 Figure 5
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# orthonormal 8-point DCT-II basis: A[u,x] = c(u)/2 * cos((2x+1)u*pi/16)
_A = np.zeros((8, 8))
for _u in range(8):
    for _x in range(8):
        _c = (1 / np.sqrt(2)) if _u == 0 else 1.0
        _A[_u, _x] = 0.5 * _c * np.cos((2 * _x + 1) * _u * np.pi / 16)


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


def _fdct2(block: np.ndarray) -> np.ndarray:
    return _A @ block @ _A.T


class _HuffTable:
    """Canonical Huffman decode table from BITS (16 counts) + values."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(bits[length - 1]):
                self.lookup[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, reader: "_BitReader") -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | reader.read_bit()
            v = self.lookup.get((length, code))
            if v is not None:
                return v
        raise ValueError("invalid Huffman code")


class _BitReader:
    """MSB-first bit reader over de-stuffed entropy segments."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise ValueError("entropy data exhausted")
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def receive(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def _entropy_segments(b: bytes, start: int) -> list[bytes]:
    """Entropy-coded data from ``start``: de-stuff FF00, split on
    restart markers (FFD0-FFD7), stop at any other marker."""
    segs: list[bytearray] = [bytearray()]
    i = start
    n = len(b)
    while i < n:
        c = b[i]
        if c != 0xFF:
            segs[-1].append(c)
            i += 1
            continue
        nxt = b[i + 1] if i + 1 < n else 0xD9
        if nxt == 0x00:
            segs[-1].append(0xFF)
            i += 2
        elif 0xD0 <= nxt <= 0xD7:
            segs.append(bytearray())
            i += 2
        else:
            break
    return [bytes(s) for s in segs]


def decode_jpeg(b: bytes) -> np.ndarray | None:
    """Baseline sequential JFIF → (H, W, 3) uint8 RGB (grayscale
    replicates).  None for non-JPEG, progressive, arithmetic, or
    12-bit payloads (the remaining Pillow seam)."""
    if not b or not b.startswith(b"\xff\xd8"):
        return None
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    H = W = 0
    scan_comps: list[dict] = []
    scan_at = -1
    restart_interval = 0
    n = len(b)
    while i + 4 <= n:
        if b[i] != 0xFF:
            return None
        marker = b[i + 1]
        i += 2
        if marker in (0x01,) or 0xD0 <= marker <= 0xD9:
            continue
        L = struct.unpack_from(">H", b, i)[0]
        seg = b[i + 2 : i + L]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    return None  # 16-bit tables: seam
                qt[tq] = np.frombuffer(
                    seg, np.uint8, 64, j + 1
                ).astype(np.int32)
                j += 65
        elif marker == 0xC0:  # SOF0 baseline
            prec, H, W, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                return None
            for k in range(nc):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                comps.append(
                    {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                )
        elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                        0xCB, 0xCD, 0xCE, 0xCF):
            return None  # progressive/arithmetic/lossless: seam
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                values = list(seg[j + 17 : j + 17 + nv])
                huff[(tc, th)] = _HuffTable(bits, values)
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            for k in range(ns):
                cid, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                comp = next(c for c in comps if c["id"] == cid)
                scan_comps.append(
                    {**comp, "dc": tables >> 4, "ac": tables & 15}
                )
            scan_at = i + L
            break
        i += L
    if scan_at < 0 or not comps or W <= 0 or H <= 0:
        return None

    hmax = max(c["h"] for c in scan_comps)
    vmax = max(c["v"] for c in scan_comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in scan_comps
    ]
    segments = _entropy_segments(b, scan_at)
    seg_idx = 0
    reader = _BitReader(segments[0])
    preds = [0] * len(scan_comps)
    try:
        for my in range(mcuy):
            for mx in range(mcux):
                mcu_no = my * mcux + mx
                if (
                    restart_interval
                    and mcu_no > 0
                    and mcu_no % restart_interval == 0
                ):
                    # restart: jump to the next entropy segment, byte-
                    # aligned, and reset the DC predictors (T.81 E.2.4)
                    seg_idx += 1
                    reader = _BitReader(segments[seg_idx])
                    preds = [0] * len(scan_comps)
                for ci, c in enumerate(scan_comps):
                    q = qt[c["tq"]]
                    for v in range(c["v"]):
                        for h in range(c["h"]):
                            zig = np.zeros(64, np.int32)
                            t = huff[(0, c["dc"])].decode(reader)
                            diff = _extend(reader.receive(t), t)
                            preds[ci] += diff
                            zig[0] = preds[ci]
                            k = 1
                            while k < 64:
                                rs = huff[(1, c["ac"])].decode(reader)
                                r, s = rs >> 4, rs & 15
                                if s == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    raise ValueError("AC overflow")
                                zig[k] = _extend(reader.receive(s), s)
                                k += 1
                            block = np.zeros(64, np.float64)
                            block[ZIGZAG] = zig * q
                            px = _idct2(block.reshape(8, 8)) + 128.0
                            y0 = (my * c["v"] + v) * 8
                            x0 = (mx * c["h"] + h) * 8
                            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px
    except (ValueError, IndexError, KeyError, StopIteration):
        return None

    full = []
    for ci, c in enumerate(scan_comps):
        p = planes[ci]
        ry, rx = vmax // c["v"], hmax // c["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:H, :W])
    if len(full) == 1:
        g = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.repeat(g[..., None], 3, axis=2)
    if len(full) != 3:
        return None
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    bl = y + 1.772 * (cb - 128.0)
    return np.clip(np.stack([r, g, bl], axis=2), 0, 255).astype(np.uint8)


# ---------------------------------------------------------- encoder

# Annex-K example quantization tables (public spec constants)
QT_LUMA = np.array(
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
    dtype=np.int32,
)
QT_CHROMA = np.array(
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
    dtype=np.int32,
)

# Annex-K typical Huffman tables
_DC_L_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
_DC_L_VALS = list(range(12))
_DC_C_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
_DC_C_VALS = list(range(12))
_AC_L_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
_AC_L_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12, 0x21, 0x31, 0x41,
    0x06, 0x13, 0x51, 0x61, 0x07, 0x22, 0x71, 0x14, 0x32, 0x81, 0x91,
    0xA1, 0x08, 0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0, 0x24,
    0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16, 0x17, 0x18, 0x19, 0x1A,
    0x25, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A, 0x53,
    0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65, 0x66,
    0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A, 0x92, 0x93,
    0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6, 0xB7,
    0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9,
    0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF1, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]
_AC_C_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
_AC_C_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21, 0x31, 0x06, 0x12,
    0x41, 0x51, 0x07, 0x61, 0x71, 0x13, 0x22, 0x32, 0x81, 0x08, 0x14,
    0x42, 0x91, 0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0, 0x15,
    0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34, 0xE1, 0x25, 0xF1, 0x17,
    0x18, 0x19, 0x1A, 0x26, 0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37,
    0x38, 0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49, 0x4A,
    0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59, 0x5A, 0x63, 0x64, 0x65,
    0x66, 0x67, 0x68, 0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89, 0x8A,
    0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3,
    0xA4, 0xA5, 0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5,
    0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5, 0xC6, 0xC7,
    0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9,
    0xDA, 0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA, 0xF2,
    0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8, 0xF9, 0xFA,
]


def _encode_codes(bits: list[int], values: list[int]) -> dict[int, tuple[int, int]]:
    """value -> (code, length), canonical assignment (encoder mirror)."""
    out = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((code >> i) & 1)
            self.n += 1
            if self.n == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # stuffing
                self.acc = 0
                self.n = 0

    def flush(self) -> None:
        if self.n:
            self.acc = (self.acc << (8 - self.n)) | ((1 << (8 - self.n)) - 1)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    return int(abs(v)).bit_length()


def _scaled_qt(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, quality))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int32)


def encode_jpeg(img: np.ndarray, quality: int = 90) -> bytes:
    """(H, W, 3) uint8 RGB → baseline JFIF bytes (4:4:4, Annex-K-style
    tables scaled by ``quality``).  Exists so tests can round-trip real
    compressed pixels without Pillow; not a speed-tuned encoder."""
    h, w = img.shape[:2]
    x = img.astype(np.float64)
    y = 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]
    cb = 128.0 - 0.168736 * x[..., 0] - 0.331264 * x[..., 1] + 0.5 * x[..., 2]
    cr = 128.0 + 0.5 * x[..., 0] - 0.418688 * x[..., 1] - 0.081312 * x[..., 2]
    qly = _scaled_qt(QT_LUMA, quality)
    qlc = _scaled_qt(QT_CHROMA, quality)
    # QT_* are in raster order; DQT stores tables in ZIGZAG order
    qly_z = qly[ZIGZAG]
    qlc_z = qlc[ZIGZAG]

    dc_l = _encode_codes(_DC_L_BITS, _DC_L_VALS)
    dc_c = _encode_codes(_DC_C_BITS, _DC_C_VALS)
    ac_l = _encode_codes(_AC_L_BITS, _AC_L_VALS)
    ac_c = _encode_codes(_AC_C_BITS, _AC_C_VALS)

    ph = -(-h // 8) * 8
    pw = -(-w // 8) * 8

    def pad(p: np.ndarray) -> np.ndarray:
        return np.pad(p, ((0, ph - h), (0, pw - w)), mode="edge")

    planes = [pad(y), pad(cb), pad(cr)]
    writer = _BitWriter()
    preds = [0, 0, 0]
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            for ci, plane in enumerate(planes):
                q = qly if ci == 0 else qlc
                dct = _fdct2(plane[by : by + 8, bx : bx + 8] - 128.0)
                coef = np.round(dct.ravel() / q).astype(np.int64)
                zig = coef[ZIGZAG]
                dtab = dc_l if ci == 0 else dc_c
                atab = ac_l if ci == 0 else ac_c
                diff = int(zig[0]) - preds[ci]
                preds[ci] = int(zig[0])
                t = _category(diff)
                code, ln = dtab[t]
                writer.put(code, ln)
                if t:
                    v = diff if diff >= 0 else diff + (1 << t) - 1
                    writer.put(v, t)
                run = 0
                last_nz = int(np.max(np.nonzero(zig)[0])) if np.any(zig[1:]) else 0
                for k in range(1, 64):
                    if k > last_nz:
                        code, ln = atab[0x00]  # EOB
                        writer.put(code, ln)
                        break
                    v = int(zig[k])
                    if v == 0:
                        run += 1
                        continue
                    while run > 15:
                        code, ln = atab[0xF0]  # ZRL
                        writer.put(code, ln)
                        run -= 16
                    s = _category(v)
                    code, ln = atab[(run << 4) | s]
                    writer.put(code, ln)
                    vv = v if v >= 0 else v + (1 << s) - 1
                    writer.put(vv, s)
                    run = 0
    writer.flush()

    out = bytearray(b"\xff\xd8")  # SOI
    out += b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    for tid, tz in ((0, qly_z), (1, qlc_z)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + bytes(
            int(v) for v in tz
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 17, 8, h, w, 3)
    for cid, tq in ((1, 0), (2, 1), (3, 1)):
        out += bytes([cid, 0x11, tq])  # 4:4:4
    for tc_th, bits, vals in (
        (0x00, _DC_L_BITS, _DC_L_VALS),
        (0x01, _DC_C_BITS, _DC_C_VALS),
        (0x10, _AC_L_BITS, _AC_L_VALS),
        (0x11, _AC_C_BITS, _AC_C_VALS),
    ):
        out += b"\xff\xc4" + struct.pack(">H", 3 + 16 + len(vals))
        out += bytes([tc_th]) + bytes(bits) + bytes(vals)
    out += b"\xff\xda" + struct.pack(">HB", 12, 3)
    for cid, tabs in ((1, 0x00), (2, 0x11), (3, 0x11)):
        out += bytes([cid, tabs])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
