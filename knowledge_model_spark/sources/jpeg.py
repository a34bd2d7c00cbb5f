"""JPEG codec with zero new dependencies (pure numpy/stdlib).

Closes the image-codec seam: REAL decode for sequential JFIF
(SOF0/SOF1, Huffman, 8-bit, any chroma subsampling, restart markers)
AND progressive JFIF (SOF2 — spectral selection and successive
approximation with EOB runs, the scan scripts libjpeg-family encoders
emit), plus a baseline encoder (4:4:4, Annex-K-style tables) so tests
can round-trip pixels without Pillow.  Arithmetic-coded, lossless,
hierarchical, and 12-bit JPEGs return None and stay on the declared
Pillow seam.

Conformance anchors (tests/test_sources.py):
- the decoder takes Huffman and quantization tables FROM THE FILE
  (DHT/DQT), so table constants cannot desynchronize encode/decode;
- hand-authored single-coefficient fixtures pin the IDCT normalization
  and zigzag order against spec arithmetic computed independently in
  the test (a mirrored encoder/decoder bug cannot hide there);
- external JPEGs from the container's stdlib test data and the nodejs
  docs (written by libjpeg-family encoders, not by this repo; the
  nodejs pair is PROGRESSIVE) decode to the right dimensions with
  plausible content;
- a hand-assembled 4-scan progressive stream (DC/AC first + refinement
  scans, successive approximation, a refine-scan coefficient
  insertion) reconstructs the exact coefficient block, pinned against
  the spec's direct IDCT arithmetic;
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


def _canonical_codes(bits: list[int], values: list[int]):
    """Yield (value, code, length) for a canonical Huffman spec — the
    single implementation behind both the decoder lookup and the
    encoder map (a fix to one cannot miss the other)."""
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            yield values[k], code, length
            code += 1
            k += 1
        code <<= 1


class _HuffTable:
    """Canonical Huffman decode table from BITS (16 counts) + values."""

    def __init__(self, bits: list[int], values: list[int]):
        self.lookup: dict[tuple[int, int], int] = {
            (length, code): value
            for value, code, length in _canonical_codes(bits, values)
        }

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


def _entropy_segments(b: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded data from ``start``: de-stuff FF00, split on
    restart markers (FFD0-FFD7), stop at any other marker.  Returns
    (segments, index of the terminating marker's FF) so multi-scan
    files (progressive) can keep parsing after each scan."""
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
    return [bytes(s) for s in segs], i


def _parse_jpeg(b: bytes) -> dict | None:
    """Marker-level parse: quant/huffman tables, frame header, and ALL
    scans (progressive files carry many SOS, each with its own
    spectral band Ss..Se and successive-approximation bits Ah/Al and
    possibly tables defined between scans — so each scan snapshots the
    table objects it references)."""
    i = 2
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffTable] = {}
    comps: list[dict] = []
    H = W = 0
    mode = None  # "baseline" | "progressive"
    restart_interval = 0
    scans: list[dict] = []
    n = len(b)
    while i + 2 <= n:
        if b[i] != 0xFF:
            return None
        # any number of 0xFF FILL bytes may pad before a marker
        # (T.81 B.1.1.2) — some encoders pad before RST/EOI
        while i + 1 < n and b[i + 1] == 0xFF:
            i += 1
        if i + 2 > n:
            break
        marker = b[i + 1]
        i += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD8:
            continue
        if i + 2 > n:
            return None
        L = struct.unpack_from(">H", b, i)[0]
        seg = b[i + 2 : i + L]
        if marker == 0xDB:  # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                if pq != 0:
                    return None  # 16-bit tables: seam
                qt[tq] = np.frombuffer(seg, np.uint8, 64, j + 1).astype(np.int32)
                j += 65
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            prec, H, W, nc = seg[0], *struct.unpack_from(">HH", seg, 1), seg[5]
            if prec != 8:
                return None
            mode = "progressive" if marker == 0xC2 else "baseline"
            for k in range(nc):
                cid, hv, tq = seg[6 + 3 * k : 9 + 3 * k]
                if (hv >> 4) == 0 or (hv & 15) == 0:
                    return None  # zero sampling factor: malformed
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq})
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD,
                        0xCE, 0xCF):
            return None  # arithmetic/lossless/hierarchical: seam
        elif marker == 0xC4:  # DHT
            j = 0
            while j < len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                bits = list(seg[j + 1 : j + 17])
                nv = sum(bits)
                huff[(tc, th)] = _HuffTable(bits, list(seg[j + 17 : j + 17 + nv]))
                j += 17 + nv
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            sc = []
            for k in range(ns):
                cid, tables = seg[1 + 2 * k], seg[2 + 2 * k]
                comp = next((c for c in comps if c["id"] == cid), None)
                if comp is None:
                    return None
                sc.append(
                    {
                        **comp,
                        "dct": huff.get((0, tables >> 4)),
                        "act": huff.get((1, tables & 15)),
                    }
                )
            ss, se, ahal = seg[1 + 2 * ns : 4 + 2 * ns]
            segments, i = _entropy_segments(b, i + L)
            scans.append(
                {
                    "comps": sc,
                    "ss": ss,
                    "se": se,
                    "ah": ahal >> 4,
                    "al": ahal & 15,
                    "segments": segments,
                    "ri": restart_interval,
                }
            )
            continue  # i already points at the terminating marker's FF
        i += L
    if not comps or not scans or W <= 0 or H <= 0 or mode is None:
        return None
    return {
        "qt": qt, "comps": comps, "H": H, "W": W,
        "mode": mode, "scans": scans,
    }


def _finish(planes: list[np.ndarray], comps: list[dict], H: int, W: int,
            hmax: int, vmax: int) -> np.ndarray | None:
    full = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        if vmax % c["v"] or hmax % c["h"]:
            return None  # non-integer sampling ratio (legal but rare):
            # integer replication can't reconstruct it — seam, not a
            # silently wrong image
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


def _decode_baseline(parsed: dict) -> np.ndarray | None:
    """Sequential decode over ALL scans: a legal sequential JPEG may
    carry one interleaved scan (the common case) OR one scan per
    component — single-component scans use the component's OWN block
    grid per T.81 A.2, exactly as in the progressive path."""
    comps, H, W = parsed["comps"], parsed["H"], parsed["W"]
    qt = parsed["qt"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    planes = {
        c["id"]: np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), np.float64)
        for c in comps
    }
    seen: set[int] = set()

    def decode_block(reader, c, preds, ci):
        zig = np.zeros(64, np.int64)
        t = c["dct"].decode(reader)
        if t > 15:
            raise ValueError("DC category out of range")
        preds[ci] += _extend(reader.receive(t), t)
        zig[0] = preds[ci]
        k = 1
        while k < 64:
            rs = c["act"].decode(reader)
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
        block[ZIGZAG] = zig * qt[c["tq"]]
        return _idct2(block.reshape(8, 8)) + 128.0

    for scan in parsed["scans"]:
        sc = scan["comps"]
        seen.update(c["id"] for c in sc)
        segments, ri = scan["segments"], scan["ri"]
        seg_idx = 0
        reader = _BitReader(segments[0])
        preds = [0] * len(sc)
        if len(sc) > 1:  # interleaved: MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu_no = my * mcux + mx
                    if ri and mcu_no > 0 and mcu_no % ri == 0:
                        # restart: next segment, byte-aligned, DC
                        # predictors reset (T.81 E.2.4)
                        seg_idx += 1
                        reader = _BitReader(segments[seg_idx])
                        preds = [0] * len(sc)
                    for ci, c in enumerate(sc):
                        for v in range(c["v"]):
                            for h in range(c["h"]):
                                px = decode_block(reader, c, preds, ci)
                                y0 = (my * c["v"] + v) * 8
                                x0 = (mx * c["h"] + h) * 8
                                planes[c["id"]][
                                    y0 : y0 + 8, x0 : x0 + 8
                                ] = px
        else:  # single component: its own row-major block grid
            c = sc[0]
            comp_w = -(-W * c["h"] // hmax)
            comp_h = -(-H * c["v"] // vmax)
            nbw = -(-comp_w // 8)
            nbh = -(-comp_h // 8)
            for bno in range(nbh * nbw):
                if ri and bno > 0 and bno % ri == 0:
                    seg_idx += 1
                    reader = _BitReader(segments[seg_idx])
                    preds = [0]
                by, bx = divmod(bno, nbw)
                px = decode_block(reader, c, preds, 0)
                planes[c["id"]][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = px
    if seen != {c["id"] for c in comps}:
        return None  # a component never got a scan: don't emit a
        # grayscale-replicated image with chroma silently dropped
    return _finish([planes[c["id"]] for c in comps], comps, H, W, hmax, vmax)


def _dc_first(reader, table, pred: int, coef, al: int) -> int:
    t = table.decode(reader)
    if t > 15:
        raise ValueError("DC category out of range")
    pred += _extend(reader.receive(t), t)
    coef[0] = pred << al
    return pred


def _ac_first(reader, table, coef, ss, se, al, eobrun) -> int:
    """AC first scan for one block (T.81 G.1.2.2 / libjpeg
    decode_mcu_AC_first).  Returns the updated EOB run."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = table.decode(reader)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += reader.receive(r)
                break
            k += 16
            continue
        k += r
        if k > se:
            raise ValueError("AC overflow")
        coef[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _ac_refine(reader, table, coef, ss, se, al, eobrun) -> int:
    """AC successive-approximation refinement for one block (T.81
    G.1.2.3 / libjpeg decode_mcu_AC_refine): already-nonzero
    coefficients consume a correction bit as the scan passes them; new
    coefficients arrive as ±1<<Al after skipping r zero-HISTORY
    positions.  Returns the updated EOB run."""
    p1 = 1 << al
    m1 = -1 << al
    k = ss
    if eobrun == 0:
        while k <= se:
            rs = table.decode(reader)
            r, s = rs >> 4, rs & 15
            if s:
                s_val = p1 if reader.receive(1) else m1
            else:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += reader.receive(r)
                    break
                s_val = 0  # ZRL: skip 16 zero-history positions
            while k <= se:
                if coef[k] != 0:
                    if reader.receive(1) and (coef[k] & p1) == 0:
                        coef[k] += p1 if coef[k] >= 0 else m1
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if s_val and k <= se:
                coef[k] = s_val
            k += 1
    if eobrun > 0:
        while k <= se:
            if coef[k] != 0:
                if reader.receive(1) and (coef[k] & p1) == 0:
                    coef[k] += p1 if coef[k] >= 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


def _decode_progressive(parsed: dict) -> np.ndarray | None:
    comps, H, W = parsed["comps"], parsed["H"], parsed["W"]
    qt = parsed["qt"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    # coefficient accumulators in ZIGZAG order, MCU-padded block grids
    grids = {
        c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64), np.int64)
        for c in comps
    }
    for scan in parsed["scans"]:
        sc = scan["comps"]
        ss, se, ah, al = scan["ss"], scan["se"], scan["ah"], scan["al"]
        segments, ri = scan["segments"], scan["ri"]
        seg_idx = 0
        reader = _BitReader(segments[0])
        preds = [0] * len(sc)
        eobrun = 0
        if len(sc) > 1:
            # interleaved (multi-component DC scans): MCU order.  A
            # single-component scan is ALWAYS non-interleaved per T.81
            # A.2 — its block grid is the component's own ceil(comp/8),
            # which differs from the MCU grid when sampling factors
            # exceed 1 and the image isn't MCU-aligned.
            units = []
            for my in range(mcuy):
                for mx in range(mcux):
                    mcu = []
                    for ci, c in enumerate(sc):
                        for v in range(c["v"]):
                            for h in range(c["h"]):
                                mcu.append(
                                    (ci, grids[c["id"]][my * c["v"] + v,
                                                        mx * c["h"] + h])
                                )
                    units.append(mcu)
        else:
            # non-interleaved: the component's OWN block grid, row-major
            # (T.81 A.2.2: dimensions from the component's sample counts)
            c = sc[0]
            comp_w = -(-W * c["h"] // hmax)
            comp_h = -(-H * c["v"] // vmax)
            nbw = -(-comp_w // 8)
            nbh = -(-comp_h // 8)
            units = [
                [(0, grids[c["id"]][by, bx])]
                for by in range(nbh)
                for bx in range(nbw)
            ]
        for unit_no, mcu in enumerate(units):
            if ri and unit_no > 0 and unit_no % ri == 0:
                seg_idx += 1
                reader = _BitReader(segments[seg_idx])
                preds = [0] * len(sc)
                eobrun = 0
            for ci, coef in mcu:
                if ss == 0:  # DC scan (Se must be 0)
                    if ah == 0:
                        preds[ci] = _dc_first(
                            reader, sc[ci]["dct"], preds[ci], coef, al
                        )
                    elif reader.receive(1):
                        coef[0] |= 1 << al
                else:  # AC scan (single component)
                    table = sc[ci]["act"]
                    if ah == 0:
                        eobrun = _ac_first(
                            reader, table, coef, ss, se, al, eobrun
                        )
                    else:
                        eobrun = _ac_refine(
                            reader, table, coef, ss, se, al, eobrun
                        )
    planes = []
    for c in comps:
        g = grids[c["id"]]
        bh, bw = g.shape[:2]
        plane = np.zeros((bh * 8, bw * 8), np.float64)
        q = qt[c["tq"]]
        for by in range(bh):
            for bx in range(bw):
                block = np.zeros(64, np.float64)
                block[ZIGZAG] = g[by, bx] * q
                plane[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = (
                    _idct2(block.reshape(8, 8)) + 128.0
                )
        planes.append(plane)
    return _finish(planes, comps, H, W, hmax, vmax)


def decode_jpeg(b: bytes) -> np.ndarray | None:
    """Sequential (SOF0/SOF1) AND progressive (SOF2) 8-bit JFIF →
    (H, W, 3) uint8 RGB (grayscale replicates).  Progressive support
    covers spectral selection and successive approximation with EOB
    runs — the scan scripts libjpeg-family encoders emit.  None for
    non-JPEG, arithmetic-coded, lossless, hierarchical, or 12-bit
    payloads (the remaining Pillow seam)."""
    if not b or not b.startswith(b"\xff\xd8"):
        return None
    try:
        parsed = _parse_jpeg(b)
        if parsed is None:
            return None
        if parsed["mode"] == "baseline":
            return _decode_baseline(parsed)
        return _decode_progressive(parsed)
    except (ValueError, IndexError, KeyError, StopIteration, TypeError,
            AttributeError, ZeroDivisionError, OverflowError,
            struct.error):
        # corrupt payloads must return None, never crash the Spark
        # task that fed an arbitrary binary through decode_image_any
        return None


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
    """value -> (code, length), from the shared canonical assignment."""
    return {
        value: (code, length)
        for value, code, length in _canonical_codes(bits, values)
    }


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
