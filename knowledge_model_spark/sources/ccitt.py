"""CCITT Group 4 (T.6) and Group 3 1-D + mixed 2-D (T.4) fax codecs — pure stdlib.

The most common remaining PDF image filter after the row predictors:
fax-era scanned documents embed 1-bit /CCITTFaxDecode (K < 0) image
XObjects, which the reference decodes transparently through PyMuPDF
(knowledge_model/ingestion/parse_pdfs.py:57-88).  This module is the
in-container decode: :func:`g4_decode` / :func:`g3_1d_decode` inflate
G4 (/K < 0) and G3 one-dimensional (/K 0) bit streams to boolean
rasters; :func:`g4_encode` / :func:`g3_1d_encode` are the
independently-written encoder twins used for conformance (the LZW/ADPCM method: encode→decode
round-trip through two separate code paths, plus hand-computed spec
vectors and structural prefix-freeness checks on the code tables in
tests/test_sources.py).

T.6 in brief (all tables public in the ITU-T T.4/T.6 recommendations):
every line is 2-D coded against the previous (reference) line — an
imaginary all-white line for the first — by walking "changing
elements":

- **vertical modes** V0/VR1-3/VL1-3 place the next color change a1
  within ±3 pixels of the reference change b1;
- **pass mode** (0001) skips a reference color span that ends before
  the coding change;
- **horizontal mode** (001) emits two explicit run lengths in T.4
  modified-Huffman codes (terminating 0–63 plus makeup multiples of
  64, color-specific up to 1728, shared extended makeups to 2560);
- the block ends with EOFB (two EOL codes, 2×000000000001).

Scale shape: runs inside Arrow-batched ``mapInPandas`` kernels on the
executors (one payload per row); cost is linear in pixels.
"""

from __future__ import annotations

import numpy as np

# ----------------------------------------------------------- code tables
# T.4 §2.2.2 modified-Huffman run-length codes, as "bit-string" keys.

WHITE_TERMINATING = {
    0: "00110101", 1: "000111", 2: "0111", 3: "1000", 4: "1011",
    5: "1100", 6: "1110", 7: "1111", 8: "10011", 9: "10100",
    10: "00111", 11: "01000", 12: "001000", 13: "000011", 14: "110100",
    15: "110101", 16: "101010", 17: "101011", 18: "0100111",
    19: "0001100", 20: "0001000", 21: "0010111", 22: "0000011",
    23: "0000100", 24: "0101000", 25: "0101011", 26: "0010011",
    27: "0100100", 28: "0011000", 29: "00000010", 30: "00000011",
    31: "00011010", 32: "00011011", 33: "00010010", 34: "00010011",
    35: "00010100", 36: "00010101", 37: "00010110", 38: "00010111",
    39: "00101000", 40: "00101001", 41: "00101010", 42: "00101011",
    43: "00101100", 44: "00101101", 45: "00000100", 46: "00000101",
    47: "00001010", 48: "00001011", 49: "01010010", 50: "01010011",
    51: "01010100", 52: "01010101", 53: "00100100", 54: "00100101",
    55: "01011000", 56: "01011001", 57: "01011010", 58: "01011011",
    59: "01001010", 60: "01001011", 61: "00110010", 62: "00110011",
    63: "00110100",
}

WHITE_MAKEUP = {
    64: "11011", 128: "10010", 192: "010111", 256: "0110111",
    320: "00110110", 384: "00110111", 448: "01100100", 512: "01100101",
    576: "01101000", 640: "01100111", 704: "011001100",
    768: "011001101", 832: "011010010", 896: "011010011",
    960: "011010100", 1024: "011010101", 1088: "011010110",
    1152: "011010111", 1216: "011011000", 1280: "011011001",
    1344: "011011010", 1408: "011011011", 1472: "010011000",
    1536: "010011001", 1600: "010011010", 1664: "011000",
    1728: "010011011",
}

BLACK_TERMINATING = {
    0: "0000110111", 1: "010", 2: "11", 3: "10", 4: "011", 5: "0011",
    6: "0010", 7: "00011", 8: "000101", 9: "000100", 10: "0000100",
    11: "0000101", 12: "0000111", 13: "00000100", 14: "00000111",
    15: "000011000", 16: "0000010111", 17: "0000011000",
    18: "0000001000", 19: "00001100111", 20: "00001101000",
    21: "00001101100", 22: "00000110111", 23: "00000101000",
    24: "00000010111", 25: "00000011000", 26: "000011001010",
    27: "000011001011", 28: "000011001100", 29: "000011001101",
    30: "000001101000", 31: "000001101001", 32: "000001101010",
    33: "000001101011", 34: "000011010010", 35: "000011010011",
    36: "000011010100", 37: "000011010101", 38: "000011010110",
    39: "000011010111", 40: "000001101100", 41: "000001101101",
    42: "000011011010", 43: "000011011011", 44: "000001010100",
    45: "000001010101", 46: "000001010110", 47: "000001010111",
    48: "000001100100", 49: "000001100101", 50: "000001010010",
    51: "000001010011", 52: "000000100100", 53: "000000110111",
    54: "000000111000", 55: "000000100111", 56: "000000101000",
    57: "000001011000", 58: "000001011001", 59: "000000101011",
    60: "000000101100", 61: "000001011010", 62: "000001100110",
    63: "000001100111",
}

BLACK_MAKEUP = {
    64: "0000001111", 128: "000011001000", 192: "000011001001",
    256: "000001011011", 320: "000000110011", 384: "000000110100",
    448: "000000110101", 512: "0000001101100", 576: "0000001101101",
    640: "0000001001010", 704: "0000001001011", 768: "0000001001100",
    832: "0000001001101", 896: "0000001110010", 960: "0000001110011",
    1024: "0000001110100", 1088: "0000001110101", 1152: "0000001110110",
    1216: "0000001110111", 1280: "0000001010010", 1344: "0000001010011",
    1408: "0000001010100", 1472: "0000001010101", 1536: "0000001011010",
    1600: "0000001011011", 1664: "0000001100100", 1728: "0000001100101",
}

# T.4 §2.2.3 extended makeup codes 1792-2560, shared by both colors.
EXT_MAKEUP = {
    1792: "00000001000", 1856: "00000001100", 1920: "00000001101",
    1984: "000000010010", 2048: "000000010011", 2112: "000000010100",
    2176: "000000010101", 2240: "000000010110", 2304: "000000010111",
    2368: "000000011100", 2432: "000000011101", 2496: "000000011110",
    2560: "000000011111",
}

# T.6 §4.2.1 two-dimensional mode codes.
MODE_CODES = {
    "1": ("V", 0), "011": ("V", 1), "000011": ("V", 2),
    "0000011": ("V", 3), "010": ("V", -1), "000010": ("V", -2),
    "0000010": ("V", -3), "001": ("H", 0), "0001": ("P", 0),
}

EOFB = "000000000001" * 2

# decode lookup: bitstring -> (run, is_terminating), per color
_WHITE_DECODE = {
    **{c: (r, True) for r, c in WHITE_TERMINATING.items()},
    **{c: (r, False) for r, c in WHITE_MAKEUP.items()},
    **{c: (r, False) for r, c in EXT_MAKEUP.items()},
}
_BLACK_DECODE = {
    **{c: (r, True) for r, c in BLACK_TERMINATING.items()},
    **{c: (r, False) for r, c in BLACK_MAKEUP.items()},
    **{c: (r, False) for r, c in EXT_MAKEUP.items()},
}
_MAX_CODE_LEN = 14


class _BitReader:
    """MSB-first bit cursor over bytes."""

    def __init__(self, data: bytes):
        self.bits = np.unpackbits(np.frombuffer(data, np.uint8))
        self.pos = 0

    def read_bit(self) -> int | None:
        if self.pos >= len(self.bits):
            return None
        b = int(self.bits[self.pos])
        self.pos += 1
        return b

    def peek(self, n: int) -> str:
        end = min(self.pos + n, len(self.bits))
        return "".join("1" if b else "0" for b in self.bits[self.pos : end])


def _read_mode(r: _BitReader) -> tuple[str, int] | None:
    """Next 2-D mode code (longest is 7 bits; EOFB checked first)."""
    if r.peek(len(EOFB)) == EOFB:
        return ("EOFB", 0)
    acc = ""
    for _ in range(7):
        b = r.read_bit()
        if b is None:
            return None
        acc += "1" if b else "0"
        if acc in MODE_CODES:
            return MODE_CODES[acc]
    return None  # invalid / extension code: refuse


def _read_run(r: _BitReader, white: bool) -> int | None:
    """One complete MH run length (makeups + terminating code)."""
    table = _WHITE_DECODE if white else _BLACK_DECODE
    total = 0
    while True:
        acc = ""
        hit = None
        for _ in range(_MAX_CODE_LEN):
            b = r.read_bit()
            if b is None:
                return None
            acc += "1" if b else "0"
            if acc in table:
                hit = table[acc]
                break
        if hit is None:
            return None
        run, terminating = hit
        total += run
        if terminating:
            return total


def _transitions(row: np.ndarray) -> list[int]:
    """Positions where the pixel color changes (line starts white)."""
    padded = np.concatenate([[False], row])
    return list(np.nonzero(padded[1:] != padded[:-1])[0])


def _next_b1_b2(ref: list[int], a0: int, color_black: bool) -> tuple[int, int]:
    """(b1, b2) per T.6 §4.2.1.3: b1 = first reference changing element
    right of a0 with color opposite a0's color; b2 = the next after b1.
    ``ref`` holds transition positions (even index = white→black);
    returns line-width sentinels when exhausted (caller supplies them
    by appending W, W)."""
    import bisect

    i = bisect.bisect_right(ref, a0)
    # transition at even index turns the pixel black; we need b1 to be a
    # transition to the color OPPOSITE the coding color
    want_even = not color_black  # coding white → b1 is a to-black change
    if i < len(ref) - 2 and (i % 2 == 0) != want_even:
        i += 1
    b1 = ref[i] if i < len(ref) else ref[-1]
    b2 = ref[i + 1] if i + 1 < len(ref) else ref[-1]
    return b1, b2


def _decode_2d_line(
    r: _BitReader, ref: list[int], columns: int
) -> list[int] | None:
    """Decode ONE 2-D coded line (T.6 §4.2.1 — also the 2-D line form
    of mixed-mode T.4) against ``ref``; returns the coded transition
    list, or None on malformed input."""
    cur: list[int] = []
    a0 = -1
    black = False
    while a0 < columns:
        mode = _read_mode(r)
        if mode is None:
            return None
        kind, delta = mode
        if kind == "EOFB":
            return None  # EOFB/EOL mid-line: malformed
        b1, b2 = _next_b1_b2(ref, a0, black)
        if kind == "P":
            a0 = b2
            continue
        if kind == "V":
            a1 = b1 + delta
            if a1 < 0 or a1 < a0:
                return None
            cur.append(a1)
            a0 = a1
            black = not black
            continue
        # horizontal: two explicit runs of (current, opposite) color
        r1 = _read_run(r, white=not black)
        if r1 is None:
            return None
        r2 = _read_run(r, white=black)
        if r2 is None:
            return None
        start = max(a0, 0)
        a1 = start + r1
        a2 = a1 + r2
        if a2 < a1 or a1 < start:
            return None
        cur.append(a1)
        cur.append(a2)
        a0 = a2
    return cur


def _decode_1d_line(r: _BitReader, columns: int) -> np.ndarray | None:
    """Decode ONE 1-D MH line (white-first run alternation summing to
    exactly ``columns``)."""
    line = np.zeros(columns, bool)
    pos = 0
    white = True
    while pos < columns:
        run = _read_run(r, white=white)
        if run is None or pos + run > columns:
            return None
        if not white:
            line[pos : pos + run] = True
        pos += run
        white = not white
    return line


def _line_from_flips(cur: list[int], columns: int) -> np.ndarray:
    """Coded transition list → bool line (True = black)."""
    line = np.zeros(columns, bool)
    flips = [t for t in cur if t < columns]
    for i in range(0, len(flips) - len(flips) % 2, 2):
        line[flips[i] : flips[i + 1]] = True
    if len(flips) % 2:
        line[flips[-1] :] = True
    return line


def g4_decode(
    data: bytes,
    columns: int,
    rows: int | None = None,
    byte_align: bool = False,
) -> np.ndarray | None:
    """G4 bit stream → (rows, columns) bool raster (True = black), or
    None for a malformed stream.  Decodes until EOFB, stream end, or
    ``rows`` lines when given (PDF /Rows); ``byte_align`` consumes the
    per-line fill bits ``/EncodedByteAlign true`` writers insert."""
    if columns <= 0 or not data:
        return None
    r = _BitReader(data)
    ref: list[int] = [columns, columns]  # imaginary all-white line
    out: list[np.ndarray] = []
    while rows is None or len(out) < rows:
        if r.pos >= len(r.bits) or r.peek(len(EOFB)) == EOFB:
            break
        if not r.bits[r.pos :].any():
            break  # zero padding to the byte boundary, no further lines
        cur = _decode_2d_line(r, ref, columns)
        if cur is None:
            return None
        out.append(_line_from_flips(cur, columns))
        ref = [t for t in cur if t <= columns] + [columns, columns]
        if byte_align:
            r.pos += -r.pos % 8
    if rows is not None and len(out) != rows:
        return None
    if not out:
        return None
    return np.stack(out)


def _encode_run(run: int, white: bool) -> str:
    """MH code string for one run length (makeups then terminating)."""
    term = WHITE_TERMINATING if white else BLACK_TERMINATING
    makeup = WHITE_MAKEUP if white else BLACK_MAKEUP
    bits = ""
    while run >= 2624:  # 2560 + 63 headroom keeps every residual codable
        bits += EXT_MAKEUP[2560]
        run -= 2560
    if run >= 64:
        m = (run // 64) * 64
        bits += EXT_MAKEUP[m] if m > 1728 else makeup[m]
        run -= m
    return bits + term[run]


def _encode_2d_line(row: np.ndarray, ref: list[int], columns: int) -> str:
    """ONE line 2-D coded against ``ref`` (greedy mode choice per T.6
    §4.2.1: pass when b2 < a1, vertical within ±3, horizontal
    otherwise)."""
    cur = _transitions(row) + [columns, columns]
    bits: list[str] = []
    a0 = -1
    black = False
    ci = 0  # index into cur of the next coding change a1
    while a0 < columns:
        a1 = cur[ci] if ci < len(cur) else columns
        b1, b2 = _next_b1_b2(ref, a0, black)
        if b2 < a1:
            bits.append("0001")  # pass
            a0 = b2
            continue
        d = a1 - b1
        if -3 <= d <= 3:
            bits.append(
                {0: "1", 1: "011", 2: "000011", 3: "0000011",
                 -1: "010", -2: "000010", -3: "0000010"}[d]
            )
            a0 = a1
            black = not black
            ci += 1
            continue
        a2 = cur[ci + 1] if ci + 1 < len(cur) else columns
        start = max(a0, 0)
        bits.append("001")
        bits.append(_encode_run(a1 - start, white=not black))
        bits.append(_encode_run(a2 - a1, white=black))
        a0 = a2
        ci += 2
    return "".join(bits)


def _encode_1d_line(row: np.ndarray, columns: int) -> str:
    """ONE line 1-D MH coded (white-first alternation; a line starting
    black gets a zero-length white run — a real MH code, not a hack)."""
    trans = _transitions(row) + [columns]
    bits: list[str] = []
    pos = 0
    white = True
    ti = 0
    while pos < columns:
        nxt = trans[ti] if ti < len(trans) else columns
        bits.append(_encode_run(nxt - pos, white=white))
        pos = nxt
        white = not white
        ti += 1
    return "".join(bits)


def _pack_bits(s: str) -> bytes:
    s += "0" * (-len(s) % 8)
    return np.packbits(np.frombuffer(s.encode(), np.uint8) - ord("0")).tobytes()


def g4_encode(bitmap: np.ndarray, byte_align: bool = False) -> bytes:
    """(rows, columns) bool raster (True = black) → G4 stream ending in
    EOFB, zero-padded to a byte boundary.  Written independently of the
    decoder so round-trip identity is a real conformance check, not a
    shared-code tautology.  ``byte_align`` zero-fills each line to a
    byte boundary (the /EncodedByteAlign writer convention)."""
    bitmap = np.asarray(bitmap, bool)
    rows, columns = bitmap.shape
    bits: list[str] = []
    n = 0
    ref = [columns, columns]
    for y in range(rows):
        line = _encode_2d_line(bitmap[y], ref, columns)
        bits.append(line)
        n += len(line)
        if byte_align and n % 8:
            bits.append("0" * (-n % 8))
            n += -n % 8
        ref = _transitions(bitmap[y]) + [columns, columns]
    bits.append(EOFB)
    return _pack_bits("".join(bits))


# ------------------------------------------------------- Group 3 one-dimensional


def _consume_eols(r: _BitReader) -> None:
    """Consume any fill bits + EOL codes at the cursor (T.4 §2.2: EOL =
    eleven+ zeros then a one; no run code carries more than 7 leading
    zeros, so ≥11 zeros unambiguously starts an EOL).  A zero-run that
    reaches stream end is left in place — the caller's all-zero check
    treats it as trailing pad."""
    while True:
        zeros = 0
        while r.pos + zeros < len(r.bits) and not r.bits[r.pos + zeros]:
            zeros += 1
        if zeros < 11 or r.pos + zeros >= len(r.bits):
            return  # no EOL here (or only trailing pad): done
        r.pos += zeros + 1  # through the terminating 1


def g3_1d_decode(
    data: bytes,
    columns: int,
    rows: int | None = None,
    byte_align: bool = False,
) -> np.ndarray | None:
    """CCITT Group 3 one-dimensional (T.4 MH, PDF ``/K 0``) → (rows,
    columns) bool raster (True = black), or None.  Each line is a
    white-first alternation of MH run codes summing exactly to
    ``columns``; optional EOLs (with fill) between lines are consumed,
    none are required (the PDF default EndOfLine=false); ``byte_align``
    consumes the per-line fill of /EncodedByteAlign writers."""
    if columns <= 0 or not data:
        return None
    r = _BitReader(data)
    out: list[np.ndarray] = []
    while rows is None or len(out) < rows:
        _consume_eols(r)
        if r.pos >= len(r.bits) or not r.bits[r.pos :].any():
            break  # stream end / zero padding
        line = _decode_1d_line(r, columns)
        if line is None:
            return None
        out.append(line)
        if byte_align:
            r.pos += -r.pos % 8
    if rows is not None and len(out) != rows:
        return None
    if not out:
        return None
    return np.stack(out)


def g3_1d_encode(
    bitmap: np.ndarray, with_eol: bool = False, byte_align: bool = False
) -> bytes:
    """(rows, columns) bool raster → T.4 1-D MH stream (encoder twin of
    :func:`g3_1d_decode`; ``with_eol`` prefixes every line with an EOL
    the way tape-era G3 writers did, ``byte_align`` zero-fills each
    line to a byte boundary — both exercising the decoder's framing
    tolerance)."""
    bitmap = np.asarray(bitmap, bool)
    _, columns = bitmap.shape
    bits: list[str] = []
    n = 0
    for row in bitmap:
        if with_eol:
            bits.append("000000000001")
            n += 12
        line = _encode_1d_line(row, columns)
        bits.append(line)
        n += len(line)
        if byte_align and n % 8:
            bits.append("0" * (-n % 8))
            n += -n % 8
    return _pack_bits("".join(bits))


# --------------------------------------------------- Group 3 mixed (K > 0)


def g3_mixed_decode(
    data: bytes, columns: int, rows: int | None = None
) -> np.ndarray | None:
    """CCITT Group 3 two-dimensional / mixed mode (T.4 §4.2, PDF
    ``/K > 0``): every line is framed by EOL + one tag bit — 1 selects
    a 1-D MH line, 0 a 2-D line coded against the previous line (the
    same vertical/pass/horizontal modes as G4).  K itself only bounds
    how many 2-D lines may follow a 1-D line; the tag bits carry the
    actual per-line choice, so the decoder needs no K."""
    if columns <= 0 or not data:
        return None
    r = _BitReader(data)
    out: list[np.ndarray] = []
    ref: list[int] = [columns, columns]
    # position of the last set bit, computed ONCE — the loop-top
    # trailing-zeros test and the RTC test below would otherwise scan
    # the whole remaining stream per line (O(rows × bits))
    _ones = np.flatnonzero(r.bits)
    last_one = int(_ones[-1]) if _ones.size else -1
    while rows is None or len(out) < rows:
        _consume_eols(r)
        if r.pos >= len(r.bits) or r.pos > last_one:
            break  # stream end / RTC-style trailing zeros
        tag = r.read_bit()
        if tag is None:
            break
        if tag == 1:  # 1-D line
            # RTC trailer (T.4 §2.2.3: six EOL+tag-1 sequences): after
            # a tag-1 that is part of the trailer, the next bits are
            # another EOL (≥11 zeros — no MH run code carries more
            # than 7 leading zeros) or only trailing pad.  Treat that
            # as end-of-data instead of a malformed 1-D line, so
            # rows=None streams with a spec-legal RTC still decode.
            # An 11-bit window is exact: first-one-at-≥11 and
            # no-one-at-all both mean "not a decodable 1-D line".
            if not r.bits[r.pos : r.pos + 11].any():
                break
            line = _decode_1d_line(r, columns)
            if line is None:
                return None
        else:  # 2-D line against the previous line
            cur = _decode_2d_line(r, ref, columns)
            if cur is None:
                return None
            line = _line_from_flips(cur, columns)
        out.append(line)
        ref = _transitions(line) + [columns, columns]
    if rows is not None and len(out) != rows:
        return None
    if not out:
        return None
    return np.stack(out)


def g3_mixed_encode(bitmap: np.ndarray, k: int = 4) -> bytes:
    """Encoder twin of :func:`g3_mixed_decode`: every K-th line 1-D
    (starting with line 0, as T.4 requires after each EOL-reset), the
    rest 2-D against the previous line; each line framed EOL + tag."""
    bitmap = np.asarray(bitmap, bool)
    rows, columns = bitmap.shape
    bits: list[str] = []
    ref = [columns, columns]
    for y in range(rows):
        one_d = y % max(1, k) == 0
        bits.append("000000000001" + ("1" if one_d else "0"))
        if one_d:
            bits.append(_encode_1d_line(bitmap[y], columns))
        else:
            bits.append(_encode_2d_line(bitmap[y], ref, columns))
        ref = _transitions(bitmap[y]) + [columns, columns]
    return _pack_bits("".join(bits))
