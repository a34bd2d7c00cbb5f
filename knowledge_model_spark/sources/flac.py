"""REAL in-repo FLAC codec: subset decoder + encoder twin.

Closes the one audio-codec seam that fits the refuse-never-misdecode
policy with honest in-container anchoring (r10 verdict item 8): FLAC is
LOSSLESS, so an in-repo encoder twin gives bit-exact round-trip gates —
the CCITT/TIFF recipe — unlike the declined perceptual codecs (MP3,
AAC) whose correctness can't be anchored without golden files.

Reference: the FLAC format specification (RFC 9639 / xiph.org format
docs).  The reference pipeline's audio surface is the same
librosa/ffmpeg seam as WAV/AIFF (knowledge_model ingests documents
only; multimodal columns are this engine's §2.11 extension).

Decoder coverage (``decode_flac``):
- STREAMINFO metadata block (all other block types skipped by length,
  last-metadata flag honored)
- frame headers: both blocking strategies, all block-size codes
  (including 8/16-bit end-of-header forms), sample-rate codes 0000 and
  the end-of-header forms, sample-size codes, CRC-8 verified
- channel assignments: independent (mono/stereo) AND left/side,
  right/side, mid/side (side channel decoded at bps+1 per spec)
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (quantized coefficients + signed shift), wasted-bits unary prefix
- residual: 4-bit (method 00) and 5-bit (method 01) Rice parameters,
  any partition order, escape partitions (raw n-bit residuals)
- frame CRC-16 verified; STREAMINFO MD5 of the decoded stream verified
  when present (non-zero)

REFUSED (return None, never misdecoded): non-subset sample rates in
STREAMINFO (0), bps other than 8/12/16/20/24, reserved subframe types,
CRC mismatches, truncated streams.

The encoder twin (``encode_flac``) writes genuine spec streams and
deliberately rotates the decoder's whole surface: per-frame it cycles
subframe strategies (best-FIXED, VERBATIM, CONSTANT where possible,
and an LPC form of the order-1 predictor), partition orders 0/1, Rice
method 00/01, and for stereo inputs the four channel assignments.
Every stream carries the true STREAMINFO MD5, so a decoder bug cannot
round-trip silently.
"""

from __future__ import annotations

import hashlib
import struct

import numpy as np

_FIXED_COEFFS: dict[int, list[int]] = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}


# ------------------------------------------------------------ bit I/O


class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, bits: int) -> None:
        if bits == 0:
            return
        value &= (1 << bits) - 1
        self._acc = (self._acc << bits) | value
        self._n += bits
        while self._n >= 8:
            self._n -= 8
            self.buf.append((self._acc >> self._n) & 0xFF)
        self._acc &= (1 << self._n) - 1

    def write_signed(self, value: int, bits: int) -> None:
        self.write(value & ((1 << bits) - 1), bits)

    def write_unary(self, q: int) -> None:
        # FLAC unary: q zero bits terminated by a single 1 bit
        while q >= 32:
            self.write(0, 32)
            q -= 32
        self.write(1, q + 1)

    def align(self) -> None:
        if self._n:
            self.write(0, 8 - self._n)

    def getvalue(self) -> bytes:
        assert self._n == 0
        return bytes(self.buf)


class _BitReader:
    def __init__(self, b: bytes, byte_pos: int = 0) -> None:
        self.b = b
        self.pos = byte_pos * 8  # absolute bit position

    def read(self, bits: int) -> int:
        if self.pos + bits > len(self.b) * 8:
            raise EOFError
        out = 0
        pos = self.pos
        remaining = bits
        while remaining:
            byte = self.b[pos >> 3]
            off = pos & 7
            take = min(8 - off, remaining)
            chunk = (byte >> (8 - off - take)) & ((1 << take) - 1)
            out = (out << take) | chunk
            pos += take
            remaining -= take
        self.pos = pos
        return out

    def read_signed(self, bits: int) -> int:
        v = self.read(bits)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v

    def read_unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:  # corrupt stream guard
                raise EOFError
        return q

    def align(self) -> None:
        self.pos = (self.pos + 7) & ~7

    def byte_pos(self) -> int:
        assert self.pos % 8 == 0
        return self.pos // 8


# ------------------------------------------------------------- CRCs


def _crc8(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07 if crc & 0x80 else crc << 1) & 0xFF
    return crc


def _crc16(data: bytes) -> int:
    crc = 0
    for byte in data:
        crc ^= byte << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005 if crc & 0x8000 else crc << 1) & 0xFFFF
    return crc


# ------------------------------------------- extended UTF-8 numbers


def _write_utf8_number(w: _BitWriter, n: int) -> None:
    if n < 0x80:
        w.write(n, 8)
        return
    # count of continuation bytes
    for nbytes in range(1, 7):
        if n < (1 << (6 - nbytes + 6 * nbytes)):
            break
    w.write((0xFF << (7 - nbytes)) & 0xFF | (n >> (6 * nbytes)), 8)
    for i in range(nbytes - 1, -1, -1):
        w.write(0x80 | ((n >> (6 * i)) & 0x3F), 8)


def _read_utf8_number(r: _BitReader) -> int | None:
    first = r.read(8)
    if first < 0x80:
        return first
    nbytes = 0
    mask = 0x40
    while first & mask:
        nbytes += 1
        mask >>= 1
    if nbytes < 1 or nbytes > 6:
        return None
    n = first & (mask - 1)
    for _ in range(nbytes):
        c = r.read(8)
        if c & 0xC0 != 0x80:
            return None
        n = (n << 6) | (c & 0x3F)
    return n


# ----------------------------------------------------------- decoder

_SAMPLE_SIZE_CODES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24}
_BLOCK_SIZE_CODES = {1: 192, **{i: 576 << (i - 2) for i in range(2, 6)},
                     **{i: 256 << (i - 8) for i in range(8, 16)}}
_RATE_CODES = {
    1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000, 6: 22050,
    7: 24000, 8: 32000, 9: 44100, 10: 48000, 11: 96000,
}


def _decode_residual(
    r: _BitReader, blocksize: int, order: int
) -> list[int] | None:
    method = r.read(2)
    if method > 1:
        return None  # reserved coding method
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    part_order = r.read(4)
    n_parts = 1 << part_order
    if blocksize % n_parts or blocksize // n_parts <= (
        order if part_order == 0 else 0
    ):
        if blocksize // n_parts < order and part_order > 0:
            return None
    res: list[int] = []
    for p in range(n_parts):
        n = blocksize // n_parts - (order if p == 0 else 0)
        if n < 0:
            return None
        param = r.read(plen)
        if param == escape:
            raw_bits = r.read(5)
            for _ in range(n):
                res.append(r.read_signed(raw_bits) if raw_bits else 0)
        else:
            for _ in range(n):
                q = r.read_unary()
                u = (q << param) | (r.read(param) if param else 0)
                res.append((u >> 1) ^ -(u & 1))
    return res


def _decode_subframe(
    r: _BitReader, blocksize: int, bps: int
) -> np.ndarray | None:
    if r.read(1) != 0:
        return None  # mandatory zero pad bit
    ftype = r.read(6)
    wasted = 0
    if r.read(1):
        wasted = r.read_unary() + 1
    eff = bps - wasted
    if eff <= 0:
        return None
    out: np.ndarray
    if ftype == 0:  # CONSTANT
        v = r.read_signed(eff)
        out = np.full(blocksize, v, dtype=np.int64)
    elif ftype == 1:  # VERBATIM
        out = np.fromiter(
            (r.read_signed(eff) for _ in range(blocksize)),
            dtype=np.int64, count=blocksize,
        )
    elif 8 <= ftype <= 12:  # FIXED order 0-4
        order = ftype - 8
        warm = [r.read_signed(eff) for _ in range(order)]
        res = _decode_residual(r, blocksize, order)
        if res is None or len(res) != blocksize - order:
            return None
        coefs = _FIXED_COEFFS[order]
        samples = list(warm)
        for e in res:
            pred = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append(pred + e)
        out = np.asarray(samples, dtype=np.int64)
    elif ftype >= 32:  # LPC, order = low 5 bits + 1
        order = (ftype & 0x1F) + 1
        warm = [r.read_signed(eff) for _ in range(order)]
        prec = r.read(4)
        if prec == 0xF:
            return None  # invalid per spec
        prec += 1
        shift = r.read_signed(5)
        if shift < 0:
            return None  # negative shift is spec-reserved in practice
        coefs = [r.read_signed(prec) for _ in range(order)]
        res = _decode_residual(r, blocksize, order)
        if res is None or len(res) != blocksize - order:
            return None
        samples = list(warm)
        for e in res:
            acc = sum(c * samples[-i - 1] for i, c in enumerate(coefs))
            samples.append((acc >> shift) + e)
        out = np.asarray(samples, dtype=np.int64)
    else:
        return None  # reserved subframe type
    if wasted:
        out = out << wasted
    return out


def decode_flac(b: bytes) -> tuple[np.ndarray, int] | None:
    """FLAC → (mono float32 waveform in [-1, 1], sample_rate).

    Stereo downmixes by mean AFTER exact integer reconstruction (the
    decode_wav_pcm16 convention).  None for non-FLAC payloads, any
    construct outside the documented subset, CRC mismatch, or — when
    STREAMINFO carries a non-zero MD5 — an MD5 mismatch of the decoded
    stream (a wrong decode can never round-trip silently)."""
    if len(b) < 42 or b[:4] != b"fLaC":
        return None
    try:
        pos = 4
        info = None
        while True:
            if pos + 4 > len(b):
                return None
            hdr = b[pos]
            last, btype = hdr & 0x80, hdr & 0x7F
            length = int.from_bytes(b[pos + 1 : pos + 4], "big")
            body = b[pos + 4 : pos + 4 + length]
            if btype == 0:
                if length != 34:
                    return None
                r = _BitReader(body)
                r.read(16)  # min blocksize
                r.read(16)  # max blocksize
                r.read(24)
                r.read(24)
                rate = r.read(20)
                channels = r.read(3) + 1
                bps = r.read(5) + 1
                total = r.read(36)
                md5 = body[18:34]
                info = (rate, channels, bps, total, md5)
            pos += 4 + length
            if last:
                break
        if info is None:
            return None
        rate, channels, bps, total, md5 = info
        if rate == 0 or bps not in (8, 12, 16, 20, 24) or channels > 8:
            return None

        chans: list[list[int]] = [[] for _ in range(channels)]
        n_done = 0
        while pos < len(b) and (total == 0 or n_done < total):
            frame_start = pos
            r = _BitReader(b, pos)
            sync = r.read(14)
            if sync != 0x3FFE:
                return None
            if r.read(1) != 0:
                return None
            r.read(1)  # blocking strategy (number semantics only)
            bs_code = r.read(4)
            rate_code = r.read(4)
            chan_code = r.read(4)
            size_code = r.read(3)
            if r.read(1) != 0:
                return None
            if _read_utf8_number(r) is None:
                return None
            if bs_code == 0:
                return None
            elif bs_code == 6:
                blocksize = r.read(8) + 1
            elif bs_code == 7:
                blocksize = r.read(16) + 1
            else:
                blocksize = _BLOCK_SIZE_CODES[bs_code]
            if rate_code == 0:
                pass
            elif rate_code in _RATE_CODES:
                if _RATE_CODES[rate_code] != rate:
                    return None
            elif rate_code == 12:
                if r.read(8) * 1000 != rate:
                    return None
            elif rate_code == 13:
                if r.read(16) != rate:
                    return None
            elif rate_code == 14:
                if r.read(16) * 10 != rate:
                    return None
            else:
                return None
            if size_code == 0:
                frame_bps = bps
            elif size_code in _SAMPLE_SIZE_CODES:
                frame_bps = _SAMPLE_SIZE_CODES[size_code]
                if frame_bps != bps:
                    return None
            else:
                return None
            r.align()
            hp = r.byte_pos()
            if hp >= len(b) or _crc8(b[frame_start:hp]) != b[hp]:
                return None
            r.pos += 8  # consume the CRC-8 byte

            if chan_code < 8:
                if chan_code + 1 != channels:
                    return None
                subs = []
                for _ in range(channels):
                    s = _decode_subframe(r, blocksize, frame_bps)
                    if s is None:
                        return None
                    subs.append(s)
            elif chan_code in (8, 9, 10):
                if channels != 2:
                    return None
                bps_a = frame_bps + (1 if chan_code == 9 else 0)
                bps_b = frame_bps + (1 if chan_code in (8, 10) else 0)
                a = _decode_subframe(r, blocksize, bps_a)
                bch = _decode_subframe(r, blocksize, bps_b)
                if a is None or bch is None:
                    return None
                if chan_code == 8:  # left/side
                    left, side = a, bch
                    subs = [left, left - side]
                elif chan_code == 9:  # right/side
                    side, right = a, bch
                    subs = [right + side, right]
                else:  # mid/side
                    mid, side = a, bch
                    left = ((mid << 1) | (side & 1)) + side >> 1
                    subs = [left, left - side]
            else:
                return None
            r.align()
            crc_at = r.byte_pos()
            if crc_at + 2 > len(b):
                return None
            if _crc16(b[frame_start:crc_at]) != int.from_bytes(
                b[crc_at : crc_at + 2], "big"
            ):
                return None
            pos = crc_at + 2
            for c in range(channels):
                chans[c].extend(int(v) for v in subs[c])
            n_done += blocksize

        arrs = [np.asarray(c, dtype=np.int64) for c in chans]
        if total:
            if any(len(a) < total for a in arrs):
                return None
            arrs = [a[:total] for a in arrs]
        if md5 != b"\x00" * 16:
            h = hashlib.md5()
            nbytes = (bps + 7) // 8
            inter = np.empty(len(arrs[0]) * channels, dtype=np.int64)
            for c in range(channels):
                inter[c::channels] = arrs[c]
            raw = bytearray()
            for v in inter.tolist():
                raw += int(v).to_bytes(nbytes, "little", signed=True)
            h.update(bytes(raw))
            if h.digest() != md5:
                return None
        mono = (
            arrs[0].astype(np.float64)
            if channels == 1
            else np.mean([a.astype(np.float64) for a in arrs], axis=0)
        )
        return (mono / float(1 << (bps - 1))).astype(np.float32), int(rate)
    except (EOFError, KeyError, IndexError, struct.error):
        return None


# ----------------------------------------------------------- encoder


def _rice_param(zigzag: list[int]) -> int:
    if not zigzag:
        return 0
    mean = sum(zigzag) / len(zigzag)
    p = 0
    while (1 << (p + 1)) < mean + 1 and p < 14:
        p += 1
    return p


def _write_residual(
    w: _BitWriter, res: list[int], order: int, blocksize: int,
    part_order: int, method: int, force_escape: bool = False,
) -> None:
    plen = 4 if method == 0 else 5
    escape = (1 << plen) - 1
    w.write(method, 2)
    w.write(part_order, 4)
    n_parts = 1 << part_order
    at = 0
    for p in range(n_parts):
        n = blocksize // n_parts - (order if p == 0 else 0)
        part = res[at : at + n]
        at += n
        zz = [(v << 1) if v >= 0 else (((-v) << 1) - 1) for v in part]
        param = _rice_param(zz)
        # escape to raw coding when rice would be pathological
        max_need = max((v.bit_length() + 1 for v in part), default=1)
        rice_bits = sum((u >> param) + 1 + param for u in zz)
        if (force_escape or rice_bits > n * (max_need + 2)) and max_need <= 31:
            w.write(escape, plen)
            w.write(max_need, 5)
            for v in part:
                w.write_signed(v, max_need)
            continue
        if param >= escape:
            param = escape - 1
        w.write(param, plen)
        for u in zz:
            w.write_unary(u >> param)
            if param:
                w.write(u & ((1 << param) - 1), param)


def _encode_subframe(
    w: _BitWriter, samples: np.ndarray, bps: int, strategy: str,
    part_order: int, method: int, force_escape: bool = False,
) -> None:
    blocksize = len(samples)
    s = [int(v) for v in samples]
    if strategy == "constant" and len(set(s)) == 1:
        w.write(0, 1)
        w.write(0, 6)
        w.write(0, 1)
        w.write_signed(s[0], bps)
        return
    if strategy == "verbatim":
        w.write(0, 1)
        w.write(1, 6)
        w.write(0, 1)
        for v in s:
            w.write_signed(v, bps)
        return
    if strategy == "lpc1" and blocksize > 1:
        # genuine LPC subframe: order-1 predictor coeff [1], shift 0
        order = 1
        w.write(0, 1)
        w.write(0x20 | (order - 1), 6)
        w.write(0, 1)
        w.write_signed(s[0], bps)
        w.write(14, 4)  # precision 15
        w.write_signed(0, 5)  # shift 0
        w.write_signed(1, 15)  # the single coefficient
        res = [s[i] - s[i - 1] for i in range(order, blocksize)]
        _write_residual(w, res, order, blocksize, part_order, method,
                        force_escape)
        return
    # best FIXED order 0-2 by residual magnitude; shared trailing zero
    # bits come off as a wasted-bits prefix (exercises the decoder's
    # unary wasted path exactly as real encoders of shifted material do)
    wasted = 0
    nonzero = [v for v in s if v != 0]
    if nonzero:
        wasted = min((v & -v).bit_length() - 1 for v in nonzero)
        wasted = min(wasted, bps - 2)
    if wasted:
        s = [v >> wasted for v in s]
    eff = bps - wasted
    best_order, best_res, best_cost = 0, s[:], None
    for order in range(0, 3):
        if blocksize <= order:
            break
        coefs = _FIXED_COEFFS[order]
        res = [
            s[i] - sum(c * s[i - j - 1] for j, c in enumerate(coefs))
            for i in range(order, blocksize)
        ]
        cost = sum(abs(v) for v in res)
        if best_cost is None or cost < best_cost:
            best_order, best_res, best_cost = order, res, cost
    order = best_order
    w.write(0, 1)
    w.write(8 + order, 6)
    if wasted:
        w.write(1, 1)
        w.write_unary(wasted - 1)
    else:
        w.write(0, 1)
    for v in s[:order]:
        w.write_signed(v, eff)
    _write_residual(w, best_res, order, blocksize, part_order, method,
                    force_escape)


def encode_flac(
    pcm: np.ndarray, rate: int, blocksize: int = 1024
) -> bytes:
    """Encoder twin: int16 samples (1-D mono or (n, 2) stereo) → a
    genuine FLAC stream carrying the true STREAMINFO MD5.

    Deliberately rotates the decoder surface per frame: subframe
    strategy (best-FIXED / VERBATIM / LPC-form order-1 / CONSTANT when
    possible), Rice partition order 0/1, coding method 00/01, and for
    stereo the four channel assignments (independent, left/side,
    right/side, mid/side)."""
    pcm = np.asarray(pcm)
    stereo = pcm.ndim == 2
    channels = 2 if stereo else 1
    n = len(pcm)
    bps = 16
    md5 = hashlib.md5()
    if stereo:
        inter = np.empty(n * 2, dtype=np.int64)
        inter[0::2] = pcm[:, 0]
        inter[1::2] = pcm[:, 1]
    else:
        inter = pcm.astype(np.int64)
    raw = bytearray()
    for v in inter.tolist():
        raw += int(v).to_bytes(2, "little", signed=True)
    md5.update(bytes(raw))

    out = bytearray(b"fLaC")
    si = _BitWriter()
    si.write(min(blocksize, max(16, min(n, blocksize))), 16)
    si.write(blocksize, 16)
    si.write(0, 24)
    si.write(0, 24)
    si.write(rate, 20)
    si.write(channels - 1, 3)
    si.write(bps - 1, 5)
    si.write(n, 36)
    si.align()
    body = si.getvalue() + md5.digest()
    out += bytes([0x80]) + len(body).to_bytes(3, "big") + body

    strategies = ["fixed", "verbatim", "lpc1", "fixed"]
    for fi, start in enumerate(range(0, n, blocksize)):
        block = pcm[start : start + blocksize]
        bs = len(block)
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed-blocksize strategy, frame number follows
        w.write(7, 4)  # 16-bit blocksize-1 at end of header
        w.write(0, 4)  # rate from STREAMINFO
        if stereo:
            chan_code = (1, 8, 9, 10)[fi % 4]
        else:
            chan_code = 0
        w.write(chan_code, 4)
        w.write(4, 3)  # 16-bit samples
        w.write(0, 1)
        _write_utf8_number(w, fi)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.getvalue()
        w2 = _BitWriter()
        part_order = fi % 2 if bs % 2 == 0 else 0
        method = (fi // 2) % 2
        strat = strategies[fi % len(strategies)]

        force_escape = fi % 5 == 4  # rotate the raw-partition path in

        def _one(samples: np.ndarray, sub_bps: int, strategy: str) -> None:
            s = strategy
            if s == "fixed" and len(set(int(v) for v in samples)) == 1:
                s = "constant"
            _encode_subframe(
                w2, samples, sub_bps, s, part_order, method, force_escape
            )

        if not stereo:
            _one(block.astype(np.int64), bps, strat)
        else:
            left = block[:, 0].astype(np.int64)
            right = block[:, 1].astype(np.int64)
            side = left - right
            if chan_code == 1:
                _one(left, bps, strat)
                _one(right, bps, strat)
            elif chan_code == 8:
                _one(left, bps, strat)
                _one(side, bps + 1, strat)
            elif chan_code == 9:
                _one(side, bps + 1, strat)
                _one(right, bps, strat)
            else:  # mid/side
                mid = (left + right) >> 1
                _one(mid, bps, strat)
                _one(side, bps + 1, strat)
        w2.align()
        frame = hdr + bytes([_crc8(hdr)]) + w2.getvalue()
        out += frame + _crc16(frame).to_bytes(2, "big")
    return bytes(out)
