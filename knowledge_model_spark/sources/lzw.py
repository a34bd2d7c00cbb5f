"""Shared LZW core for the GIF and PDF decoders (r5 verdict item 5).

One dictionary machine, two conformance targets:

- **GIF** (multimodal.py): LSB-first bit packing, variable width
  3..12, giflib's growth rule — a ``RunningCode`` counter that ticks on
  EVERY code read (including Clear/EOI) and grows the width when it
  EXCEEDS ``1 << code_size``.  Anchored against giflib-written files in
  tests/test_sources.py.
- **PDF /LZWDecode** (pdf.py): MSB-first bit packing, 8-bit symbols
  (Clear=256, EOD=257, first dynamic code 258), width 9..12, and the
  spec's *EarlyChange* rule (PDF 32000-1 §7.4.4.2, inherited from the
  TIFF off-by-one): with EarlyChange=1 (the default) the width grows
  one code EARLIER than the dictionary strictly requires — when
  ``next_code + early_change`` reaches ``1 << code_size`` after an
  entry is added.  EarlyChange=0 (``/DecodeParms << /EarlyChange 0 >>``)
  grows exactly at the boundary.  This matches pdf.js's LZWStream and
  every mainstream PDF writer.

Both variants share the table logic verbatim: KwKwK handling
(``code == next_code`` → prev + prev[0]), a 4096-entry cap after which
no entries are added until a Clear code, and None on any code beyond
the table (garbage tolerance — callers treat None as "not decodable",
never as empty output).
"""

from __future__ import annotations


def lzw_decode(
    data: bytes,
    min_code_size: int,
    *,
    lsb_first: bool,
    growth: str,
    expected: int | None = None,
    early_change: int = 1,
    max_output: int | None = None,
) -> list[int] | None:
    """Generic LZW decode → symbol list, or None on garbage.

    ``growth``: ``"giflib"`` (per-read running counter, grows past the
    boundary) or ``"pdf"`` (grows after a dictionary add when
    ``next_code + early_change >= 1 << code_size``).  ``expected``:
    stop after this many output symbols (GIF knows the pixel count);
    None decodes until EOD or data exhaustion (PDF).  ``max_output``:
    garbage-inflation guard for EOD-less inputs — corrupt data decodes
    "successfully" far more often under LZW than under zlib, and its
    growing dictionary entries can inflate a few KB of junk into MBs
    that downstream parsers then chew on; exceeding the cap returns
    None (a LEGITIMATE stream that large would carry EOD long before).
    """
    clear = 1 << min_code_size
    eoi = clear + 1
    code_size = min_code_size + 1
    nbits = len(data) * 8
    bitpos = 0
    table: dict[int, list[int]] = {i: [i] for i in range(clear)}
    next_code = eoi + 1  # next dictionary slot
    running = eoi + 1  # giflib's RunningCode: ticks per READ
    prev: list[int] | None = None
    out: list[int] = []
    while expected is None or len(out) < expected:
        if bitpos + code_size > nbits:
            if expected is None:
                break  # EOD-less stream: spec-violating but common
            return None
        byte_i = bitpos >> 3
        if lsb_first:
            window = int.from_bytes(data[byte_i : byte_i + 3], "little")
            code = (window >> (bitpos & 7)) & ((1 << code_size) - 1)
        else:
            window = int.from_bytes(
                data[byte_i : byte_i + 3].ljust(3, b"\0"), "big"
            )
            code = (window >> (24 - (bitpos & 7) - code_size)) & (
                (1 << code_size) - 1
            )
        bitpos += code_size
        if growth == "giflib":
            running += 1
            if running > (1 << code_size) and code_size < 12:
                code_size += 1
        if code == clear:
            table = {i: [i] for i in range(clear)}
            next_code = eoi + 1
            running = eoi + 1
            code_size = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table.get(code)
            if entry is None:
                return None
        elif code in table:
            entry = table[code]
        elif code == next_code:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            return None
        out.extend(entry)
        if max_output is not None and len(out) > max_output:
            return None
        if prev is not None and next_code < 4096:
            table[next_code] = prev + [entry[0]]
            next_code += 1
            if (
                growth == "pdf"
                and next_code + early_change >= (1 << code_size)
                and code_size < 12
            ):
                code_size += 1
        prev = entry
    if expected is not None and len(out) < expected:
        return None
    return out[:expected] if expected is not None else out


def lzw_decode_pdf(data: bytes, early_change: int = 1) -> bytes | None:
    """PDF /LZWDecode stream → bytes (MSB-first, EarlyChange per the
    stream's /DecodeParms, default 1), or None on garbage — including
    garbage that INFLATES: output is capped at max(1 MB, 64× input),
    several times beyond any legitimate content stream's compression
    ratio (real text streams deflate ~5-20×)."""
    out = lzw_decode(
        data, 8, lsb_first=False, growth="pdf", early_change=early_change,
        max_output=max(1 << 20, 64 * len(data)),
    )
    return None if out is None else bytes(out)


def lzw_encode_pdf(data: bytes, early_change: int = 1) -> bytes:
    """PDF-variant LZW encoder (fixtures and round-trip tests): MSB
    packing, leading Clear, trailing EOD, width growth kept one add
    AHEAD of the decoder's (the decoder's table lags the encoder's by
    exactly one entry, so the encoder grows when
    ``next_code - 1 + early_change`` reaches the boundary), Clear +
    reset when the table fills."""
    buf = 0
    buf_bits = 0
    out = bytearray()

    def emit(code: int, width: int) -> None:
        nonlocal buf, buf_bits
        buf = (buf << width) | code
        buf_bits += width
        while buf_bits >= 8:
            out.append((buf >> (buf_bits - 8)) & 0xFF)
            buf_bits -= 8

    def fresh():
        return {bytes([i]): i for i in range(256)}, 258, 9

    table, next_code, width = fresh()
    emit(256, width)  # leading Clear (writers always emit it)
    w = b""
    for i in range(len(data)):
        c = data[i : i + 1]
        wc = w + c
        if wc in table:
            w = wc
            continue
        emit(table[w], width)
        if next_code < 4096:
            table[wc] = next_code
            next_code += 1
            if next_code - 1 + early_change >= (1 << width) and width < 12:
                width += 1
        else:
            # table full: Clear, reset, restart the phrase
            emit(256, width)
            table, next_code, width = fresh()
        w = c
    if w:
        emit(table[w], width)
        # the decoder adds an entry after this read; keep width in sync
        # for the EOD code that follows
        if next_code < 4096:
            next_code += 1
            if next_code - 1 + early_change >= (1 << width) and width < 12:
                width += 1
    emit(257, width)  # EOD
    if buf_bits:
        out.append((buf << (8 - buf_bits)) & 0xFF)
    return bytes(out)
