"""Shared PNG/TIFF row-predictor core.

One implementation of the five PNG scanline filters (None/Sub/Up/
Average/Paeth, RFC 2083 §6) and TIFF horizontal differencing, used by
BOTH consumers that need them:

- ``decode_png`` (sources/multimodal.py) unfilters IDAT scanlines —
  including per-pass Adam7 sub-images — through
  :func:`png_unfilter_scanlines`;
- the PDF stream filters (sources/pdf.py) apply ``/DecodeParms
  /Predictor`` post-processing to FlateDecode / LZWDecode output
  through :func:`unfilter_rows` — predictor 2 is TIFF horizontal
  differencing, predictors 10–15 are the PNG filters with a per-row
  tag byte (PDF 32000-1 §7.4.4.4: the VALUE 10–15 only declares "PNG
  predictors present"; each row's actual filter comes from its tag).

Modern PDF writers predictor-compress exactly the ObjStm/xref streams
that carry the catalog/page tree (reference parity: PyMuPDF decodes
them transparently, knowledge_model/ingestion/parse_pdfs.py:57-88), so
this module is what keeps real-world PDF text extraction from silently
losing those documents.

:func:`png_filter_scanlines` / :func:`filter_rows` are the encoder
twins — fixtures and round-trip tests are anchored on encode→decode
identity through independent inverse code paths, the same conformance
method the LZW/ADPCM codecs use.

Scale shape: these run INSIDE Arrow-batched ``mapInPandas`` kernels on
the executors (one payload per row, no shuffle); per-byte loops are
bounded by a single stream's size, never by table size.
"""

from __future__ import annotations

import numpy as np


def png_unfilter_scanlines(
    raw: bytes, pos: int, n_rows: int, stride: int, bpp: int
) -> tuple[np.ndarray, int] | None:
    """Unfilter ``n_rows`` PNG scanlines of ``stride`` bytes starting at
    ``raw[pos]`` (each prefixed by its filter-type byte); ``bpp`` is the
    filter byte distance (max(1, channels*bitdepth/8) per the spec).

    Returns ``((n_rows, stride) uint8 array, position after the last
    row)`` or None for a truncated buffer / invalid filter type.

    The Up filter vectorizes (uint8 wraparound IS the mod-256 the spec
    wants); Sub/Average/Paeth carry a left-neighbor dependency and run
    as per-byte loops — fine for the stream/fixture sizes this decodes,
    and bounded by one payload, not the table.
    """
    if len(raw) < pos + n_rows * (stride + 1):
        return None
    sub = np.zeros((n_rows, stride), np.uint8)
    for y in range(n_rows):
        ft = raw[pos]
        pos += 1
        line = np.frombuffer(raw, np.uint8, stride, pos).copy()
        pos += stride
        prev = sub[y - 1] if y else np.zeros(stride, np.uint8)
        if ft == 0:  # None
            sub[y] = line
        elif ft == 2:  # Up — vectorized, uint8 add wraps mod 256
            sub[y] = line + prev
        elif ft == 1:  # Sub
            rec = line
            for x in range(bpp, stride):
                rec[x] = (int(rec[x]) + int(rec[x - bpp])) & 0xFF
            sub[y] = rec
        elif ft == 3:  # Average
            rec = line
            for x in range(stride):
                left = int(rec[x - bpp]) if x >= bpp else 0
                rec[x] = (int(rec[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            sub[y] = rec
        elif ft == 4:  # Paeth
            rec = line
            for x in range(stride):
                a = int(rec[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + up - c
                pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                rec[x] = (int(rec[x]) + pred) & 0xFF
            sub[y] = rec
        else:
            return None
    return sub, pos


def png_filter_scanlines(
    rows: np.ndarray, bpp: int, filter_types=None
) -> bytes:
    """Encoder twin of :func:`png_unfilter_scanlines`: apply PNG
    scanline filters to a ``(n_rows, stride)`` uint8 array, prefixing
    each row with its filter-type byte.  ``filter_types`` is a per-row
    sequence (cycled); default rotates through all five types so a
    round-trip fixture exercises every filter."""
    rows = np.asarray(rows, dtype=np.uint8)
    n_rows, stride = rows.shape
    if filter_types is None:
        filter_types = [0, 1, 2, 3, 4]
    out = bytearray()
    for y in range(n_rows):
        ft = int(filter_types[y % len(filter_types)])
        cur = rows[y].astype(np.int32)
        prev = rows[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        left = np.zeros(stride, np.int32)
        left[bpp:] = cur[:-bpp]
        upleft = np.zeros(stride, np.int32)
        upleft[bpp:] = prev[:-bpp]
        if ft == 0:
            enc = cur
        elif ft == 1:  # Sub
            enc = cur - left
        elif ft == 2:  # Up
            enc = cur - prev
        elif ft == 3:  # Average
            enc = cur - ((left + prev) >> 1)
        elif ft == 4:  # Paeth
            p = left + prev - upleft
            pa, pb, pc = np.abs(p - left), np.abs(p - prev), np.abs(p - upleft)
            pred = np.where(
                (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, prev, upleft)
            )
            enc = cur - pred
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
        out.append(ft)
        out += (enc & 0xFF).astype(np.uint8).tobytes()
    return bytes(out)


def unfilter_rows(
    data: bytes, predictor: int, columns: int, colors: int = 1, bpc: int = 8
) -> bytes | None:
    """Invert a PDF ``/DecodeParms`` row predictor over decompressed
    stream bytes (PDF 32000-1 §7.4.4.4): predictor 1 is identity, 2 is
    TIFF horizontal differencing, 10–15 are the PNG filters (per-row
    tag byte).  None for truncated / non-row-aligned data or an
    unsupported (predictor, bpc) combination — honest refusal, never a
    misdecode.

    Sub-byte ``bpc`` is supported for the PNG predictors (they operate
    on BYTES, bpp = max(1, colors*bpc/8)); TIFF differencing is decoded
    for the 8-bit samples real writers emit and refused for sub-byte
    depths (differencing there acts on packed sub-byte samples — rare
    enough that a wrong decode is worse than a skip).
    """
    if predictor <= 1:
        return data
    if predictor == 2:  # TIFF horizontal differencing
        if bpc != 8 or columns <= 0 or colors <= 0:
            return None
        stride = columns * colors
        if not data or len(data) % stride:
            return None
        px = np.frombuffer(data, np.uint8).reshape(-1, columns, colors)
        return (
            (np.cumsum(px.astype(np.uint32), axis=1) & 0xFF)
            .astype(np.uint8)
            .tobytes()
        )
    if 10 <= predictor <= 15:  # PNG predictors, per-row tag byte
        if columns <= 0 or colors <= 0 or bpc <= 0:
            return None
        stride = (columns * colors * bpc + 7) // 8
        if not data or len(data) % (stride + 1):
            return None
        n_rows = len(data) // (stride + 1)
        bpp = max(1, colors * bpc // 8)
        got = png_unfilter_scanlines(data, 0, n_rows, stride, bpp)
        if got is None:
            return None
        return got[0].tobytes()
    return None


def filter_rows(
    data: bytes,
    predictor: int,
    columns: int,
    colors: int = 1,
    bpc: int = 8,
    filter_types=None,
) -> bytes:
    """Encoder twin of :func:`unfilter_rows` (fixtures / round-trip
    tests).  ``data`` must be whole rows (pad the payload first — PDF
    predictor streams are row-structured by contract)."""
    if predictor <= 1:
        return data
    if predictor == 2:
        if bpc != 8:
            raise ValueError("TIFF differencing encoder supports bpc=8 only")
        stride = columns * colors
        if len(data) % stride:
            raise ValueError("data is not whole rows")
        px = np.frombuffer(data, np.uint8).reshape(-1, columns, colors)
        first = px[:, :1, :].astype(np.int16)
        diffs = np.diff(px.astype(np.int16), axis=1)
        return (
            (np.concatenate([first, diffs], axis=1) & 0xFF)
            .astype(np.uint8)
            .tobytes()
        )
    if 10 <= predictor <= 15:
        stride = (columns * colors * bpc + 7) // 8
        if len(data) % stride:
            raise ValueError("data is not whole rows")
        rows = np.frombuffer(data, np.uint8).reshape(-1, stride)
        return png_filter_scanlines(rows, max(1, colors * bpc // 8), filter_types)
    raise ValueError(f"unsupported predictor {predictor}")
