"""Pure-numpy + stdlib-zlib PNG codec — the REAL compressed-format leg
of the image path (round-9 verdict ask #4).

The WAV/BMP/AVI modules decode genuine but UNCOMPRESSED containers;
real pipelines carry PNG/JPEG. JPEG needs libjpeg, but PNG's only
compression is DEFLATE — which the stdlib ships — so this module
implements the canonical subset end to end from the public PNG
specification (RFC 2083 / W3C PNG): signature, CRC-validated chunk
walk, IHDR, zlib-inflated IDAT, and all five scanline filters
(None/Sub/Up/Average/Paeth) with exact unfiltering.

Supported subset: 8-bit grayscale (color type 0) and 8-bit truecolor
RGB (color type 2), non-interlaced. Everything else — palette, alpha,
16-bit, Adam7 interlace, nonzero compression/filter methods — raises
ValueError naming the field, loud like a real decoder, so a later
libpng swap only widens coverage. Round-tripped bit-exactly in
tests/test_png.py including per-row filter sweeps, hand-built golden
bytes, and crafted-corruption fuzz (bad CRC, truncated IDAT, length
lies).

Reference parity: the aliyun reference ships no codec of its own (it
moves opaque bytes; SURVEY.md §2 multimodal posture) — this is the
training-data-pipeline extension the build brief requires, with the
Spark-side plumbing in multimodal/media.py.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

__all__ = ["encode_png", "decode_png"]

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(ctype: bytes, data: bytes) -> bytes:
    return (
        struct.pack(">I", len(data))
        + ctype
        + data
        + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
    )


def _filter_row(
    ftype: int, raw: np.ndarray, prev: np.ndarray, bpp: int
) -> np.ndarray:
    """Apply filter ``ftype`` to reconstructed row ``raw`` (what the
    ENCODER does — all references are recon values, so fully
    vectorized). int16 in, uint8 out."""
    left = np.zeros_like(raw)
    left[bpp:] = raw[:-bpp]
    ul = np.zeros_like(prev)
    ul[bpp:] = prev[:-bpp]
    if ftype == 0:
        out = raw
    elif ftype == 1:
        out = raw - left
    elif ftype == 2:
        out = raw - prev
    elif ftype == 3:
        out = raw - (left + prev) // 2
    elif ftype == 4:
        out = raw - _paeth(left, prev, ul)
    else:
        raise ValueError(f"encode_png: filter type {ftype} out of range 0-4")
    return (out % 256).astype(np.uint8)


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Paeth predictor, vectorized over a scanline (spec §6.6)."""
    p = a + b - c
    pa, pb, pc = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    out = np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c))
    return out


def encode_png(pixels: np.ndarray, row_filters=None) -> bytes:
    """Serialize uint8 pixels into a genuine PNG.

    ``pixels``: (h, w) grayscale → color type 0, or (h, w, 3) RGB →
    color type 2. ``row_filters``: per-row filter types 0-4 (int or
    sequence; default 0). Non-zero filters make the container exercise
    the decoder's unfilter paths — the catalog entry cycles all five."""
    a = np.asarray(pixels)
    if a.dtype != np.uint8:
        raise ValueError(f"encode_png: pixels must be uint8, got {a.dtype}")
    if a.ndim == 2:
        color_type, bpp = 0, 1
        rows = a[:, :, None]
    elif a.ndim == 3 and a.shape[2] == 3:
        color_type, bpp = 2, 3
        rows = a
    else:
        raise ValueError(
            f"encode_png: pixels must be (h,w) or (h,w,3), got {a.shape}"
        )
    h, w = rows.shape[:2]
    if h < 1 or w < 1:
        raise ValueError(f"encode_png: empty image {rows.shape}")
    if row_filters is None:
        row_filters = [0] * h
    elif isinstance(row_filters, int):
        row_filters = [row_filters] * h
    if len(row_filters) != h:
        raise ValueError("encode_png: row_filters length != height")
    flat = rows.reshape(h, w * bpp).astype(np.int16)
    prev = np.zeros(w * bpp, dtype=np.int16)
    scan = bytearray()
    for y in range(h):
        ft = int(row_filters[y])
        scan.append(ft)
        scan.extend(_filter_row(ft, flat[y], prev, bpp).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(scan)))
        + _chunk(b"IEND", b"")
    )


def decode_png(payload: bytes) -> np.ndarray:
    """Parse a PNG → (h, w) uint8 grayscale or (h, w, 3) uint8 RGB.

    Validates the signature and every chunk CRC, walks chunks in
    order, inflates the concatenated IDAT stream, and unfilters each
    scanline per the spec. Unsupported features and corrupt containers
    are refused loudly (never guessed at)."""
    if len(payload) < len(_SIG) or payload[: len(_SIG)] != _SIG:
        raise ValueError("decode_png: not a PNG (bad signature)")
    pos = len(_SIG)
    ihdr = None
    idat = bytearray()
    seen_iend = False
    while pos < len(payload):
        if pos + 8 > len(payload):
            raise ValueError("decode_png: truncated chunk header")
        (length,) = struct.unpack_from(">I", payload, pos)
        ctype = payload[pos + 4 : pos + 8]
        end = pos + 8 + length
        if end + 4 > len(payload):
            raise ValueError(f"decode_png: truncated {ctype!r} chunk")
        data = payload[pos + 8 : end]
        (crc,) = struct.unpack_from(">I", payload, end)
        if crc != (zlib.crc32(ctype + data) & 0xFFFFFFFF):
            raise ValueError(f"decode_png: CRC mismatch in {ctype!r}")
        if ctype == b"IHDR":
            if ihdr is not None:
                raise ValueError("decode_png: duplicate IHDR")
            ihdr = data
        elif ctype == b"IDAT":
            idat.extend(data)
        elif ctype == b"IEND":
            seen_iend = True
            break
        elif ctype == b"PLTE":
            raise ValueError("decode_png: palette images unsupported")
        # ancillary chunks (tEXt, pHYs, ...) are skipped per spec
        pos = end + 4
    if ihdr is None:
        raise ValueError("decode_png: missing IHDR")
    if not seen_iend:
        raise ValueError("decode_png: missing IEND")
    if len(ihdr) != 13:
        raise ValueError(f"decode_png: IHDR length {len(ihdr)} != 13")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(
        ">IIBBBBB", ihdr
    )
    if depth != 8:
        raise ValueError(f"decode_png: bit depth {depth} unsupported (8 only)")
    if color_type not in (0, 2):
        raise ValueError(
            f"decode_png: color type {color_type} unsupported (0/2 only)"
        )
    if comp != 0 or filt != 0:
        raise ValueError("decode_png: nonzero compression/filter method")
    if interlace != 0:
        raise ValueError("decode_png: interlaced (Adam7) unsupported")
    if w < 1 or h < 1:
        raise ValueError(f"decode_png: bad dimensions {w}x{h}")
    bpp = 1 if color_type == 0 else 3
    stride = w * bpp
    try:
        raw = zlib.decompress(bytes(idat))
    except zlib.error as e:
        raise ValueError(f"decode_png: IDAT inflate failed: {e}") from None
    if len(raw) != h * (1 + stride):
        raise ValueError(
            f"decode_png: scanline data {len(raw)} bytes != {h}*(1+{stride})"
        )
    scan = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    ftypes = scan[:, 0]
    if (ftypes > 4).any():
        raise ValueError(
            f"decode_png: filter type {int(ftypes.max())} out of range"
        )
    out = np.zeros((h, stride), dtype=np.int16)
    prev = np.zeros(stride, dtype=np.int16)
    for y in range(h):
        ft = int(ftypes[y])
        raw_row = scan[y, 1:].astype(np.int16)
        if ft == 0:
            row = raw_row
        elif ft == 2:
            row = (raw_row + prev) % 256
        elif ft == 1:
            # recon[x] = raw[x] + recon[x-bpp]: per-lane cumsum mod 256
            lanes = raw_row.reshape(w, bpp).astype(np.int64)
            row = (np.cumsum(lanes, axis=0) % 256).reshape(stride).astype(
                np.int16
            )
        else:
            # Average/Paeth reference the in-progress recon row —
            # sequential per byte by definition. Plain-list arithmetic
            # here: numpy SCALAR indexing in a dependency-chained loop
            # costs ~3x list indexing (measured — this leg dominated
            # the catalog entry's wall before the switch)
            rawl = raw_row.tolist()
            prevl = prev.tolist()
            rowl = [0] * stride
            if ft == 3:
                for x in range(stride):
                    left = rowl[x - bpp] if x >= bpp else 0
                    rowl[x] = (rawl[x] + ((left + prevl[x]) >> 1)) & 255
            else:
                for x in range(stride):
                    a = rowl[x - bpp] if x >= bpp else 0
                    b = prevl[x]
                    c = prevl[x - bpp] if x >= bpp else 0
                    p = a + b - c
                    pa = p - a if p >= a else a - p
                    pb = p - b if p >= b else b - p
                    pc = p - c if p >= c else c - p
                    if pa <= pb and pa <= pc:
                        pred = a
                    elif pb <= pc:
                        pred = b
                    else:
                        pred = c
                    rowl[x] = (rawl[x] + pred) & 255
            row = np.array(rowl, dtype=np.int16)
        out[y] = row
        prev = row
    img = out.astype(np.uint8)
    if color_type == 0:
        return img.reshape(h, w)
    return img.reshape(h, w, 3)
