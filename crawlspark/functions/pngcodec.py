"""Vendored pure-Python PNG codec (zlib + the 5 scanline filters).

The container has no Pillow, so the real-format decode path
(sources/docgen.py decode_real) would otherwise be unverifiable in
CI — every real-bytes test skips. This module implements enough of
the PNG spec (ISO/IEC 15948) from scratch to prove that path on real
bytes: 8-bit greyscale / truecolor / truecolor+alpha images, all five
scanline filters (None/Sub/Up/Average/Paeth), multi-IDAT streams, and
chunk CRC validation. Reference analog: the importer's image parsing
feeds FeaturedImageResolver (web/.../image/impl/
FeaturedImageResolver.java:99-254) with decoded pixels — here those
pixels come from a dependency-free decoder instead of ImageIO.

Deliberately NOT supported (raises ValueError, never wrong pixels):
bit depths != 8, palette images, interlacing. The cluster path uses
Pillow; this codec exists so CI on a bare container still exercises
decode-real-bytes → pixels → phash/PSNR end to end.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"

# color type -> samples per pixel (8-bit depth only)
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray, level: int = 6) -> bytes:
    """(h, w, 3) uint8 RGB -> spec-conformant lossless PNG bytes
    (8-bit truecolor, filter 0 per scanline, one IDAT)."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("encode_png expects (h, w, 3) uint8 RGB")
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    # filter byte 0 (None) prepended to each scanline
    raw = np.empty((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = pixels.reshape(h, w * 3)
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), level))
        + _chunk(b"IEND", b"")
    )


def _unfilter(raw: np.ndarray, h: int, w: int, ch: int) -> np.ndarray:
    """Reverse per-scanline filtering: raw is (h, 1 + w*ch) uint8 with
    the filter byte in column 0. Sub/Up/Average/Paeth per the spec's
    reconstruction functions; arithmetic in int32, stored mod 256."""
    out = np.zeros((h, w * ch), dtype=np.int32)
    bpp = ch  # bytes per pixel at bit depth 8
    for y in range(h):
        f = int(raw[y, 0])
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
        if f == 0:  # None
            out[y] = line
        elif f == 1:  # Sub — running recurrence along the scanline
            cur = line.copy()
            for x in range(bpp, w * ch):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
            out[y] = cur
        elif f == 2:  # Up — vectorized
            out[y] = (line + prev) & 0xFF
        elif f == 3:  # Average
            cur = line.copy()
            for x in range(w * ch):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + (left + prev[x]) // 2) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            cur = line.copy()
            for x in range(w * ch):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                c = prev[x - bpp] if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pr = a
                elif pb <= pc:
                    pr = b
                else:
                    pr = c
                cur[x] = (cur[x] + pr) & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"png: unknown filter type {f} on row {y}")
    return out.astype(np.uint8).reshape(h, w, ch)


def decode_png(data: bytes) -> np.ndarray:
    """Real PNG bytes -> (h, w, 3) uint8 RGB. Greyscale broadcasts to
    3 channels; alpha is dropped (the documents-table contract is RGB
    pixels). CRC-validated; raises ValueError on anything outside the
    supported subset rather than guessing."""
    if data[:8] != PNG_SIG:
        raise ValueError("png: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack(">I", data[pos : pos + 4])
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError(f"png: truncated {tag!r} chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"png: CRC mismatch in {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    w, h, depth, color, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"png: unsupported bit depth {depth} (8 only)")
    if color not in _CHANNELS:
        raise ValueError(f"png: unsupported color type {color}")
    if comp != 0 or filt != 0:
        raise ValueError("png: unknown compression/filter method")
    if interlace != 0:
        raise ValueError("png: interlaced images unsupported")
    ch = _CHANNELS[color]
    raw_bytes = zlib.decompress(bytes(idat))
    stride = 1 + w * ch
    if len(raw_bytes) != h * stride:
        raise ValueError("png: decompressed size mismatch")
    raw = np.frombuffer(raw_bytes, dtype=np.uint8).reshape(h, stride)
    px = _unfilter(raw, h, w, ch)
    if color == 0:  # greyscale
        return np.repeat(px, 3, axis=2)
    if color == 2:  # truecolor
        return px
    if color == 4:  # grey+alpha -> drop alpha, broadcast
        return np.repeat(px[:, :, :1], 3, axis=2)
    return px[:, :, :3]  # truecolor+alpha -> drop alpha
