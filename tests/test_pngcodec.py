"""Vendored pure-Python PNG codec: real bytes -> pixels in THIS
container (no Pillow), closing r3's 'real codec unverifiable in CI'
gap. The decoder is exercised against independently forward-filtered
scanlines (spec math applied in the test, inverted by the codec), and
the docgen decode path is proven on real PNG bytes end to end
(pixels, PSNR gate, phash)."""

import struct
import zlib

import numpy as np
import pytest

from crawlspark.functions.pngcodec import PNG_SIG, decode_png, encode_png
from crawlspark.sources.docgen import decode_image, phash64, pixels_for, psnr


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def _forward_filter(pixels: np.ndarray, ftypes: list[int]) -> bytes:
    """Apply the spec's FORWARD filters (the encoder side the codec
    itself never uses beyond type 0) — an independent oracle for the
    decoder's reconstruction functions."""
    h, w, ch = pixels.shape
    px = pixels.astype(np.int32).reshape(h, w * ch)
    out = bytearray()
    for y in range(h):
        f = ftypes[y % len(ftypes)]
        out.append(f)
        prev = px[y - 1] if y > 0 else np.zeros(w * ch, dtype=np.int32)
        for x in range(w * ch):
            cur = int(px[y, x])
            a = int(px[y, x - ch]) if x >= ch else 0
            b = int(prev[x])
            c = int(prev[x - ch]) if x >= ch else 0
            if f == 0:
                v = cur
            elif f == 1:
                v = cur - a
            elif f == 2:
                v = cur - b
            elif f == 3:
                v = cur - (a + b) // 2
            else:  # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                v = cur - pr
            out.append(v & 0xFF)
    return bytes(out)


def _build_png(
    pixels: np.ndarray, ftypes: list[int], color: int = 2
) -> bytes:
    h, w, ch = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = _forward_filter(pixels, ftypes)
    # split IDAT in two to exercise multi-chunk streams
    z = zlib.compress(raw, 6)
    mid = len(z) // 2
    return (
        PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", z[:mid])
        + _chunk(b"IDAT", z[mid:])
        + _chunk(b"IEND", b"")
    )


def _pix(h, w, ch=3, seed=7):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)


def test_decoder_inverts_every_filter_type():
    px = _pix(10, 9)
    for f in (0, 1, 2, 3, 4):
        got = decode_png(_build_png(px, [f]))
        assert np.array_equal(got, px), f"filter {f}"
    # mixed filters per row
    assert np.array_equal(decode_png(_build_png(px, [0, 1, 2, 3, 4])), px)


def test_encode_decode_roundtrip_lossless():
    for h, w, seed in [(1, 1, 1), (5, 17, 2), (32, 32, 3)]:
        px = _pix(h, w, seed=seed)
        assert np.array_equal(decode_png(encode_png(px)), px)


def test_greyscale_and_alpha_color_types():
    g = _pix(6, 5, ch=1, seed=4)
    got = decode_png(_build_png(g, [2], color=0))
    assert np.array_equal(got, np.repeat(g, 3, axis=2))
    rgba = _pix(6, 5, ch=4, seed=5)
    got = decode_png(_build_png(rgba, [4], color=6))
    assert np.array_equal(got, rgba[:, :, :3])


def test_crc_and_unsupported_are_loud():
    px = _pix(4, 4)
    buf = bytearray(encode_png(px))
    buf[40] ^= 0xFF  # flip a byte inside IDAT
    with pytest.raises(ValueError, match="CRC mismatch"):
        decode_png(bytes(buf))
    with pytest.raises(ValueError, match="bad signature"):
        decode_png(b"GIF89a" + bytes(buf))
    deep = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="bit depth"):
        decode_png(deep)
    laced = (
        PNG_SIG
        + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(laced)


def test_docgen_decodes_real_png_without_pillow():
    """The input_hint invariants on REAL bytes in this container:
    decode_image falls through decode_real into the vendored codec,
    pixels match exactly (lossless => PSNR inf >= 40dB), and phash
    over real-bytes-decoded pixels equals phash over the source."""
    px = pixels_for("doc-real-png", 24, 16)
    real = encode_png(px)
    assert real[:8] == PNG_SIG  # genuinely real PNG bytes, no magic
    got = decode_image(real)
    assert np.array_equal(got, px)
    assert psnr(px, got) == float("inf")
    assert phash64(got) == phash64(px)
