"""Vendored baseline-JPEG codec (functions/jpegcodec.py): encode/
decode roundtrip fidelity on real JFIF bytes, the input_hint's
PSNR>=40dB lossy gate, marker structure, and decoder guards. Where
Pillow exists, cross-decodes verify interop both ways."""

import struct

import numpy as np
import pytest

from crawlspark.functions.jpegcodec import (
    UNZIGZAG,
    ZIGZAG,
    _DCT,
    decode_jpeg,
    encode_jpeg,
)
from crawlspark.sources.docgen import have_pil, pixels_for, psnr


def test_zigzag_is_a_permutation_and_dct_orthonormal():
    assert sorted(ZIGZAG) == list(range(64))
    assert (ZIGZAG[UNZIGZAG] == np.arange(64)).all()
    assert list(ZIGZAG[:10]) == [0, 1, 8, 16, 9, 2, 3, 10, 17, 24]
    assert np.allclose(_DCT @ _DCT.T, np.eye(8), atol=1e-12)


def test_marker_structure():
    buf = encode_jpeg(pixels_for("m", 16, 16), 90)
    assert buf[:2] == b"\xff\xd8" and buf[-2:] == b"\xff\xd9"
    assert b"JFIF\x00" in buf[:32]
    assert b"\xff\xc0" in buf  # SOF0 (baseline)


def test_constant_image_near_exact():
    px = np.full((24, 24, 3), 120, np.uint8)
    out = decode_jpeg(encode_jpeg(px, 95))
    assert np.abs(out.astype(int) - 120).max() <= 1


def test_psnr_gate_on_real_jpeg_bytes():
    """The BASELINE input_hint invariant on REAL bytes, no Pillow
    needed: decode(encode(px)) within PSNR>=40dB, genuinely lossy."""
    for url in [f"http://a.b/{i}" for i in range(5)]:
        px = pixels_for(url, 32, 32)
        out = decode_jpeg(encode_jpeg(px, 98))
        p = psnr(px, out)
        assert p >= 40.0, (url, p)
        assert not np.array_equal(px, out)


def test_non_multiple_of_8_dimensions():
    px = pixels_for("odd", 33, 37)  # w=33, h=37
    out = decode_jpeg(encode_jpeg(px, 98))
    assert out.shape == px.shape
    assert psnr(px, out) >= 40.0


def test_quality_monotonic():
    px = pixels_for("q", 48, 48)
    ps = [
        psnr(px, decode_jpeg(encode_jpeg(px, q)))
        for q in (50, 75, 95, 100)
    ]
    assert ps == sorted(ps), ps


def test_decoder_rejects_progressive_and_garbage():
    with pytest.raises(ValueError, match="SOI"):
        decode_jpeg(b"not a jpeg")
    # minimal stream with a progressive SOF2 marker
    buf = b"\xff\xd8" + b"\xff\xc2" + struct.pack(">H", 8) + bytes(6)
    with pytest.raises(ValueError, match="baseline"):
        decode_jpeg(buf)


@pytest.mark.skipif(not have_pil(), reason="Pillow not installed")
def test_interop_with_pillow():
    import io

    from PIL import Image

    px = pixels_for("interop", 32, 32)
    # our bytes -> Pillow
    theirs = np.asarray(
        Image.open(io.BytesIO(encode_jpeg(px, 98))).convert("RGB")
    )
    assert psnr(px, theirs) >= 40.0
    # Pillow bytes (4:2:0 default subsampling) -> our decoder
    bio = io.BytesIO()
    Image.fromarray(px, "RGB").save(bio, format="JPEG", quality=95)
    ours = decode_jpeg(bio.getvalue())
    pil = np.asarray(Image.open(io.BytesIO(bio.getvalue())).convert("RGB"))
    assert psnr(pil, ours) >= 30.0  # same content, codec-level close
