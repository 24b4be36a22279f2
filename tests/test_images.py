"""Image payload invariants (input_hint gate): decoded-pixel allclose
(exact for png, PSNR >= 40 dB for lossy), caption equality, phash
stability. Pure-Python here; the Spark-side UDF plumbing is covered by
q_image_payload in the entry contract."""

import numpy as np

from crawlspark.sources.docgen import (
    caption_for,
    decode_image,
    encode_image,
    fmt_for,
    make_document,
    phash64,
    pixels_for,
    psnr,
)


def test_png_lossless_roundtrip():
    px = pixels_for("http://a.b/x", 32, 32)
    buf = encode_image(px, "png")
    out = decode_image(buf)
    assert np.array_equal(px, out)
    assert psnr(px, out) == float("inf")


def test_lossy_formats_meet_psnr_gate():
    for fmt in ("jpeg", "webp"):
        for url in [f"http://a.b/{i}" for i in range(5)]:
            px = pixels_for(url, 32, 32)
            out = decode_image(encode_image(px, fmt))
            p = psnr(px, out)
            assert p >= 40.0, (fmt, url, p)
            assert not np.array_equal(px, out)  # actually lossy


def test_document_determinism():
    a = make_document("http://a.b/x", 32, 32)
    b = make_document("http://a.b/x", 32, 32)
    assert a["bytes"] == b["bytes"]
    assert a["phash"] == b["phash"]
    assert a["caption"] == b["caption"]
    c = make_document("http://a.b/y", 32, 32)
    assert c["bytes"] != a["bytes"]
    assert c["caption"] != a["caption"]


def test_phash_robust_to_lossy_but_distinguishes_images():
    px = pixels_for("http://a.b/x", 32, 32)
    h_orig = phash64(px)
    h_lossy = phash64(decode_image(encode_image(px, "jpeg")))
    # hamming distance between original and lossy-decoded is small
    d = bin((h_orig ^ h_lossy) & ((1 << 64) - 1)).count("1")
    assert d <= 4, d
    h_other = phash64(pixels_for("http://a.b/completely-different", 32, 32))
    d2 = bin((h_orig ^ h_other) & ((1 << 64) - 1)).count("1")
    assert d2 >= 10, d2


def test_fmt_and_caption_derivation():
    assert fmt_for("u1") in ("png", "jpeg", "webp")
    cap = caption_for("http://a.b/x")
    assert cap.endswith("(http://a.b/x)")
    assert len(cap.split()) >= 5


def test_phash_int64_range():
    for i in range(20):
        h = phash64(pixels_for(f"u{i}", 16, 16))
        assert -(1 << 63) <= h < (1 << 63)
