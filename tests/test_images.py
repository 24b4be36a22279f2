"""Image payload invariants (input_hint gate): decoded-pixel allclose
(exact for png, PSNR >= 40 dB for lossy), caption equality, phash
stability. Pure-Python here; the Spark-side UDF plumbing is covered by
q_image_payload in the entry contract."""

import numpy as np
import pytest

from crawlspark.sources.docgen import (
    caption_for,
    decode_image,
    encode_image,
    encode_real,
    fmt_for,
    have_pil,
    make_document,
    phash64,
    pixels_for,
    psnr,
)

# both codecs share one invariant suite. The "real" leg runs in EVERY
# container: Pillow where installed, else the vendored pure-Python
# PNG (functions/pngcodec.py) and baseline-JPEG (functions/jpegcodec
# .py) codecs — so the input_hint's lossy PSNR>=40dB gate executes on
# real bytes here, not just where Pillow exists. Only webp stays
# Pillow-gated (test_real_webp_lossless_roundtrip).
CODECS = [
    pytest.param("fake", id="fake"),
    pytest.param("real", id="real"),
]


def _encode(codec: str, px, fmt: str) -> bytes:
    return encode_real(px, fmt) if codec == "real" else encode_image(px, fmt)


@pytest.mark.parametrize("codec", CODECS)
def test_png_lossless_roundtrip(codec):
    px = pixels_for("http://a.b/x", 32, 32)
    buf = _encode(codec, px, "png")
    out = decode_image(buf)
    assert np.array_equal(px, out)
    assert psnr(px, out) == float("inf")


@pytest.mark.parametrize("codec", CODECS)
def test_lossy_formats_meet_psnr_gate(codec):
    # webp is lossless under the real codec (encode_real uses
    # lossless webp), so the lossy gate there is jpeg-only
    fmts = ("jpeg", "webp") if codec == "fake" else ("jpeg",)
    for fmt in fmts:
        for url in [f"http://a.b/{i}" for i in range(5)]:
            px = pixels_for(url, 32, 32)
            out = decode_image(_encode(codec, px, fmt))
            p = psnr(px, out)
            assert p >= 40.0, (codec, fmt, url, p)
            assert not np.array_equal(px, out)  # actually lossy


@pytest.mark.skipif(not have_pil(), reason="Pillow not installed")
def test_real_webp_lossless_roundtrip():
    px = pixels_for("http://a.b/x", 32, 32)
    assert np.array_equal(px, decode_image(encode_real(px, "webp")))


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


def test_phash_neardup_pairs_spark(spark):
    """Image near-dup dedup end-to-end on REAL payload phashes: a
    lossy re-encode of the same image must pair with the original
    (small Hamming distance), unrelated images must not — through the
    banded hamming64_dup_pairs join (the multimodal companion of
    simhash_dup_pairs)."""
    from crawlspark.operators.similarity import hamming64_dup_pairs

    rows = []
    for i, iid in enumerate(["u-a", "u-b", "u-c", "u-d"]):
        px = pixels_for(f"http://img/{iid}", 32, 32)
        rows.append((2 * i, phash64(px)))
        # near-dup twin: lossy roundtrip of the SAME pixels
        rows.append(
            (2 * i + 1, phash64(decode_image(encode_image(px, "jpeg"))))
        )
    sigs = spark.createDataFrame(rows, "doc_id long, sig long")
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in hamming64_dup_pairs(sigs, max_dist=4).collect()
    }
    for i in range(4):  # each original pairs with its lossy twin
        assert (2 * i, 2 * i + 1) in got, got
    # no cross-image pair sneaks in under the distance bound
    for (a, b) in got:
        assert b == a + 1 and a % 2 == 0, got


def test_image_quality_stats_real_payloads(spark):
    """Quality stats over REAL crawled-payload images: sane ranges,
    noisy payload textures never flag low-information, while solid
    and black frames do (the LAION-class payload filter)."""
    import numpy as np
    from pyspark.sql import functions as F

    from crawlspark.functions.images import (
        image_quality_udf,
        low_information_col,
        luma_plane,
        quality_stats,
    )
    from crawlspark.sources.docgen import encode_image, make_document

    rows = []
    for i in range(8):
        d = make_document(f"http://h/p{i}", 16, 16)
        rows.append((f"p{i}", bytearray(d["bytes"])))
    rows.append(
        ("solid", bytearray(encode_image(
            np.full((16, 16, 3), 120, np.uint8), "png")))
    )
    rows.append(
        ("black", bytearray(encode_image(
            np.zeros((16, 16, 3), np.uint8), "png")))
    )
    df = spark.createDataFrame(rows, "id string, bytes binary").select(
        "id", image_quality_udf()(F.col("bytes")).alias("s")
    ).select("id", "s", low_information_col(F.col("s")).alias("low"))
    got = {r["id"]: r for r in df.collect()}
    for i in range(8):
        r = got[f"p{i}"]
        assert 0 <= r["s"]["mean_luma"] <= 255
        assert r["s"]["entropy_bits"] > 1.0  # noisy texture
        assert not r["low"]
    assert got["solid"]["low"] and got["solid"]["s"]["std_luma"] == 0.0
    assert got["black"]["low"] and got["black"]["s"]["dark_frac"] == 1.0

    # kernel-level: BT.601 integer luma
    px = np.zeros((1, 2, 3), np.uint8)
    px[0, 0] = (255, 0, 0)
    px[0, 1] = (0, 255, 0)
    y = luma_plane(px)
    assert y[0, 0] == (299 * 255) // 1000
    assert y[0, 1] == (587 * 255) // 1000
    mean, std, ent, dark, bright = quality_stats(
        np.full((4, 4, 3), 200, np.uint8)
    )
    assert (mean, std, ent, dark, bright) == (200.0, 0.0, 0.0, 0.0, 0.0)
