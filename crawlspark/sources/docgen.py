"""Image+caption document payload (BASELINE.json input_hint table).

Committed pages become rows of the ``documents`` table
``(image_id string, bytes binary, w int, h int, fmt string,
caption string, phash long)`` — the FeaturedImageResolver analog
(web/.../image/impl/FeaturedImageResolver.java:99-254: fetch/decode/
scale/store the page's featured image).

Codec paths, most-real-first: ``decode_real`` uses Pillow when
importable (import-gated; this container lacks Pillow so those tests
skip, and ``decode_real`` raises ImportError with a clear message if
called without it); real PNG bytes also decode through the vendored
pure-Python codec (functions/pngcodec.py — zlib + filters, no
third-party deps, CI-verifiable here); everything else uses the
deterministic fake codec below. Every Spark-side piece is real
regardless of codec: binary columns, Arrow-vectorized
encode/decode/phash/PSNR UDF plumbing, schema, partitioning.

Fake codec format (self-describing, lossy-capable):
  header = magic(5s) | fmt(4s) | w(uint16) | h(uint16) | quant(uint8)
  body   = zlib(raw or quantized RGB uint8, C-order)
"jpeg"/"webp" quantize to step 4 => max abs error 2, PSNR ≈ 47 dB —
exercising the PSNR>=40dB lossy gate for real; "png" is lossless.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAGIC = b"CSIMG"
_HDR = struct.Struct(">5s4sHHB")
_QUANT = {"png": 0, "jpeg": 4, "webp": 4}
_WORDS = (
    "amber basalt cirrus dune ember fjord garnet harbor isle juniper "
    "krill lagoon mesa nectar onyx prairie quartz reef summit tundra"
).split()


def _seed_bytes(key: str, n: int) -> np.ndarray:
    """Deterministic uint8 stream from blake2b in counter mode."""
    out = bytearray()
    i = 0
    while len(out) < n:
        out += hashlib.blake2b(f"{key}:{i}".encode(), digest_size=64).digest()
        i += 1
    return np.frombuffer(bytes(out[:n]), dtype=np.uint8)


def pixels_for(image_id: str, w: int, h: int) -> np.ndarray:
    """Oracle pixels: seeded noise + an id-dependent gradient (h, w, 3).

    The gradient orientation/scale derive from the id so different
    images have genuinely different low-frequency structure (and hence
    distant phashes) — pure position gradients would make every
    image's phash near-identical."""
    noise = _seed_bytes(image_id, w * h * 3).reshape(h, w, 3).astype(np.int16)
    d = hashlib.blake2b(f"grad:{image_id}".encode(), digest_size=4).digest()
    ax = (d[0] % 5) - 2  # -2..2
    ay = (d[1] % 5) - 2
    phase = d[2]
    yy, xx = np.mgrid[0:h, 0:w]
    grad = (ax * xx * 255 // max(1, w - 1) + ay * yy * 255 // max(1, h - 1) + phase) % 256
    px = (noise // 2 + grad[..., None] // 2).astype(np.uint8)
    return px


def fmt_for(image_id: str) -> str:
    d = hashlib.blake2b(image_id.encode(), digest_size=2).digest()
    return ("png", "jpeg", "webp")[d[0] % 3]


def caption_for(image_id: str) -> str:
    d = hashlib.blake2b(f"cap:{image_id}".encode(), digest_size=8).digest()
    words = " ".join(_WORDS[b % len(_WORDS)] for b in d[:5])
    return f"{words} ({image_id})"


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    h, w, _ = pixels.shape
    q = _QUANT[fmt]
    data = pixels if q == 0 else ((pixels // q) * q + q // 2).astype(np.uint8)
    return _HDR.pack(MAGIC, fmt.encode().ljust(4), w, h, q) + zlib.compress(
        data.tobytes(), 1
    )


def decode_image(buf: bytes) -> np.ndarray:
    """Decode fake-codec bytes -> (h, w, 3) uint8."""
    magic, _fmt, w, h, _q = _HDR.unpack(buf[: _HDR.size])
    if magic != MAGIC:
        return decode_real(buf)
    raw = zlib.decompress(buf[_HDR.size :])
    return np.frombuffer(raw, dtype=np.uint8).reshape(h, w, 3)


def have_pil() -> bool:
    """True when Pillow is importable — the real codec's gate (the
    sandbox container ships without it; clusters install it)."""
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def decode_real(buf: bytes) -> np.ndarray:
    """Real-format decode (activates automatically: ``decode_image``
    falls through here for any buffer without the fake codec's magic).
    Pillow when importable; without it, real PNG bytes decode through
    the vendored pure-Python codec (functions/pngcodec.py) and real
    baseline-JPEG bytes through the vendored JFIF codec
    (functions/jpegcodec.py), so this container's CI exercises real
    bytes -> pixels end to end INCLUDING the lossy PSNR>=40dB gate.
    WebP without Pillow raises NotImplementedError; the Spark
    plumbing (schema, batching, UDF signatures) is identical either
    way."""
    try:
        import io

        from PIL import Image  # noqa: F401

        return np.asarray(Image.open(io.BytesIO(buf)).convert("RGB"))
    except ImportError as exc:
        from crawlspark.functions.pngcodec import PNG_SIG, decode_png

        if buf[:8] == PNG_SIG:
            return decode_png(buf)
        if buf[:2] == b"\xff\xd8":  # JPEG SOI
            from crawlspark.functions.jpegcodec import decode_jpeg

            return decode_jpeg(buf)
        raise NotImplementedError(
            "real webp decode requires Pillow (not in this container); "
            "PNG/JPEG decode via the vendored functions/pngcodec.py / "
            "jpegcodec.py and fake-codec bytes carry the CSIMG magic "
            "and decode natively"
        ) from exc


def encode_real(pixels: np.ndarray, fmt: str, quality: int = 98) -> bytes:
    """Real-format encode: Pillow when importable, else the vendored
    pure-Python codecs for PNG (lossless) and baseline JPEG (4:4:4,
    libjpeg quality scaling) — so the input_hint's decoded-pixel
    invariant (exact for PNG, PSNR>=40dB for lossy) executes on REAL
    bytes in containers without Pillow. WebP still requires Pillow
    (skip-not-fail where absent).

    JPEG writes 4:4:4 at ``quality`` so the PSNR>=40dB gate holds on
    real bytes; PNG is lossless; WebP writes lossless (cwebp's
    -lossless) so the round-trip gate is format-independent. The
    default quality is 98 because the synthetic oracle pixels
    (pixels_for) are half-amplitude noise — the hardest content class
    for DCT coding: q95 lands ~36dB on them, q98 ~43dB with margin,
    and the encode stays genuinely lossy (asserted in tests)."""
    f = fmt.lower()
    try:
        import io

        from PIL import Image
    except ImportError:
        if f == "png":
            from crawlspark.functions.pngcodec import encode_png

            return encode_png(pixels)
        if f in ("jpg", "jpeg"):
            from crawlspark.functions.jpegcodec import encode_jpeg

            return encode_jpeg(pixels, quality=quality)
        raise NotImplementedError(
            "real webp encode requires Pillow (not in this container)"
        ) from None
    img = Image.fromarray(pixels, mode="RGB")
    bio = io.BytesIO()
    if f in ("jpg", "jpeg"):
        img.save(bio, format="JPEG", quality=quality, subsampling=0)
    elif f == "webp":
        img.save(bio, format="WEBP", lossless=True)
    else:
        img.save(bio, format=f.upper())
    return bio.getvalue()


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash: 8x8 block-mean grayscale vs its median."""
    gray = pixels.astype(np.uint32).sum(axis=2) // 3
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8), dtype=np.float64)
    for r in range(8):
        for c in range(8):
            blocks[r, c] = gray[ys[r] : ys[r + 1], xs[c] : xs[c + 1]].mean()
    bits = (blocks > np.median(blocks)).flatten()
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v  # int64 two's complement


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def make_document(image_id: str, w: int, h: int) -> dict:
    """Full oracle document row for one committed page."""
    fmt = fmt_for(image_id)
    px = pixels_for(image_id, w, h)
    buf = encode_image(px, fmt)
    return {
        "image_id": image_id,
        "bytes": buf,
        "w": w,
        "h": h,
        "fmt": fmt,
        "caption": caption_for(image_id),
        "phash": phash64(decode_image(buf)),
    }


# ---------------------------------------------------------------------------
# Spark surface — Arrow-vectorized UDFs over the binary column.
# ---------------------------------------------------------------------------

DOCUMENT_TYPE = T.StructType(
    [
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
        T.StructField("caption", T.StringType()),
        T.StructField("phash", T.LongType()),
    ]
)


def make_document_udf(w: int, h: int):
    """Synthesize the image payload for committed page URLs."""

    @F.pandas_udf(DOCUMENT_TYPE)
    def _synth(image_id: pd.Series) -> pd.DataFrame:
        rows = [make_document(u, w, h) for u in image_id]
        return pd.DataFrame(rows)[["bytes", "w", "h", "fmt", "caption", "phash"]]

    return _synth


@F.pandas_udf(T.LongType())
def phash_udf(buf: pd.Series) -> pd.Series:
    return pd.Series([phash64(decode_image(b)) for b in buf], dtype="int64")


def psnr_vs_oracle_udf():
    """PSNR of stored bytes vs the oracle pixels (the per-row
    decoded-pixel invariant from input_hint)."""

    @F.pandas_udf(T.DoubleType())
    def _psnr(image_id: pd.Series, buf: pd.Series, w: pd.Series, h: pd.Series) -> pd.Series:
        out = []
        for iid, b, wi, hi in zip(image_id, buf, w, h):
            out.append(psnr(pixels_for(iid, int(wi), int(hi)), decode_image(b)))
        return pd.Series(out, dtype="float64")

    return _psnr
