"""Image transformation operators over the binary payload column.

From-scratch analogs of the reference's image operators:

* ``ImageTransformer`` (importer/.../transformer/impl/
  ImageTransformer.java): a configured chain of scale / rotate / crop
  operations applied to an image stream, plus target-format
  re-encode. Here the chain is applied Arrow-vectorized over the
  ``bytes`` binary column (one pandas UDF per batch, numpy per image
  — no per-row Python loops beyond the unavoidable per-image codec
  call, exactly how a Pillow-backed version would run on a cluster).
* ``FeaturedImageResolver`` candidate selection
  (web/.../image/impl/FeaturedImageResolver.java:99-254): the
  ``minDimensions`` filter and ``largest``-pick over a page's
  candidate images — pure Column expressions over an
  ``array<struct<...>>``, no Python at all.

The codec is the deterministic fake from ``sources.docgen`` (Pillow is
absent in this container — see docgen.decode_real); every Spark-side
piece (schema, batching, op chain, selection) is real.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..sources.docgen import decode_image, encode_image

# ---------------------------------------------------------------------------
# numpy kernels (one image at a time; vectorized across pixels)
# ---------------------------------------------------------------------------


def resize_pixels(px: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Area-mean downscale / nearest-neighbor upscale, (h, w, 3) uint8.

    Matches the common "box filter down, nearest up" behavior of
    java.awt's getScaledInstance(SCALE_AREA_AVERAGING) that
    ImageTransformer uses for shrink-heavy pipelines.
    """
    h, w, _ = px.shape
    if out_w == w and out_h == h:
        return px
    if out_w <= w and out_h <= h:
        ys = np.linspace(0, h, out_h + 1).astype(int)
        xs = np.linspace(0, w, out_w + 1).astype(int)
        out = np.empty((out_h, out_w, 3), dtype=np.uint8)
        for r in range(out_h):
            band = px[ys[r] : max(ys[r] + 1, ys[r + 1])]
            # mean over y once per row-band, then per x-band
            bm = band.mean(axis=0)
            for c in range(out_w):
                out[r, c] = bm[xs[c] : max(xs[c] + 1, xs[c + 1])].mean(axis=0)
        return out
    yi = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    xi = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return px[yi][:, xi]


def crop_pixels(
    px: np.ndarray, x: int, y: int, cw: int, ch: int
) -> np.ndarray:
    h, w, _ = px.shape
    x0, y0 = max(0, x), max(0, y)
    return px[y0 : min(h, y0 + ch), x0 : min(w, x0 + cw)]


def rotate_pixels(px: np.ndarray, degrees: int) -> np.ndarray:
    """Right-angle rotation (ImageTransformer supports arbitrary
    angles; the non-right-angle path needs an interpolating raster lib
    and is out of scope with the fake codec)."""
    if degrees % 90 != 0:
        raise ValueError("only right-angle rotations are supported")
    # np.rot90 is counter-clockwise; the reference's Rotate is clockwise
    return np.rot90(px, k=(-degrees // 90) % 4)


def apply_ops(px: np.ndarray, ops: tuple) -> np.ndarray:
    """Apply an ImageTransformer op chain to one image.

    ops: tuple of ("scale", w, h) | ("scale_factor", f) |
    ("crop", x, y, w, h) | ("rotate", degrees) | ("flip", "h"|"v").
    """
    for op in ops:
        kind = op[0]
        if kind == "scale":
            px = resize_pixels(px, int(op[1]), int(op[2]))
        elif kind == "scale_factor":
            h, w, _ = px.shape
            px = resize_pixels(
                px, max(1, int(w * op[1])), max(1, int(h * op[1]))
            )
        elif kind == "crop":
            px = crop_pixels(px, *(int(v) for v in op[1:]))
        elif kind == "rotate":
            px = rotate_pixels(px, int(op[1]))
        elif kind == "flip":
            px = px[:, ::-1] if op[1] == "h" else px[::-1]
        else:
            raise ValueError(f"unknown image op {kind!r}")
    return np.ascontiguousarray(px)


# ---------------------------------------------------------------------------
# Spark surface
# ---------------------------------------------------------------------------

TRANSFORMED_TYPE = T.StructType(
    [
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fmt", T.StringType()),
    ]
)


def transform_image_udf(
    ops: tuple, target_fmt: str | None = None, codec: str = "fake"
):
    """Arrow-batched ImageTransformer: bytes -> transformed struct.

    ``ops`` is the configured chain (closed over — identical for every
    row, like the reference's XML-configured transformer);
    ``target_fmt`` re-encodes to another format (ImageTransformer's
    ``targetFormat``), defaulting to the source format. ``codec``
    picks the re-encode path: "fake" (the deterministic sandbox
    codec) or "real" (Pillow — docgen.encode_real; use where the
    library exists). Decoding auto-detects per buffer either way.
    """
    if codec == "real":
        from ..sources.docgen import encode_real as _enc
    else:
        _enc = encode_image

    @F.pandas_udf(TRANSFORMED_TYPE)
    def _transform(buf: pd.Series, fmt: pd.Series) -> pd.DataFrame:
        rows = []
        for b, f in zip(buf, fmt):
            px = apply_ops(decode_image(b), ops)
            out_fmt = target_fmt or f
            rows.append(
                {
                    "bytes": _enc(px, out_fmt),
                    "w": px.shape[1],
                    "h": px.shape[0],
                    "fmt": out_fmt,
                }
            )
        return pd.DataFrame(rows)[["bytes", "w", "h", "fmt"]]

    return _transform


def pick_featured(
    candidates: Column, min_w: int = 0, min_h: int = 0, largest: bool = True
) -> Column:
    """FeaturedImageResolver selection over a page's candidate images.

    ``candidates``: array<struct<... w:int, h:int ...>>. Drops images
    below ``minDimensions`` (FeaturedImageResolver.java:208-216), then
    picks the LARGEST by pixel area when ``largest`` (the resolver's
    ``setLargest(true)``), else the FIRST qualifying in document order
    (default DOM-order pick). Pure Column expressions — evaluated
    JVM-side, null when nothing qualifies.
    """
    ok = F.filter(
        candidates,
        lambda c: (c["w"] >= F.lit(min_w)) & (c["h"] >= F.lit(min_h)),
    )
    if not largest:
        return F.when(F.size(ok) > 0, F.element_at(ok, 1))
    best = F.aggregate(
        ok,
        F.element_at(ok, 1),
        lambda acc, c: F.when(
            c["w"] * c["h"] > acc["w"] * acc["h"], c
        ).otherwise(acc),
    )
    return F.when(F.size(ok) > 0, best)


# ---------------------------------------------------------------------------
# image quality stats (training-data filters for image+caption corpora)
# ---------------------------------------------------------------------------
# The LAION-class payload filters an image-caption pipeline runs before
# training: luma statistics, histogram entropy, dark/blown-out pixel
# fractions, and the low-information verdict (solid-color thumbnails,
# tracking pixels, black frames). Integer luma (BT.601 scaled by 1000,
# floor division) keeps the per-pixel math exact and engine-agnostic;
# the aggregate stats are exact doubles for the fixture shapes the
# oracle hashes (solid / two-value images).

IMAGE_QUALITY_TYPE = T.StructType(
    [
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("std_luma", T.DoubleType()),
        T.StructField("entropy_bits", T.DoubleType()),
        T.StructField("dark_frac", T.DoubleType()),
        T.StructField("bright_frac", T.DoubleType()),
    ]
)


def luma_plane(px: np.ndarray) -> np.ndarray:
    """Integer BT.601 luma: (299 R + 587 G + 114 B) // 1000."""
    p = px.astype(np.int64)
    return (
        299 * p[:, :, 0] + 587 * p[:, :, 1] + 114 * p[:, :, 2]
    ) // 1000


def quality_stats(px: np.ndarray) -> tuple[float, float, float, float, float]:
    y = luma_plane(px).ravel()
    n = y.size
    mean = float(y.mean())
    std = float(np.sqrt(((y - y.mean()) ** 2).mean()))
    counts = np.bincount(y.astype(np.int64), minlength=256)
    p = counts[counts > 0] / n
    # max() canonicalizes the single-bin case's -0.0 to 0.0 (the
    # value-hash oracle distinguishes signed zeros)
    entropy = float(max(0.0, -(p * np.log2(p)).sum()))
    dark = float((y < 16).sum() / n)
    bright = float((y > 239).sum() / n)
    return mean, std, entropy, dark, bright


def image_quality_udf():
    """Arrow-vectorized quality stats over the bytes column."""

    @F.pandas_udf(IMAGE_QUALITY_TYPE)
    def udf(buf: pd.Series) -> pd.DataFrame:
        rows = []
        for b in buf:
            if b is None:
                rows.append((None,) * 5)
                continue
            rows.append(quality_stats(decode_image(bytes(b))))
        return pd.DataFrame(
            rows,
            columns=[f.name for f in IMAGE_QUALITY_TYPE.fields],
        )

    return udf


def low_information_col(
    stats: Column,
    min_std: float = 2.0,
    min_entropy: float = 1.0,
    max_dark: float = 0.95,
    max_bright: float = 0.95,
) -> Column:
    """The keep/drop verdict over an IMAGE_QUALITY_TYPE struct: flat
    (std below min), near-constant histogram (entropy below min), or
    dominated by dark/blown pixels."""
    return (
        (stats["std_luma"] < min_std)
        | (stats["entropy_bits"] < min_entropy)
        | (stats["dark_frac"] > max_dark)
        | (stats["bright_frac"] > max_bright)
    )
