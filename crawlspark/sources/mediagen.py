"""Audio/video payload columns: opaque binary + typed metadata.

The multimodal contract the image payload (sources/docgen.py) already
follows, extended to the other two modalities a training-data crawl
carries: the PAYLOAD is an opaque ``binary`` column, the METADATA is
typed struct fields, and every media op is an Arrow-batched pandas
UDF / ``mapInPandas`` over that column — so the Spark-side plumbing
(schema, partitioning, batch shape) is identical whether the codec is
the deterministic fake below or a real library.

Codecs: the container ships no audio/video libraries, so the real
decode slots (``decode_audio_real`` / ``iter_frames_real``) are
import-gated stubs that raise ``NotImplementedError`` with the
library name — exactly like docgen's Pillow gate, they activate when
``soundfile`` / ``av`` are installed on a cluster. The FAKE codecs
are deterministic and self-contained:

* audio — PCM16 mono in a tiny ``FAUD`` container (sample rate +
  sample count header, blake2b-seeded samples), so RMS/ZCR feature
  extraction does real signal arithmetic;
* video — a ``FVID`` container of length-prefixed fake-codec image
  frames (docgen.encode_image), so frame sampling, thumbnailing and
  the whole existing image-transformer chain run on real frame bytes.

Reference anchor: the reference pipes every non-HTML payload through
Tika parsers (importer/.../parser/impl/DefaultParser.java) — binary in,
text+metadata out. Here each modality keeps its binary column and the
metadata is explicit struct fields (input_hint: typed columns, not a
string map).
"""

from __future__ import annotations

import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .docgen import _seed_bytes, encode_image, decode_image, pixels_for

AUD_MAGIC = b"FAUD"
VID_MAGIC = b"FVID"
_AUD_HDR = struct.Struct(">4sII")  # magic, sample_rate, n_samples
_VID_HDR = struct.Struct(">4sHHHH")  # magic, w, h, fps, n_frames


# -- fake audio codec ----------------------------------------------------------

def encode_audio(samples: np.ndarray, sample_rate: int) -> bytes:
    return _AUD_HDR.pack(AUD_MAGIC, sample_rate, len(samples)) + (
        samples.astype("<i2").tobytes()
    )


def decode_audio(buf: bytes) -> tuple[np.ndarray, int]:
    """-> (int16 samples, sample_rate); real-codec fallthrough."""
    magic, sr, n = _AUD_HDR.unpack(buf[: _AUD_HDR.size])
    if magic != AUD_MAGIC:
        return decode_audio_real(buf)
    return np.frombuffer(buf[_AUD_HDR.size :], dtype="<i2", count=n), sr


def decode_audio_real(buf: bytes) -> tuple[np.ndarray, int]:
    try:
        import soundfile  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real audio decode needs the 'soundfile' library (absent in "
            "this container); the FAUD fake codec exercises the full "
            "binary path"
        )
    import io

    import soundfile as sf

    data, sr = sf.read(io.BytesIO(buf), dtype="int16")
    return np.asarray(data), sr


def samples_for(audio_id: str, n: int) -> np.ndarray:
    """Deterministic int16 'waveform': seeded noise shaped by an
    id-dependent low-frequency envelope (so RMS genuinely differs
    between clips)."""
    raw = _seed_bytes(audio_id, 2 * n).view("<i2").astype(np.int32)
    env = (np.sin(np.linspace(0, 3 + (raw[0] % 7), n)) + 1.2) / 2.2
    return (raw // 4 * env).astype(np.int16)


# -- fake video codec ----------------------------------------------------------

def encode_video(frames: list[bytes], w: int, h: int, fps: int) -> bytes:
    out = [_VID_HDR.pack(VID_MAGIC, w, h, fps, len(frames))]
    for fr in frames:
        out.append(struct.pack(">I", len(fr)))
        out.append(fr)
    return b"".join(out)


def video_meta(buf: bytes) -> tuple[int, int, int, int]:
    magic, w, h, fps, n = _VID_HDR.unpack(buf[: _VID_HDR.size])
    if magic != VID_MAGIC:
        raise ValueError("not a FVID container")
    return w, h, fps, n


def iter_frames(buf: bytes):
    """Yield raw frame bytes (fake-codec images) from a FVID container."""
    _, _, _, n = video_meta(buf)
    off = _VID_HDR.size
    for _ in range(n):
        (ln,) = struct.unpack_from(">I", buf, off)
        off += 4
        yield buf[off : off + ln]
        off += ln


def iter_frames_real(buf: bytes):
    try:
        import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            "real video decode needs the 'av' (PyAV/ffmpeg) library "
            "(absent in this container); the FVID fake container "
            "exercises the full binary path"
        )
    raise NotImplementedError("wire av.open(BytesIO(buf)).decode(video=0)")


def make_video(video_id: str, w: int, h: int, fps: int, n_frames: int) -> bytes:
    frames = [
        encode_image(pixels_for(f"{video_id}:f{i}", w, h), "png")
        for i in range(n_frames)
    ]
    return encode_video(frames, w, h, fps)


# -- Spark ops -----------------------------------------------------------------

AUDIO_TYPE = T.StructType(
    [
        T.StructField("bytes", T.BinaryType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("codec", T.StringType()),
    ]
)


def make_audio_udf(sample_rate: int = 8000):
    """audio_id, duration_ms -> typed audio payload struct."""

    @F.pandas_udf(AUDIO_TYPE)
    def _synth(audio_id: pd.Series, duration_ms: pd.Series) -> pd.DataFrame:
        rows = []
        for aid, dur in zip(audio_id, duration_ms):
            n = int(sample_rate * int(dur) // 1000)
            rows.append(
                {
                    "bytes": encode_audio(samples_for(aid, n), sample_rate),
                    "sample_rate": sample_rate,
                    "n_samples": n,
                    "duration_ms": int(dur),
                    "codec": "pcm16",
                }
            )
        return pd.DataFrame(rows)[
            ["bytes", "sample_rate", "n_samples", "duration_ms", "codec"]
        ]

    return _synth


AUDIO_FEAT_TYPE = T.StructType(
    [
        T.StructField("rms", T.DoubleType()),
        T.StructField("zcr", T.DoubleType()),
    ]
)


@F.pandas_udf(AUDIO_FEAT_TYPE)
def audio_features_udf(buf: pd.Series) -> pd.DataFrame:
    """Feature extraction on the binary column: RMS energy and
    zero-crossing rate — numpy-vectorized per clip, Arrow-batched
    across clips."""
    rows = []
    for b in buf:
        s, _sr = decode_audio(b)
        x = s.astype(np.float64)
        rms = float(np.sqrt(np.mean(x * x))) if len(x) else 0.0
        zc = (
            float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1])))
            if len(x) > 1
            else 0.0
        )
        rows.append({"rms": rms, "zcr": zc})
    return pd.DataFrame(rows)[["rms", "zcr"]]


def sample_frames(
    video_df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "video_id",
    every_k: int = 2,
) -> DataFrame:
    """Frame sampling over the opaque video column: one output row per
    k-th frame (frame 0, k, 2k, ...), carrying the frame's image-codec
    bytes — which feed directly into the existing image ops
    (functions/images.py transformer chain, docgen.phash_udf).

    ``mapInPandas`` (not a scalar UDF) because the op EXPANDS rows:
    one clip -> ceil(n_frames / k) frames, decided inside the batch.
    """
    schema = (
        f"{id_col} string, frame_idx int, n_frames int, frame binary"
    )

    def expand(batches):
        for pdf in batches:
            out = []
            for vid, buf in zip(pdf[id_col], pdf[payload_col]):
                buf = bytes(buf)
                _, _, _, n = video_meta(buf)
                for i, fr in enumerate(iter_frames(buf)):
                    if i % every_k == 0:
                        out.append(
                            {
                                id_col: vid,
                                "frame_idx": i,
                                "n_frames": n,
                                "frame": fr,
                            }
                        )
            yield pd.DataFrame(
                out, columns=[id_col, "frame_idx", "n_frames", "frame"]
            )

    return video_df.select(id_col, payload_col).mapInPandas(expand, schema)


VIDEO_TYPE = T.StructType(
    [
        T.StructField("bytes", T.BinaryType()),
        T.StructField("w", T.IntegerType()),
        T.StructField("h", T.IntegerType()),
        T.StructField("fps", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
    ]
)


def make_video_udf(w: int = 16, h: int = 16, fps: int = 10):
    """video_id, n_frames -> typed video payload struct."""

    @F.pandas_udf(VIDEO_TYPE)
    def _synth(video_id: pd.Series, n_frames: pd.Series) -> pd.DataFrame:
        rows = []
        for vid, n in zip(video_id, n_frames):
            n = int(n)
            rows.append(
                {
                    "bytes": make_video(vid, w, h, fps, n),
                    "w": w,
                    "h": h,
                    "fps": fps,
                    "n_frames": n,
                    "duration_ms": int(n * 1000 // fps),
                }
            )
        return pd.DataFrame(rows)[
            ["bytes", "w", "h", "fps", "n_frames", "duration_ms"]
        ]

    return _synth


@F.pandas_udf(T.BooleanType())
def frame_decodes_udf(frame: pd.Series) -> pd.Series:
    """Does the frame payload decode to an (h, w, 3) image — the
    thumbnail-viability check before the image-transformer chain."""
    out = []
    for b in frame:
        try:
            px = decode_image(bytes(b))
            out.append(px.ndim == 3 and px.shape[2] == 3)
        except Exception:
            out.append(False)
    return pd.Series(out)


def video_neardup_pairs(
    video_df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "video_id",
    every_k: int = 2,
    max_dist: int = 4,
    min_shared: int = 2,
) -> DataFrame:
    """Video near-dup pairs via sampled-frame perceptual hashes — the
    composition a multimodal dedup pipeline actually runs: sample
    every k-th frame (mapInPandas), phash each frame (the image
    payload op), find near-matching frame pairs with the banded
    64-bit Hamming join, then aggregate to video pairs that share at
    least ``min_shared`` near-identical sampled frames.

    (a, b, n_shared_frames, min_hamming), a < b. Scale shape: the
    expensive step is the frame-phash band join — bucketed equi-join,
    never all-pairs over videos; frame volume is |videos| x
    ceil(frames/k) slim rows."""
    from ..operators.similarity import hamming64_dup_pairs
    from .docgen import phash_udf

    frames = sample_frames(video_df, payload_col, id_col, every_k)
    sigs = frames.select(
        F.concat_ws("#", F.col(id_col), F.col("frame_idx")).alias("fid"),
        phash_udf(F.col("frame")).alias("sig"),
    )
    fpairs = hamming64_dup_pairs(
        sigs, id_col="fid", sig_col="sig", max_dist=max_dist
    )
    va = F.split(F.col("a"), "#").getItem(0)
    vb = F.split(F.col("b"), "#").getItem(0)
    return (
        fpairs.select(
            F.least(va, vb).alias("a"),
            F.greatest(va, vb).alias("b"),
            "hamming",
        )
        .filter(F.col("a") != F.col("b"))
        .groupBy("a", "b")
        .agg(
            F.count("*").alias("n_shared_frames"),
            F.min("hamming").cast("long").alias("min_hamming"),
        )
        .filter(F.col("n_shared_frames") >= min_shared)
    )


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit audio fingerprint: sign of consecutive window-energy
    deltas over 65 equal windows (a chromaprint-style construction
    reduced to energy-only — amplitude-scale invariant, robust to
    re-quantization, deterministic)."""
    if len(samples) < 65:
        samples = np.pad(samples.astype(np.float64), (0, 65 - len(samples)))
    x = samples.astype(np.float64)
    bounds = np.linspace(0, len(x), 66).astype(int)
    e = np.array(
        [float(np.mean(x[bounds[i]:bounds[i + 1]] ** 2) if bounds[i+1] > bounds[i] else 0.0)
         for i in range(65)]
    )
    bits = e[1:] > e[:-1]
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= 1 << 63 else v


@F.pandas_udf(T.LongType())
def audio_fingerprint_udf(buf: pd.Series) -> pd.Series:
    return pd.Series(
        [audio_fingerprint64(decode_audio(b)[0]) for b in buf],
        dtype="int64",
    )


def audio_neardup_pairs(
    audio_df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "audio_id",
    max_dist: int = 4,
) -> DataFrame:
    """Audio near-dup pairs: fingerprint each clip (Arrow UDF over the
    binary column) and join near-matching fingerprints with the banded
    64-bit Hamming join — the same bucketed scale shape as
    text/image/video near-dup. (a, b, hamming), a < b."""
    from ..operators.similarity import hamming64_dup_pairs

    sigs = audio_df.select(
        F.col(id_col).alias("aid"),
        audio_fingerprint_udf(F.col(payload_col)).alias("sig"),
    )
    return hamming64_dup_pairs(
        sigs, id_col="aid", sig_col="sig", max_dist=max_dist
    )
