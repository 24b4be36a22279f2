"""Audio/video payload columns: fake codecs, feature extraction,
frame sampling (sources/mediagen.py)."""

import numpy as np
import pytest

from crawlspark.sources.mediagen import (
    decode_audio,
    decode_audio_real,
    encode_audio,
    iter_frames,
    iter_frames_real,
    make_video,
    samples_for,
    video_meta,
)
from crawlspark.sources.docgen import decode_image


def test_audio_roundtrip_deterministic():
    s = samples_for("aud://1", 4000)
    buf = encode_audio(s, 8000)
    got, sr = decode_audio(buf)
    assert sr == 8000
    assert np.array_equal(got, s)
    assert np.array_equal(samples_for("aud://1", 4000), s)  # deterministic
    assert not np.array_equal(samples_for("aud://2", 4000), s)


def test_video_container_and_frames():
    buf = make_video("vid://7", 16, 16, 10, 5)
    w, h, fps, n = video_meta(buf)
    assert (w, h, fps, n) == (16, 16, 10, 5)
    frames = list(iter_frames(buf))
    assert len(frames) == 5
    px = decode_image(frames[3])
    assert px.shape == (16, 16, 3)
    # frames genuinely differ (id-dependent pixels per frame)
    assert not np.array_equal(decode_image(frames[0]), px)


def test_real_codec_slots_are_gated():
    with pytest.raises(NotImplementedError):
        decode_audio_real(b"RIFFxxxx")
    with pytest.raises(NotImplementedError):
        list(iter_frames_real(b"\x00\x00\x00 ftypisom"))


def test_sample_frames_spark(spark):
    from pyspark.sql import functions as F

    from crawlspark.sources.mediagen import make_video_udf, sample_frames

    d = spark.range(3).select(
        F.concat(F.lit("vid://"), F.col("id")).alias("video_id"),
        (F.lit(4) + F.col("id").cast("int")).alias("nf"),  # 4,5,6 frames
    )
    vid = d.select(
        "video_id",
        make_video_udf(16, 16, 10)(F.col("video_id"), F.col("nf"))[
            "bytes"
        ].alias("payload"),
    )
    rows = sample_frames(vid, "payload", "video_id", every_k=2).collect()
    by_vid = {}
    for r in rows:
        by_vid.setdefault(r["video_id"], []).append(r["frame_idx"])
    assert sorted(by_vid["vid://0"]) == [0, 2]        # 4 frames
    assert sorted(by_vid["vid://1"]) == [0, 2, 4]     # 5 frames
    assert sorted(by_vid["vid://2"]) == [0, 2, 4]     # 6 frames
    px = decode_image(bytes(rows[0]["frame"]))
    assert px.shape == (16, 16, 3)


def test_video_neardup_pairs_spark(spark):
    """A lossy re-encode of the same video must pair with the original
    (sampled frames phash-near), unrelated videos must not."""
    from pyspark.sql import functions as F

    from crawlspark.sources.docgen import (
        decode_image,
        encode_image,
    )
    from crawlspark.sources.mediagen import (
        encode_video,
        iter_frames,
        make_video,
        video_neardup_pairs,
    )

    orig = make_video("vid://x", 32, 32, 10, 6)
    # near-dup twin: every frame jpeg-roundtripped (phash moves a little)
    twin = encode_video(
        [
            encode_image(decode_image(fr), "jpeg")
            for fr in iter_frames(orig)
        ],
        32,
        32,
        10,
    )
    other = make_video("vid://unrelated", 32, 32, 10, 6)
    df = spark.createDataFrame(
        [("v-orig", orig), ("v-twin", twin), ("v-other", other)],
        "video_id string, payload binary",
    )
    got = {
        (r["a"], r["b"]): r["n_shared_frames"]
        for r in video_neardup_pairs(df).collect()
    }
    assert ("v-orig", "v-twin") in got, got
    assert got[("v-orig", "v-twin")] >= 2
    assert all({a, b} == {"v-orig", "v-twin"} for a, b in got), got


def test_audio_neardup_pairs_spark(spark):
    """A re-quantized copy of a clip pairs with the original (energy
    deltas keep their signs); a different clip does not."""
    from crawlspark.sources.mediagen import (
        audio_neardup_pairs,
        encode_audio,
        samples_for,
    )

    a = samples_for("aud://one", 8000)
    a_quant = ((a.astype(np.int32) // 8) * 8).astype(np.int16)
    b = samples_for("aud://two", 8000)
    df = spark.createDataFrame(
        [
            ("a", encode_audio(a, 8000)),
            ("a2", encode_audio(a_quant, 8000)),
            ("b", encode_audio(b, 8000)),
        ],
        "audio_id string, payload binary",
    )
    got = {
        (r["a"], r["b"]): r["hamming"]
        for r in audio_neardup_pairs(df).collect()
    }
    assert ("a", "a2") in got, got
    assert all({x, y} == {"a", "a2"} for x, y in got), got
