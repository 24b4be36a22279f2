"""Unit tests for the URL-seen operators: Bloom prefilter, dense seq
assignment, first-wins dedup."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from crawlspark.operators.dedup import BloomPrefilter, assign_seq, first_wins


def test_bloom_no_false_negatives_and_low_fpp(spark):
    n = 50_000
    seen = spark.range(n).select(
        F.col("id").alias("url"), F.xxhash64(F.col("id")).alias("seen_key")
    )
    bloom = BloomPrefilter(1 << 20)
    bloom.add_df(seen)
    # candidates: half seen, half fresh
    cand = spark.range(n // 2, n + n // 2).select(
        F.col("id").alias("url"), F.xxhash64(F.col("id")).alias("seen_key")
    )
    maybe, fresh = bloom.filter_candidates(cand)
    maybe_ids = set(r["url"] for r in maybe.collect())
    fresh_ids = set(r["url"] for r in fresh.collect())
    # every genuinely-seen candidate MUST be in maybe (no false negatives)
    for i in range(n // 2, n):
        assert i in maybe_ids
    # false positive rate among genuinely-fresh candidates stays low
    fp = sum(1 for i in range(n, n + n // 2) if i in maybe_ids)
    assert fp / (n // 2) < 0.05, fp
    assert fresh_ids.isdisjoint(set(range(n // 2, n)))


def test_bloom_probe_overflow_safe():
    # keys at the int64 extremes must not overflow the probe math
    keys = np.array([-(1 << 63), (1 << 63) - 1, 0, -1], dtype=np.int64)
    for pos in BloomPrefilter._probe_positions(keys, 1 << 20):
        assert ((pos >= 0) & (pos < (1 << 20))).all()


def test_assign_seq_dense_and_ordered(spark):
    df = spark.range(10_000).select(
        (F.col("id") * 7919 % 10_000).alias("a"),
        F.col("id").alias("b"),
    )
    out = assign_seq(df, ["a", "b"], start=100).collect()
    rows = sorted(out, key=lambda r: (r["a"], r["b"]))
    seqs = [r["seq"] for r in rows]
    assert seqs == list(range(100, 100 + len(rows)))


def test_assign_seq_empty(spark):
    df = spark.createDataFrame([], "a long, b long")
    assert assign_seq(df, ["a", "b"], start=0).count() == 0


def test_first_wins(spark):
    df = spark.createDataFrame(
        [("u1", 5, 0), ("u1", 3, 1), ("u2", 9, 0), ("u1", 3, 0)],
        "url string, parent_seq long, out_pos int",
    )
    out = first_wins(df, "url", ["parent_seq", "out_pos"]).collect()
    got = {r["url"]: (r["parent_seq"], r["out_pos"]) for r in out}
    assert got == {"u1": (3, 0), "u2": (9, 0)}
