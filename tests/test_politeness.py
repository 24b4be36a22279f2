"""Directed unit tests for the per-host politeness scheduler."""

import pytest
from pyspark.sql import functions as F

from crawlspark.operators.politeness import schedule_hosts


def _batch(spark, rows):
    return spark.createDataFrame(
        rows, "url string, host string, seq long, avail_ms long"
    )


def test_recurrence_basic(spark):
    batch = _batch(
        spark,
        [
            ("u1", "h1", 0, 0),
            ("u2", "h1", 1, 0),
            ("u3", "h1", 2, 5000),
            ("u4", "h2", 3, 0),
        ],
    )
    delays = spark.createDataFrame(
        [("h1", 1000)], "host string, crawl_delay_ms long"
    )
    out = {
        r["url"]: r["sched_ms"]
        for r in schedule_hosts(batch, delays, None, 3000).collect()
    }
    # h1: first at avail=0; second waits delay; third's avail dominates
    assert out["u1"] == 0
    assert out["u2"] == 1000
    assert out["u3"] == 5000
    # h2 has no robots delay -> default applies but first fetch = avail
    assert out["u4"] == 0


def test_carried_host_state(spark):
    batch = _batch(spark, [("u1", "h1", 10, 0), ("u2", "h1", 11, 0)])
    delays = spark.createDataFrame(
        [("h1", 2000)], "host string, crawl_delay_ms long"
    )
    state = spark.createDataFrame(
        [("h1", 9000)], "host string, last_sched_ms long"
    )
    out = {
        r["url"]: r["sched_ms"]
        for r in schedule_hosts(batch, delays, state, 3000).collect()
    }
    assert out["u1"] == 11000  # last + delay
    assert out["u2"] == 13000


def test_default_delay_precedence(spark):
    # robots delay present -> overrides default (AbstractDelayResolver
    # precedence :100-115); absent -> default
    batch = _batch(
        spark, [("a1", "ha", 0, 0), ("a2", "ha", 1, 0), ("b1", "hb", 2, 0), ("b2", "hb", 3, 0)]
    )
    delays = spark.createDataFrame(
        [("ha", 500), ("hb", None)], "host string, crawl_delay_ms long"
    )
    out = {
        r["url"]: r["sched_ms"]
        for r in schedule_hosts(batch, delays, None, 3000).collect()
    }
    assert out["a2"] - out["a1"] == 500
    assert out["b2"] - out["b1"] == 3000


def test_hot_host_vectorized_scale(spark):
    # one host, 50k queued rows: the recurrence must be O(n) numpy,
    # not per-row Python — this finishes in seconds if vectorized
    n = 50_000
    batch = spark.range(n).select(
        F.concat(F.lit("u"), F.col("id")).alias("url"),
        F.lit("hot.example").alias("host"),
        F.col("id").alias("seq"),
        F.lit(0).cast("long").alias("avail_ms"),
    )
    delays = spark.createDataFrame(
        [("hot.example", 10)], "host string, crawl_delay_ms long"
    )
    out = schedule_hosts(batch, delays, None, 3000)
    agg = out.agg(
        F.max("sched_ms").alias("mx"), F.count("*").alias("n")
    ).collect()[0]
    assert agg["n"] == n
    assert agg["mx"] == (n - 1) * 10
