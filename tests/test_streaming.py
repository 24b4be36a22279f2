"""Structured Streaming candidate ingestion: exactly-once staging and
watermarked per-host rate aggregation."""

import json

import pytest
from pyspark.sql import functions as F

from crawlspark.streaming.ingest import (
    clean_candidates,
    host_arrival_rates,
    read_candidate_stream,
    stage_candidates,
)


@pytest.fixture()
def candidate_dir(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    rows = [
        {"raw_url": "HTTP://A.B:80/x#f", "depth": 1, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:00:01Z"},
        {"raw_url": "http://a.b/y", "depth": 1, "avail_ms": 5,
         "discovered_at": "2024-01-01T00:00:02Z"},
        {"raw_url": "mailto:bad@x", "depth": 1, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:00:03Z"},
        {"raw_url": "http://c.d/skip-me", "depth": 2, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:00:30Z"},
        {"raw_url": "http://c.d/keep", "depth": 2, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:01:10Z"},
    ]
    with open(d / "batch1.json", "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return d


def test_stream_staging_exactly_once(spark, tmp_path, candidate_dir):
    stream = read_candidate_stream(spark, str(candidate_dir))
    assert stream.isStreaming
    clean = clean_candidates(stream, exclude_patterns=(r"skip-me",))
    stage_candidates(
        clean, str(tmp_path / "staged"), str(tmp_path / "ckpt")
    )
    out = spark.read.parquet(str(tmp_path / "staged"))
    urls = sorted(r["url"] for r in out.collect())
    # normalized (scheme/host lowered, :80 and fragment stripped),
    # bad scheme dropped, exclude filter applied
    assert urls == ["http://a.b/x", "http://a.b/y", "http://c.d/keep"]
    # re-running against the same checkpoint ingests nothing new
    stage_candidates(
        clean, str(tmp_path / "staged"), str(tmp_path / "ckpt")
    )
    assert spark.read.parquet(str(tmp_path / "staged")).count() == 3


def test_host_arrival_rates(spark, tmp_path, candidate_dir):
    stream = read_candidate_stream(spark, str(candidate_dir))
    clean = clean_candidates(stream)
    rates = host_arrival_rates(clean, 60, 30, 120)
    q = (
        rates.writeStream.format("memory")
        .queryName("rates")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    # append mode only emits windows the watermark has closed; with a
    # single batch nothing closes — use complete mode on a fresh query
    q2 = (
        rates.writeStream.format("memory")
        .queryName("rates_all")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    rows = spark.sql(
        "select host, sum(n_candidates) n from rates_all group by host"
    ).collect()
    got = {r["host"]: r["n"] for r in rows}
    # sliding windows (60s window, 30s slide) double-count arrivals
    assert got["a.b"] == 4  # 2 candidates x 2 windows
    assert got["c.d"] >= 2


def test_firstseen_gate_stateful_across_batches(spark, tmp_path):
    """applyInPandasWithState keeps the per-host seen set ACROSS
    micro-batches: a URL re-discovered in a later file must be
    suppressed, new URLs pass (maxFilesPerTrigger=1 forces one
    micro-batch per file)."""
    from crawlspark.streaming.ingest import firstseen_gate

    d = tmp_path / "in"
    d.mkdir()
    b1 = [
        {"raw_url": "http://h.x/a", "depth": 1, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:00:01Z"},
        {"raw_url": "http://h.x/b", "depth": 1, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:00:02Z"},
    ]
    b2 = [
        {"raw_url": "http://h.x/a", "depth": 2, "avail_ms": 9,  # repeat
         "discovered_at": "2024-01-01T00:01:01Z"},
        {"raw_url": "http://h.x/c", "depth": 2, "avail_ms": 0,  # new
         "discovered_at": "2024-01-01T00:01:02Z"},
    ]
    for name, rows in (("b1.json", b1), ("b2.json", b2)):
        with open(d / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")

    stream = (
        spark.readStream.schema(
            "raw_url string, depth int, avail_ms long,"
            " discovered_at timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    gated = firstseen_gate(clean_candidates(stream))
    q = (
        gated.writeStream.format("memory")
        .queryName("gated")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["url"]: r["depth"]
        for r in spark.sql("select * from gated").collect()
    }
    assert set(got) == {"http://h.x/a", "http://h.x/b", "http://h.x/c"}
    assert got["http://h.x/a"] == 1  # the batch-2 rediscovery was gated


def test_politeness_gate_state_across_batches(spark, tmp_path):
    """The streaming scheduler must continue each host's schedule
    across micro-batches (batch 2 starts at last_sched + delay, not
    at avail), independently per host."""
    from crawlspark.streaming.ingest import politeness_gate

    d = tmp_path / "in"
    d.mkdir()
    b1 = [
        {"raw_url": "http://h.x/a", "depth": 1, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:00:01Z"},
        {"raw_url": "http://h.x/b", "depth": 1, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:00:02Z"},
        {"raw_url": "http://other.y/o", "depth": 1, "avail_ms": 50,
         "discovered_at": "2024-01-01T00:00:03Z"},
    ]
    b2 = [
        {"raw_url": "http://h.x/c", "depth": 2, "avail_ms": 0,
         "discovered_at": "2024-01-01T00:01:01Z"},
        {"raw_url": "http://h.x/d", "depth": 2, "avail_ms": 9000,
         "discovered_at": "2024-01-01T00:01:02Z"},
    ]
    for name, rows in (("b1.json", b1), ("b2.json", b2)):
        with open(d / name, "w") as f:
            for r in rows:
                f.write(json.dumps(r) + "\n")
    stream = (
        spark.readStream.schema(
            "raw_url string, depth int, avail_ms long,"
            " discovered_at timestamp"
        )
        .option("maxFilesPerTrigger", 1)
        .json(str(d))
    )
    q = (
        politeness_gate(clean_candidates(stream), delay_ms=1000)
        .writeStream.format("memory")
        .queryName("sched")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        r["url"]: r["sched_ms"]
        for r in spark.sql("select * from sched").collect()
    }
    hx = sorted(
        v for u, v in got.items() if u.startswith("http://h.x/")
    )
    # batch1: 0, 1000; batch2 continues: 2000, then 9000 (avail wins)
    assert hx == [0, 1000, 2000, 9000]
    assert got["http://other.y/o"] == 50  # independent host state
