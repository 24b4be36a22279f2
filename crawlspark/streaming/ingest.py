"""Continuous frontier ingestion via Structured Streaming.

The reference's crawl loop is batch-iterative ("process until queue
empty", CrawlerProcessStep.java:41-43) and has no event-time streaming
(SURVEY.md §2.15) — the superstep engine in plans/superstep.py is the
faithful rebuild. This module adds the Spark-native *continuous* entry
path the reference lacks: an external system (link discoverers, seed
feeds, recrawl schedulers) drops candidate files into a directory and
Structured Streaming applies the stateless half of the queue pipeline
(normalize -> host/seen-key -> reference filters) incrementally,
landing clean candidates in a staging table that each engine superstep
drains with an exactly-once file-source checkpoint.

Stateful stages (URL-seen anti-join, per-host politeness recurrence,
seq assignment) stay in the superstep loop on purpose: they need the
ledger total order, which a streaming micro-batch cannot see.

``host_arrival_rates`` shows the event-time side: watermarked sliding
windows over candidate arrival, the signal a scheduler uses to spot
hot hosts before they skew a superstep.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.urls import normalize_url_udf, url_host_udf

CANDIDATE_SCHEMA = (
    "raw_url string, depth int, avail_ms long, discovered_at timestamp"
)


def read_candidate_stream(spark: SparkSession, input_dir: str) -> DataFrame:
    """File-source stream of raw candidates (one JSON object per line)."""
    return (
        spark.readStream.schema(CANDIDATE_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(input_dir)
    )


def clean_candidates(
    stream: DataFrame,
    include_patterns: tuple[str, ...] = (),
    exclude_patterns: tuple[str, ...] = (),
) -> DataFrame:
    """Stateless queue-pipeline stages on the stream: normalize,
    host/seen-key derivation, reference filters (§2.2 order)."""
    c = stream.withColumn("url", normalize_url_udf(F.col("raw_url"))).filter(
        F.col("url").isNotNull()
    )
    keep = F.lit(True)
    for pat in exclude_patterns:
        keep = keep & ~F.col("url").rlike(pat)
    if include_patterns:
        any_inc = F.lit(False)
        for pat in include_patterns:
            any_inc = any_inc | F.col("url").rlike(pat)
        keep = keep & any_inc
    return c.filter(keep).select(
        "url",
        F.xxhash64(F.col("url")).alias("seen_key"),
        url_host_udf(F.col("url")).alias("host"),
        "depth",
        "avail_ms",
        "discovered_at",
    )


def stage_candidates(
    clean: DataFrame,
    staging_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Exactly-once landing into the staging table the superstep loop
    drains. availableNow=True processes the backlog then stops (test
    mode); False runs continuously."""
    writer = (
        clean.writeStream.format("parquet")
        .option("path", staging_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    q = writer.start()
    if available_now:
        q.awaitTermination()
    return q


def host_arrival_rates(
    clean: DataFrame,
    window_seconds: int = 60,
    slide_seconds: int = 30,
    watermark_seconds: int = 120,
) -> DataFrame:
    """Watermarked sliding-window candidate arrival rate per host —
    the hot-host early-warning feed (drives salting/budget decisions
    before politeness scheduling sees the skew)."""
    return (
        clean.withWatermark("discovered_at", f"{watermark_seconds} seconds")
        .groupBy(
            F.window(
                F.col("discovered_at"),
                f"{window_seconds} seconds",
                f"{slide_seconds} seconds",
            ),
            F.col("host"),
        )
        .agg(
            F.count("*").alias("n_candidates"),
            F.approx_count_distinct("seen_key").alias("approx_unique"),
        )
    )


def firstseen_gate(clean: DataFrame) -> DataFrame:
    """Stateful streaming URL-seen gate: per-host GroupState holds the
    set of seen keys and only FIRST arrivals pass — the continuous
    analog of QueueReferenceStage's anti-join, built on
    ``applyInPandasWithState`` (the custom-stateful-operator slot).

    The exact ledger anti-join stays in the superstep (it needs the
    crawl's total order); this gate runs UPSTREAM so repeat
    discoveries never reach the staging table — at frontier rates
    where the same hot URL is rediscovered thousands of times per
    minute, it is the difference between a staging table of unique
    candidates and one of raw link volume.

    Scale shape: state is sharded by host (the crawl's natural key,
    same partitioning politeness uses), lives in the state store
    (RocksDB on a real cluster), and holds int64 hashes, not URLs —
    ~8 bytes per unique URL per host. Arrow-batched; no per-row
    Python calls outside the vectorized loop.
    """
    import pandas as pd

    out_schema = "url string, host string, depth int, avail_ms long"
    state_schema = "seen array<long>"

    def gate(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        outs = []
        for pdf in pdfs:
            mask = []
            for v in pdf["seen_key"]:
                v = int(v)
                if v in seen:
                    mask.append(False)
                else:
                    seen.add(v)
                    mask.append(True)
            outs.append(
                pdf.loc[mask, ["url", "host", "depth", "avail_ms"]]
            )
        state.update((list(seen),))
        yield pd.concat(outs) if outs else pd.DataFrame(
            columns=["url", "host", "depth", "avail_ms"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return clean.groupBy("host").applyInPandasWithState(
        gate,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )


def politeness_gate(clean: DataFrame, delay_ms: int = 1000) -> DataFrame:
    """Continuous per-host politeness scheduler: the streaming analog
    of the batch recurrence (operators/politeness.py, sched =
    max(avail, last + delay)) with each host's ``last_sched`` carried
    ACROSS micro-batches in GroupState.

    Within a micro-batch, rows are ordered (avail_ms, seen_key) — the
    stream has no ledger seq, so that pair is the documented
    deterministic order. State is one int64 per host (same host
    sharding as the first-seen gate); Arrow-batched like the batch
    recurrence.
    """
    import pandas as pd

    out_schema = (
        "url string, host string, depth int, avail_ms long,"
        " sched_ms long"
    )
    state_schema = "last_sched long"

    def sched(key, pdfs, state):
        last = int(state.get[0]) if state.exists else None
        outs = []
        for pdf in pdfs:
            pdf = pdf.sort_values(
                ["avail_ms", "seen_key"]
            ).reset_index(drop=True)
            scheds = []
            for avail in pdf["avail_ms"]:
                s = (
                    int(avail)
                    if last is None
                    else max(int(avail), last + delay_ms)
                )
                scheds.append(s)
                last = s
            out = pdf[["url", "host", "depth", "avail_ms"]].copy()
            out["sched_ms"] = scheds
            outs.append(out)
        if last is not None:
            state.update((last,))
        yield pd.concat(outs) if outs else pd.DataFrame(
            columns=["url", "host", "depth", "avail_ms", "sched_ms"]
        )

    from pyspark.sql.streaming.state import GroupStateTimeout

    return clean.groupBy("host").applyInPandasWithState(
        sched,
        out_schema,
        state_schema,
        "update",
        GroupStateTimeout.NoTimeout,
    )
