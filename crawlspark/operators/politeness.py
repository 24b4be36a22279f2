"""Per-host politeness scheduler — the one genuinely custom physical
operator (SURVEY.md §4: SiteDelay semantics).

Semantics (engine == oracle, see oracle/simulator.py):
    sched_i = max(avail_i, last_sched[host] + delay_ms)
processed per host in ``seq`` order, where ``avail`` is the
discovering parent's own scheduled time and ``delay_ms`` follows the
reference precedence robots crawl-delay > default 3 s
(AbstractDelayResolver.java:100-115; BaseDelayResolverConfig.java:64;
per-site serialization SiteDelay.java:44-58).

Physical shape: ``groupBy(host).applyInPandas`` with the recurrence
*vectorized* — for constant per-host delay,
    sched_i = i*delay + max(last+delay, running_max(avail_j - j*delay))
is a single ``np.maximum.accumulate``, so even a hot host with millions
of queued URLs costs O(n) numpy, not O(n) Python. Host groups are
hash-distributed across executors; cross-host skew is handled by AQE
(the group itself must stay whole — the recurrence is serial per host
by *definition* of politeness, so "salting" a host would change the
semantics; the scale lever is that per-row work is ~3 numpy ops).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def schedule_hosts(
    batch: DataFrame,
    host_delays: DataFrame,
    host_state: DataFrame | None,
    default_delay_ms: int,
) -> DataFrame:
    """Add ``sched_ms`` to a QUEUED batch.

    ``host_delays``: (host, crawl_delay_ms nullable) — small dim,
    broadcast. ``host_state``: (host, last_sched_ms) carried across
    supersteps (None on the first).
    """
    b = batch.join(F.broadcast(host_delays), "host", "left").withColumn(
        "__delay", F.coalesce(F.col("crawl_delay_ms"), F.lit(default_delay_ms))
    )
    if host_state is not None:
        b = b.join(F.broadcast(host_state), "host", "left")
    else:
        b = b.withColumn("last_sched_ms", F.lit(None).cast("long"))

    out_schema = batch.sparkSession.createDataFrame(
        [], batch.schema
    ).withColumn("sched_ms", F.lit(0).cast("long")).schema
    out_cols = [f.name for f in out_schema.fields]

    def sched_group(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("seq").reset_index(drop=True)
        delay = int(pdf["__delay"].iloc[0])
        last = pdf["last_sched_ms"].iloc[0]
        avail = pdf["avail_ms"].to_numpy(dtype="int64")
        idx = np.arange(len(pdf), dtype="int64")
        v = avail - idx * delay
        run = np.maximum.accumulate(v)
        if not pd.isna(last):
            run = np.maximum(run, np.int64(last) + delay)
        pdf["sched_ms"] = run + idx * delay
        return pdf[out_cols]

    return b.groupBy("host").applyInPandas(sched_group, schema=out_schema)
