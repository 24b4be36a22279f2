"""SparkSession factory tuned for the crawl workload.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-plan + skew-join splitting for hot hosts), Arrow
on (every custom operator is a pandas/Arrow UDF), shuffle partitions
sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "crawlspark",
    cores: int | str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) a SparkSession.

    ``cores`` may be an int (-> local[N]) or a master string. On a real
    cluster this function is bypassed by spark-submit's own session; all
    configs here are safe to set cluster-side too.
    """
    if cores is None:
        cores = os.environ.get("SPARK_GRAFT_CPUS", "*")
    master = cores if isinstance(cores, str) and not str(cores).isdigit() else None
    if master is None:
        master = f"local[{cores}]"
    if not master.startswith("local") and "://" not in master:
        master = f"local[{master}]"
    if shuffle_partitions is None:
        n = os.cpu_count() or 8
        shuffle_partitions = int(os.environ.get("SPARK_GRAFT_SHUFFLE", n))

    builder = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # ledger/frontier rows are ~60-100B; at the default 128 MiB a
        # half-million-row frontier scan (and the politeness shuffle
        # map fed by it) collapses into ONE task. 8 MiB keeps slim
        # scans parallel while leaving wide binary tables reasonable.
        .config("spark.sql.files.maxPartitionBytes", "8m")
        # single-node: every task is process-local; don't let the
        # scheduler hold slots waiting for locality on cached blocks
        .config("spark.locality.wait", "0s")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            os.environ.get("SPARK_GRAFT_ARROW_BATCH", "10000"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # the superstep plan carries hundreds of predicates/projections;
        # constraint propagation is quadratic in them and costs ~3s of
        # driver-side optimization PER ACTION (~2x the whole driver
        # floor of a small crawl, measured) while enabling no useful
        # pruning here — the heavy frames are filtered through explicit
        # columns, not inferable constraints
        .config("spark.sql.constraintPropagation.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
