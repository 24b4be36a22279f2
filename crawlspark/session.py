"""SparkSession factory tuned for the crawl workload.

Local-mode defaults mirror what we would set on a real cluster:
AQE on (runtime re-plan + skew-join splitting for hot hosts), Arrow
on (every custom operator is a pandas/Arrow UDF), shuffle partitions
sized to cores rather than the 200 default.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _sweep_stale_scratch(local_dir: str, max_age_s: int = 6 * 3600) -> None:
    """Best-effort removal of scratch left by KILLED JVMs. A clean
    shutdown deletes its own spark-*/blockmgr-* subdirs via Spark's
    shutdown hook; on tmpfs a leaked one is leaked RAM, so sweep
    entries old enough (6h) that no live session on this box can own
    them."""
    import shutil
    import time

    try:
        now = time.time()
        for name in os.listdir(local_dir):
            p = os.path.join(local_dir, name)
            try:
                if now - os.path.getmtime(p) > max_age_s:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                continue
    except OSError:
        pass


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
        # BypassMergeSortShuffleWriter opens one TEMP FILE PER REDUCER
        # per map task whenever partitions < the 200 default — at 32
        # shuffle partitions x thousands of sub-second tasks that is
        # ~200k file create/delete syscalls per crawl, and jstack +
        # /proc kernel-stack sampling showed 27/32 task threads inside
        # FileOutputStream.open0 with 26-41% of the whole box in
        # SYSTEM time (directory-inode serialization). Forcing the
        # sort-based writer (one data + one index file per map task)
        # cut the sf0.1 crawl 102s -> 70s median at local[32]. The
        # same storm hits any many-core executor on one disk, so this
        # is a cluster-appropriate default for small-partition-count
        # shuffles, not a local-mode hack.
        .config(
            "spark.shuffle.sort.bypassMergeThreshold",
            os.environ.get("SPARK_GRAFT_BYPASS_THRESHOLD", "2"),
        )
        # the superstep plan carries hundreds of predicates/projections;
        # constraint propagation is quadratic in them and costs ~3s of
        # driver-side optimization PER ACTION (~2x the whole driver
        # floor of a small crawl, measured) while enabling no useful
        # pruning here — the heavy frames are filtered through explicit
        # columns, not inferable constraints
        .config("spark.sql.constraintPropagation.enabled", "false")
    )
    # LOCAL MODE ONLY: put shuffle/spill scratch on tmpfs. Even with
    # the sort-based writer, shuffle index/data creates + renames on
    # ext4 serialize in the kernel (measured: tmpfs took the sf0.1
    # local[32] crawl 86s -> 77s on top of the writer fix). On a real
    # cluster spark.local.dir comes from the cluster manager and
    # shuffle data can exceed RAM, so this default never applies
    # there. Override with SPARK_GRAFT_LOCAL_DIR (or extra_conf).
    local_dir = os.environ.get("SPARK_GRAFT_LOCAL_DIR")
    if (
        local_dir is None
        and master.startswith("local")
        and "spark.local.dir" not in (extra_conf or {})
        and os.path.isdir("/dev/shm")
        and os.access("/dev/shm", os.W_OK)
    ):
        local_dir = "/dev/shm/crawlspark-local"
    if local_dir:
        os.makedirs(local_dir, exist_ok=True)
        _sweep_stale_scratch(local_dir)
        builder = builder.config("spark.local.dir", local_dir)
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
