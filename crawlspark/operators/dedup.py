"""URL-seen dedup + deterministic sequence assignment, at scale.

* ``assign_seq`` — the FIFO queue's monotonic key
  (MVStoreCacheQueue.java:27-35) re-expressed without a single-task
  global window: range-repartition on the order key, sort within
  partitions, collect only the tiny per-partition counts to the
  driver, then add cumulative offsets per partition. O(1) driver data,
  fully parallel — survives a 10^10-row frontier.

* ``first_wins`` — first-discovery-wins candidate dedup
  (DedupService.java:88-99 "first reference wins", made deterministic
  by ordering on (parent_seq, out_pos) instead of thread arrival).

* ``BloomPrefilter`` — the partitioned URL-seen Bloom filter from the
  north rule: per-partition bitmaps built executor-side over
  ``xxhash64(url)``, OR-reduced, broadcast, then applied as a
  vectorized membership test. A Bloom hit is only *probable*, so the
  exact ledger anti-join (CrawlerEntryLedger.java:361 exact-key dedup)
  always runs after it on the survivors — the filter only shrinks the
  anti-join's probe side.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def first_wins(
    df: DataFrame, key: str, order_cols: list[str], n_part: int | None = None
) -> DataFrame:
    """Keep the first row per key by deterministic order.

    ``n_part`` pins the clustering shuffle width explicitly: the
    window's own exchange is AQE-coalescible, and with compressible
    slim rows AQE happily folds a multi-100k-row level into ONE
    partition — serializing every Python stage downstream of the
    window. An explicit repartition-by-num is exempt from coalescing
    and already satisfies the window's clustering requirement.
    """
    if n_part is not None:
        df = df.repartition(n_part, F.col(key))
    w = Window.partitionBy(key).orderBy(*[F.col(c) for c in order_cols])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def assign_seq_small(
    df: DataFrame, order_cols: list[str], start: int, seq_col: str = "seq"
) -> DataFrame:
    """Small-level fast path: one shuffle to a single partition, sort,
    number. No range-sampling pass, no per-partition count job —
    two whole Spark jobs cheaper than ``assign_seq``, and a single
    sort task over <~150k rows is milliseconds. Upstream lineage keeps
    its parallelism (``repartition``, not ``coalesce``)."""
    one = df.repartition(1).sortWithinPartitions(*order_cols)
    cols = df.columns
    schema = one.withColumn(seq_col, F.lit(0).cast("long")).schema

    def add_seq(it):
        off = start
        for pdf in it:
            if len(pdf) == 0:
                continue
            seqs = np.arange(off, off + len(pdf), dtype="int64")
            off += len(pdf)
            yield pdf.assign(**{seq_col: seqs})

    return one.mapInPandas(add_seq, schema=schema).select(*cols, seq_col)


def assign_seq(
    df: DataFrame,
    order_cols: list[str],
    start: int,
    seq_col: str = "seq",
    n_part: int | None = None,
) -> DataFrame:
    """Add a dense 0-gap sequence ``start, start+1, ...`` following the
    total order given by ``order_cols`` (must be unique per row)."""
    spark = df.sparkSession
    if n_part is None:
        n_part = max(2, spark.sparkContext.defaultParallelism)
    parted = df.repartitionByRange(n_part, *order_cols).sortWithinPartitions(
        *order_cols
    )
    parted = parted.cache()
    counts = (
        parted.withColumn("__pid", F.spark_partition_id())
        .groupBy("__pid")
        .count()
        .collect()
    )
    sizes = {r["__pid"]: r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = start
    for pid in sorted(sizes):
        offsets[pid] = acc
        acc += sizes[pid]
    boff = spark.sparkContext.broadcast(offsets)
    cols = df.columns

    def add_seq(it):
        # called once per partition; batches arrive in partition order,
        # so a local running offset is exact.
        off = None
        for pdf in it:
            if len(pdf) == 0:
                continue
            if off is None:
                off = boff.value[int(pdf["__pid"].iloc[0])]
            seqs = np.arange(off, off + len(pdf), dtype="int64")
            off += len(pdf)
            yield pdf.assign(**{seq_col: seqs}).drop(columns="__pid")

    schema = parted.withColumn(seq_col, F.lit(0).cast("long")).schema
    out = (
        parted.withColumn("__pid", F.spark_partition_id())
        .mapInPandas(add_seq, schema=schema)
        .select(*cols, seq_col)
    )
    # expose the internal cache so the caller can release it once the
    # result is materialized (long superstep loops would otherwise
    # accumulate cached frames)
    out._assign_seq_cache = parted
    return out


class BloomPrefilter:
    """Driver-held Bloom bitmap over xxhash64 seen-keys.

    Built distributed (one bitmap per partition, OR-reduced via
    treeAggregate-style collect of packed uint64 words), applied
    vectorized. k=4 hash probes derived from the 64-bit key by
    splitting/mixing — no per-row Python.
    """

    K = 4

    def __init__(self, bits: int = 1 << 22):
        assert bits & (bits - 1) == 0, "bits must be a power of two"
        self.bits = bits
        self.words = np.zeros(bits // 64, dtype=np.uint64)

    @staticmethod
    def _probe_positions(keys: np.ndarray, bits: int) -> list[np.ndarray]:
        k = keys.astype(np.uint64)
        mask = np.uint64(bits - 1)
        h2 = (k >> np.uint64(32)) | (k << np.uint64(32))
        out = []
        with np.errstate(over="ignore"):
            for i in range(BloomPrefilter.K):
                c = (0x9E3779B97F4A7C15 * (i + 1)) & ((1 << 64) - 1)
                p = k + np.uint64(i) * h2 + np.uint64(c)
                out.append((p & mask).astype(np.int64))
        return out

    def add_df(self, df: DataFrame, key_col: str = "seen_key") -> None:
        bits = self.bits

        def build(it):
            words = np.zeros(bits // 64, dtype=np.uint64)
            any_rows = False
            for pdf in it:
                if len(pdf) == 0:
                    continue
                any_rows = True
                keys = pdf[key_col].to_numpy()
                for pos in BloomPrefilter._probe_positions(keys, bits):
                    np.bitwise_or.at(
                        words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
                    )
            if any_rows:
                yield pd.DataFrame({"words": [words.tobytes()]})

        parts = (
            df.select(key_col)
            .mapInPandas(build, schema="words binary")
            .collect()
        )
        for row in parts:
            self.words |= np.frombuffer(row["words"], dtype=np.uint64)

    def filter_candidates(
        self, df: DataFrame, key_col: str = "seen_key"
    ) -> tuple[DataFrame, DataFrame]:
        """Split candidates into (maybe_seen, definitely_new)."""
        spark = df.sparkSession
        bwords = spark.sparkContext.broadcast(self.words.tobytes())
        bits = self.bits

        @F.pandas_udf("boolean")
        def maybe_contains(keys: pd.Series) -> pd.Series:
            words = np.frombuffer(bwords.value, dtype=np.uint64)
            k = keys.to_numpy()
            hit = np.ones(len(k), dtype=bool)
            for pos in BloomPrefilter._probe_positions(k, bits):
                bitset = (
                    words[pos // 64] >> (pos % 64).astype(np.uint64)
                ) & np.uint64(1)
                hit &= bitset.astype(bool)
            return pd.Series(hit)

        # nondeterministic marker = plan-shape tool (single Arrow node
        # per branch; see urls.normalize_url_udf)
        maybe_contains = maybe_contains.asNondeterministic()
        flagged = df.withColumn("__maybe", maybe_contains(F.col(key_col)))
        return (
            flagged.filter(F.col("__maybe")).drop("__maybe"),
            flagged.filter(~F.col("__maybe")).drop("__maybe"),
        )


def connected_components(
    pairs: DataFrame,
    a_col: str = "a",
    b_col: str = "b",
    max_iter: int = 20,
    on_max_iter: str = "raise",
) -> DataFrame:
    """Duplicate CLUSTERS from near-dup pairs: (id, component), where
    component = the minimum member id — the canonical-document pick a
    training-data dedup makes after any pair-join op
    (minhash/simhash/embedding/phash near-dup all emit (a, b) pairs;
    keeping one doc per component is the step that actually shrinks
    the corpus).

    Min-label propagation WITH pointer-jump doubling over the
    undirected pair graph: each round every vertex takes the min label
    among itself and its neighbors (one groupBy-min shuffle), then
    labels are short-circuited through their own targets
    (``component(v) <- component(component(v))``, one more equi-join)
    — the label-doubling step that makes a diameter-D chain converge
    in O(log D) rounds instead of O(D), so max_iter=20 covers chains
    of ~2^20 hops (boilerplate near-dup families chain far past the
    plain-propagation bound that silently truncated in r3). The loop
    runs driver-side with localCheckpoint per round so the plan never
    nests, and stops early on a zero-change round (one tiny count
    action per round — no row data ever collected).

    If ``max_iter`` rounds elapse with labels still changing the
    result is NOT a fixed point: ``on_max_iter`` = "raise" (default)
    raises RuntimeError, "warn" logs + warns and returns the
    truncated labels — never a silent wrong answer."""
    if on_max_iter not in ("raise", "warn"):
        raise ValueError("on_max_iter must be 'raise' or 'warn'")
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .union(
            pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst"))
        )
        .distinct()
        .localCheckpoint()
    )
    labels = (
        edges.select(F.col("src").alias("id"))
        .distinct()
        .select("id", F.col("id").alias("component"))
        .localCheckpoint()
    )
    changed = 0
    for _ in range(max_iter):
        neigh = (
            edges.join(labels, edges.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
            .groupBy("id")
            .agg(F.min("component").alias("n_comp"))
        )
        stepped = labels.join(neigh, "id", "left").select(
            "id",
            F.least(
                F.col("component"), F.coalesce("n_comp", "component")
            ).alias("component"),
        )
        # pointer jump: component labels are themselves vertex ids, so
        # re-resolving each label through ITS current label halves the
        # remaining chain length every round (large-star flavor)
        ptr = stepped.select(
            F.col("id").alias("p_id"), F.col("component").alias("p_comp")
        )
        nxt = (
            stepped.join(ptr, stepped.component == ptr.p_id, "left")
            .select(
                "id",
                F.least(
                    F.col("component"),
                    F.coalesce("p_comp", "component"),
                ).alias("component"),
            )
            .localCheckpoint()
        )
        changed = (
            nxt.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = nxt
        if changed == 0:
            break
    if changed != 0:
        msg = (
            f"connected_components did not converge in {max_iter} rounds "
            f"({changed} labels still changing) — components are "
            "truncated; raise max_iter"
        )
        if on_max_iter == "raise":
            raise RuntimeError(msg)
        import logging
        import warnings

        logging.getLogger(__name__).warning(msg)
        warnings.warn(msg, RuntimeWarning, stacklevel=2)
    return labels
