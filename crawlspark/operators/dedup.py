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

import warnings

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
    first_col_bounds: tuple[int, int] | None = None,
) -> DataFrame:
    """Add a dense 0-gap sequence ``start, start+1, ...`` following the
    total order given by ``order_cols`` (must be unique per row).

    ``first_col_bounds=(lo, hi)`` — when the caller knows the value
    range of ``order_cols[0]`` (the crawl engine does: a candidate's
    ``parent_seq`` is always a seq of the level being processed, whose
    dense range the driver tracks), the range-partitioner's SAMPLING
    pass is skipped entirely: rows are bucketed by a computed
    ``(v - lo) * buckets // span`` id — monotone in the first order
    column, so bucket k's rows all precede bucket k+1's in the total
    order — and hash-clustered by that id (every row of a bucket lands
    in one partition; which physical partition is irrelevant because
    offsets are accumulated per *bucket*). One shuffle + one tiny
    per-bucket count job instead of sample + shuffle + count: a whole
    pass over the candidate lineage saved per superstep. NULL first
    columns all map to bucket 0 (Spark sorts nulls first ascending, so
    they belong at the front of the total order anyway).
    """
    spark = df.sparkSession
    if n_part is None:
        n_part = max(2, spark.sparkContext.defaultParallelism)
    if first_col_bounds is not None:
        return _assign_seq_bucketed(
            df, order_cols, start, seq_col, n_part, first_col_bounds
        )
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


# n_part -> token list: token[p] is an int Spark's HashPartitioning
# routes to partition p of n_part. Murmur3 (seed 42) is fixed across
# sessions, so the table never invalidates.
_PART_TOKENS: dict[int, list[int]] = {}


def _partition_tokens(spark, n_part: int) -> list[int]:
    """Find, for every partition p of ``n_part``, an int that Spark's
    hash partitioner sends exactly there — computed WITH ``F.hash``
    itself (HashPartitioning's partition id is
    ``pmod(murmur3(cols), n)``), so the mapping can never drift from
    the engine. One tiny driver job per distinct ``n_part`` per
    process; coupon-collector says ~n·ln(n) candidates suffice, we
    probe in growing batches."""
    toks = _PART_TOKENS.get(n_part)
    if toks is not None:
        return toks
    found: dict[int, int] = {}
    lo = 0
    while len(found) < n_part:
        hi = lo + max(64, 8 * n_part)
        rows = (
            spark.range(lo, hi)
            .select(
                F.col("id").cast("int").alias("t"),
                F.pmod(
                    F.hash(F.col("id").cast("int")), F.lit(n_part)
                ).alias("p"),
            )
            .collect()
        )
        for r in rows:
            found.setdefault(int(r["p"]), int(r["t"]))
        lo = hi
    toks = [found[p] for p in range(n_part)]
    _PART_TOKENS[n_part] = toks
    return toks


def _assign_seq_bucketed(
    df: DataFrame,
    order_cols: list[str],
    start: int,
    seq_col: str,
    n_part: int,
    bounds: tuple[int, int],
) -> DataFrame:
    """Sample-free ``assign_seq``: explicit order-contiguous buckets
    from the known first-column range (see ``assign_seq`` docstring).

    4x more buckets than partitions, assigned to partitions in
    contiguous equal blocks (bucket b -> partition b·n_part//n_buckets)
    through a hash-token table (:func:`_partition_tokens`) — raw
    ``repartition(n, __bkt)`` would throw ~4·n_part distinct values at
    n_part partitions balls-in-bins style, leaving some partitions
    with 2x the buckets and the sort+downstream stages straggling on
    them (measured ~7%% on the bench crawl). Routing is balance-only
    either way: offsets are per *bucket*, so any one-partition-per-
    bucket placement is correct."""
    lo, hi = bounds
    span = max(1, int(hi) - int(lo) + 1)
    n_buckets = max(1, min(4 * n_part, span))
    first = F.col(order_cols[0]).cast("long")
    bucket = F.when(
        first.isNull(), F.lit(0)
    ).otherwise(
        F.greatest(
            F.lit(0),
            F.least(
                F.lit(n_buckets - 1),
                ((first - F.lit(int(lo))) * n_buckets / F.lit(span)).cast(
                    "long"
                ),
            ),
        )
    )
    toks = _partition_tokens(df.sparkSession, n_part)
    # bucket block -> the token hashing to that exact partition
    tok_arr = F.array(*[F.lit(t) for t in toks])
    pid = F.element_at(
        tok_arr, (F.col("__bkt") * n_part / n_buckets).cast("int") + 1
    )
    parted = (
        df.withColumn("__bkt", bucket)
        .repartition(n_part, pid)
        .sortWithinPartitions("__bkt", *order_cols)
    )
    parted = parted.cache()
    counts = parted.groupBy("__bkt").count().collect()
    sizes = {int(r["__bkt"]): r["count"] for r in counts}
    offsets: dict[int, int] = {}
    acc = start
    for b in sorted(sizes):
        offsets[b] = acc
        acc += sizes[b]
    boff = parted.sparkSession.sparkContext.broadcast(offsets)
    cols = df.columns

    def add_seq(it):
        # batches arrive sorted by (__bkt, *order_cols); a bucket's rows
        # are contiguous within the partition and global to it, so a
        # per-bucket running offset is exact.
        cur_bkt = None
        off = 0
        for pdf in it:
            if len(pdf) == 0:
                continue
            bkts = pdf["__bkt"].to_numpy()
            seqs = np.empty(len(pdf), dtype="int64")
            pos = 0
            # contiguous runs of equal bucket id
            change = np.flatnonzero(np.diff(bkts)) + 1
            for s, e in zip(
                np.concatenate(([0], change)),
                np.concatenate((change, [len(bkts)])),
            ):
                b = int(bkts[s])
                if b != cur_bkt:
                    cur_bkt = b
                    off = boff.value[b]
                seqs[s:e] = np.arange(off, off + (e - s), dtype="int64")
                off += e - s
                pos = e
            assert pos == len(bkts)
            yield pdf.assign(**{seq_col: seqs}).drop(columns="__bkt")

    schema = parted.drop("__bkt").withColumn(
        seq_col, F.lit(0).cast("long")
    ).schema
    out = parted.mapInPandas(add_seq, schema=schema).select(*cols, seq_col)
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
    # estimated fill ratio thresholds: past WARN_FILL the false-"maybe"
    # rate (fill^K) starts costing anti-join probes; past DISABLE_FILL
    # the filter rejects almost nothing, so it auto-disables — the
    # exact anti-join downstream keeps correctness either way, the
    # filter only ever shrinks its probe side.
    WARN_FILL = 0.5
    DISABLE_FILL = 0.75

    def __init__(self, bits: int = 1 << 22):
        assert bits & (bits - 1) == 0, "bits must be a power of two"
        self.bits = bits
        self.words = np.zeros(bits // 64, dtype=np.uint64)
        self.n_keys = 0  # inserts seen (duplicates counted once-ish)
        self.enabled = True
        self._warned = False

    def fill_ratio(self) -> float:
        """EXACT set-bit fraction of the bitmap (popcount, not the
        1-exp(-kn/m) estimate — the words are on the driver anyway)."""
        return float(
            np.unpackbits(self.words.view(np.uint8)).sum()
        ) / self.bits

    def _check_saturation(self) -> None:
        fill = self.fill_ratio()
        if fill >= self.DISABLE_FILL and self.enabled:
            self.enabled = False
            warnings.warn(
                f"BloomPrefilter saturated (fill={fill:.2f} >= "
                f"{self.DISABLE_FILL}, ~{self.n_keys} keys into "
                f"{self.bits} bits): auto-disabled — candidates now "
                f"flow straight to the exact anti-join. Size "
                f"bloom_bits for the expected URL count or switch to "
                f"the sharded distributed filter (bloom_shards > 0).",
                RuntimeWarning,
                stacklevel=3,
            )
        elif fill >= self.WARN_FILL and not self._warned:
            self._warned = True
            warnings.warn(
                f"BloomPrefilter filling up (fill={fill:.2f} >= "
                f"{self.WARN_FILL}, ~{self.n_keys} keys into "
                f"{self.bits} bits): false-'maybe' rate ~"
                f"{fill ** self.K:.2f} and climbing. Raise bloom_bits "
                f"or use bloom_shards for a distributed filter.",
                RuntimeWarning,
                stacklevel=3,
            )

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
        if not self.enabled:
            return  # saturated: stop paying the build job
        bits = self.bits

        def build(it):
            words = np.zeros(bits // 64, dtype=np.uint64)
            n = 0
            for pdf in it:
                if len(pdf) == 0:
                    continue
                n += len(pdf)
                keys = pdf[key_col].to_numpy()
                for pos in BloomPrefilter._probe_positions(keys, bits):
                    np.bitwise_or.at(
                        words, pos // 64, np.uint64(1) << (pos % 64).astype(np.uint64)
                    )
            if n:
                yield pd.DataFrame(
                    {"words": [words.tobytes()], "n_keys": [n]}
                )

        parts = (
            df.select(key_col)
            .mapInPandas(build, schema="words binary, n_keys long")
            .collect()
        )
        for row in parts:
            self.words |= np.frombuffer(row["words"], dtype=np.uint64)
            self.n_keys += row["n_keys"]
        self._check_saturation()

    def filter_candidates(
        self, df: DataFrame, key_col: str = "seen_key", caches: list | None = None
    ) -> tuple[DataFrame, DataFrame]:
        """Split candidates into (maybe_seen, definitely_new)."""
        if not self.enabled:
            # saturated filter: everything is "maybe" — the exact
            # anti-join sees the full candidate set, exactly as if no
            # prefilter existed
            return df, df.limit(0)
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


class ShardedBloomPrefilter:
    """Distributed, sharded URL-seen Bloom filter — the north rule's
    "partitioned Bloom filter" with NOTHING living on the driver.

    The 64-bit seen-key's TOP ``log2(n_shards)`` bits pick a shard;
    each shard owns an independent ``bits_per_shard`` bitmap stored as
    one binary row of a distributed dim frame ``(shard, words,
    set_bits)``. Probe positions use only the key's LOW bits
    (``_probe_positions`` masks to ``bits_per_shard``), so shard
    routing and probing never share entropy.

    * build/merge: keys → groupBy(shard) → per-shard bitmap OR-fold —
      one keyed shuffle, executor memory O(bits_per_shard).
    * apply: candidates cogrouped with the dim on shard via
      ``applyInPandas`` — co-partitioned, each task holds exactly one
      shard bitmap + its candidate rows. No broadcast, no driver
      array: total filter memory is bits/8 bytes SPREAD over the
      cluster, so sizing for 10^10 keys (~12 GB at 10 bits/key) is a
      per-executor cost of bits/(8·n_shards), not a driver OOM.
    * saturation: exact per-shard popcounts ride the dim; the merge
      returns the worst shard's fill ratio, and past DISABLE_FILL the
      filter auto-disables with a loud warning (the exact anti-join
      downstream keeps correctness; the filter only shrinks its probe
      side — same contract as BloomPrefilter).

    Reference parity: the single-array BloomPrefilter and this one
    admit identical "definitely new" verdicts for the same (bits,
    keys) only probabilistically — both are PREfilters; the engine's
    fetch order and URL-seen set are decided by the exact anti-join
    either way (CrawlerEntryLedger.java:361 exact-key dedup).
    """

    K = BloomPrefilter.K
    WARN_FILL = BloomPrefilter.WARN_FILL
    DISABLE_FILL = BloomPrefilter.DISABLE_FILL

    def __init__(self, bits_per_shard: int = 1 << 16,
                 n_shards: int = 64):
        assert bits_per_shard & (bits_per_shard - 1) == 0, (
            "bits_per_shard must be a power of two"
        )
        assert n_shards >= 2 and n_shards & (n_shards - 1) == 0, (
            "n_shards must be a power of two >= 2"
        )
        self.bits = bits_per_shard
        self.n_shards = n_shards
        self.shard_shift = 64 - n_shards.bit_length() + 1  # 64-log2(n)
        self.dim: DataFrame | None = None  # (shard, words, set_bits)
        self.n_keys = 0
        self.enabled = True
        self._warned = False

    _DIM_SCHEMA = "shard int, words binary, set_bits long, n_keys long"

    def _shard_col(self, key_col: str):
        return F.shiftrightunsigned(
            F.col(key_col), self.shard_shift
        ).cast("int")

    def _delta_dim(self, df: DataFrame, key_col: str) -> DataFrame:
        bits = self.bits

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            words = np.zeros(bits // 64, dtype=np.uint64)
            keys = pdf["__k"].to_numpy()
            for pos in BloomPrefilter._probe_positions(keys, bits):
                np.bitwise_or.at(
                    words, pos // 64,
                    np.uint64(1) << (pos % 64).astype(np.uint64),
                )
            return pd.DataFrame({
                "shard": [int(pdf["__shard"].iloc[0])],
                "words": [words.tobytes()],
                "set_bits": [int(
                    np.unpackbits(words.view(np.uint8)).sum()
                )],
                "n_keys": [len(pdf)],
            })

        return (
            df.select(
                F.col(key_col).alias("__k"),
                self._shard_col(key_col).alias("__shard"),
            )
            .groupBy("__shard")
            .applyInPandas(build, schema=self._DIM_SCHEMA)
        )

    def add_df(self, df: DataFrame, key_col: str = "seen_key") -> None:
        """OR a key frame into the filter: delta bitmaps per shard,
        merged with the standing dim by one keyed shuffle. The merged
        dim is eagerly localCheckpointed (flat plan — supersteps would
        otherwise nest every prior merge's lineage) and the old one
        released."""
        if not self.enabled:
            return
        bits = self.bits
        delta = self._delta_dim(df, key_col)
        if self.dim is None:
            merged = delta
        else:
            def fold(pdf: pd.DataFrame) -> pd.DataFrame:
                words = np.zeros(bits // 64, dtype=np.uint64)
                for b in pdf["words"]:
                    words |= np.frombuffer(b, dtype=np.uint64)
                return pd.DataFrame({
                    "shard": [int(pdf["shard"].iloc[0])],
                    "words": [words.tobytes()],
                    "set_bits": [int(
                        np.unpackbits(words.view(np.uint8)).sum()
                    )],
                    "n_keys": [int(pdf["n_keys"].sum())],
                })

            merged = (
                self.dim.unionByName(delta)
                .groupBy("shard")
                .applyInPandas(fold, schema=self._DIM_SCHEMA)
            )
        old = self.dim
        self.dim = merged.localCheckpoint(eager=True)
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass
        # saturation gauge: n_shards tiny rows — a metrics aggregate,
        # not row data
        agg = self.dim.agg(
            F.max(F.col("set_bits")).alias("worst"),
            F.sum(F.col("n_keys")).alias("n"),
        ).collect()[0]
        self.n_keys = int(agg["n"] or 0)
        self._check_saturation(float(agg["worst"] or 0) / bits)

    def _check_saturation(self, fill: float) -> None:
        if fill >= self.DISABLE_FILL and self.enabled:
            self.enabled = False
            if self.dim is not None:
                try:
                    self.dim.unpersist()
                except Exception:
                    pass
            warnings.warn(
                f"ShardedBloomPrefilter saturated (worst shard fill="
                f"{fill:.2f} >= {self.DISABLE_FILL}, ~{self.n_keys} "
                f"keys into {self.n_shards}x{self.bits} bits): "
                f"auto-disabled — candidates flow straight to the "
                f"exact anti-join. Raise bits_per_shard/n_shards for "
                f"the expected URL count.",
                RuntimeWarning,
                stacklevel=3,
            )
        elif fill >= self.WARN_FILL and not self._warned:
            self._warned = True
            warnings.warn(
                f"ShardedBloomPrefilter filling up (worst shard fill="
                f"{fill:.2f} >= {self.WARN_FILL}, ~{self.n_keys} keys "
                f"into {self.n_shards}x{self.bits} bits): "
                f"false-'maybe' rate ~{fill ** self.K:.2f} and "
                f"climbing.",
                RuntimeWarning,
                stacklevel=3,
            )

    def filter_candidates(
        self, df: DataFrame, key_col: str = "seen_key",
        caches: list | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """Split candidates into (maybe_seen, definitely_new) by
        cogrouping candidates with the shard dim — each task sees one
        shard's bitmap + that shard's candidate rows, co-partitioned
        on the shard key. A shard with no bitmap row has no seen keys:
        its candidates are definitely new."""
        if not self.enabled or self.dim is None:
            return df, df.limit(0)
        bits = self.bits
        cols = df.columns
        cand = df.withColumn("__shard", self._shard_col(key_col))
        out_schema = (
            cand.withColumn("__maybe", F.lit(True)).drop("__shard")
            .schema
        )

        def apply(left: pd.DataFrame, right: pd.DataFrame
                  ) -> pd.DataFrame:
            left = left.drop(columns="__shard")
            if len(left) == 0:
                return left.assign(__maybe=pd.Series([], dtype=bool))
            if len(right) == 0:
                return left.assign(__maybe=False)
            words = np.frombuffer(
                right["words"].iloc[0], dtype=np.uint64
            )
            k = left[key_col].to_numpy()
            hit = np.ones(len(k), dtype=bool)
            for pos in BloomPrefilter._probe_positions(k, bits):
                bitset = (
                    words[pos // 64] >> (pos % 64).astype(np.uint64)
                ) & np.uint64(1)
                hit &= bitset.astype(bool)
            return left.assign(__maybe=hit)

        flagged = (
            cand.groupBy("__shard")
            .cogroup(self.dim.groupBy("shard"))
            .applyInPandas(apply, schema=out_schema)
        )
        if caches is not None:
            # the two output branches each re-trigger the cogroup
            # shuffle; a step-scoped cache makes it run once
            flagged = flagged.cache()
            caches.append(flagged)
        return (
            flagged.filter(F.col("__maybe")).select(*cols),
            flagged.filter(~F.col("__maybe")).select(*cols),
        )

    def release(self) -> None:
        if self.dim is not None:
            try:
                self.dim.unpersist()
            except Exception:
                pass
            self.dim = None


class ShardedCuckooPrefilter:
    """Distributed, sharded URL-seen CUCKOO filter — the second shape
    the north rule names ("partitioned Bloom/cuckoo filters keyed by
    canonicalized-URL xxhash64"), with the same dim-frame architecture
    as :class:`ShardedBloomPrefilter` (nothing on the driver) plus the
    one capability a Bloom filter cannot offer: **deletion**
    (``delete_df`` — e.g. evicting a URL the recrawl resolver marks
    due, so it re-queues without rebuilding the filter).

    Partial-key cuckoo hashing (Fan et al., "Cuckoo Filter: Practically
    Better Than Bloom", CoNEXT 2014 — public paper): per shard, a table
    of ``n_buckets`` buckets x 4 slots of 16-bit fingerprints. For a
    64-bit seen-key ``k``:

    * shard  = top ``log2(n_shards)`` bits (same routing as the Bloom
      shards — co-partitionable with candidates),
    * fp     = bits 32..47, mapped away from 0 (0 = empty slot),
    * i1     = low bits (``k & (n_buckets-1)``),
    * i2     = ``i1 XOR h(fp)`` — derivable from (i1, fp) alone, which
      is what makes table MERGES possible: an occupied (bucket, fp)
      slot re-inserts into another table without the original key.

    Contract parity with the Bloom prefilters: *zero false negatives*
    while enabled. A cuckoo table can refuse an insert (all kicks
    exhausted); an absent key would probe "definitely new" and skip
    the exact anti-join, so ANY insert failure — like saturation —
    auto-disables the whole filter with a loud warning before the next
    ``filter_candidates`` call (everything then flows to the exact
    anti-join; correctness never depends on the prefilter).

    Deleting a key that was never added can evict another key's
    fingerprint (shared-slot ambiguity — inherent to cuckoo filters);
    callers must only delete keys previously added, mirroring the
    reference ledger's delete-by-known-reference
    (CrawlerEntryLedger.java:206-241).
    """

    SLOTS = 4
    MAX_KICKS = 500
    WARN_FILL = 0.80
    DISABLE_FILL = 0.92

    def __init__(self, buckets_per_shard: int = 1 << 12,
                 n_shards: int = 64):
        assert buckets_per_shard & (buckets_per_shard - 1) == 0, (
            "buckets_per_shard must be a power of two"
        )
        assert n_shards >= 2 and n_shards & (n_shards - 1) == 0, (
            "n_shards must be a power of two >= 2"
        )
        self.n_buckets = buckets_per_shard
        self.n_shards = n_shards
        self.shard_shift = 64 - n_shards.bit_length() + 1
        self.dim: DataFrame | None = None
        self.n_keys = 0
        self.enabled = True
        self._warned = False

    _DIM_SCHEMA = (
        "shard int, table binary, used_slots long, n_keys long, "
        "failed long"
    )

    def _shard_col(self, key_col: str):
        return F.shiftrightunsigned(
            F.col(key_col), self.shard_shift
        ).cast("int")

    # ---- pure-numpy core (executor-side, Arrow-batched) ----

    @staticmethod
    def _fp_i1(keys: np.ndarray, n_buckets: int):
        k = keys.astype(np.int64).view(np.uint64)
        fp = ((k >> np.uint64(32)) & np.uint64(0xFFFF)).astype(
            np.uint16
        )
        fp = np.where(fp == 0, np.uint16(1), fp)
        i1 = (k & np.uint64(n_buckets - 1)).astype(np.int64)
        return fp, i1

    @staticmethod
    def _alt(fp, n_buckets: int):
        """Alternate-bucket offset h(fp); i2 = i XOR h(fp). Works on
        scalars and arrays; multiply-hash spreads the 16-bit fp over
        the bucket space."""
        return (
            np.asarray(fp).astype(np.uint64) * np.uint64(0x5BD1E995)
            & np.uint64(n_buckets - 1)
        ).astype(np.int64)

    @classmethod
    def _contains(cls, table: np.ndarray, n_buckets: int,
                  keys: np.ndarray) -> np.ndarray:
        t = table.reshape(n_buckets, cls.SLOTS)
        fp, i1 = cls._fp_i1(keys, n_buckets)
        i2 = i1 ^ cls._alt(fp, n_buckets)
        f = fp[:, None]
        return (t[i1] == f).any(axis=1) | (t[i2] == f).any(axis=1)

    @classmethod
    def _insert_pairs(cls, table: np.ndarray, n_buckets: int,
                      fps: np.ndarray, buckets: np.ndarray) -> int:
        """Insert (fp, bucket) pairs with kick eviction; returns the
        number of pairs that exhausted MAX_KICKS (table full). The
        kick slot choice is deterministic ((fp + kick) % SLOTS), so
        resumed runs rebuild byte-identical tables."""
        t = table.reshape(n_buckets, cls.SLOTS)
        failed = 0
        for fp, b in zip(fps.tolist(), buckets.tolist()):
            cur_fp, cur_b = int(fp), int(b)
            placed = False
            for kick in range(cls.MAX_KICKS):
                row = t[cur_b]
                z = np.nonzero(row == 0)[0]
                if z.size:
                    row[z[0]] = cur_fp
                    placed = True
                    break
                alt_b = cur_b ^ int(cls._alt(cur_fp, n_buckets))
                row2 = t[alt_b]
                z2 = np.nonzero(row2 == 0)[0]
                if z2.size:
                    row2[z2[0]] = cur_fp
                    placed = True
                    break
                s = (cur_fp + kick) % cls.SLOTS
                victim = int(row[s])
                row[s] = cur_fp
                cur_fp = victim
                cur_b = cur_b ^ int(cls._alt(victim, n_buckets))
            if not placed:
                failed += 1
        return failed

    @classmethod
    def _insert_keys(cls, table: np.ndarray, n_buckets: int,
                     keys: np.ndarray) -> tuple[int, int]:
        """Insert keys not already present; returns (n_new, failed).
        Presence + dedup are vectorized; only the genuinely new
        (fp, bucket) pairs take the per-pair kick loop."""
        if len(keys) == 0:
            return 0, 0
        present = cls._contains(table, n_buckets, keys)
        keys = keys[~present]
        if len(keys) == 0:
            return 0, 0
        fp, i1 = cls._fp_i1(keys, n_buckets)
        code = np.unique(
            i1.astype(np.uint64) << np.uint64(16) | fp.astype(np.uint64)
        )
        u_fp = (code & np.uint64(0xFFFF)).astype(np.uint16)
        u_b = (code >> np.uint64(16)).astype(np.int64)
        failed = cls._insert_pairs(table, n_buckets, u_fp, u_b)
        return len(code) - failed, failed

    # ---- distributed surface (mirrors ShardedBloomPrefilter) ----

    def _delta_dim(self, df: DataFrame, key_col: str) -> DataFrame:
        n_buckets, slots = self.n_buckets, self.SLOTS

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            table = np.zeros(n_buckets * slots, dtype=np.uint16)
            n_new, failed = ShardedCuckooPrefilter._insert_keys(
                table, n_buckets, pdf["__k"].to_numpy()
            )
            return pd.DataFrame({
                "shard": [int(pdf["__shard"].iloc[0])],
                "table": [table.tobytes()],
                "used_slots": [int(np.count_nonzero(table))],
                "n_keys": [n_new],
                "failed": [failed],
            })

        return (
            df.select(
                F.col(key_col).alias("__k"),
                self._shard_col(key_col).alias("__shard"),
            )
            .groupBy("__shard")
            .applyInPandas(build, schema=self._DIM_SCHEMA)
        )

    def add_df(self, df: DataFrame, key_col: str = "seen_key") -> None:
        """Insert a key frame: per-shard delta tables, folded into the
        standing dim by one keyed shuffle (occupied (bucket, fp) slots
        of the smaller tables re-inserted into the largest-population
        one — the XOR identity makes slot pairs key-free). Eagerly
        localCheckpointed like the Bloom dim; any insert failure
        disables the filter before the next probe."""
        if not self.enabled:
            return
        n_buckets, slots = self.n_buckets, self.SLOTS
        delta = self._delta_dim(df, key_col)
        if self.dim is None:
            merged = delta
        else:
            def fold(pdf: pd.DataFrame) -> pd.DataFrame:
                order = pdf["used_slots"].to_numpy().argsort()[::-1]
                base = np.frombuffer(
                    pdf["table"].iloc[int(order[0])], dtype=np.uint16
                ).copy()
                failed = int(pdf["failed"].sum())
                n_keys = int(pdf["n_keys"].iloc[int(order[0])])
                t_base = base.reshape(n_buckets,
                                      ShardedCuckooPrefilter.SLOTS)
                for j in order[1:]:
                    t = np.frombuffer(
                        pdf["table"].iloc[int(j)], dtype=np.uint16
                    ).reshape(n_buckets, ShardedCuckooPrefilter.SLOTS)
                    rows, cols = np.nonzero(t)
                    fps = t[rows, cols]
                    # skip pairs already present in base (re-added keys)
                    alt = rows ^ ShardedCuckooPrefilter._alt(
                        fps, n_buckets
                    )
                    f = fps[:, None]
                    dup = (t_base[rows] == f).any(axis=1) | (
                        t_base[alt] == f
                    ).any(axis=1)
                    failed += ShardedCuckooPrefilter._insert_pairs(
                        base, n_buckets, fps[~dup], rows[~dup]
                    )
                    n_keys += int(np.count_nonzero(~dup))
                return pd.DataFrame({
                    "shard": [int(pdf["shard"].iloc[0])],
                    "table": [base.tobytes()],
                    "used_slots": [int(np.count_nonzero(base))],
                    "n_keys": [n_keys],
                    "failed": [failed],
                })

            merged = (
                self.dim.unionByName(delta)
                .groupBy("shard")
                .applyInPandas(fold, schema=self._DIM_SCHEMA)
            )
        old = self.dim
        self.dim = merged.localCheckpoint(eager=True)
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass
        agg = self.dim.agg(
            F.max(F.col("used_slots")).alias("worst"),
            F.sum(F.col("n_keys")).alias("n"),
            F.sum(F.col("failed")).alias("failed"),
        ).collect()[0]
        self.n_keys = int(agg["n"] or 0)
        self._check_saturation(
            float(agg["worst"] or 0) / (n_buckets * slots),
            int(agg["failed"] or 0),
        )

    def delete_df(self, df: DataFrame,
                  key_col: str = "seen_key") -> None:
        """Remove one fingerprint copy per key from its (i1, i2) pair —
        the cuckoo capability Bloom lacks. Only delete keys previously
        added (see class docstring)."""
        if not self.enabled or self.dim is None:
            return
        n_buckets = self.n_buckets

        def fold(pdf: pd.DataFrame, keys_pdf: pd.DataFrame
                 ) -> pd.DataFrame:
            if len(pdf) == 0:
                return pdf
            table = np.frombuffer(
                pdf["table"].iloc[0], dtype=np.uint16
            ).copy()
            t = table.reshape(n_buckets, ShardedCuckooPrefilter.SLOTS)
            removed = 0
            if len(keys_pdf):
                fp, i1 = ShardedCuckooPrefilter._fp_i1(
                    keys_pdf["__k"].to_numpy(), n_buckets
                )
                i2 = i1 ^ ShardedCuckooPrefilter._alt(fp, n_buckets)
                for f, b1, b2 in zip(
                    fp.tolist(), i1.tolist(), i2.tolist()
                ):
                    for b in (b1, b2):
                        hit = np.nonzero(t[b] == f)[0]
                        if hit.size:
                            t[b][hit[0]] = 0
                            removed += 1
                            break
            return pd.DataFrame({
                "shard": [int(pdf["shard"].iloc[0])],
                "table": [table.tobytes()],
                "used_slots": [int(np.count_nonzero(table))],
                "n_keys": [max(0, int(pdf["n_keys"].iloc[0]) - removed)],
                "failed": [int(pdf["failed"].iloc[0])],
            })

        keys = df.select(
            F.col(key_col).alias("__k"),
            self._shard_col(key_col).alias("__shard"),
        )
        merged = (
            self.dim.groupBy("shard")
            .cogroup(keys.groupBy("__shard"))
            .applyInPandas(
                lambda left, right: fold(left, right),
                schema=self._DIM_SCHEMA,
            )
        )
        old = self.dim
        self.dim = merged.localCheckpoint(eager=True)
        if old is not None:
            try:
                old.unpersist()
            except Exception:
                pass

    def _check_saturation(self, fill: float, failed: int) -> None:
        if (failed > 0 or fill >= self.DISABLE_FILL) and self.enabled:
            self.enabled = False
            if self.dim is not None:
                try:
                    self.dim.unpersist()
                except Exception:
                    pass
            warnings.warn(
                f"ShardedCuckooPrefilter saturated (worst shard fill="
                f"{fill:.2f}, {failed} failed inserts, ~{self.n_keys} "
                f"keys into {self.n_shards}x{self.n_buckets}x"
                f"{self.SLOTS} slots): auto-disabled — candidates flow "
                f"straight to the exact anti-join (an unstored key "
                f"must never read 'definitely new'). Raise "
                f"buckets_per_shard/n_shards for the expected URL "
                f"count.",
                RuntimeWarning,
                stacklevel=3,
            )
        elif fill >= self.WARN_FILL and not self._warned:
            self._warned = True
            warnings.warn(
                f"ShardedCuckooPrefilter filling up (worst shard fill="
                f"{fill:.2f} >= {self.WARN_FILL}, ~{self.n_keys} keys):"
                f" kick chains lengthen and an insert failure will "
                f"auto-disable the filter.",
                RuntimeWarning,
                stacklevel=3,
            )

    def filter_candidates(
        self, df: DataFrame, key_col: str = "seen_key",
        caches: list | None = None,
    ) -> tuple[DataFrame, DataFrame]:
        """(maybe_seen, definitely_new) — identical contract and plan
        shape to the sharded Bloom: candidates cogrouped with the shard
        dim, one co-partitioned task per shard, vectorized fingerprint
        probes."""
        if not self.enabled or self.dim is None:
            return df, df.limit(0)
        n_buckets = self.n_buckets
        cols = df.columns
        cand = df.withColumn("__shard", self._shard_col(key_col))
        out_schema = (
            cand.withColumn("__maybe", F.lit(True)).drop("__shard")
            .schema
        )

        def apply(left: pd.DataFrame, right: pd.DataFrame
                  ) -> pd.DataFrame:
            left = left.drop(columns="__shard")
            if len(left) == 0:
                return left.assign(__maybe=pd.Series([], dtype=bool))
            if len(right) == 0:
                return left.assign(__maybe=False)
            table = np.frombuffer(
                right["table"].iloc[0], dtype=np.uint16
            )
            hit = ShardedCuckooPrefilter._contains(
                table, n_buckets, left[key_col].to_numpy()
            )
            return left.assign(__maybe=hit)

        flagged = (
            cand.groupBy("__shard")
            .cogroup(self.dim.groupBy("shard"))
            .applyInPandas(apply, schema=out_schema)
        )
        if caches is not None:
            flagged = flagged.cache()
            caches.append(flagged)
        return (
            flagged.filter(F.col("__maybe")).select(*cols),
            flagged.filter(~F.col("__maybe")).select(*cols),
        )

    def release(self) -> None:
        if self.dim is not None:
            try:
                self.dim.unpersist()
            except Exception:
                pass
            self.dim = None


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
