"""Link-graph analytics for crawl prioritization.

Out-of-reference scope (the reference crawls depth-first by
discovery; a frontier at the 10^10-URL tier wants authority-aware
prioritization). PageRank here is the fixed-iteration, integer
micro-unit variant:

* ranks live in MICRO-UNITS (longs, 1.0 == 1_000_000) and every
  division is an explicit floor — so each iteration is integer
  arithmetic whose sums are order-independent. Float PageRank sums
  contributions in partition order and no two engines (or two runs
  at different parallelism) agree bit-for-bit; the micro-unit form
  is exactly reproducible anywhere, including the DuckDB oracle as
  unrolled CTEs.
* each iteration is one equi-join (edges x ranks) + one groupBy sum
  — the canonical Spark iterative-graph shape: shuffle keyed on dst,
  no driver-side edge data, no cartesian anything. The degree dim is
  computed once and reused.
* nodes without in-links get the damping floor; nodes without
  out-links (dangling) simply leak their mass, matching the simple
  propagation variant (documented deviation from mass-conserving
  PageRank — at crawl-prioritization fidelity the ordering, not the
  normalization, is what matters).

At 100 TB: edges partition by dst for the contribution shuffle; the
rank frame is O(nodes) and stays distributed; n_iters is a fixed
small constant so lineage stays shallow (localCheckpoint per round
guards the longer configurations, as in dedup.connected_components).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MICRO = 1_000_000


def pagerank_micro(
    edges: DataFrame,
    n_iters: int = 3,
    damping_pct: int = 85,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 5,
) -> DataFrame:
    """(node, rank_micro) after ``n_iters`` integer PageRank rounds.

    rank0 = 1.0 (MICRO); per round:
      contrib(dst) = sum over in-edges of floor(rank(src) / deg(src))
      rank'(node)  = (100 - damping_pct)% * MICRO
                     + floor(damping_pct * contrib / 100)
    All longs; ``damping_pct`` is an integer percentage so the oracle
    can mirror the exact arithmetic.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be 0..100")
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = e.groupBy("src").agg(F.count("*").alias("deg"))
    base = (100 - damping_pct) * MICRO // 100
    ranks = nodes.select(
        "node", F.lit(MICRO).cast("long").alias("rank_micro")
    )
    for i in range(n_iters):
        contribs = (
            e.join(ranks, e.src == F.col("node"))
            .join(deg, "src")
            .select(
                F.col("dst").alias("node"),
                F.floor(F.col("rank_micro") / F.col("deg"))
                .cast("long")
                .alias("c"),
            )
        )
        summed = contribs.groupBy("node").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, "node", "left")
            .select(
                "node",
                (
                    F.lit(base)
                    + F.floor(
                        F.lit(damping_pct)
                        * F.coalesce(F.col("s"), F.lit(0))
                        / F.lit(100)
                    )
                )
                .cast("long")
                .alias("rank_micro"),
            )
        )
        if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks


def degree_stats(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """(node, out_degree, in_degree) over the edge list — the quick
    hub/authority gauge feeding crawl budgets."""
    e = edges.select(
        F.col(src_col).cast("long").alias("src"),
        F.col(dst_col).cast("long").alias("dst"),
    )
    out_d = e.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_degree")
    )
    in_d = e.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        out_d.join(in_d, "node", "full")
        .select(
            "node",
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
        )
    )
