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
  out-links (dangling) leak their mass by default — the simple
  propagation variant, where ordering (not normalization) is what
  crawl prioritization needs — or conserve it with
  ``dangling="redistribute"``, which shares each round's dangling
  total equally across all nodes using the same integer floors (the
  textbook mass-conserving correction, still oracle-exact).
* ``tol_micro`` turns on delta-based early stop for long
  configurations: iteration ends when no node's rank moved more
  than the tolerance, and the round count used is reported.

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
    dangling: str = "leak",
    tol_micro: int = 0,
) -> DataFrame:
    """(node, rank_micro) after up to ``n_iters`` integer PageRank
    rounds.

    rank0 = 1.0 (MICRO); per round:
      contrib(dst) = sum over in-edges of floor(rank(src) / deg(src))
      rank'(node)  = (100 - damping_pct)% * MICRO
                     + floor(damping_pct * contrib / 100)
                     [+ floor(damping_pct * dangling_sum
                              / (100 * n_nodes))  when redistributing]
    All longs; ``damping_pct`` is an integer percentage so the oracle
    can mirror the exact arithmetic.

    ``dangling``: ``"leak"`` (default — nodes without out-links lose
    their mass, the simple-propagation variant) or ``"redistribute"``
    (mass-conserving: each round the dangling nodes' total rank is
    shared equally across all nodes; the per-round total is a 1-row
    aggregate cross-joined back in — no driver collect, and the
    unrolled-CTE oracle mirrors it exactly).

    ``tol_micro`` > 0 enables delta-based early stop: iteration ends
    once ``max |rank' - rank| <= tol_micro`` (a 1-value metrics
    aggregate per round; each round's frame is then eagerly
    localCheckpointed so the convergence check isn't recomputed).
    The round count actually run is exposed as ``result._pr_iters``
    — with early stop the result is still exact for that count, so
    an oracle unrolled to ``result._pr_iters`` rounds matches.
    """
    if not 0 <= damping_pct <= 100:
        raise ValueError("damping_pct must be 0..100")
    if dangling not in ("leak", "redistribute"):
        raise ValueError("dangling must be 'leak' or 'redistribute'")
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
    if dangling == "redistribute":
        # nodes with no out-links, computed once; n_nodes is a single
        # driver scalar (O(1) driver data)
        dang = nodes.join(
            deg.select(F.col("src").alias("node")), "node", "left_anti"
        ).localCheckpoint(eager=True)
        n_nodes = nodes.count()
    ranks = nodes.select(
        "node", F.lit(MICRO).cast("long").alias("rank_micro")
    )
    iters_run = 0
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
        new_rank = F.lit(base) + F.floor(
            F.lit(damping_pct)
            * F.coalesce(F.col("s"), F.lit(0))
            / F.lit(100)
        )
        joined = nodes.join(summed, "node", "left")
        if dangling == "redistribute":
            d_row = (
                ranks.join(dang, "node")
                .agg(
                    F.coalesce(F.sum("rank_micro"), F.lit(0))
                    .cast("long")
                    .alias("__dsum")
                )
            )
            joined = joined.crossJoin(F.broadcast(d_row))
            new_rank = new_rank + F.floor(
                F.lit(damping_pct)
                * F.col("__dsum")
                / F.lit(100 * n_nodes)
            )
        new_ranks = joined.select(
            "node", new_rank.cast("long").alias("rank_micro")
        )
        iters_run = i + 1
        if tol_micro > 0:
            new_ranks = new_ranks.localCheckpoint(eager=True)
            delta = (
                new_ranks.alias("n")
                .join(ranks.alias("o"), "node")
                .agg(
                    F.max(
                        F.abs(
                            F.col("n.rank_micro")
                            - F.col("o.rank_micro")
                        )
                    ).alias("d")
                )
                .collect()[0]["d"]
            )
            ranks = new_ranks
            if delta is not None and delta <= tol_micro:
                break
        else:
            ranks = new_ranks
            if (i + 1) % checkpoint_every == 0 and i + 1 < n_iters:
                ranks = ranks.localCheckpoint(eager=True)
    ranks._pr_iters = iters_run
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
