"""Degenerate-LSH-bucket guard shared by the pair-join dedup ops.

Within-bucket pairing is quadratic in bucket size: one 10^6-row
bucket (e.g. a mass-duplicated boilerplate page hashing every copy to
the same signature) emits 10^12 candidate rows and sinks the job at
the 10^10-document tier. Every bucketed pair join (MinHash bands,
SimHash bands, sign-LSH embedding buckets) therefore routes its
bucket frame through :func:`cap_buckets` before self-joining.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

log = logging.getLogger("crawlspark.lsh")


def cap_buckets(
    buckets: DataFrame,
    keys: list[str],
    max_bucket: int,
    op: str,
    log_drops: bool = True,
) -> DataFrame:
    """Drop buckets with more than ``max_bucket`` members from
    candidate generation — never silently: one tiny aggregate action
    counts the dropped buckets/rows and logs a warning (dropping a
    bucket means those documents' pairs are NOT reported by this op;
    at scale the right follow-up is more bands/planes or an exact
    pass over just the dropped buckets' members).

    The cap filter is a window count over the same keys the pair
    join shuffles on, so it adds no extra exchange to the join plan;
    the drop-count log costs one extra pass over the bucket lineage
    (cheap when the signature frame is persisted, as in
    ``minhash_dup_pairs``) and can be disabled with
    ``log_drops=False``.
    """
    w = Window.partitionBy(*[F.col(k) for k in keys])
    b = buckets.withColumn("__bn", F.count(F.lit(1)).over(w))
    if log_drops:
        over = (
            buckets.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > max_bucket)
            .agg(
                F.count(F.lit(1)).alias("nb"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("nr"),
            )
            .first()
        )
        if over["nb"]:
            log.warning(
                "%s: dropped %d degenerate LSH bucket(s) totalling %d "
                "rows (bucket cap %d) — pairs within them are not "
                "reported",
                op,
                over["nb"],
                int(over["nr"]),
                max_bucket,
            )
    return b.filter(F.col("__bn") <= max_bucket).drop("__bn")


def overflow_adjacent_pairs(
    buckets: DataFrame,
    keys: list[str],
    max_bucket: int,
    id_col: str,
    sort_col: str | None = None,
) -> DataFrame:
    """LINEAR-cost candidate pairs from the OVER-cap buckets that
    :func:`cap_buckets` drops — the opt-in exact-pass fallback: rather
    than omitting a degenerate bucket's pairs entirely, sort its
    members within the bucket (by ``sort_col``, default the id) and
    pair each row with its successor. A 10^6-row boilerplate bucket
    emits 10^6-1 chained candidates instead of ~10^12 — one window
    shuffle, bounded memory, no quadratic blowup.

    The chain is complete for DEDUP semantics: downstream exact
    verification keeps only true near-dups, and connected-components
    clustering recovers the full duplicate family from the adjacent
    chain (every member links to its sort-neighbor; identical or
    near-identical docs sort adjacently). Non-adjacent direct pairs
    within the bucket are intentionally not enumerated — that IS the
    bound. Returns (a, b) with a < b, distinct."""
    w = Window.partitionBy(*[F.col(k) for k in keys])
    over = buckets.withColumn("__bn", F.count(F.lit(1)).over(w)).filter(
        F.col("__bn") > max_bucket
    )
    ws = Window.partitionBy(*[F.col(k) for k in keys]).orderBy(
        F.col(sort_col or id_col), F.col(id_col)
    )
    nxt = F.lead(id_col).over(ws)
    return (
        over.select(
            F.least(F.col(id_col), nxt).alias("a"),
            F.greatest(F.col(id_col), nxt).alias("b"),
        )
        .filter(F.col("a").isNotNull() & (F.col("a") != F.col("b")))
        .distinct()
    )
