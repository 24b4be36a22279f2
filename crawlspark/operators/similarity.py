"""Embedding similarity search: brute-force cosine top-k + LSH buckets.

Brute-force is the exactness baseline (small query set x full table,
a broadcast-join-shaped product); the scale path is sign-LSH
bucketing: b deterministic pseudo-random hyperplanes (hash-seeded, no
RNG state) -> b-bit signature -> candidates share a bucket, so the
expensive cosine only runs inside buckets. All arithmetic is JVM-side
(`F.aggregate`/`F.zip_with`); a vectorized pandas-UDF variant would
drop in for very wide vectors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .textops import str_hash32


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk(
    emb: DataFrame, n_queries: int = 5, k: int = 5
) -> DataFrame:
    """Top-k cosine neighbors for the first ``n_queries`` vectors.

    (query_id, neighbor_id, cos) — neighbor != query; deterministic
    tie-break on neighbor_id.
    """
    q = emb.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    j = F.broadcast(q).crossJoin(
        emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    )
    scored = j.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding")))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select(
            "query_id", "neighbor_id", F.round("cos", 6).alias("cos"), "rk"
        )
    )


def lsh_signatures(emb: DataFrame, n_planes: int = 16) -> DataFrame:
    """Sign-LSH signature: plane p's weight for dim d is a deterministic
    hash of (p, d) mapped to [-1, 1) — reproducible on any engine with
    md5, no RNG state shipped to executors."""
    dim_idx = F.sequence(F.lit(1), F.size(F.col("embedding")))
    sig = F.lit(0).cast("long")
    for p in range(n_planes):
        proj = F.aggregate(
            F.zip_with(
                F.col("embedding"),
                dim_idx,
                lambda x, d: x.cast("double")
                * (
                    (
                        str_hash32(
                            F.concat_ws(":", F.lit(str(p)), d.cast("string"))
                        ).cast("double")
                        / F.lit(2147483648.0)
                    )
                    - F.lit(1.0)
                ),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        sig = sig + F.when(proj > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return emb.select("vec_id", "label", sig.alias("lsh_sig"))


def lsh_bucket_stats(emb: DataFrame, n_planes: int = 8) -> DataFrame:
    """Bucket occupancy of the sign-LSH index — the health check that
    decides bucket fan-out before the ANN join."""
    return (
        lsh_signatures(emb, n_planes)
        .groupBy("lsh_sig")
        .agg(
            F.count("*").alias("n_vectors"),
            F.countDistinct("label").alias("n_labels"),
        )
    )


def lsh_ann(
    emb: DataFrame, n_queries: int = 5, k: int = 3, n_planes: int = 8
) -> DataFrame:
    """ANN top-k restricted to same-LSH-bucket candidates — the shape
    that survives 10^10 rows (equi-join on bucket, no cross product)."""
    sigs = lsh_signatures(emb, n_planes).select("vec_id", "lsh_sig")
    with_sig = emb.join(sigs, "vec_id")
    q = with_sig.filter(F.col("vec_id") < n_queries).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qv"),
        "lsh_sig",
    )
    cand = F.broadcast(q).join(
        with_sig.select(
            F.col("vec_id").alias("neighbor_id"), "embedding", "lsh_sig"
        ),
        "lsh_sig",
    )
    scored = cand.filter(F.col("query_id") != F.col("neighbor_id")).select(
        "query_id",
        "neighbor_id",
        (
            _dot(F.col("qv"), F.col("embedding"))
            / (_norm(F.col("qv")) * _norm(F.col("embedding")))
        ).alias("cos"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("query_id", "neighbor_id", F.round("cos", 6).alias("cos"))
    )
