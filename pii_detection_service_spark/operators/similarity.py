"""Similarity search over the embeddings table (array<float> column).

- brute-force cosine top-k: broadcast the query vector, map-side cosine in
  JVM higher-order functions, TakeOrderedAndProject for the top-k (no full
  sort materialization).
- LSH-bucketed ANN: random-hyperplane signs → bucket id. Anchors are
  data-derived (fixed vec_ids) so the oracle is portable. At scale, the
  bucket id becomes the shuffle/partition key and queries probe one bucket
  instead of the full corpus.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame

from .relational import table

_DOT = (
    "aggregate(zip_with({u}, {v}, (x, y) -> x * y), "
    "cast(0.0 as double), (acc, x) -> acc + x)"
)
_NORM = "sqrt(aggregate(transform({u}, x -> x * x), cast(0.0 as double), (acc, x) -> acc + x))"


def topk_cosine(spark, sf_dir, k: int = 10) -> DataFrame:
    """Top-k by cosine against the vec_id=0 embedding (broadcast join —
    the dimension side is one row; nothing shuffles)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = e.where(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    cos = F.round(
        F.expr(_DOT.format(u="v", v="qv"))
        / (F.expr(_NORM.format(u="v")) * F.expr(_NORM.format(u="qv"))),
        4,
    )
    return (
        e.where(F.col("vec_id") != 0)
        .join(F.broadcast(q))
        .select("vec_id", cos.alias("cos"))
        .orderBy(F.col("cos").desc(), "vec_id")
        .limit(k)
    )


def lsh_buckets(spark, sf_dir) -> DataFrame:
    """Sign-LSH bucket histogram: 8 data-derived hyperplanes (embeddings of
    vec_id 1..8); bucket = Σ_j (dot(v, anchor_j) > 0) << (j-1)."""
    e = table(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    anchors = e.where((F.col("vec_id") >= 1) & (F.col("vec_id") <= 8)).select(
        F.col("vec_id").alias("aid"), F.col("v").alias("av")
    )
    dot = F.expr(_DOT.format(u="v", v="av"))
    per_vec = (
        e.join(F.broadcast(anchors))
        .groupBy("vec_id")
        .agg(
            F.sum(
                F.when(
                    dot > 0,
                    F.expr("shiftleft(cast(1 as bigint), cast(aid as int) - 1)"),
                ).otherwise(F.lit(0).cast("long"))
            ).alias("bucket")
        )
    )
    return per_vec.groupBy("bucket").agg(F.count(F.lit(1)).alias("n_vecs"))
