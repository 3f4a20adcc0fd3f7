"""Approximate-nearest-neighbor search over an embedding column.

* :func:`brute_force_topk` — exact cosine top-k: broadcast the query
  set, JVM-side ``zip_with``/``aggregate`` dot products, per-query
  window top-k. The correctness baseline; linear scan of the corpus.
* :func:`ivf_topk` — IVF-flat scale path: corpus is bucketed by nearest
  centroid (one shuffle, done once); a query probes only ``n_probe``
  centroid buckets, so the scan cost drops by ~n_centroids/n_probe.
  Centroids come from a deterministic one-pass assign-average (k-means
  single iteration over a hashed seeding) — no external libraries.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window as W, functions as F

__all__ = ["cosine", "dot", "brute_force_topk", "build_ivf", "ivf_topk"]


def dot(a, b) -> F.Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0),
                       lambda acc, x: acc + x.cast("double"))


def cosine(a, b) -> F.Column:
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


def brute_force_topk(corpus: DataFrame, queries: DataFrame, k: int = 10,
                     vec_col: str = "embedding", id_col: str = "vec_id",
                     q_vec_col: Optional[str] = None, q_id_col: Optional[str] = None) -> DataFrame:
    """Exact top-k by cosine. Queries are broadcast (small side) so the
    corpus never shuffles; ranking is a per-query window."""
    q_vec_col = q_vec_col or vec_col
    q_id_col = q_id_col or id_col
    q = F.broadcast(
        queries.select(F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("qv"))
    )
    c = corpus.select(F.col(id_col).alias("item_id"), F.col(vec_col).alias("cv"))
    scored = q.crossJoin(c).select(
        "query_id", "item_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def build_ivf(corpus: DataFrame, n_centroids: int = 16, vec_col: str = "embedding",
              id_col: str = "vec_id", seed: int = 42) -> tuple[DataFrame, DataFrame]:
    """One-iteration IVF training: deterministic hash-seeded assignment
    → centroid = mean of bucket → reassign to nearest centroid.
    Returns (assigned corpus with ``centroid_id``, centroids table)."""
    seeded = corpus.select(
        F.col(id_col).alias("item_id"),
        F.col(vec_col).alias("cv"),
        F.pmod(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.lit(n_centroids))
        .cast("int").alias("seed_bucket"),
    )
    dim = len(seeded.select("cv").first()["cv"])
    cents = seeded.groupBy("seed_bucket").agg(
        F.array(*[F.avg(F.col("cv")[i]) for i in range(dim)]).alias("centroid")
    ).select(F.col("seed_bucket").alias("centroid_id"), "centroid")
    cents_b = F.broadcast(cents)
    # reassign each vector to its nearest centroid (one scan, no shuffle
    # of vectors until the final bucket write)
    scored = seeded.crossJoin(cents_b).select(
        "item_id", "cv", "centroid_id", cosine(F.col("cv"), F.col("centroid")).alias("sim")
    )
    w = W.partitionBy("item_id").orderBy(F.desc("sim"))
    assigned = (
        scored.withColumn("r", F.row_number().over(w)).filter("r = 1")
        .select("item_id", "cv", "centroid_id")
    )
    return assigned, cents


def ivf_topk(assigned: DataFrame, centroids: DataFrame, queries: DataFrame,
             k: int = 10, n_probe: int = 4,
             q_vec_col: str = "embedding", q_id_col: str = "vec_id") -> DataFrame:
    """Probe the ``n_probe`` nearest centroid buckets per query, exact
    cosine within them. At cluster scale ``assigned`` is written
    bucketed/partitioned by ``centroid_id`` so a probe is a partition-
    pruned scan."""
    q = queries.select(F.col(q_id_col).alias("query_id"), F.col(q_vec_col).alias("qv"))
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "query_id", "qv", "centroid_id", cosine(F.col("qv"), F.col("centroid")).alias("csim")
    )
    w = W.partitionBy("query_id").orderBy(F.desc("csim"))
    probes = qc.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= n_probe) \
        .select("query_id", "qv", "centroid_id")
    scored = F.broadcast(probes).join(assigned, "centroid_id").select(
        "query_id", "item_id", cosine(F.col("qv"), F.col("cv")).alias("cosine")
    )
    w2 = W.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("item_id"))
    return scored.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
