"""Distribution-drift checks vs a persisted baseline snapshot: PSI and
Kolmogorov–Smirnov (SURVEY.md §2.9).

Scale path: **bucketed** — both sides reduce to #buckets histogram rows
(map-side combine, tiny shuffle), then a broadcast-sized join computes
the statistic; works at any input size. Exact KS over raw values is
also provided for small/oracle use (single-partition window — its
documented cost).

Baselines persist as plain parquet histograms
(:class:`BaselineSnapshot`), the checkpoint analogue of north_rule's
"persisted baseline stats snapshot".
"""

from __future__ import annotations

import math
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F

__all__ = ["bucket_histogram", "psi", "psi_from_histograms", "ks_bucketed", "ks_exact",
           "BaselineSnapshot"]


def bucket_histogram(df: DataFrame, col: str, lo: float, hi: float, buckets: int = 20) -> DataFrame:
    """Fixed-bound histogram: bucket 0 = underflow, buckets+1 = overflow.
    Deterministic given (lo, hi, buckets) → SQL-oracle-able and safely
    comparable across runs/engines."""
    c = F.col(col).cast("double")
    b = F.when(c < lo, F.lit(0)).when(c >= hi, F.lit(buckets + 1)).otherwise(
        (F.floor((c - lo) / ((hi - lo) / buckets)) + 1).cast("int")
    )
    return (
        df.filter(c.isNotNull())
        .groupBy(b.alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def psi_from_histograms(cur_hist: DataFrame, base_hist: DataFrame, eps: float = 1e-6) -> DataFrame:
    """PSI = Σ (p−q)·ln(p/q) over bucket shares (ε-smoothed)."""
    cur_t = cur_hist.agg(F.sum("cnt").alias("t")).select("t")
    base_t = base_hist.agg(F.sum("cnt").alias("t")).select("t")
    cur = cur_hist.crossJoin(cur_t).select("bucket", (F.col("cnt") / F.col("t")).alias("p"))
    base = base_hist.crossJoin(base_t).select("bucket", (F.col("cnt") / F.col("t")).alias("q"))
    joined = cur.join(base, "bucket", "full_outer").select(
        F.coalesce("p", F.lit(0.0)).alias("p"), F.coalesce("q", F.lit(0.0)).alias("q")
    )
    p = F.col("p") + eps
    q = F.col("q") + eps
    return joined.agg(F.sum((p - q) * F.log(p / q)).alias("psi"))


def psi(cur: DataFrame, base: DataFrame, col: str, lo: float, hi: float,
        buckets: int = 20, eps: float = 1e-6) -> DataFrame:
    return psi_from_histograms(
        bucket_histogram(cur, col, lo, hi, buckets),
        bucket_histogram(base, col, lo, hi, buckets),
        eps,
    )


def ks_bucketed(cur: DataFrame, base: DataFrame, col: str, lo: float, hi: float,
                buckets: int = 200) -> DataFrame:
    """KS statistic on bucketed CDFs: max |F_cur − F_base| at bucket
    edges. Error ≤ max bucket mass; #buckets rows through the window."""
    ch = bucket_histogram(cur, col, lo, hi, buckets).withColumnRenamed("cnt", "c_cur")
    bh = bucket_histogram(base, col, lo, hi, buckets).withColumnRenamed("cnt", "c_base")
    j = ch.join(bh, "bucket", "full_outer").na.fill(0, ["c_cur", "c_base"])
    w = W.orderBy("bucket").rowsBetween(W.unboundedPreceding, 0)
    tot = j.agg(F.sum("c_cur").alias("tc"), F.sum("c_base").alias("tb"))
    cdf = j.withColumn("cum_cur", F.sum("c_cur").over(w)).withColumn(
        "cum_base", F.sum("c_base").over(w)
    )
    return cdf.crossJoin(tot).agg(
        F.max(F.abs(F.col("cum_cur") / F.col("tc") - F.col("cum_base") / F.col("tb"))).alias("ks")
    )


def ks_exact(cur: DataFrame, base: DataFrame, col: str) -> DataFrame:
    """Exact two-sample KS via cume_dist over the pooled sample.
    Single-partition window — for small data / oracle verification."""
    a = cur.select(F.col(col).cast("double").alias("v")).filter("v is not null") \
        .withColumn("is_cur", F.lit(1))
    b = base.select(F.col(col).cast("double").alias("v")).filter("v is not null") \
        .withColumn("is_cur", F.lit(0))
    u = a.unionByName(b)
    g = u.groupBy("v").agg(
        F.sum("is_cur").alias("c_cur"), F.sum(1 - F.col("is_cur")).alias("c_base")
    )
    w = W.orderBy("v").rowsBetween(W.unboundedPreceding, 0)
    tot = g.agg(F.sum("c_cur").alias("tc"), F.sum("c_base").alias("tb"))
    cdf = g.withColumn("cum_cur", F.sum("c_cur").over(w)).withColumn(
        "cum_base", F.sum("c_base").over(w)
    )
    return cdf.crossJoin(tot).agg(
        F.max(F.abs(F.col("cum_cur") / F.col("tc") - F.col("cum_base") / F.col("tb"))).alias("ks")
    )


class BaselineSnapshot:
    """Persisted baseline histograms, keyed by (table, column)."""

    def __init__(self, path: str):
        self.path = path

    def write(self, hist: DataFrame, table: str, column: str, mode: str = "overwrite") -> None:
        (hist.withColumn("table", F.lit(table)).withColumn("column", F.lit(column))
         .write.mode(mode).partitionBy("table", "column").parquet(self.path))

    def read(self, spark: SparkSession, table: str, column: str) -> DataFrame:
        return (spark.read.parquet(self.path)
                .filter((F.col("table") == table) & (F.col("column") == column))
                .select("bucket", "cnt"))
