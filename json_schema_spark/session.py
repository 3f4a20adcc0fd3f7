"""SparkSession factory tuned for the validation workload.

Defaults follow the local-mode guidance in the public Spark docs:
AQE on, Arrow on, shuffle partitions sized to cores (not 200).
On a real cluster the same builder args apply unchanged; only
``master`` and memory sizing differ (spark-submit supplies them).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

__all__ = ["get_spark"]


def get_spark(app: str = "json_schema_spark", cores: int | None = None,
              shuffle_partitions: int | None = None, ui: bool = False,
              extra: dict | None = None) -> SparkSession:
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    shuffle_partitions = shuffle_partitions or max(cores, 8)
    b = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # InferFiltersFromGenerate copies the generator's INPUT expression
        # into a `size(e) > 0` filter that predicate-pushdown then sinks
        # below the repartition exchange — for the dedup operators the
        # input is a computed shingle/band array, so the whole shingling
        # pipeline re-evaluates inside the (often single-task) scan
        # stage. Measured on the prefix-Jaccard headline at sf0.1: two
        # concurrent 5.3 s single-task filter stages ahead of every
        # 32-way stage; the rule saves nothing here (no generator input
        # is ever empty at the scan) and serializes the cold path.
        .config("spark.sql.optimizer.excludedRules",
                "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate")
        .config("spark.ui.enabled", str(ui).lower())
        # 24g: at 16+ local threads an 8g heap inflates CPU work ~1.3-1.7×
        # in GC/allocator contention; 24g measured ZERO inflation
        # (BASELINE.md round 2, run 3). On a cluster spark-submit sizes
        # executors instead.
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "24g"))
        # Start G1 concurrent marking early (default IHOP 45% of 24g):
        # mixed query sequences otherwise accumulate ~10g of old-gen
        # garbage, and the first allocation-heavy stage after that hits
        # a concurrent-mark/mixed-GC storm mid-stage (measured: the
        # MinHash verify stage at 3-6x its clean time, 650s of GC pause
        # across 32 tasks). IHOP=30 keeps marking ahead of the burst.
        .config("spark.driver.extraJavaOptions",
                os.environ.get("SPARK_GRAFT_DRIVER_JAVA_OPTS",
                               "-XX:InitiatingHeapOccupancyPercent=30"
                               " -XX:G1ReservePercent=15"))
    )
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
