"""Resumable validation runs: bucket manifest + idempotent restart.

north_rule: "resumable from checkpoint with per-partition lineage +
metrics". The unit of resume is a deterministic hash bucket of a stable
row key (survives repartitioning, unlike ``spark_partition_id``). Each
completed bucket appends its verdict rows and one manifest row
(bucket id, rows, violations, sha256 digest, wall-clock). On restart,
completed buckets are skipped by manifest lookup; digests let the test
suite assert no bucket is processed twice and re-runs are byte-stable.

On a real cluster the same layout maps 1:1 onto an Iceberg table where
the manifest is the snapshot log; parquet directories keep the sandbox
dependency-free.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

__all__ = ["ResumableRun"]


class ResumableRun:
    def __init__(self, run_dir: str, n_buckets: int = 32, key_col: str = "row_id"):
        self.run_dir = run_dir
        self.n_buckets = n_buckets
        self.key_col = key_col
        self.manifest_dir = os.path.join(run_dir, "manifest")
        self.out_dir = os.path.join(run_dir, "verdicts")

    def bucket_of(self) -> F.Column:
        return F.pmod(F.xxhash64(F.col(self.key_col)), F.lit(self.n_buckets)).cast("int")

    def _digest_exprs(self, prefix: str = "") -> list[F.Column]:
        """The (rows, violation_rows, digest_xor64) aggregate expressions
        — ONE definition shared by the ``run()`` manifest observation and
        ``_disk_stats()``'s read-back audit, so the two sides of
        ``reconcile`` can never drift apart."""
        return [
            F.count(F.lit(1)).alias(f"{prefix}rows"),
            F.coalesce(F.sum((~F.col("valid")).cast("long")), F.lit(0)).alias(
                f"{prefix}violation_rows"
            ),
            F.coalesce(
                F.expr("conv(cast(bit_xor(xxhash64(cast(" + self.key_col +
                       " as string), cast(valid as string))) as string), 10, 16)"),
                F.lit("0"),
            ).alias(f"{prefix}digest_xor64"),
        ]

    def completed_buckets(self, spark: SparkSession) -> set[int]:
        try:
            rows = spark.read.parquet(self.manifest_dir).select("bucket").distinct().collect()
        except Exception:
            return set()
        return {r["bucket"] for r in rows}

    def run(
        self,
        df: DataFrame,
        validate: Callable[[DataFrame], DataFrame],
        max_buckets: Optional[int] = None,
    ) -> list[int]:
        """Process incomplete buckets (optionally at most ``max_buckets``
        — used by tests to simulate a crash). Returns buckets processed.

        Each bucket is one narrow filtered pass; at cluster scale the
        bucket column prunes Iceberg partitions so a resume touches only
        unprocessed data.
        """
        spark = df.sparkSession
        done = self.completed_buckets(spark)
        todo = [b for b in range(self.n_buckets) if b not in done]
        if max_buckets is not None:
            todo = todo[:max_buckets]
        processed = []
        src = df.withColumn("__bucket", self.bucket_of())
        for b in todo:
            t0 = time.perf_counter()
            part = src.filter(F.col("__bucket") == b).drop("__bucket")
            validated = validate(part)
            out = validated.withColumn("__bucket", F.lit(b))
            # Manifest metrics ride on the write job itself via observe()
            # — zero extra passes (the old shape re-read the written
            # parquet and ran a second job per bucket).
            obs = Observation(f"bucket_{b}")
            out = out.observe(obs, *self._digest_exprs())
            # Dynamic partition overwrite: a rerun of a bucket whose
            # data landed but whose manifest append crashed REPLACES the
            # bucket directory instead of appending duplicates — the
            # write is idempotent per bucket, so the manifest always
            # certifies exactly what is on disk. The mode is forced at
            # the SESSION level for the duration of the write (and
            # restored after): the per-write option alone is not honored
            # on every Spark lineage, and a session stuck on STATIC
            # would silently wipe every completed bucket on resume.
            conf_key = "spark.sql.sources.partitionOverwriteMode"
            prev_mode = spark.conf.get(conf_key, None)
            spark.conf.set(conf_key, "dynamic")
            try:
                (out.write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__bucket")
                    .parquet(self.out_dir))
            finally:
                if prev_mode is None:
                    spark.conf.unset(conf_key)
                else:
                    spark.conf.set(conf_key, prev_mode)
            stats = obs.get
            manifest = spark.createDataFrame(
                [(b, stats["rows"], stats["violation_rows"], stats["digest_xor64"],
                  (time.perf_counter() - t0) * 1000.0)],
                "bucket int, rows long, violation_rows long, digest_xor64 string, elapsed_ms double",
            )
            manifest.write.mode("append").parquet(self.manifest_dir)
            processed.append(b)
        return processed

    def manifest(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.manifest_dir)

    def reconcile(self, spark: SparkSession) -> DataFrame:
        """Offline audit: recompute per-bucket stats from what is on
        disk and return buckets whose manifest row disagrees.

        The per-bucket write is idempotent (dynamic partition overwrite)
        so duplicated DATA cannot survive a crash-rerun; the residual
        risk is observe() metrics double-counting under speculative
        task duplication — this read-back catches that without putting
        an extra job on the hot path (``run`` stays 2 jobs/bucket)."""
        try:
            on_disk = spark.read.parquet(self.out_dir)
        except Exception:
            # every bucket was empty: nothing was ever written, so there
            # is no parquet schema to infer — audit against zero rows
            on_disk = None
        if on_disk is None:
            disk = spark.createDataFrame(
                [], "bucket int, disk_rows long, disk_violation_rows long, "
                    "disk_digest_xor64 string")
        else:
            disk = self._disk_stats(on_disk)
        man = self.manifest(spark).select("bucket", "rows", "violation_rows",
                                          "digest_xor64")
        joined = man.join(disk, "bucket", "full_outer")
        # an EMPTY bucket appends a manifest row (rows=0, digest "0")
        # but dynamic partition overwrite writes no __bucket directory —
        # missing disk stats opposite a manifest row mean zero rows on
        # disk, not a mismatch; a manifest-less disk partition still
        # flags (its manifest side stays NULL)
        return joined.filter(
            ~(F.col("rows").eqNullSafe(F.coalesce(F.col("disk_rows"), F.lit(0)))
              & F.col("violation_rows").eqNullSafe(
                  F.coalesce(F.col("disk_violation_rows"), F.lit(0)))
              & F.col("digest_xor64").eqNullSafe(
                  F.coalesce(F.col("disk_digest_xor64"), F.lit("0"))))
        )

    def _disk_stats(self, on_disk: DataFrame) -> DataFrame:
        return (
            on_disk
            .groupBy(F.col("__bucket").cast("int").alias("bucket"))
            .agg(*self._digest_exprs(prefix="disk_"))
        )

    def results(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.out_dir)
