"""Incremental vs full re-validation on the north-rule source table.

Models the daily-snapshot scenario: a previous run validated snapshot
S0 of the 10^12-file source-code table and materialized its verdicts;
snapshot S1 arrives with ~1% churn (content edits, deletes, adds).
Three ways to produce S1's verdict table, timed over the same parquet:

  full         validate every row of S1 from scratch
  incremental  digest-diff S0 vs S1 (slim xxhash64 join), validate only
               the delta, carry prior verdicts (operators/incremental.py)
  changelog    same, but the delta keys come from table metadata
               (Iceberg incremental scan / CDC) — change detection free

What to expect, honestly: the flagship validator is a single codegen'd
projection, so at local scale `full` is scan-bound and `incremental`'s
extra digest pass over BOTH snapshots makes it comparable-or-slower —
the digest mode pays off only when the validator is much heavier than
xxhash64 (kernel path, violation trees, multi-schema) or when verdicts
feed expensive downstream writes. `changelog` is the 100 TB shape: cost
∝ churn + one slim key join, independent of corpus width. The point of
this bench is to measure that crossover, not to assume it.

Usage: python scripts/bench_incremental.py [rows] [churn_mod]
Prints one JSON line.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from json_schema_spark.session import get_spark  # noqa: E402
from json_schema_spark.flagship import validate_source_table  # noqa: E402
from json_schema_spark.operators.incremental import (  # noqa: E402
    apply_changelog,
    incremental_validate,
)
from json_schema_spark.sources.synth import source_code_table  # noqa: E402

ROWS = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
CHURN_MOD = int(sys.argv[2]) if len(sys.argv) > 2 else 97  # ~1% edits
CONTENT_COLS = ["repo", "path", "commit", "lang", "content"]
WORK = "/tmp/bench_incremental"


def _validate(df):
    # Slim verdict projection (key + verdict + invariant): the verdict
    # table a real run materializes. Keeping the wide content column in
    # the output would drag the full corpus width through the carried-
    # verdict union and erase the incremental advantage by construction.
    return validate_source_table(
        df, with_violations=True, with_sha=True
    ).select("row_id", "valid", "violations", "content_sha256")


def _mat(df):
    df.write.format("noop").mode("overwrite").save()


def main() -> None:
    spark = get_spark("bench_incremental")
    shutil.rmtree(WORK, ignore_errors=True)

    # ---- setup (untimed): S0, its verdicts, S1, all materialized ----
    s0 = source_code_table(spark, ROWS, seed=42)
    s0.write.parquet(f"{WORK}/s0")
    old = spark.read.parquet(f"{WORK}/s0")
    _validate(old).write.parquet(f"{WORK}/prior")
    prior = spark.read.parquet(f"{WORK}/prior")

    rid = F.col("row_id")
    s1 = (
        old.filter(rid % 997 != 3)  # ~0.1% deletes
        .withColumn(
            "content",
            F.when(rid % CHURN_MOD == 0,
                   F.concat(F.coalesce(F.col("content"), F.lit("")),
                            F.lit(" // rev2")))
            .otherwise(F.col("content")),
        )
        .unionByName(
            old.filter(rid % 499 == 7)  # ~0.2% adds, re-keyed
            .withColumn("row_id", rid + F.lit(10_000_000_000))
        )
    )
    s1.write.parquet(f"{WORK}/s1")
    new = spark.read.parquet(f"{WORK}/s1")
    delta = new.join(old.select("row_id", F.col("content").alias("__oc")),
                     "row_id", "left").filter(
        F.col("__oc").isNull() | (F.col("content") != F.col("__oc"))
    ).select("row_id")
    delta.write.parquet(f"{WORK}/delta")  # the "Iceberg changelog"
    delta = spark.read.parquet(f"{WORK}/delta")
    # The full changelog an Iceberg incremental scan delivers: the
    # changed/added rows themselves + the removed keys. In this mode
    # the new snapshot is never an input at all.
    new.join(delta, "row_id", "left_semi").write.parquet(f"{WORK}/changed")
    changed = spark.read.parquet(f"{WORK}/changed")
    old.join(new.select("row_id"), "row_id", "left_anti") \
        .select("row_id").write.parquet(f"{WORK}/removed")
    removed = spark.read.parquet(f"{WORK}/removed")
    n_new = new.count()
    n_delta = delta.count()

    def timed(fn):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            best = min(best, time.perf_counter() - t0)
        return round(best, 3)

    t_full = timed(lambda: _mat(_validate(new)))
    t_inc = timed(lambda: _mat(incremental_validate(
        old, new, ["row_id"], _validate, prior,
        content_cols=CONTENT_COLS, digest="xxhash64")))
    t_log = timed(lambda: _mat(incremental_validate(
        old, new, ["row_id"], _validate, prior, delta_keys=delta)))
    t_rows = timed(lambda: _mat(apply_changelog(
        prior, changed, ["row_id"], _validate, removed_keys=removed)))

    print(json.dumps({
        "metric": "incremental_validate",
        "rows": n_new,
        "delta_rows": n_delta,
        "churn_pct": round(100.0 * n_delta / n_new, 2),
        "full_sec": t_full,
        "incremental_digest_sec": t_inc,
        "incremental_changelog_keys_sec": t_log,
        "incremental_changelog_rows_sec": t_rows,
        "unit": "sec",
    }))


if __name__ == "__main__":
    main()
