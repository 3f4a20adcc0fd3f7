"""spark-submit job: validate a source-code file table end to end.

    spark-submit --py-files dist/json_schema_spark.zip \
        scripts/submit_validate.py \
        --input  <parquet dir with (repo,path,commit,lang,content)> \
        --output <run dir> [--resumable] [--buckets 64]

or, reading a catalog table instead of a path (the Iceberg deployment
shape — with the Iceberg runtime jars + catalog conf on the cluster,
``--table my_catalog.db.source_files`` gets snapshot isolation and
partition pruning for free; nothing else here changes):

    spark-submit ... --table <catalog.db.table> --output <run dir>

Writes under --output:
  verdicts/    row_id, valid, violations, content_sha256 (parquet)
  violations/  exploded violation rows
  ledger/      per-partition pass/fail + metrics + sha256 digest
  summary.json driver-side run summary

The job uses whatever master/executors spark-submit supplies — on a
cluster nothing here changes; ``--resumable`` switches to the
hash-bucket manifest path (idempotent restart after a crash).
"""

from __future__ import annotations

import argparse
import json
import os
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    g = ap.add_mutually_exclusive_group(required=True)
    g.add_argument("--input", help="parquet directory")
    g.add_argument("--table", help="catalog table name (e.g. an Iceberg table)")
    ap.add_argument("--output", required=True)
    ap.add_argument("--resumable", action="store_true")
    ap.add_argument("--buckets", type=int, default=64)
    args = ap.parse_args()

    owns_session = SparkSession.getActiveSession() is None
    spark = SparkSession.builder.appName("validate_source_table").getOrCreate()
    from json_schema_spark.flagship import validate_source_table
    from json_schema_spark.operators.checkpoint import ResumableRun
    from json_schema_spark.operators.ledger import global_digest, partition_ledger

    t0 = time.time()
    df = spark.table(args.table) if args.table else spark.read.parquet(args.input)
    if "row_id" not in df.columns:
        df = df.withColumn("row_id", F.monotonically_increasing_id())

    if args.resumable:
        run = ResumableRun(os.path.join(args.output, "run"), n_buckets=args.buckets)
        validate = lambda d: validate_source_table(d).select(
            "row_id", "valid", F.to_json("violations").alias("violations_json"),
            "content_sha256",
        )
        done = run.run(df, validate)
        verdicts = run.results(spark)
        summary = {
            "mode": "resumable", "buckets_processed": len(done),
            "rows": verdicts.count(),
        }
    else:
        validated = validate_source_table(df)
        validated.select("row_id", "valid", "violations", "content_sha256") \
            .write.mode("overwrite").parquet(os.path.join(args.output, "verdicts"))
        from json_schema_spark.plans.runner import SparkValidator
        SparkValidator.violations_df(validated, ["row_id", "repo", "path"]) \
            .write.mode("overwrite").parquet(os.path.join(args.output, "violations"))
        partition_ledger(validated).write.mode("overwrite") \
            .parquet(os.path.join(args.output, "ledger"))
        g = global_digest(validated).collect()[0]
        summary = {
            "mode": "full",
            "rows": df.count(),
            "violation_count": g["violation_count"],
            "violations_xor64": g["violations_xor64"],
        }

    summary["elapsed_sec"] = round(time.time() - t0, 2)
    summary["files_per_sec"] = round(summary.get("rows", 0) / summary["elapsed_sec"], 1)
    with open(os.path.join(args.output, "summary.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))
    if owns_session:  # leave an embedding caller's session alone
        spark.stop()


if __name__ == "__main__":
    main()
