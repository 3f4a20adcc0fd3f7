"""Structured Streaming validation: file-source micro-batches through
the same compiled expressions, watermarked windowed rates, per-batch
ledger via foreachBatch."""

import glob
import json

import pytest
from pyspark.sql import functions as F

from json_schema_spark.flagship import FLAGSHIP_SCHEMA
from json_schema_spark.plans.runner import SparkValidator
from json_schema_spark.sources.synth import source_code_table
from json_schema_spark.streaming.validate import (
    stream_ledger_writer,
    validate_stream,
    windowed_violation_rates,
)

COLS = ["repo", "path", "commit", "lang", "content"]


@pytest.fixture(scope="module")
def src_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_src")
    source_code_table(spark, 4000, partitions=4).write.parquet(str(d / "files"))
    return str(d / "files")


def test_stream_matches_batch(spark, src_dir, tmp_path):
    v = SparkValidator(FLAGSHIP_SCHEMA, dialect="draft7")
    batch = spark.read.parquet(src_dir)
    expected_invalid = (
        v.apply_table(batch, columns=COLS, with_violations=False)
        .filter("not valid").count()
    )

    schema = batch.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src_dir)
    )
    validated = validate_stream(stream, v, columns=COLS)
    out = str(tmp_path / "out")
    q = (
        validated.select("row_id", "valid")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 4000
    assert got.filter("not valid").count() == expected_invalid


def test_stream_ledger_foreachbatch(spark, src_dir, tmp_path):
    v = SparkValidator(FLAGSHIP_SCHEMA, dialect="draft7")
    schema = spark.read.parquet(src_dir).schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src_dir)
    )
    validated = validate_stream(stream, v, columns=COLS)
    ledger_path = str(tmp_path / "ledger")
    q = (
        validated.writeStream
        .foreachBatch(stream_ledger_writer(ledger_path))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ledger = spark.read.parquet(ledger_path)
    rows = ledger.agg(F.sum("rows_scanned")).collect()[0][0]
    assert rows == 4000
    assert ledger.select("batch_id").distinct().count() >= 2  # several micro-batches
    assert ledger.filter(F.col("violations_sha256").isNull()).count() == 0


def test_windowed_violation_rates(spark, tmp_path):
    v = SparkValidator(
        {"type": "object", "properties": {"k": {"maximum": 5}}, "required": ["k"]},
        dialect="draft7",
    )
    rows = [(i, f'{{"k": {i % 10}}}', f"2026-01-01 00:{i % 3:02d}:00") for i in range(90)]
    df = spark.createDataFrame(rows, "row_id long, doc string, ts_s string").withColumn(
        "ts", F.col("ts_s").cast("timestamp")
    )
    src = str(tmp_path / "json_src")
    df.write.parquet(src)
    stream = spark.readStream.schema(spark.read.parquet(src).schema).parquet(src)
    validated = validate_stream(stream, v, doc_col="doc")
    rates = windowed_violation_rates(validated, "ts", window="1 minute")
    # complete-mode memory sink: append mode would withhold windows the
    # watermark hasn't passed when the finite stream ends
    q = (
        rates.writeStream.format("memory")
        .queryName("rates_t")
        .outputMode("complete")
        .option("checkpointLocation", str(tmp_path / "ckpt2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r["window_start"].minute: r for r in spark.sql("select * from rates_t").collect()}
    # k in 0..9, 4 invalid of 10 (k>5); uniform across 3 windows of 30 rows
    assert set(got) == {0, 1, 2}
    for m in got:
        assert got[m]["rows"] == 30
        assert got[m]["violation_rows"] == 12
        assert abs(got[m]["violation_rate"] - 0.4) < 1e-9


def test_stream_dedup_drops_duplicates(spark, tmp_path):
    from json_schema_spark.streaming.validate import stream_dedup

    d = tmp_path / "dup_src"
    rows = [(i % 50, f"2026-01-01 00:00:{i % 60:02d}") for i in range(200)]
    (spark.createDataFrame(rows, "k long, ts string")
     .withColumn("ts", F.col("ts").cast("timestamp"))
     .repartition(4).write.parquet(str(d)))
    schema = spark.read.parquet(str(d)).schema
    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(str(d))
    deduped = stream_dedup(stream, ["k"], "ts", watermark="1 hour")
    out = str(tmp_path / "dedup_out")
    q = (deduped.writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", str(tmp_path / "ck2"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.read.parquet(out)
    assert got.count() == 50                      # one survivor per key
    assert got.select("k").distinct().count() == 50


def test_running_violation_totals_stateful(spark, src_dir, tmp_path):
    from json_schema_spark.streaming.validate import running_violation_totals

    v = SparkValidator(FLAGSHIP_SCHEMA, dialect="draft7")
    batch = spark.read.parquet(src_dir)
    expected = {
        r["lang"]: (r["rows"], r["viols"])
        for r in (
            v.apply_table(batch, columns=COLS, with_violations=False)
            .groupBy("lang")
            .agg(F.count(F.lit(1)).alias("rows"),
                 F.sum((~F.col("valid")).cast("long")).alias("viols"))
            .collect()
        )
    }

    schema = batch.schema
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 2).parquet(src_dir)
    )
    validated = validate_stream(stream, v, columns=COLS, with_violations=False)
    totals = running_violation_totals(validated, "lang")
    q = (totals.writeStream.format("memory").queryName("run_totals")
         .outputMode("update")
         .option("checkpointLocation", str(tmp_path / "ck3"))
         .trigger(availableNow=True).start())
    q.awaitTermination(180)
    # memory sink in update mode appends every per-batch update; the
    # final running total per key is the max (totals only grow)
    got = {}
    for r in spark.sql("SELECT lang, max(rows) AS rows, max(violation_rows) AS v "
                       "FROM run_totals GROUP BY lang").collect():
        got[r["lang"]] = (r["rows"], r["v"])
    assert got == expected
