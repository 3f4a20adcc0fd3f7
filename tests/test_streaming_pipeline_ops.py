"""The round-3 pipeline operators composed into Structured Streaming:
PII scrubbing, chunking and deterministic splitting are stateless
codegen projections, so they drop into a readStream -> writeStream
pipeline unchanged — this pins that property (no accidental
batch-only API like collect/localCheckpoint in the hot path) and that
micro-batch results equal the batch results row-for-row.
"""

from __future__ import annotations

import pytest

from json_schema_spark.operators.chunking import chunk_documents
from json_schema_spark.operators.pii import detect_pii, redact_pii
from json_schema_spark.operators.sampling import train_valid_test_split


@pytest.fixture(scope="module")
def doc_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream_docs")
    rows = [
        (i, f"doc {i} mail user{i}@example.com body " + ("x" * (i % 40)))
        for i in range(200)
    ]
    spark.createDataFrame(rows, "doc_id long, text string") \
        .repartition(4).write.parquet(str(d / "docs"))
    return str(d / "docs")


def _run_stream(spark, doc_dir, transform, tmp_path, name):
    batch_df = transform(spark.read.parquet(doc_dir))
    schema = spark.read.parquet(doc_dir).schema
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", 1).parquet(doc_dir))
    out = transform(stream)
    q = (out.writeStream.format("memory").queryName(name)
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.sql(f"select * from {name}")
    return batch_df, got


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_pii_scrub_streams(spark, doc_dir, tmp_path):
    def scrub(df):
        return redact_pii(detect_pii(df)).select(
            "doc_id", "pii_email", "pii_total", "redacted")

    batch, streamed = _run_stream(spark, doc_dir, scrub, tmp_path, "pii_s")
    assert _rows(batch) == _rows(streamed)
    assert all(r.pii_email == 1 for r in streamed.collect())


def test_chunking_streams(spark, doc_dir, tmp_path):
    def chunk(df):
        return chunk_documents(df, size=24, stride=16)

    batch, streamed = _run_stream(spark, doc_dir, chunk, tmp_path, "chunk_s")
    assert _rows(batch) == _rows(streamed)
    assert streamed.count() > 200  # long docs produced multiple windows


def test_split_streams(spark, doc_dir, tmp_path):
    def split(df):
        return train_valid_test_split(df, (0.8, 0.1, 0.1), seed=3) \
            .select("doc_id", "split")

    batch, streamed = _run_stream(spark, doc_dir, split, tmp_path, "split_s")
    # a row's split assignment is a pure function of (id, seed): the
    # micro-batch boundary cannot move it
    assert _rows(batch) == _rows(streamed)


def test_repetition_signals_stream(spark, doc_dir, tmp_path):
    from json_schema_spark.operators.repetition import repetition_features

    def feats(df):
        return repetition_features(df).select(
            "doc_id", "dup_line_frac", "top_2gram_char_frac",
            "dup_5gram_char_frac")

    batch, streamed = _run_stream(spark, doc_dir, feats, tmp_path, "rep_s")
    assert _rows(batch) == _rows(streamed)


def test_contamination_flags_stream(spark, doc_dir, tmp_path):
    """The literal-intersect decontamination variant streams; its
    verdicts equal the batch join form row-for-row."""
    from json_schema_spark.operators.decontaminate import (
        benchmark_ngrams, contamination_flags, decontaminate)

    docs = spark.read.parquet(doc_dir)
    bench = docs.where("doc_id % 19 = 0")
    grams = [r.gram for r in benchmark_ngrams(bench, n=4).collect()]

    def flags(df):
        return contamination_flags(df, grams, n=4).select(
            "doc_id", "contaminated", "n_contaminated_grams")

    batch, streamed = _run_stream(spark, doc_dir, flags, tmp_path, "dc_s")
    assert _rows(batch) == _rows(streamed)
    join_form = decontaminate(docs, bench, n=4).select(
        "doc_id", "contaminated", "n_contaminated_grams")
    assert _rows(join_form) == _rows(streamed)
    assert any(r.contaminated for r in streamed.collect())
