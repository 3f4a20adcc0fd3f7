"""End-to-end test of the spark-submit entry point
(``scripts/submit_validate.py``): path mode and catalog-table mode
(the Iceberg deployment shape) must produce identical artifacts."""

from __future__ import annotations

import importlib.util
import json
import os
import sys

import pytest

from json_schema_spark.sources.synth import source_code_table

_SCRIPT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                       "scripts", "submit_validate.py")


def _run_main(argv: list[str]) -> None:
    spec = importlib.util.spec_from_file_location("submit_validate", _SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    old = sys.argv
    sys.argv = ["submit_validate.py"] + argv
    try:
        mod.main()
    finally:
        sys.argv = old


@pytest.fixture(scope="module")
def src_path(spark, tmp_path_factory):
    p = str(tmp_path_factory.mktemp("submit") / "src")
    source_code_table(spark, 1500, partitions=4).write.parquet(p)
    return p


def test_submit_path_and_table_modes_agree(spark, src_path, tmp_path):
    """--input <parquet> and --table <catalog name> run the identical
    job: same row count, same violation count, same xor64 digest, and
    the verdict/violations/ledger parquet artifacts all land."""
    out1, out2 = str(tmp_path / "o1"), str(tmp_path / "o2")
    _run_main(["--input", src_path, "--output", out1])
    spark.read.parquet(src_path).write.mode("overwrite").saveAsTable("submit_src_tbl")
    try:
        _run_main(["--table", "submit_src_tbl", "--output", out2])
    finally:
        spark.sql("DROP TABLE IF EXISTS submit_src_tbl")
    s1 = json.load(open(os.path.join(out1, "summary.json")))
    s2 = json.load(open(os.path.join(out2, "summary.json")))
    assert s1["rows"] == s2["rows"] == 1500
    assert s1["violation_count"] == s2["violation_count"]
    assert s1["violations_xor64"] == s2["violations_xor64"]
    for d in ("verdicts", "violations", "ledger"):
        assert spark.read.parquet(os.path.join(out1, d)).count() >= 0
    v = spark.read.parquet(os.path.join(out1, "verdicts"))
    assert set(v.columns) == {"row_id", "valid", "violations", "content_sha256"}


def test_submit_resumable_mode(spark, src_path, tmp_path):
    """--resumable writes the bucket manifest and reproduces the same
    verdict rows as a fresh full run."""
    out = str(tmp_path / "res")
    _run_main(["--input", src_path, "--output", out, "--resumable",
               "--buckets", "8"])
    s = json.load(open(os.path.join(out, "summary.json")))
    assert s["mode"] == "resumable" and s["rows"] == 1500
    assert s["buckets_processed"] == 8
