"""snapshot_diff — the cross-snapshot reconciliation check
(operators/reconcile.py). Properties the driver oracle
(snapshot_diff_orders) can't see directly: per-class correctness on a
hand-built diff, NULL-safe key matching, NULL-value transitions, digest
modes agreeing with the exact struct compare, and the slim-projection
plan shape (column pruning through the digest)."""

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.reconcile import snapshot_diff


@pytest.fixture()
def snaps(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None), (4, "d", 40.0),
         (None, "nullkey", 5.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 10.0),          # unchanged
         (2, "B", 20.0),          # changed (string)
         (3, "c", 33.0),          # changed (NULL -> value)
         (None, "nullkey", 5.0),  # unchanged, NULL key
         (9, "new", 90.0)],       # added; key 4 removed
        "k long, s string, v double",
    )
    return old, new


EXPECT = {(2, "changed"), (3, "changed"), (4, "removed"), (9, "added")}


@pytest.mark.parametrize("digest", ["xxhash64", "sha256", None])
def test_classification_all_digest_modes(snaps, digest):
    old, new = snaps
    got = {(r.k, r.status)
           for r in snapshot_diff(old, new, ["k"], digest=digest).collect()}
    assert got == EXPECT  # NULL key row matched null-safely => not listed


@pytest.mark.parametrize("digest", ["xxhash64", None])
def test_include_unchanged_and_null_key_match(snaps, digest):
    old, new = snaps
    rows = snapshot_diff(old, new, ["k"], digest=digest,
                         include_unchanged=True).collect()
    by_k = {r.k: r.status for r in rows}
    assert by_k[None] == "unchanged"  # eqNullSafe, not added+removed
    assert by_k[1] == "unchanged"
    assert len(rows) == 6


def test_summary_counts(snaps):
    old, new = snaps
    got = {r.status: r.rows
           for r in snapshot_diff(old, new, ["k"], mode="summary").collect()}
    assert got == {"unchanged": 2, "changed": 2, "removed": 1, "added": 1}


def test_compare_cols_default_excludes_missing_and_keys(spark):
    old = spark.createDataFrame([(1, "x", "meta")], "k long, s string, extra string")
    new = spark.createDataFrame([(1, "x", 7)], "k long, s string, other int")
    # only 's' is shared and non-key: 'extra'/'other' must not count
    assert snapshot_diff(old, new, ["k"]).count() == 0


def test_key_validation(snaps):
    old, new = snaps
    with pytest.raises(ValueError, match="absent from old"):
        snapshot_diff(old.drop("k"), new, ["k"])
    with pytest.raises(ValueError, match="unknown mode"):
        snapshot_diff(old, new, ["k"], mode="both")


def test_digest_plan_prunes_uncompared_columns(spark, tmp_path):
    p_old, p_new = str(tmp_path / "old"), str(tmp_path / "new")
    df = spark.range(100).select(
        F.col("id").alias("k"), F.col("id").cast("string").alias("s"),
        (F.col("id") * 2.0).alias("v"),
        F.repeat(F.lit("x"), 50).alias("wide"),
    )
    df.write.parquet(p_old)
    df.filter("k % 7 != 0").write.parquet(p_new)
    out = snapshot_diff(spark.read.parquet(p_old), spark.read.parquet(p_new),
                        ["k"], compare_cols=["s", "v"])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
    # the slim digest projection must prune 'wide' out of both scans
    for line in plan.splitlines():
        if "ReadSchema" in line:
            assert "wide" not in line, line
    assert out.count() == 15  # 100/7 rounded up => removed rows only
