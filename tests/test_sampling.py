"""Deterministic sampling / splitting — stability properties the
driver oracle (sample_split_documents) can't see directly."""

import pytest

from json_schema_spark.operators.sampling import (
    deterministic_sample,
    stratified_sample,
    train_valid_test_split,
)


@pytest.fixture()
def docs(spark):
    rows = [(i, ["en", "de", "zh"][i % 3]) for i in range(300)]
    return spark.createDataFrame(rows, "doc_id long, lang string")


def test_sample_is_deterministic_and_partition_independent(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.3, seed=5).collect()}
    b = {r.doc_id for r in
         deterministic_sample(docs.repartition(13), 0.3, seed=5).collect()}
    assert a == b
    assert 0.15 < len(a) / 300 < 0.45  # loose: uniform-ish


def test_different_seeds_differ(docs):
    a = {r.doc_id for r in deterministic_sample(docs, 0.5, seed=1).collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 0.5, seed=2).collect()}
    assert a != b


def test_fraction_monotone(docs):
    # the kept set grows monotonically with fraction (nested samples)
    small = {r.doc_id for r in deterministic_sample(docs, 0.2, seed=3).collect()}
    big = {r.doc_id for r in deterministic_sample(docs, 0.6, seed=3).collect()}
    assert small <= big


def test_stratified_fractions(docs):
    kept = stratified_sample(docs, "lang", {"en": 1.0, "de": 0.5},
                             default_fraction=0.0, seed=7).collect()
    by_lang = {}
    for r in kept:
        by_lang.setdefault(r.lang, 0)
        by_lang[r.lang] += 1
    assert by_lang.get("en") == 100      # keep-all stratum is exact
    assert "zh" not in by_lang           # default 0.0 drops the stratum
    assert 20 < by_lang.get("de", 0) < 80


def test_split_disjoint_exhaustive_and_stable_under_append(spark):
    base = spark.createDataFrame([(i,) for i in range(200)], "doc_id long")
    more = spark.createDataFrame([(i,) for i in range(250)], "doc_id long")
    a = {r.doc_id: r.split for r in train_valid_test_split(base, seed=9).collect()}
    b = {r.doc_id: r.split for r in train_valid_test_split(more, seed=9).collect()}
    assert len(a) == 200 and len(b) == 250
    # appending rows never moves an existing row's assignment
    assert all(b[i] == a[i] for i in a)
    assert set(b.values()) == {"train", "valid", "test"}


def test_invalid_args(docs):
    with pytest.raises(ValueError):
        deterministic_sample(docs, 1.5)
    with pytest.raises(ValueError):
        train_valid_test_split(docs, (0.5,), ("a", "b"))


def test_plan_no_shuffle_no_python(docs):
    plan = (train_valid_test_split(deterministic_sample(docs, 0.5))
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "Python" not in plan and "ArrowEval" not in plan
