"""Connected components (alternating large-star / small-star) and the
keep-canonical transitive dedup built on it.

The driver-contract oracle (``neardup_clusters_documents``) gates the
distributed rounds against DuckDB's exact recursive transitive closure
on real pair data; these tests pin the algorithmic properties that the
oracle data doesn't exercise: long chains (logarithmic round count),
merged components, determinism of labels."""

import pytest
from pyspark.sql import functions as F

from json_schema_spark.operators.components import (
    connected_components,
    dedup_keep_canonical,
)


def _pairs(spark, edges):
    return spark.createDataFrame(edges, "id_a long, id_b long")


def _labels(df):
    return {(r.id, r.component) for r in df.collect()}


def test_basic_components(spark):
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11),
                           (20, 21), (21, 22), (20, 22)])
    got = _labels(connected_components(pairs))
    assert got == {(1, 1), (2, 1), (3, 1), (4, 1),
                   (10, 10), (11, 10),
                   (20, 20), (21, 20), (22, 20)}


def test_long_chain_converges_in_logarithmic_rounds(spark):
    # diameter-40 path: naive min-label propagation would need ~40
    # rounds; the star rounds must finish well under the cap
    chain = _pairs(spark, [(i, i + 1) for i in range(100, 140)])
    got = _labels(connected_components(chain, max_rounds=12))
    assert {c for _, c in got} == {100}
    assert {i for i, _ in got} == set(range(100, 140 + 1))


def test_components_merge_through_shared_node(spark):
    # two stars meeting at one hub must fuse into one component
    pairs = _pairs(spark, [(5, 50), (5, 51), (6, 50), (6, 60), (7, 60)])
    got = _labels(connected_components(pairs))
    assert {c for _, c in got} == {5}
    assert len(got) == 6


def test_duplicate_and_reversed_pairs_are_harmless(spark):
    pairs = _pairs(spark, [(1, 2), (2, 1), (1, 2), (2, 3)])
    assert _labels(connected_components(pairs)) == {(1, 1), (2, 1), (3, 1)}


def test_empty_pairs(spark):
    assert _labels(connected_components(_pairs(spark, []))) == set()


def test_dedup_keep_canonical(spark):
    docs = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long")
    pairs = _pairs(spark, [(1, 2), (2, 3), (3, 4), (10, 11)])
    kept = sorted(r.doc_id for r in
                  dedup_keep_canonical(docs, pairs).collect())
    # one per cluster (the min id) + the isolated doc
    assert kept == [1, 10, 99]


def test_labels_are_deterministic_across_partitionings(spark):
    edges = [(i, i + 1) for i in range(0, 30, 2)] + [(4, 5), (9, 27)]
    a = _labels(connected_components(_pairs(spark, edges)))
    b = _labels(connected_components(
        _pairs(spark, list(reversed(edges))).repartition(7)))
    assert a == b
