"""Deterministic sampling and train/valid/test splitting for
training-data pipelines (north_star extension; the reference has no
table operators).

``DataFrame.sample`` is non-deterministic across retries, partition
layouts and Spark versions — useless for reproducible corpus builds.
These operators key every decision on a sha256 of the row's stable id
(plus a seed), so a row's fate is a pure function of (id, seed):
re-runs, re-partitions, incremental appends and disjoint clusters all
agree, and the DuckDB oracle can replay the exact row set. Everything
is a codegen'd projection + filter — no shuffle, no Python, and the
filter is pushdown-adjacent (evaluated straight off the scan).

The unit interval position of a row is the first 8 sha256 hex digits
of ``<id>:<seed>`` scaled by 16^-8 — uniform enough for sampling, and
bit-identical in any engine with sha256 and string concat.
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["hash_position", "deterministic_sample", "stratified_sample",
           "train_valid_test_split"]

_SCALE = float(16 ** 8)


def hash_position(key, seed: int = 0) -> F.Column:
    """Uniform [0, 1) position derived from sha256(key ':' seed)."""
    h = F.sha2(F.concat(key.cast("string"), F.lit(f":{seed}")), 256)
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(_SCALE))


def deterministic_sample(df: DataFrame, fraction: float,
                         key_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Keep ~``fraction`` of rows, decided per row by hash position."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    return df.where(hash_position(F.col(key_col), seed) < fraction)


def stratified_sample(df: DataFrame, strata_col: str,
                      fractions: Mapping[str, float],
                      default_fraction: float = 0.0,
                      key_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Per-stratum keep fractions (e.g. rebalance languages): rows in
    strata absent from ``fractions`` keep with ``default_fraction``."""
    thresh = F.lit(float(default_fraction))
    for value, frac in sorted(fractions.items()):
        if not 0.0 <= frac <= 1.0:
            raise ValueError(f"fraction for {value!r} must be in [0, 1]")
        thresh = F.when(F.col(strata_col) == value, F.lit(float(frac))) \
                  .otherwise(thresh)
    return df.where(hash_position(F.col(key_col), seed) < thresh)


def train_valid_test_split(df: DataFrame, weights: Sequence[float] = (0.8, 0.1, 0.1),
                           names: Sequence[str] = ("train", "valid", "test"),
                           key_col: str = "doc_id", seed: int = 0) -> DataFrame:
    """Adds a ``split`` column assigning each row to one bucket by hash
    range — disjoint, exhaustive, and stable under appends (a new row
    never moves an old row's assignment, unlike randomSplit)."""
    if len(weights) != len(names) or not weights:
        raise ValueError("weights and names must align and be non-empty")
    total = float(sum(weights))
    pos = hash_position(F.col(key_col), seed)
    col = None
    acc = 0.0
    for w, name in zip(weights, names):
        # round the boundary so e.g. 0.8 + 0.1 is exactly 0.9 — the
        # replayed oracle writes the short decimal literal, and an
        # accumulated 0.9000000000000001 would disagree on rows landing
        # in the 1-ulp gap
        acc = round(acc + float(w) / total, 12)
        cond = pos < acc
        col = F.when(cond, name) if col is None else col.when(cond, name)
    # float-edge safety: anything at/above the last boundary joins the
    # final bucket
    return df.withColumn("split", col.otherwise(names[-1]))
