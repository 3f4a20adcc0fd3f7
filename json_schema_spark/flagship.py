"""Flagship workload: draft-07 validation of the source-code table.

The representative schema from FIXTURES.md §1 applied row-wise over
``(repo, path, commit, lang, content)`` via the typed-row Column plan —
whole-stage-codegen'd boolean expressions, zero Python on executors.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .plans.runner import SparkValidator

__all__ = ["FLAGSHIP_SCHEMA", "flagship_validator", "validate_source_table"]

FLAGSHIP_SCHEMA = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "required": ["repo", "path", "commit", "lang", "content"],
    "properties": {
        "repo": {"type": "string", "pattern": "^[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+$"},
        "path": {"type": "string", "minLength": 1, "maxLength": 512},
        "commit": {"type": "string", "pattern": "^[0-9a-f]{40}$"},
        "lang": {"enum": ["python", "java", "scala", "sql", "markdown", "json", "yaml", "other"]},
        "content": {"type": "string"},
    },
}


def flagship_validator() -> SparkValidator:
    return SparkValidator(FLAGSHIP_SCHEMA, dialect="draft7")


def validate_source_table(df: DataFrame, with_violations: bool = True,
                          with_sha: bool = True,
                          salt_partitions: int | None = None,
                          salt_buckets: int = 32) -> DataFrame:
    """Adds ``valid``, ``violations`` and the cross-engine per-row
    invariant ``content_sha256`` (input_hint: sha256(content) equality
    vs the reference).

    ``salt_partitions``: opt-in skew-mitigated repartition
    ``repartition(N, repo, salt)`` (SURVEY §4.2) for the cluster layout
    where downstream per-repo work (ledger, checkpoint buckets,
    repo-level aggregates) follows validation: a Zipf-shaped repo
    distribution pins a mega-repo onto one executor under a plain
    ``repartition(N, repo)``; the salt — a deterministic hash of the
    full row key, NOT a random number, so re-runs place rows
    identically — splits each repo across up to ``salt_buckets``
    partitions while keeping (repo, salt) co-location for two-phase
    per-repo combines (measured on the Zipf synthetic at 16 partitions:
    max/mean rows 3.57 plain vs 1.35 salted at 32 buckets —
    tests/test_scale_layout.py). Validation itself is row-local, so the default
    (None) stays the zero-Exchange pure-projection plan."""
    cols = ["repo", "path", "commit", "lang", "content"]
    if salt_partitions is not None:
        salt = F.pmod(
            F.xxhash64(F.col("repo"), F.col("path"), F.col("commit")),
            F.lit(salt_buckets),
        )
        df = df.repartition(salt_partitions, F.col("repo"), salt)
    out = flagship_validator().apply_table(df, columns=cols, with_violations=with_violations)
    if with_sha:
        out = out.withColumn("content_sha256", F.sha2(F.col("content"), 256))
    return out
