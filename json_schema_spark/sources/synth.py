"""Deterministic synthetic source-code-repository table (FIXTURES.md §1).

One row per file: ``(row_id, repo, path, commit, lang, content)`` —
the input shape from BASELINE.json's ``input_hint``. Generation is
**pure Column expressions over ``spark.range(n)``**: no driver-side
data, no Python on executors, deterministic for a given (rows, seed)
at any scale — the local stand-in for the 10^12-file Iceberg table.

Planted violations (known answers, scale-free modulo rules):

* ``row_id % 997 == 0``   → ``repo`` NULL              (required)
* ``row_id % 1009 == 0``  → ``content`` NULL           (required)
* ``row_id % 499 == 0``   → ``commit`` fails hex40     (pattern)
* ``row_id % 503 == 0``   → ``lang = 'golang'``        (enum)
* ``row_id % 991 == 0``   → ``path`` longer than 512   (maxLength)
* ``row_id % 1013 == 0``  → key columns copied from row_id-1 (uniqueness)
* repo ids 13 and 77 are absent from the ``repos`` dimension (orphans)
* ``drift=True``          → content of ``row_id % 101 == 55`` tripled
  (shifts the length distribution for KS/PSI checks)

Repo popularity is Zipf-like (log-uniform inverse CDF) so a few
mega-repos hold most rows — exercises salting / AQE skew handling.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

__all__ = ["source_code_table", "write_source_table", "repos_dim",
           "LANGS", "N_REPOS", "N_ORGS", "ORPHAN_REPO_IDS"]

LANGS = ["python", "java", "scala", "sql", "markdown", "json", "yaml", "other"]
_EXT = {"python": "py", "java": "java", "scala": "scala", "sql": "sql",
        "markdown": "md", "json": "json", "yaml": "yaml", "other": "txt"}
N_REPOS = 101
N_ORGS = 7
ORPHAN_REPO_IDS = (13, 77)

_WORDS = (
    "def class import return yield lambda async await select insert update "
    "delete join group order limit where schema table column index commit "
    "branch merge diff patch build test assert mock fixture spark partition "
    "shuffle broadcast executor driver stage task row batch stream window "
    "agg filter map reduce cache persist checkpoint lineage parquet iceberg "
    "json yaml token parse compile validate constraint keyword pointer ref"
).split()


def _u(seed: int, salt: int, *cols: Column) -> Column:
    """Deterministic uniform [0,1) from xxhash64 (JVM-side, seed-stable)."""
    h = F.xxhash64(F.lit(seed), F.lit(salt), *cols)
    return (F.pmod(h, F.lit(1_000_000_007)).cast("double")) / 1_000_000_007.0


def _word(seed: int, salt: int, *cols: Column) -> Column:
    idx = F.pmod(F.xxhash64(F.lit(seed), F.lit(salt), *cols), F.lit(len(_WORDS))).cast("int")
    return F.element_at(F.array(*[F.lit(w) for w in _WORDS]), idx + 1)


def source_code_table(
    spark: SparkSession,
    rows: int,
    seed: int = 42,
    plant: bool = True,
    drift: bool = False,
    partitions: int | None = None,
) -> DataFrame:
    df = spark.range(0, rows, 1, partitions or max(8, spark.sparkContext.defaultParallelism))
    rid = F.col("id")

    # uniqueness plant: key columns derive from key_id (== id-1 for dup rows)
    key_id = (
        F.when((rid % 1013 == 0) & (rid > 0), rid - 1).otherwise(rid)
        if plant
        else rid
    )

    # Zipf-like repo popularity: log-uniform over [0, N_REPOS)
    u_repo = _u(seed, 1, key_id)
    repo_id = (
        F.least(F.floor(F.exp(u_repo * math.log(N_REPOS))), F.lit(N_REPOS)) - 1
    ).cast("int")
    org_id = F.pmod(repo_id, F.lit(N_ORGS))
    repo = F.concat(F.lit("org"), org_id.cast("string"), F.lit("/repo"), repo_id.cast("string"))

    lang_idx = F.pmod(F.xxhash64(F.lit(seed), F.lit(2), rid), F.lit(len(LANGS))).cast("int")
    lang = F.element_at(F.array(*[F.lit(l) for l in LANGS]), lang_idx + 1)
    # path/commit must be fully key_id-determined so planted duplicate
    # rows really collide on (repo, path, commit)
    ext_idx = F.pmod(F.xxhash64(F.lit(seed), F.lit(2), key_id), F.lit(len(LANGS))).cast("int")
    ext = F.element_at(F.array(*[F.lit(_EXT[l]) for l in LANGS]), ext_idx + 1)

    depth = (F.pmod(F.xxhash64(F.lit(seed), F.lit(3), key_id), F.lit(5)) + 1).cast("int")
    path = F.concat(
        F.concat_ws(
            "/",
            F.transform(
                F.sequence(F.lit(1), depth),
                lambda i: _word(seed, 4, key_id, i),
            ),
        ),
        F.lit("/"), _word(seed, 5, key_id), F.lit("."), ext,
    )

    commit = F.substring(
        F.sha2(F.concat_ws("|", repo, path, key_id.cast("string")), 256), 1, 40
    )

    # content: ~30% of rows are valid JSON documents, rest pseudo-source
    n_tok = (F.pmod(F.xxhash64(F.lit(seed), F.lit(6), rid), F.lit(120)) + 16).cast("int")
    prose = F.concat_ws(
        " ",
        F.transform(F.sequence(F.lit(1), n_tok), lambda i: _word(seed, 7, rid, i)),
    )
    json_doc = F.to_json(
        F.struct(
            repo.alias("repo"),
            path.alias("path"),
            commit.alias("commit"),
            lang.alias("lang"),
            n_tok.alias("tokens"),
            F.array(_word(seed, 8, rid), _word(seed, 9, rid)).alias("tags"),
        )
    )
    is_json_row = _u(seed, 10, rid) < 0.30
    content = F.when(is_json_row, json_doc).otherwise(prose)
    if drift:
        content = F.when(
            rid % 101 == 55, F.concat(content, F.lit(" "), content, F.lit(" "), content)
        ).otherwise(content)

    if plant:
        repo = F.when(rid % 997 == 0, F.lit(None).cast("string")).otherwise(repo)
        content = F.when(rid % 1009 == 0, F.lit(None).cast("string")).otherwise(content)
        commit = F.when(rid % 499 == 0, F.concat(F.lit("not-a-sha-"), rid.cast("string"))).otherwise(commit)
        lang = F.when(rid % 503 == 0, F.lit("golang")).otherwise(lang)
        path = F.when(rid % 991 == 0, F.concat(path, F.lit("/"), F.repeat(F.lit("x"), 520))).otherwise(path)

    return df.select(
        rid.alias("row_id"),
        repo.alias("repo"),
        path.alias("path"),
        commit.alias("commit"),
        lang.alias("lang"),
        content.alias("content"),
    )


def write_source_table(
    spark: SparkSession,
    path: str,
    rows: int,
    seed: int = 42,
    plant: bool = True,
    drift: bool = False,
    partition_by: tuple[str, ...] = ("lang",),
) -> DataFrame:
    """Materialize the synthetic source table with the PRODUCTION
    LAYOUT the north rule assumes: hive/Iceberg-style partitioning on
    the low-cardinality filter column (``lang``), so a lang-filtered
    validation prunes whole partition directories at the scan
    (``PartitionFilters`` in the plan, untouched files never opened).
    At the 10^12-file target this layout is the difference between
    scanning 100 TB and scanning one language's slice; the Iceberg
    catalog adds snapshot/manifest metadata on top of exactly this
    partition shape (the Iceberg runtime jar is absent in this
    container, so hive-partitioned parquet stands in — same pruning
    semantics, same directory layout). Returns the reader DataFrame."""
    source_code_table(spark, rows, seed=seed, plant=plant, drift=drift) \
        .write.partitionBy(*partition_by).mode("overwrite").parquet(path)
    return spark.read.parquet(path)


def repos_dim(spark: SparkSession, include_orphans: bool = False) -> DataFrame:
    """`repos(repo, owner)` dimension; repo ids in ORPHAN_REPO_IDS are
    deliberately absent so fact rows referencing them are RI orphans."""
    df = spark.range(0, N_REPOS).select(
        F.concat(
            F.lit("org"), F.pmod(F.col("id"), F.lit(N_ORGS)).cast("string"),
            F.lit("/repo"), F.col("id").cast("string"),
        ).alias("repo"),
        F.concat(F.lit("owner_"), F.pmod(F.col("id"), F.lit(13)).cast("string")).alias("owner"),
    )
    if not include_orphans:
        orphans = [f"org{r % N_ORGS}/repo{r}" for r in ORPHAN_REPO_IDS]
        df = df.filter(~F.col("repo").isin(orphans))
    return df
