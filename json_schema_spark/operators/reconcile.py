"""Snapshot reconciliation: row-level diff between two versions of a
table (the dataset-versioning check a 100 TB validation pipeline runs
after every rewrite/backfill/migration — "did this job change exactly
the rows it claimed to?").

The reference engine validates one document tree at a time; cross-
snapshot reconciliation is part of the table-level layer this repo adds
on top (SURVEY.md §2.9), alongside uniqueness / referential /
drift checks.

Scale shape: each side is reduced to a slim ``(keys…, digest)``
projection before the join, so the full-outer join's shuffle carries a
few bytes per row regardless of table width; with both snapshots
bucketed/partitioned by the key (the Iceberg layout the north rule
assumes) the join is co-located and shuffle-free. Nothing collects to
the driver; summary mode is a partial-aggregable groupBy on top.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["snapshot_diff"]

# canonical-encoding separators for the digest string: US (unit
# separator) between fields, NUL as the null sentinel — bytes that do
# not appear in sane text columns (see the aliasing note in the
# docstring)
_SEP = "\x1f"
_NULL = "\x00"


def _digest_col(cols: Sequence[str], method: str) -> F.Column:
    canon = F.concat_ws(
        _SEP, *[F.coalesce(F.col(c).cast("string"), F.lit(_NULL)) for c in cols]
    )
    if method == "xxhash64":
        return F.xxhash64(canon)
    if method == "sha256":
        return F.sha2(canon, 256)
    raise ValueError(f"unknown digest method {method!r}")


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Optional[Sequence[str]] = None,
    mode: str = "rows",
    digest: Optional[str] = "xxhash64",
    include_unchanged: bool = False,
) -> DataFrame:
    """Classify every key of two snapshots as ``added`` / ``removed`` /
    ``changed`` / ``unchanged``.

    ``keys`` must identify a row uniquely within each snapshot (this is
    a *snapshot* diff — run :func:`~json_schema_spark.operators.checks.
    uniqueness_report` first if that is in doubt; duplicate keys
    full-outer-join m×n and inflate every class). Key columns join
    NULL-safely (``<=>`` / ``IS NOT DISTINCT FROM``): a NULL-keyed row
    present in both snapshots compares like any other row rather than
    degenerating into one ``removed`` + one ``added``.

    ``compare_cols`` defaults to every non-key column present in BOTH
    frames. Change detection:

    * ``digest='xxhash64'`` (default, the 100 TB path): each side is
      projected to ``(keys…, xxhash64(canonical-encoding))`` — 8 bytes
      of payload per row through the join regardless of table width.
    * ``digest='sha256'``: same slim shape with a hash DuckDB can
      replicate bit-for-bit (ANSI-SQL oracle pairing).
    * ``digest=None``: exact mode — the compared columns ride the join
      as one struct and are compared NULL-safely, no canonicalization
      involved. Wider shuffle, zero aliasing risk.

    The canonical encoding used by both hash digests is
    ``concat_ws(US, coalesce(cast(col AS string), NUL))``: values
    containing the US/NUL bytes themselves (or a hash collision —
    ~2^-64 per pair for xxhash64) can alias two genuinely different
    rows into ``unchanged``; ``digest=None`` is immune.

    ``mode='rows'`` returns ``(keys…, status)`` for every non-unchanged
    key (``include_unchanged=True`` keeps all four classes);
    ``mode='summary'`` returns ``(status, rows)`` counts over all keys.

    Not streaming-composable (a full-outer join needs both complete
    snapshots); reconcile materialized snapshots instead.
    """
    keys = list(keys)
    for side, df in (("old", old), ("new", new)):
        missing = [k for k in keys if k not in df.columns]
        if missing:
            raise ValueError(f"key column(s) {missing} absent from {side}")
    if compare_cols is None:
        new_cols = set(new.columns)
        compare_cols = [c for c in old.columns
                        if c in new_cols and c not in keys]
    compare_cols = list(compare_cols)
    if digest is None:
        payload = F.struct(*[F.col(c) for c in compare_cols]) \
            if compare_cols else F.lit(0)
    else:
        payload = _digest_col(compare_cols, digest) if compare_cols else F.lit(0)

    o = old.select(*keys, payload.alias("__p"), F.lit(True).alias("__in")) \
        .alias("o")
    n = new.select(*keys, payload.alias("__p"), F.lit(True).alias("__in")) \
        .alias("n")
    cond = reduce(
        lambda a, b: a & b,
        [F.col(f"o.{k}").eqNullSafe(F.col(f"n.{k}")) for k in keys],
    )
    j = o.join(n, cond, "full_outer")
    status = (
        F.when(F.col("n.__in").isNull(), F.lit("removed"))
        .when(F.col("o.__in").isNull(), F.lit("added"))
        .when(F.col("o.__p").eqNullSafe(F.col("n.__p")), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    out = j.select(
        *[F.coalesce(F.col(f"o.{k}"), F.col(f"n.{k}")).alias(k) for k in keys],
        status.alias("status"),
    )
    if mode == "summary":
        return out.groupBy("status").agg(F.count(F.lit(1)).alias("rows"))
    if mode != "rows":
        raise ValueError(f"unknown mode {mode!r}")
    if not include_unchanged:
        out = out.filter(F.col("status") != "unchanged")
    return out
