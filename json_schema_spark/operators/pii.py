"""PII detection and redaction over document text — a training-data
scrubbing operator (north_star pipeline extension; the reference has
no table operators).

Everything is pure JVM-side ``regexp_replace`` / ``regexp_count``
Column expressions: zero Python in the hot path, whole-stage codegen,
and the scan stays narrow (one string column in, one out). At 100 TB
the op is embarrassingly parallel — no shuffle at all.

Pattern dialect: the expressions run on java.util.regex (Spark) AND
must be replayable on RE2 (DuckDB oracle), so every pattern sticks to
the common subset — no lookarounds, no backrefs, ``[0-9]`` instead of
``\\d`` (Java compiles with UNICODE_CHARACTER_CLASS where ``\\d``
matches Arabic-Indic digits; RE2's is ASCII — the explicit class
pins both engines to the same set). Boundaries are expressed inside
the match (e.g. the email local part can't start mid-token because the
token chars are all consumed greedily left-to-right) rather than with
``\\b``, whose word-character set differs between the engines.

Redaction is deliberately regex-aggressive (no Luhn check on card
candidates): for training-data scrubbing a false redaction costs a few
tokens, a false keep leaks a real number. Detection counts use the
same patterns, so detect/redact are always consistent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["PII_PATTERNS", "redact_pii", "detect_pii"]

# Ordered: earlier patterns are redacted first, so e.g. the digits of a
# card number are gone before the phone pattern could half-match them.
PII_PATTERNS: dict[str, str] = {
    # local@domain.tld — ASCII mailbox shape (RFC-lite on purpose)
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9-]*[A-Za-z0-9])?)*\.[A-Za-z]{2,}",
    # 13-19 digit runs with optional single space/dash separators
    "credit_card": r"[0-9](?:[ -]?[0-9]){12,18}",
    # US SSN xxx-xx-xxxx
    "ssn": r"[0-9]{3}-[0-9]{2}-[0-9]{4}",
    # E.164-ish international numbers: +CC then 8-14 digits/separators
    "phone": r"\+[1-9][0-9]{0,2}[ -]?[0-9](?:[ -]?[0-9]){6,12}",
    # dotted quad, each octet 0-255
    "ipv4": r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])(?:\.(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])){3}",
}


def redact_pii(df: DataFrame, text_col: str = "text",
               out_col: str = "redacted") -> DataFrame:
    """Replace every PII match with ``[PII:<kind>]``, all kinds chained
    in :data:`PII_PATTERNS` order inside one codegen'd projection."""
    col = F.coalesce(F.col(text_col), F.lit(""))
    for kind, pat in PII_PATTERNS.items():
        col = F.regexp_replace(col, F.lit(pat), F.lit(f"[PII:{kind}]"))
    return df.withColumn(out_col, col)


def detect_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document match counts per kind plus a total, same patterns
    as :func:`redact_pii`. Counting respects the same order-sensitivity
    (a card number also containing a phone-shaped substring is counted
    once, as a card): each kind counts on the text with all EARLIER
    kinds already redacted."""
    out = df
    col = F.coalesce(F.col(text_col), F.lit(""))
    kinds = []
    for kind, pat in PII_PATTERNS.items():
        cname = f"pii_{kind}"
        out = out.withColumn(cname, F.regexp_count(col, F.lit(pat)))
        col = F.regexp_replace(col, F.lit(pat), F.lit(f"[PII:{kind}]"))
        kinds.append(cname)
    total = None
    for c in kinds:
        total = F.col(c) if total is None else total + F.col(c)
    return out.withColumn("pii_total", total.cast("long"))
