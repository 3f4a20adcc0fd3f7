"""Typed-row object keywords: expr path vs Python kernel differential.

Round-2 verdict reproduced silent wrong answers: `minProperties`,
`maxProperties`, `patternProperties`, `propertyNames` and
subschema-`additionalProperties` were silently DROPPED by the typed-row
compiler (root fields + struct columns) instead of compiling or failing
closed. This file pins the fix: every object keyword over the static
field set compiles to presence-gated expressions, map columns get the
runtime key-set forms, and anything inexpressible raises
ExprUnsupported (apply_table then falls back to the Arrow kernel over
``to_json`` — NULL fields dropped, matching the NULL = absent typed
convention).

The kernel is the semantic oracle: each typed row converts to a JSON
instance by dropping NULL object fields/map values (the documented
convention), then ``CompiledSchema.validate`` must agree with the
Column-expression verdict row for row.
"""

from __future__ import annotations

import pytest
from pyspark.sql import Row, functions as F

from json_schema_spark.plans.compiler import ExprUnsupported, ok_of
from json_schema_spark.plans.runner import SparkValidator

ROWS_DDL = ("rid int, a int, b string, c double, s struct<x:int,y:string>, "
            "m map<string,int>, arr array<int>")

ROWS = [
    (0, 1, "hello", 2.5, (1, "x"), {"k": 3}, [1, 2]),
    (1, 2, None, None, None, None, None),
    (2, None, "x", 1.0, (None, "y"), {"key2": 20}, [5]),
    (3, 4, "٣٤", 7.0, (7, None), {"k": None, "b": 2}, []),
    (4, None, None, None, None, None, None),
    (5, 5, "worldly", 3.0, (9, "z"), {"a": 1, "bb": 100}, [3]),
    (6, 2, "ab", 4.0, (2, "w"), {"k": 60, "zz": 5}, [7, 8, 9]),
]

COLUMNS = ["a", "b", "c", "s", "m", "arr"]

# every schema here must be expressible on the typed expr path
SCHEMAS = [
    {"minProperties": 3},
    {"minProperties": 1},
    {"maxProperties": 2},
    {"maxProperties": 5},
    {"minProperties": 2, "maxProperties": 4},
    {"patternProperties": {"^b": {"minLength": 5}}},
    {"patternProperties": {"a": {"type": "integer"}}},
    {"propertyNames": {"pattern": "^[a-c]$"}},
    {"propertyNames": {"maxLength": 1}},
    {"properties": {"a": True, "b": True}, "additionalProperties": False},
    {"properties": {"a": {}}, "patternProperties": {"^m$": True},
     "additionalProperties": {"type": ["integer", "string"]}},
    {"required": ["a"], "minProperties": 2, "maxProperties": 6},
    # struct column as nested object
    {"properties": {"s": {"minProperties": 2}}},
    {"properties": {"s": {"maxProperties": 1}}},
    {"properties": {"s": {"patternProperties": {"^x$": {"minimum": 5}}}}},
    {"properties": {"s": {"propertyNames": {"maxLength": 1}}}},
    {"properties": {"s": {"properties": {"x": {}}, "additionalProperties": False}}},
    # map column: dynamic key set
    {"properties": {"m": {"minProperties": 1}}},
    {"properties": {"m": {"maxProperties": 1}}},
    {"properties": {"m": {"propertyNames": {"maxLength": 2}}}},
    {"properties": {"m": {"patternProperties": {"^k": {"maximum": 50}}}}},
    {"properties": {"m": {"properties": {"k": {"minimum": 0}},
                          "additionalProperties": False}}},
    {"properties": {"m": {"additionalProperties": {"maximum": 10}}}},
    {"properties": {"m": {"patternProperties": {"^k": True},
                          "additionalProperties": {"maximum": 10}}}},
    # Unicode regex parity: \d must match Arabic-Indic digits on BOTH
    # engines (rlike gets (?U), Python re is Unicode by default)
    {"properties": {"b": {"pattern": "^\\d+$"}}},
    {"patternProperties": {"^b$": {"pattern": "^\\d+$"}}},
    # unevaluatedProperties over a typed map column (2020-12)
    {"$schema": "https://json-schema.org/draft/2020-12/schema",
     "properties": {"m": {"properties": {"k": True},
                          "unevaluatedProperties": {"maximum": 10}}}},
]


def _to_instance(obj):
    """Typed row -> JSON instance under the NULL = absent convention."""
    if isinstance(obj, Row):
        obj = obj.asDict()
    if isinstance(obj, dict):
        return {k: _to_instance(v) for k, v in obj.items() if v is not None}
    if isinstance(obj, (list, tuple)):
        return [_to_instance(v) for v in obj]
    return obj


@pytest.fixture(scope="module")
def typed_df(spark):
    return spark.createDataFrame(ROWS, ROWS_DDL)


def test_typed_expr_vs_kernel(spark, typed_df):
    validators = []
    cols = []
    for i, schema in enumerate(SCHEMAS):
        dialect = "2020-12" if "$schema" in schema else "draft7"
        v = SparkValidator(schema, dialect=dialect, engine="expr")
        checks = v.table_checks(typed_df, COLUMNS)  # must NOT raise
        validators.append(v)
        cols.append(ok_of(checks).alias(f"v{i}"))
    got = {r["rid"]: r for r in typed_df.select("rid", *cols).collect()}
    raw = {r["rid"]: r for r in typed_df.collect()}
    for rid, row in raw.items():
        inst = {k: v for k, v in _to_instance(row).items() if k in COLUMNS}
        for i, v in enumerate(validators):
            want = v.kernel.is_valid(inst)
            assert got[rid][f"v{i}"] is want, (
                f"schema#{i}={SCHEMAS[i]} rid={rid} inst={inst} "
                f"expr={got[rid][f'v{i}']} kernel={want}"
            )


def test_round2_reproductions_fail_closed(spark):
    """The two reproduced wrong-answer cases from VERDICT r02."""
    df = spark.createDataFrame([(1, None, None)], "a int, b string, c int")
    v = SparkValidator({"minProperties": 3}, dialect="draft7", engine="expr")
    out = v.apply_table(df).select("valid").collect()
    assert out[0]["valid"] is False  # only one non-null column

    df2 = spark.createDataFrame([("x",)], "b string")
    v2 = SparkValidator({"patternProperties": {"^b": {"minLength": 5}}},
                        dialect="draft7", engine="expr")
    assert v2.apply_table(df2).select("valid").collect()[0]["valid"] is False


def test_unicode_digit_pattern_parity(spark):
    """`{"pattern": "^\\d+$"}` on Arabic-Indic digits: True on expr,
    kernel, and the JSON/variant path (RegexFactory.java:20 parity)."""
    df = spark.createDataFrame([("٣٤",), ("12",), ("ab",)], "b string")
    v = SparkValidator({"properties": {"b": {"pattern": "^\\d+$"}}},
                       dialect="draft7", engine="expr")
    got = [r["valid"] for r in v.apply_table(df).collect()]
    assert got == [True, True, False]
    # variant/JSON path
    jdf = df.withColumn("doc", F.to_json(F.struct("b")))
    vj = SparkValidator({"properties": {"b": {"pattern": "^\\d+$"}}},
                        dialect="draft7")
    gotj = [r["valid"] for r in vj.apply_json(jdf, "doc").collect()]
    assert gotj == [True, True, False]
    # kernel
    assert v.kernel.is_valid({"b": "٣٤"}) is True


def test_inexpressible_typed_schema_falls_back_to_kernel(spark, typed_df):
    """Recursive $ref over typed rows: expr path raises, auto engine
    falls back to the Arrow kernel via to_json (NULL fields dropped)."""
    schema = {
        "$id": "https://example.test/rec",
        "properties": {"s": {"$ref": "#"}},
        "minProperties": 2,
    }
    v_expr = SparkValidator(schema, dialect="draft7", engine="expr")
    with pytest.raises(ExprUnsupported):
        v_expr.table_checks(typed_df, COLUMNS)
    v = SparkValidator(schema, dialect="draft7")  # auto
    got = {r["rid"]: r["valid"]
           for r in v.apply_table(typed_df, COLUMNS).select("rid", "valid",
                                                            *[]).collect()}
    raw = {r["rid"]: r for r in typed_df.collect()}
    for rid, row in raw.items():
        inst = {k: x for k, x in _to_instance(row).items() if k in COLUMNS}
        assert got[rid] is v.kernel.is_valid(inst), f"rid={rid} inst={inst}"


def test_propertynames_compile_time_kernel_eval(spark):
    """propertyNames subschemas beyond the simple string keywords are
    evaluated at compile time against the static field names (the
    kernel runs on the driver, zero runtime cost)."""
    df = spark.createDataFrame([(1, 2)], "ab int, xy int")
    # allOf inside propertyNames — not _string_pred material, but static
    v = SparkValidator(
        {"propertyNames": {"allOf": [{"minLength": 2}, {"pattern": "^a"}]}},
        dialect="draft7", engine="expr")
    assert v.apply_table(df).collect()[0]["valid"] is False  # 'xy' fails ^a
    df2 = spark.createDataFrame([(1, 2)], "ab int, ax int")
    v2 = SparkValidator(
        {"propertyNames": {"allOf": [{"minLength": 2}, {"pattern": "^a"}]}},
        dialect="draft7", engine="expr")
    assert v2.apply_table(df2).collect()[0]["valid"] is True
