"""Static unevaluatedProperties / unevaluatedItems in the EXPRESSION
path (no UDF kernel): when the evaluated set is statically derivable
(properties / patternProperties / additionalProperties / allOf / $ref
only), the keyword compiles to a set-difference Column expression —
``engine="expr"`` must accept it; branch-dependent shapes must still
raise ExprUnsupported and fall back to the kernel.
"""

from __future__ import annotations

import json

import pytest

from json_schema_spark.plans.compiler import ExprUnsupported
from json_schema_spark.plans.runner import SparkValidator

D2020 = {"dialect": "2020-12"}


def _verdicts(spark, schema, docs, engine="expr", dialect="2020-12"):
    v = SparkValidator(schema, dialect=dialect, engine=engine)
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], "i int, doc string"
    )
    out = v.apply_json(df, "doc", with_violations=False)
    return [r["valid"] for r in out.orderBy("i").collect()]


def test_static_uneval_props_allof_merge(spark):
    schema = {
        "allOf": [
            {"properties": {"a": {"type": "integer"}}},
            {"patternProperties": {"^x": {"type": "string"}}},
        ],
        "properties": {"b": {"type": "boolean"}},
        "unevaluatedProperties": False,
    }
    docs = [
        {"a": 1, "b": True},        # all evaluated
        {"a": 1, "xq": "s"},        # pattern-evaluated
        {"a": 1, "c": 2},           # c unevaluated -> invalid
        {},                          # nothing -> valid
    ]
    assert _verdicts(spark, schema, docs) == [True, True, False, True]


def test_static_uneval_props_subschema(spark):
    schema = {
        "properties": {"a": True},
        "unevaluatedProperties": {"type": "integer"},
    }
    docs = [{"a": "x", "z": 3}, {"a": "x", "z": "no"}]
    assert _verdicts(spark, schema, docs) == [True, False]


def test_static_uneval_props_ref_sibling(spark):
    schema = {
        "$defs": {"base": {"properties": {"a": True, "b": True}}},
        "$ref": "#/$defs/base",
        "unevaluatedProperties": False,
    }
    docs = [{"a": 1, "b": 2}, {"a": 1, "c": 2}]
    assert _verdicts(spark, schema, docs) == [True, False]


def test_additional_properties_covers_everything(spark):
    schema = {
        "allOf": [{"additionalProperties": True}],
        "unevaluatedProperties": False,  # vacuous: allOf branch covers all
    }
    assert _verdicts(spark, schema, [{"q": 1}]) == [True]


def test_static_uneval_items(spark):
    schema = {
        "allOf": [{"prefixItems": [{"type": "integer"}]}],
        "unevaluatedItems": {"type": "string"},
    }
    docs = [[1, "a", "b"], [1, 2], ["x"]]
    assert _verdicts(spark, schema, docs) == [True, False, False]


def test_static_uneval_items_false(spark):
    schema = {
        "prefixItems": [True, True],
        "unevaluatedItems": False,
    }
    docs = [[1, 2], [1, 2, 3], []]
    assert _verdicts(spark, schema, docs) == [True, False, True]


def test_dynamic_uneval_falls_back_to_kernel(spark):
    schema = {
        "anyOf": [{"properties": {"a": True}}, {"properties": {"b": True}}],
        "unevaluatedProperties": False,
    }
    with pytest.raises(ExprUnsupported):
        SparkValidator(schema, dialect="2020-12", engine="expr").json_columns(
            __import__("pyspark.sql.functions", fromlist=["col"]).col("doc")
        )
    # auto engine: kernel fallback still yields spec verdicts
    docs = [{"a": 1}, {"a": 1, "b": 2}, {"c": 1}]
    assert _verdicts(spark, schema, docs, engine="auto") == [True, True, False]


def test_contains_uneval_items_falls_back(spark):
    schema = {"contains": {"type": "integer"}, "unevaluatedItems": False}
    with pytest.raises(ExprUnsupported):
        SparkValidator(schema, dialect="2020-12", engine="expr").json_columns(
            __import__("pyspark.sql.functions", fromlist=["col"]).col("doc")
        )


def test_expr_plan_stays_python_free(spark):
    """The static-unevaluated plan must contain no BatchEvalPython /
    ArrowEvalPython node (pure whole-stage-codegen expressions)."""
    schema = {
        "allOf": [{"properties": {"a": {"type": "integer"}}}],
        "unevaluatedProperties": False,
    }
    v = SparkValidator(schema, dialect="2020-12", engine="expr")
    df = spark.createDataFrame([('{"a": 1}',)], "doc string")
    out = v.apply_json(df, "doc", with_violations=False)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan
