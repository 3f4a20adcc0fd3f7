"""Round-5 expression-path widening: branch-dependent keywords
(anyOf / oneOf / if-then-else / dependentSchemas / draft-7 dual-form
schema dependencies) under ``unevaluated*`` stay on the Column
expression path when every branch contributes ZERO static coverage —
the kernel then merges no annotations whether a branch succeeds or
fails, so verdicts AND violation-entry multisets are provably
unaffected (r4 verdict "Next round" #6; previously any presence of
these keywords sent the whole schema to the UDF kernel).

Dual-form ``dependencies`` is coverage-invisible even with
coverage-bearing subschemas: its annotations never reach the awaited
sets (``UnevaluatedPropertiesCompiler.java:27-35`` lists
``dependentSchemas`` only; ``core/validator.py:1401`` ``merge=False``,
reference-probe verified).

Each widened shape is differentially checked against the Arrow kernel
on verdicts and full violation entries; the coverage-bearing variants
of the same shapes must STILL fall back.
"""

import json

import pytest
from pyspark.sql import functions as F

from json_schema_spark.plans.compiler import ExprUnsupported
from json_schema_spark.plans.runner import SparkValidator

D2020 = "https://json-schema.org/draft/2020-12/schema"
D2019 = "https://json-schema.org/draft/2019-09/schema#"

WIDENED = [
    # if/then with zero-coverage branches (required/const gates)
    ({"$schema": D2020, "type": "object",
      "properties": {"a": {"type": "integer"}},
      "if": {"required": ["b"]}, "then": {"minProperties": 2},
      "unevaluatedProperties": False},
     [{"a": 1}, {"a": 1, "b": 2}, {"b": 2}, {"a": 1, "c": 3}, {}]),
    # if/then/else, all zero-coverage
    ({"$schema": D2020, "type": "object",
      "properties": {"a": {}},
      "if": {"required": ["a"]}, "then": {"minProperties": 1},
      "else": {"maxProperties": 1},
      "unevaluatedProperties": False},
     [{"a": 1}, {"b": 2}, {"a": 1, "b": 2}, {}]),
    # dependentSchemas whose values carry no coverage
    ({"$schema": D2020, "type": "object",
      "properties": {"a": {"type": "integer"}},
      "dependentSchemas": {"a": {"required": ["b"]}},
      "unevaluatedProperties": False},
     [{"a": 1}, {"a": 1, "b": 2}, {"b": 2}, {"a": 1, "b": 2, "c": 3}]),
    # anyOf of zero-coverage members
    ({"$schema": D2020, "type": "object",
      "properties": {"a": {"type": "integer"}},
      "anyOf": [{"required": ["a"]}, {"minProperties": 1}],
      "unevaluatedProperties": False},
     [{"a": 1}, {"b": 2}, {}]),
    # oneOf of zero-coverage members
    ({"$schema": D2020, "type": "object",
      "properties": {"a": {"type": "integer"}},
      "oneOf": [{"required": ["a"]}, {"maxProperties": 0}],
      "unevaluatedProperties": False},
     [{"a": 1}, {}, {"a": 1, "b": 2}, {"b": 1}]),
    # dual-form schema dependencies WITH coverage-bearing subschema:
    # coverage-invisible by reference probe
    ({"$schema": D2019, "type": "object",
      "properties": {"a": {"type": "integer"}},
      "dependencies": {"a": {"properties": {"b": {"type": "string"}}}},
      "unevaluatedProperties": False},
     [{"a": 1}, {"a": 1, "b": "x"}, {"b": "x"}, {"a": 1, "b": 2}]),
    # item side: if with zero ITEM coverage
    ({"$schema": D2020,
      "prefixItems": [{"type": "integer"}],
      "if": {"minItems": 2},
      "unevaluatedItems": False},
     [[1], [1, 2], [1, "x"], [], ["x"]]),
    # item side: dependentSchemas is item-coverage-invisible even with
    # items-bearing values (it only runs on objects)
    ({"$schema": D2020,
      "prefixItems": [{"type": "integer"}],
      "dependentSchemas": {"a": {"items": {"type": "string"}}},
      "unevaluatedItems": False},
     [[1], [1, 2], {"a": 1, "b": "x"}, []]),
    # ABSORB-AND-SKIP: an unevaluated* sibling absorbs if/anyOf/oneOf/
    # dependentSchemas — for a wrong-typed instance the WHOLE group is
    # skipped, so `5` passes even though if/then would reject it
    # (the round-5 sweep found the expr path evaluating these ungated)
    ({"$schema": D2020,
      "if": {"const": 5}, "then": {"enum": [99]},
      "unevaluatedProperties": False},
     [5, {"a": 1}, 99, {}, "x"]),
    ({"$schema": D2020,
      "if": {"const": 5}, "then": {"enum": [99]},
      "unevaluatedItems": False},
     [5, [1], 99, [], "x"]),
    ({"$schema": D2020,
      "anyOf": [{"const": 5}, {"const": 6}],
      "unevaluatedProperties": False},
     [5, 7, {"a": 1}, {}]),
    ({"$schema": D2020,
      "oneOf": [{"const": 5}, {"type": "integer"}],
      "unevaluatedItems": False},
     [5, 7, [1], [], "x"]),
]

STILL_KERNEL = [
    # coverage-bearing if branch
    {"$schema": D2020, "type": "object",
     "if": {"properties": {"b": {"type": "integer"}}, "required": ["b"]},
     "unevaluatedProperties": False},
    # coverage-bearing then
    {"$schema": D2020, "type": "object",
     "if": {"required": ["b"]}, "then": {"properties": {"b": {}}},
     "unevaluatedProperties": False},
    # coverage-bearing anyOf member
    {"$schema": D2020, "type": "object",
     "anyOf": [{"properties": {"a": {}}}, {"minProperties": 1}],
     "unevaluatedProperties": False},
    # coverage-bearing dependentSchemas value (post-7 keyword DOES merge)
    {"$schema": D2020, "type": "object",
     "dependentSchemas": {"a": {"properties": {"b": {}}}},
     "unevaluatedProperties": False},
    # dynamic refs stay kernel-only
    {"$schema": D2020, "type": "object",
     "$dynamicRef": "#x",
     "$defs": {"d": {"$dynamicAnchor": "x"}},
     "unevaluatedProperties": False},
    # item side: anyOf member with prefixItems coverage
    {"$schema": D2020,
     "anyOf": [{"prefixItems": [{}]}, {"minItems": 0}],
     "unevaluatedItems": False},
    # $ref cycle THROUGH a branch: the coverage probe must detect the
    # cycle and fall back, not recurse guard -> probe -> guard forever
    {"$schema": D2020, "type": "object",
     "if": {"$ref": "#"},
     "unevaluatedProperties": False},
    {"$schema": D2020, "type": "object",
     "anyOf": [{"$ref": "#/$defs/loop"}],
     "$defs": {"loop": {"anyOf": [{"$ref": "#/$defs/loop"}]}},
     "unevaluatedProperties": False},
]


def _run(spark, schema, insts, engine):
    df = spark.createDataFrame(
        [(i, json.dumps(x)) for i, x in enumerate(insts)], "i int, doc string")
    v = SparkValidator(schema, engine=engine)
    out = v.apply_json(df, "doc")
    return {
        r["i"]: (r["valid"],
                 sorted((x["path"], x["keyword"], x["message"])
                        for x in (r["violations"] or [])))
        for r in out.collect()
    }


@pytest.mark.parametrize("case", range(len(WIDENED)))
def test_widened_shape_expr_matches_kernel(spark, case):
    schema, insts = WIDENED[case]
    expr = _run(spark, schema, insts, "expr")   # raises if not widened
    kernel = _run(spark, schema, insts, "udf")
    assert expr == kernel


@pytest.mark.parametrize("case", range(len(STILL_KERNEL)))
def test_coverage_bearing_branches_still_fall_back(spark, case):
    schema = STILL_KERNEL[case]
    v = SparkValidator(schema, engine="expr")
    with pytest.raises(ExprUnsupported):
        v.json_columns(F.lit("{}"))
