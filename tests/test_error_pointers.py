"""Pinned (error kind, instance pointer) surfaces for the reference's
additional* ABSORB (reference-probe verified, round 4): a property/item
whose properties / patternProperties / items subschema FAILED produces
no success annotation, so ``AdditionalPropertiesCompiler`` /
``v2019/AdditionalItemsCompiler`` re-validate it against the
additional* schema and THOSE errors surface at the same instance
pointer. Verdict-invariant (the instance already failed) — pure error
surface. The JVM differentials live in
``test_reference_differential.py::test_error_pointers_*``; these pins
run without a JDK.
"""

from __future__ import annotations

import pytest

from json_schema_spark.core.errors import error_kind_of
from json_schema_spark.core.validator import CompileConfig, compile_schema


def pairs(schema, doc, dialect="draft7"):
    kernel = compile_schema(schema, config=CompileConfig(dialect=dialect))
    ok, errs = kernel.validate(doc)
    assert not ok
    return {(error_kind_of(kw, msg).name, path) for path, kw, msg in errs}


# Each case: (schema, instance, pairs that MUST be present — the
# reference emits exactly these plus nothing we lack; our surface may
# add applicator-context extras).
ABSORB_CASES = [
    # failed declared property re-validated against additionalProperties
    ({"properties": {"k": {"type": "string"}},
      "additionalProperties": False},
     {"k": 1},
     {("TYPE", "/k"), ("FALSE_SCHEMA", "/k")}),
    ({"properties": {"k": {"type": "string"}},
      "additionalProperties": {"multipleOf": 3}},
     {"k": 10},
     {("TYPE", "/k"), ("MULTIPLE_OF", "/k")}),
    # a key matched by BOTH properties and patternProperties is absorbed
    # only when EVERY matching subschema failed (per-field annotations:
    # probe-verified that one success suppresses the re-validation)
    ({"properties": {"k1": {"type": "number"}},
      "patternProperties": {"^k": {"minLength": 50}},
      "additionalProperties": {"maxLength": 1}},
     {"k1": "short"},
     {("TYPE", "/k1"), ("MIN_LENGTH", "/k1"), ("MAX_LENGTH", "/k1")}),
    # ... and NOT absorbed when one matching subschema succeeded
    ({"properties": {"k1": {"type": "string"}},
      "patternProperties": {"^k": {"minLength": 50}},
      "additionalProperties": False},
     {"k1": "short", "z": 1},
     {("MIN_LENGTH", "/k1"), ("FALSE_SCHEMA", "/z")}),
    # failed tuple position re-validated against additionalItems
    ({"items": [{"enum": ["a"]}], "additionalItems": {"type": "boolean"}},
     ["b", "c"],
     {("ENUM", "/0"), ("TYPE", "/0"), ("TYPE", "/1")}),
    # SINGLE-form items + additionalItems: failed indices absorb too
    # (the reference transform pulls "items" in any shape)
    ({"items": {"type": "integer"}, "additionalItems": {"type": "boolean"}},
     [1, "x", True],
     {("TYPE", "/1")}),
]


@pytest.mark.parametrize("schema,doc,want", ABSORB_CASES)
def test_absorb_error_surface(schema, doc, want):
    got = pairs(schema, doc)
    assert want <= got, (sorted(want - got), sorted(got))


def test_one_matching_success_suppresses_absorb():
    # k1 passes properties but fails patternProperties: the properties
    # annotation marks it evaluated, so additionalProperties never runs
    # (probe-verified: reference emits ONLY MIN_LENGTH@/k1)
    got = pairs({"properties": {"k1": {"type": "string"}},
                 "patternProperties": {"^k": {"minLength": 50}},
                 "additionalProperties": False},
                {"k1": "short"})
    assert ("FALSE_SCHEMA", "/k1") not in got
    assert ("MIN_LENGTH", "/k1") in got


def test_no_absorb_when_property_succeeds():
    # a passing declared key is evaluated — additionalProperties never
    # touches it, so a false additional schema adds no /k error
    got = pairs({"properties": {"k": {"type": "string"}},
                 "additionalProperties": False,
                 "required": ["missing"]},
                {"k": "fine"})
    assert ("FALSE_SCHEMA", "/k") not in got
    assert ("REQUIRED", "") in got


def test_single_form_items_absorb_only_on_failure():
    got = pairs({"items": {"type": "integer"},
                 "additionalItems": False,
                 "minItems": 9},
                [1, 2])
    assert ("FALSE_SCHEMA", "/0") not in got
    assert ("MIN_ITEMS", "") in got


def test_additional_items_without_items_is_inert():
    kernel = compile_schema({"additionalItems": False},
                            config=CompileConfig(dialect="draft7"))
    ok, _ = kernel.validate([1, 2, 3])
    assert ok  # the reference drops additionalItems when items is absent
