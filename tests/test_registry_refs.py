"""Cross-schema $ref resolution through a pre-registered registry —
the Spark analogue of the reference's external-resolver and remote-ref
tests (``ExternalSchemaResolverTest.java``, ``JsonSchemaOrgTests``'s
localhost:1234 remotes): no network, schemas registered by URI on the
driver (SURVEY.md §2.1/§2.6)."""

import pytest

from json_schema_spark.core.registry import SchemaRegistry
from json_schema_spark.core.validator import CompileConfig, compile_schema
from json_schema_spark.plans.runner import SparkValidator


def _registry():
    reg = SchemaRegistry(default_dialect="draft7")
    reg.add({"type": "integer", "minimum": 0}, "https://example.com/nonneg.json")
    reg.add(
        {
            "$id": "https://example.com/address.json",
            "type": "object",
            "required": ["city"],
            "properties": {
                "city": {"type": "string"},
                "zip": {"$ref": "https://example.com/nonneg.json"},
            },
        },
        "https://example.com/address.json",
    )
    return reg


ROOT = {
    "$schema": "http://json-schema.org/draft-07/schema#",
    "type": "object",
    "properties": {"addr": {"$ref": "https://example.com/address.json"}},
}

CASES = [
    ({"addr": {"city": "x", "zip": 12}}, True),
    ({"addr": {"city": "x"}}, True),
    ({"addr": {"zip": 12}}, False),         # required city via remote ref
    ({"addr": {"city": "x", "zip": -1}}, False),  # transitively remote minimum
    ({"addr": {"city": 9}}, False),
    ({}, True),
]


def test_kernel_cross_schema_refs():
    reg = _registry()
    cs = compile_schema(ROOT, registry=reg, config=CompileConfig(dialect="draft7"))
    for data, expected in CASES:
        assert cs.is_valid(data) is expected, data


def test_spark_cross_schema_refs(spark):
    import json

    reg = _registry()
    v = SparkValidator(ROOT, dialect="draft7", registry=reg)
    rows = [(i, json.dumps(d)) for i, (d, _) in enumerate(CASES)]
    df = spark.createDataFrame(rows, "i int, doc string")
    got = {r["i"]: r["valid"] for r in v.apply_json(df, "doc").collect()}
    for i, (data, expected) in enumerate(CASES):
        assert got[i] is expected, data


def test_relative_ref_against_base():
    """$id establishes the base URI; relative $refs resolve against it."""
    reg = SchemaRegistry(default_dialect="draft7")
    reg.add({"enum": ["a", "b"]}, "https://example.com/schemas/letters.json")
    root = {
        "$id": "https://example.com/schemas/root.json",
        "properties": {"x": {"$ref": "letters.json"}},
    }
    cs = compile_schema(root, registry=reg, config=CompileConfig(dialect="draft7"))
    assert cs.is_valid({"x": "a"}) is True
    assert cs.is_valid({"x": "z"}) is False


def test_unresolvable_ref_raises():
    reg = SchemaRegistry(default_dialect="draft7")
    with pytest.raises(Exception):
        cs = compile_schema(
            {"$ref": "https://example.com/missing.json"},
            registry=reg,
            config=CompileConfig(dialect="draft7"),
        )
        cs.is_valid(1)  # compile- or apply-time failure both acceptable
