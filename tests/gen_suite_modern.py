"""Generate embedded 2019-09 / 2020-12 conformance cases (the keywords
those dialects add over draft-07 — SURVEY.md §2.4/§2.6).

Run: python tests/gen_suite_modern.py
"""

import json
import pathlib

BASE = pathlib.Path(__file__).parent / "suite"

S2019 = "https://json-schema.org/draft/2019-09/schema"
S2020 = "https://json-schema.org/draft/2020-12/schema"


def G(description, schema, *tests):
    return {
        "description": description,
        "schema": schema,
        "tests": [{"description": d, "data": v, "valid": ok} for d, v, ok in tests],
    }


D2019 = {}
D2019["dependent"] = [
    G("dependentRequired", {"$schema": S2019, "dependentRequired": {"bar": ["foo"]}},
      ("with", {"foo": 1, "bar": 2}, True), ("without", {"bar": 2}, False),
      ("trigger absent", {"foo": 1}, True), ("non-object", "x", True)),
    G("dependentSchemas", {"$schema": S2019,
                            "dependentSchemas": {"bar": {"required": ["foo"]}}},
      ("satisfied", {"foo": 1, "bar": 2}, True), ("fails", {"bar": 2}, False),
      ("trigger absent", {"foo": 1}, True)),
]
D2019["contains_minmax"] = [
    G("minContains", {"$schema": S2019, "contains": {"const": 1}, "minContains": 2},
      ("two", [1, 1, 2], True), ("one", [1, 2], False), ("none", [2], False)),
    G("minContains zero", {"$schema": S2019, "contains": {"const": 1}, "minContains": 0},
      ("empty array ok", [], True), ("no match ok", [2], True)),
    G("maxContains", {"$schema": S2019, "contains": {"const": 1}, "maxContains": 1},
      ("one", [1, 2], True), ("two", [1, 1], False), ("zero fails minContains default", [2], False)),
]
D2019["unevaluated"] = [
    G("unevaluatedProperties false", {"$schema": S2019,
       "properties": {"foo": {"type": "string"}}, "unevaluatedProperties": False},
      ("only known", {"foo": "a"}, True), ("unknown", {"foo": "a", "bar": 1}, False)),
    G("unevaluatedProperties sees allOf", {"$schema": S2019,
       "allOf": [{"properties": {"foo": {}}}], "unevaluatedProperties": False},
      ("covered by allOf branch", {"foo": 1}, True), ("not covered", {"bar": 1}, False)),
    G("unevaluatedProperties with if/then", {"$schema": S2019,
       "if": {"properties": {"t": {"const": "a"}}, "required": ["t"]},
       "then": {"properties": {"x": {}}},
       "unevaluatedProperties": False},
      ("then branch evaluates t and x", {"t": "a", "x": 1}, True),
      ("else leaves t unevaluated", {"t": "b"}, False),
      ("unknown with then", {"t": "a", "y": 2}, False)),
    G("unevaluatedProperties schema", {"$schema": S2019,
       "properties": {"foo": {}}, "unevaluatedProperties": {"type": "integer"}},
      ("extra int", {"foo": 1, "bar": 2}, True), ("extra string", {"foo": 1, "bar": "x"}, False)),
    G("unevaluatedItems false", {"$schema": S2019,
       "items": [{"type": "integer"}], "unevaluatedItems": False},
      ("exact", [1], True), ("extra", [1, 2], False), ("empty", [], True)),
    G("unevaluatedItems sees nested tuple", {"$schema": S2019,
       "allOf": [{"items": [{}, {}]}], "unevaluatedItems": False},
      ("covered", [1, 2], True), ("beyond", [1, 2, 3], False)),
    G("unevaluatedProperties cousin anyOf", {"$schema": S2019,
       "anyOf": [{"properties": {"a": {"type": "integer"}}, "required": ["a"]},
                  {"properties": {"b": {"type": "integer"}}, "required": ["b"]}],
       "unevaluatedProperties": False},
      ("first branch", {"a": 1}, True),
      ("both branches evaluate both", {"a": 1, "b": 2}, True),
      ("extra", {"a": 1, "c": 3}, False)),
]
D2019["recursive"] = [
    G("$recursiveRef with $recursiveAnchor", {
        "$schema": S2019, "$id": "https://example.com/strict-tree",
        "$recursiveAnchor": True,
        "type": "object",
        "properties": {"children": {"type": "array", "items": {"$recursiveRef": "#"}}},
        "unevaluatedProperties": False},
      ("ok tree", {"children": [{"children": []}]}, True),
      ("extra key deep", {"children": [{"bad": 1}]}, False)),
]

D2020 = {}
D2020["prefixItems"] = [
    G("prefixItems", {"$schema": S2020, "prefixItems": [{"type": "integer"}, {"type": "string"}]},
      ("match", [1, "x"], True), ("swapped", ["x", 1], False),
      ("shorter ok", [1], True), ("extra ok", [1, "x", True], True)),
    G("items after prefixItems", {"$schema": S2020,
       "prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
      ("prefix then strings", [1, "a", "b"], True),
      ("tail not string", [1, "a", 2], False),
      ("prefix only", [1], True),
      ("bad prefix", ["a"], False)),
    G("items alone (2020 single-schema)", {"$schema": S2020, "items": {"type": "integer"}},
      ("all int", [1, 2], True), ("one bad", [1, "x"], False)),
]
D2020["unevaluated2020"] = [
    G("unevaluatedItems with prefixItems", {"$schema": S2020,
       "prefixItems": [{"type": "string"}], "unevaluatedItems": False},
      ("exact", ["a"], True), ("extra", ["a", "b"], False)),
    G("unevaluatedItems sees contains", {"$schema": S2020,
       "contains": {"type": "string"}, "unevaluatedItems": {"type": "integer"}},
      ("strings evaluated by contains, rest ints", ["a", 1, "b"], True),
      ("uncovered float", ["a", 1.5], False)),
    G("unevaluatedProperties via $ref", {"$schema": S2020,
       "$defs": {"base": {"properties": {"a": {}}}},
       "$ref": "#/$defs/base", "properties": {"b": {}},
       "unevaluatedProperties": False},
      ("both covered (2020 ref keeps siblings)", {"a": 1, "b": 2}, True),
      ("extra", {"a": 1, "c": 2}, False)),
]
D2020["dynamicRef"] = [
    G("$dynamicRef overrides across resources", {
        "$schema": S2020, "$id": "https://example.com/dyn/list",
        "$defs": {
            "outer-item": {"$dynamicAnchor": "item", "type": "array"},
            "list": {"$id": "https://example.com/dyn/listdef",
                     "type": "array",
                     "items": {"$dynamicRef": "#item"},
                     "$defs": {"default-item": {"$dynamicAnchor": "item", "type": ["number", "string"]}}}
        },
        "$ref": "https://example.com/dyn/listdef"},
      ("outermost anchor wins: items must be arrays", [[1], [2]], True),
      ("numbers rejected by outer item anchor", [1], False)),
    G("$dynamicRef acts as $ref without dynamicAnchor at target", {
        "$schema": S2020, "$id": "https://example.com/dyn2/root",
        "$defs": {"thing": {"$anchor": "item", "type": "integer"}},
        "items": {"$dynamicRef": "#item"}},
      ("plain resolution", [1, 2], True), ("invalid", ["x"], False)),
]
D2020["anchors"] = [
    G("$anchor resolution", {"$schema": S2020, "$id": "https://example.com/anch",
       "$defs": {"A": {"$anchor": "foo", "type": "integer"}},
       "properties": {"a": {"$ref": "#foo"}}},
      ("hit", {"a": 1}, True), ("miss", {"a": "x"}, False)),
    G("exclusive bounds are numeric in modern drafts",
      {"$schema": S2020, "exclusiveMinimum": 0},
      ("positive", 1, True), ("zero", 0, False)),
]


def main():
    for sub, corpus in (("draft2019", D2019), ("draft2020", D2020)):
        out = BASE / sub
        out.mkdir(parents=True, exist_ok=True)
        for name, groups in corpus.items():
            (out / f"{name}.json").write_text(json.dumps(groups, indent=1))
        n = sum(len(t["tests"]) for gs in corpus.values() for t in gs)
        print(f"wrote {sub}: {len(corpus)} files, {n} cases")


if __name__ == "__main__":
    main()
