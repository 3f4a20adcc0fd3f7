"""Generate the embedded draft-07 conformance corpus.

Cases are authored from the JSON Schema draft-07 specification semantics
(the same behaviours the official json-schema-org/JSON-Schema-Test-Suite
asserts and the reference runs wholesale — JsonSchemaOrgTests.java:26-154).
File format matches the official suite so real suite files can be dropped
in alongside. Files prefixed ``optional_format`` run with format
assertions enabled, mirroring JsonSchemaOrgTests.java:33-37.

Run: python tests/gen_suite_draft7.py   (writes tests/suite/draft7/*.json)
"""

import json
import pathlib

OUT = pathlib.Path(__file__).parent / "suite" / "draft7"


def G(description, schema, *tests):
    return {
        "description": description,
        "schema": schema,
        "tests": [{"description": d, "data": v, "valid": ok} for d, v, ok in tests],
    }


CORPUS = {}

CORPUS["type"] = [
    G("integer type", {"type": "integer"},
      ("an integer", 1, True), ("a float with zero frac is integer", 1.0, True),
      ("a float", 1.1, False), ("a string", "1", False), ("a bool", True, False),
      ("null", None, False), ("an object", {}, False), ("an array", [], False)),
    G("number type", {"type": "number"},
      ("an integer", 1, True), ("a float", 1.1, True), ("a bool is not number", True, False),
      ("a string", "1", False)),
    G("string type", {"type": "string"},
      ("a string", "x", True), ("empty string", "", True), ("a number", 1, False),
      ("a string-looking number stays string", "1", True), ("null", None, False)),
    G("object type", {"type": "object"},
      ("an object", {"a": 1}, True), ("an array", [1], False), ("null", None, False)),
    G("array type", {"type": "array"},
      ("an array", [1], True), ("an object", {}, False), ("a string", "[]", False)),
    G("boolean type", {"type": "boolean"},
      ("true", True, True), ("false", False, True), ("zero", 0, False), ("one", 1, False),
      ("empty string", "", False)),
    G("null type", {"type": "null"},
      ("null", None, True), ("zero", 0, False), ("false", False, False), ("empty string", "", False)),
    G("union type", {"type": ["integer", "string"]},
      ("an integer", 1, True), ("a string", "x", True), ("a float", 1.5, False), ("null", None, False)),
]

CORPUS["enum"] = [
    G("simple enum", {"enum": [1, 2, 3]},
      ("member", 1, True), ("non-member", 4, False), ("float equal to member", 1.0, True),
      ("string not coerced", "1", False), ("bool not 1", True, False)),
    G("heterogeneous enum", {"enum": [6, "foo", [], True, {"foo": 12}]},
      ("int member", 6, True), ("deep object member", {"foo": 12}, True),
      ("object with extra key", {"foo": 12, "b": 1}, False),
      ("empty array member", [], True), ("bool member", True, True),
      ("one is not true", 1, False), ("float member via numeric eq", 6.0, True)),
    G("enum with null", {"enum": [None]},
      ("null", None, True), ("zero", 0, False), ("false", False, False)),
    G("nested numeric equality", {"enum": [[1, 2]]},
      ("float elements equal", [1.0, 2.0], True), ("different", [1, 3], False)),
]

CORPUS["const"] = [
    G("const int", {"const": 2},
      ("same", 2, True), ("same as float", 2.0, True), ("other", 3, False),
      ("string", "2", False), ("bool", True, False)),
    G("const object", {"const": {"a": 1, "b": 2}},
      ("key order irrelevant", {"b": 2, "a": 1}, True),
      ("numeric tolerant", {"a": 1.0, "b": 2.0}, True),
      ("extra key", {"a": 1, "b": 2, "c": 3}, False)),
    G("const null", {"const": None}, ("null", None, True), ("zero", 0, False)),
    G("const false", {"const": False}, ("false", False, True), ("zero", 0, False), ("null", None, False)),
]

CORPUS["numeric"] = [
    G("minimum", {"minimum": 1.1},
      ("above", 2.6, True), ("equal", 1.1, True), ("below", 0.6, False),
      ("non-number ignored", "x", True), ("null ignored", None, True)),
    G("maximum", {"maximum": 3.0},
      ("below", 2.6, True), ("equal", 3.0, True), ("equal int", 3, True), ("above", 3.5, False),
      ("non-number ignored", "x", True)),
    G("exclusiveMinimum", {"exclusiveMinimum": 1.1},
      ("above", 1.2, True), ("equal", 1.1, False), ("below", 0.6, False),
      ("ignores non-numbers", "x", True)),
    G("exclusiveMaximum", {"exclusiveMaximum": 3.0},
      ("below", 2.2, True), ("equal", 3.0, False), ("above", 3.5, False)),
    G("multipleOf int", {"multipleOf": 2},
      ("multiple", 10, True), ("not multiple", 7, False), ("zero", 0, True),
      ("negative multiple", -4, True), ("float multiple", 4.0, True), ("non-number", "x", True)),
    G("multipleOf decimal", {"multipleOf": 0.01},
      ("exact decimal", 19.99, True), ("too precise", 19.999, False)),
    G("multipleOf small", {"multipleOf": 0.0001},
      ("0.0075", 0.0075, True), ("0.00751", 0.00751, False), ("0.0008", 0.0008, True)),
    G("big numbers", {"maximum": 18446744073709551615},
      ("huge below", 18446744073709551600, True), ("huge above", 18446744073709551616, False)),
]

CORPUS["length"] = [
    G("minLength", {"minLength": 2},
      ("longer", "foo", True), ("exact", "fo", True), ("shorter", "f", False),
      ("non-string", 1, True), ("codepoint count", "\U0001F4A9\U0001F4A9", True)),
    G("maxLength", {"maxLength": 2},
      ("shorter", "f", True), ("exact", "fo", True), ("longer", "foo", False),
      ("two astral chars pass", "\U0001F4A9\U0001F4A9", True),
      ("three astral chars fail", "\U0001F4A9\U0001F4A9\U0001F4A9", False),
      ("array ignored", [1, 2, 3], True)),
]

CORPUS["pattern"] = [
    G("pattern is a search", {"pattern": "a+"},
      ("match inside", "xxaayy", True), ("full match", "aa", True), ("no match", "xyz", False),
      ("non-string ignored", 123, True), ("bool ignored", True, True)),
    G("anchored pattern", {"pattern": "^a[0-9]$"},
      ("match", "a7", True), ("prefix only", "a7b", False), ("wrong", "b7", False)),
    G("escaped pattern", {"pattern": "^\\d+\\.\\d+$"},
      ("decimal string", "3.14", True), ("word", "pi", False)),
]

CORPUS["required"] = [
    G("required", {"required": ["foo"]},
      ("present", {"foo": 1}, True), ("absent", {"bar": 1}, False),
      ("present null still counts", {"foo": None}, True),
      ("non-object ignored", [1], True), ("string ignored", "foo", True)),
    G("required empty", {"required": []}, ("anything", {}, True)),
    G("required multiple", {"required": ["a", "b"]},
      ("both", {"a": 1, "b": 2}, True), ("one missing", {"a": 1}, False)),
]

CORPUS["properties"] = [
    G("properties", {"properties": {"foo": {"type": "integer"}, "bar": {"type": "string"}}},
      ("both valid", {"foo": 1, "bar": "baz"}, True),
      ("one invalid", {"foo": 1, "bar": {}}, False),
      ("missing props ok", {}, True),
      ("extra props ok", {"quux": []}, True),
      ("non-object ignored", [], True)),
    G("nested properties", {"properties": {"o": {"properties": {"i": {"type": "null"}}}}},
      ("nested ok", {"o": {"i": None}}, True), ("nested bad", {"o": {"i": 1}}, False)),
]

CORPUS["patternProperties"] = [
    G("patternProperties", {"patternProperties": {"f.*o": {"type": "integer"}}},
      ("match valid", {"foo": 1}, True), ("match invalid", {"foo": "x"}, False),
      ("two matches one bad", {"foo": 1, "fxxxo": "x"}, False),
      ("unmatched ignored", {"bar": "x"}, True), ("non-object", "foo", True)),
    G("pattern is search on names", {"patternProperties": {"a": {"type": "integer"}}},
      ("name contains a", {"xax": 1}, True), ("name contains a invalid", {"xax": "s"}, False)),
]

CORPUS["additionalProperties"] = [
    G("additionalProperties false", {"properties": {"foo": {}}, "additionalProperties": False},
      ("only known", {"foo": 1}, True), ("extra", {"foo": 1, "bar": 2}, False), ("empty", {}, True)),
    G("additionalProperties schema",
      {"properties": {"foo": {}}, "patternProperties": {"^v": {}}, "additionalProperties": {"type": "boolean"}},
      ("additional bool ok", {"foo": 1, "other": True}, True),
      ("additional non-bool", {"foo": 1, "other": 1}, False),
      ("pattern-matched exempt", {"vroom": 3}, True)),
    G("additionalProperties alone", {"additionalProperties": {"type": "integer"}},
      ("all ints", {"a": 1, "b": 2}, True), ("one not", {"a": 1, "b": "x"}, False)),
]

CORPUS["propertyNames"] = [
    G("propertyNames", {"propertyNames": {"maxLength": 3}},
      ("short names", {"f": {}, "foo": {}}, True),
      ("long name", {"fooo": {}}, False),
      ("empty object", {}, True), ("non-object", [1, 2], True)),
    G("propertyNames pattern", {"propertyNames": {"pattern": "^a"}},
      ("all start a", {"a1": 1, "a2": 2}, True), ("one not", {"a1": 1, "b": 2}, False)),
]

CORPUS["objcount"] = [
    G("minProperties", {"minProperties": 1},
      ("one", {"a": 1}, True), ("none", {}, False), ("non-object", "", True), ("array ignored", [], True)),
    G("maxProperties", {"maxProperties": 2},
      ("two", {"a": 1, "b": 2}, True), ("three", {"a": 1, "b": 2, "c": 3}, False)),
]

CORPUS["dependencies"] = [
    G("dependencies array form", {"dependencies": {"bar": ["foo"]}},
      ("with dependency", {"foo": 1, "bar": 2}, True),
      ("missing dependency", {"bar": 2}, False),
      ("trigger absent", {"foo": 1}, True), ("empty", {}, True), ("non-object", "x", True)),
    G("dependencies schema form", {"dependencies": {"bar": {"properties": {"foo": {"type": "integer"}}, "required": ["foo"]}}},
      ("satisfied", {"foo": 1, "bar": 2}, True),
      ("schema fails", {"foo": "s", "bar": 2}, False),
      ("missing required", {"bar": 2}, False),
      ("trigger absent", {"foo": "s"}, True)),
    G("dependencies boolean form", {"dependencies": {"bar": False}},
      ("trigger absent", {"foo": 1}, True), ("trigger present", {"bar": 1}, False)),
]

CORPUS["items"] = [
    G("items single schema", {"items": {"type": "integer"}},
      ("all int", [1, 2, 3], True), ("one bad", [1, "x"], False), ("empty", [], True),
      ("non-array ignored", {"foo": "bar"}, True)),
    G("items tuple form", {"items": [{"type": "integer"}, {"type": "string"}]},
      ("matching tuple", [1, "x"], True), ("swapped", ["x", 1], False),
      ("shorter ok", [1], True), ("longer ok without additionalItems", [1, "x", 99], True)),
    G("additionalItems false", {"items": [{"type": "integer"}], "additionalItems": False},
      ("exact", [1], True), ("extra", [1, 2], False), ("empty", [], True)),
    G("additionalItems schema", {"items": [{}], "additionalItems": {"type": "integer"}},
      ("extra ints", [None, 2, 3], True), ("extra string", [None, "x"], False)),
    G("additionalItems ignored with schema items", {"items": {}, "additionalItems": False},
      ("all allowed", [1, 2, 3, 4], True)),
]

CORPUS["contains"] = [
    G("contains", {"contains": {"minimum": 5}},
      ("one match", [3, 4, 5], True), ("no match", [1, 2], False),
      ("empty array", [], False), ("non-array ignored", {}, True),
      ("all match", [6, 7, 8], True)),
]

CORPUS["uniqueItems"] = [
    G("uniqueItems", {"uniqueItems": True},
      ("unique", [1, 2], True), ("dup", [1, 1], False),
      ("numeric dup across types", [1, 1.0], False),
      ("deep object dup", [{"a": 1}, {"a": 1.0}], False),
      ("key order irrelevant", [{"a": 1, "b": 2}, {"b": 2, "a": 1}], False),
      ("0 and false distinct", [0, False], True),
      ("1 and true distinct", [1, True], True),
      ("nested arrays", [["a"], ["a"]], False),
      ("non-array ignored", "aaa", True)),
    G("uniqueItems false", {"uniqueItems": False}, ("dups fine", [1, 1], True)),
]

CORPUS["arraycount"] = [
    G("minItems", {"minItems": 1}, ("one", [1], True), ("none", [], False), ("non-array", "", True)),
    G("maxItems", {"maxItems": 2}, ("two", [1, 2], True), ("three", [1, 2, 3], False)),
]

CORPUS["combinators"] = [
    G("allOf", {"allOf": [{"properties": {"bar": {"type": "integer"}}, "required": ["bar"]},
                           {"properties": {"foo": {"type": "string"}}, "required": ["foo"]}]},
      ("both", {"foo": "baz", "bar": 2}, True), ("first only", {"bar": 2}, False),
      ("second only", {"foo": "baz"}, False)),
    G("anyOf", {"anyOf": [{"type": "integer"}, {"minimum": 2}]},
      ("first", 1, True), ("second", 2.5, True), ("both", 3, True), ("neither", 1.5, False)),
    G("oneOf", {"oneOf": [{"type": "integer"}, {"minimum": 2}]},
      ("first only", 1, True), ("second only", 2.5, True), ("both fail", 3, False),
      ("neither", 1.5, False)),
    G("not", {"not": {"type": "integer"}},
      ("other type", "foo", True), ("the type", 1, False)),
    G("nested combinators", {"anyOf": [{"allOf": [{"type": "string"}]}, {"not": {"type": "string"}}]},
      ("string", "x", True), ("number", 5, True)),
    G("boolean schema true", True, ("anything", {"a": 1}, True), ("null", None, True)),
    G("boolean schema false", False, ("anything", {"a": 1}, False), ("null", None, False)),
    G("empty schema", {}, ("anything", 42, True)),
]

CORPUS["ifthenelse"] = [
    G("if-then", {"if": {"exclusiveMaximum": 0}, "then": {"minimum": -10}},
      ("cond true then ok", -1, True), ("cond true then fails", -100, False),
      ("cond false", 3, True)),
    G("if-else", {"if": {"exclusiveMaximum": 0}, "else": {"multipleOf": 2}},
      ("cond true", -1, True), ("cond false else ok", 4, True), ("cond false else fails", 3, False)),
    G("then without if is ignored", {"then": {"const": 0}}, ("anything", "x", True)),
    G("else without if is ignored", {"else": {"const": 0}}, ("anything", "x", True)),
    G("if without then/else validates nothing", {"if": {"const": 0}}, ("zero", 0, True), ("other", 1, True)),
]

CORPUS["ref"] = [
    G("ref to definitions", {"definitions": {"pos": {"type": "integer", "minimum": 0}},
                              "properties": {"n": {"$ref": "#/definitions/pos"}}},
      ("valid", {"n": 3}, True), ("negative", {"n": -1}, False), ("wrong type", {"n": "x"}, False)),
    G("draft7 ref ignores siblings", {"definitions": {"int": {"type": "integer"}},
                                       "$ref": "#/definitions/int", "maximum": 1},
      ("sibling maximum ignored", 5, True), ("ref enforced", "x", False)),
    G("recursive ref", {"$id": "http://example.com/tree",
                        "type": "object",
                        "properties": {"value": {"type": "integer"},
                                       "children": {"type": "array", "items": {"$ref": "#"}}}},
      ("depth 2", {"value": 1, "children": [{"value": 2, "children": []}]}, True),
      ("bad leaf", {"value": 1, "children": [{"value": "x"}]}, False)),
    G("ref with escaped pointer", {"definitions": {"a/b": {"type": "integer"}, "c~d": {"type": "string"}},
                                    "properties": {"x": {"$ref": "#/definitions/a~1b"},
                                                   "y": {"$ref": "#/definitions/c~0d"}}},
      ("both ok", {"x": 1, "y": "s"}, True), ("x bad", {"x": "s", "y": "s"}, False)),
    G("ref via $id anchor", {"$id": "http://example.com/root.json",
                             "definitions": {"A": {"$id": "#foo", "type": "integer"}},
                             "properties": {"a": {"$ref": "#foo"}}},
      ("anchor hit", {"a": 1}, True), ("anchor miss", {"a": "x"}, False)),
    G("ref via nested $id base", {"$id": "http://example.com/a.json",
                                  "definitions": {"x": {"$id": "http://example.com/b.json", "type": "string"}},
                                  "properties": {"p": {"$ref": "b.json"}}},
      ("resolves relative to base", {"p": "s"}, True), ("invalid", {"p": 1}, False)),
]

CORPUS["content"] = [
    G("contentEncoding base64 asserts in draft7", {"contentEncoding": "base64"},
      ("valid b64", "eyJmb28iOiAiYmFyIn0=", True),
      ("invalid b64", "eyJmb28iOi%iYmFyIn0K", False),
      ("non-string ignored", 100, True)),
    G("contentMediaType json", {"contentMediaType": "application/json"},
      ("valid json doc", "{\"foo\": \"bar\"}", True),
      ("invalid json doc", "{:}", False),
      ("ignores non-strings", 100, True)),
    G("encoding+mediaType chained", {"contentEncoding": "base64", "contentMediaType": "application/json"},
      ("valid chain", "eyJmb28iOiAiYmFyIn0=", True),
      ("valid b64 invalid json", "ezp9Cg==", False),
      ("invalid b64", "{}", False)),
]

CORPUS["optional_format"] = [
    G("date format", {"format": "date"},
      ("valid", "1963-06-19", True), ("bad day", "2021-02-30", False),
      ("leap day ok", "2020-02-29", True), ("leap day non-leap-year", "2021-02-29", False),
      ("not a date", "06/19/1963", False), ("non-string ignored", 12, True)),
    G("time format", {"format": "time"},
      ("valid utc", "08:30:06Z", True), ("valid offset", "08:30:06+02:00", True),
      ("leap second utc", "23:59:60Z", True), ("leap second wrong time", "12:00:60Z", False),
      ("leap second with offset", "15:59:60-08:00", True),
      ("bad hour", "24:00:00Z", False), ("no offset", "08:30:06", False)),
    G("date-time format", {"format": "date-time"},
      ("valid", "1963-06-19T08:30:06.283185Z", True),
      ("lowercase t z", "1963-06-19t08:30:06z", True),
      ("bad month", "1990-13-01T00:00:00Z", False),
      ("missing time", "1963-06-19", False)),
    G("uuid format", {"format": "uuid"},
      ("valid", "2EB8AA08-AA98-11EA-B4AA-73B441D16380", True),
      ("lowercase", "2eb8aa08-aa98-11ea-b4aa-73b441d16380", True),
      ("too short", "2eb8aa08-aa98-11ea-b4aa", False),
      ("bad char", "2eb8aa08-aa98-11ea-b4aa-73b441d1638g", False)),
    G("ipv4 format", {"format": "ipv4"},
      ("valid", "192.168.0.1", True), ("octet too big", "256.0.0.1", False),
      ("three octets", "127.0.1", False), ("leading zero-ish ok", "87.10.0.1", True)),
    G("ipv6 format", {"format": "ipv6"},
      ("valid", "::1", True), ("full", "2001:db8::8:800:200c:417a", True),
      ("too many groups", "1:2:3:4:5:6:7:8:9", False), ("letters out of range", "::g", False),
      ("embedded ipv4", "::ffff:192.168.0.1", True)),
    G("email format", {"format": "email"},
      ("valid", "joe.bloggs@example.com", True), ("no at", "not-an-email", False),
      ("quoted local", "\"joe bloggs\"@example.com", True),
      ("double dot local", "joe..bloggs@example.com", False)),
    G("hostname format", {"format": "hostname"},
      ("valid", "www.example.com", True), ("underscore invalid", "not_valid", False),
      ("single label", "localhost", True),
      ("starts with hyphen", "-bad.example.com", False),
      ("label too long", "a" * 64 + ".example.com", False)),
    G("uri format", {"format": "uri"},
      ("valid", "http://example.com/path?q=1#f", True),
      ("relative invalid", "/relative/path", False),
      ("space invalid", "http://example.com/ path", False),
      ("mailto", "mailto:joe@example.com", True)),
    G("uri-reference format", {"format": "uri-reference"},
      ("relative ok", "/relative/path", True), ("fragment only", "#f", True),
      ("space invalid", "\\\\WINDOWS\\share", False)),
    G("json-pointer format", {"format": "json-pointer"},
      ("valid", "/foo/0/bar", True), ("empty", "", True),
      ("escaped", "/f~0o/b~1r", True), ("no leading slash", "foo/bar", False),
      ("bad escape", "/f~2", False)),
    G("relative-json-pointer format", {"format": "relative-json-pointer"},
      ("valid", "1/foo", True), ("hash form", "0#", True),
      ("leading zero count", "01/a", False), ("negative", "-1/a", False)),
    G("regex format", {"format": "regex"},
      ("valid", "a+b*", True), ("unclosed group", "(a", False)),
    G("uri-template format", {"format": "uri-template"},
      ("valid", "http://example.com/dict/{term:1}/{term}", True),
      ("explode", "http://example.com{/list*}", True),
      ("unclosed", "http://example.com/{term", False)),
    G("duration format", {"format": "duration"},
      ("days", "P3D", True), ("weeks", "P4W", True), ("full", "P1Y2M3DT4H5M6S", True),
      ("time only", "PT1H", True), ("bare P", "P", False), ("trailing T", "P1DT", False)),
]

CORPUS["nested_structures"] = [
    G("deeply nested mixed", {
        "type": "object",
        "properties": {
            "repo": {"type": "string", "pattern": "^[A-Za-z0-9_.-]+/[A-Za-z0-9_.-]+$"},
            "commit": {"type": "string", "pattern": "^[0-9a-f]{40}$"},
            "lang": {"enum": ["python", "java", "scala", "sql", "markdown", "json", "yaml", "other"]},
            "stats": {"type": "object",
                      "properties": {"lines": {"type": "integer", "minimum": 0}},
                      "additionalProperties": False},
            "tags": {"type": "array", "items": {"type": "string"}, "uniqueItems": True},
        },
        "required": ["repo", "commit"],
    },
      ("valid row", {"repo": "org/name", "commit": "a" * 40, "lang": "python",
                     "stats": {"lines": 10}, "tags": ["x", "y"]}, True),
      ("bad commit", {"repo": "org/name", "commit": "zzz"}, False),
      ("bad lang", {"repo": "o/n", "commit": "a" * 40, "lang": "golang"}, False),
      ("extra stat key", {"repo": "o/n", "commit": "a" * 40, "stats": {"lines": 1, "x": 2}}, False),
      ("dup tags", {"repo": "o/n", "commit": "a" * 40, "tags": ["x", "x"]}, False)),
]


def main():
    OUT.mkdir(parents=True, exist_ok=True)
    for name, groups in CORPUS.items():
        (OUT / f"{name}.json").write_text(json.dumps(groups, indent=1))
    n = sum(len(t["tests"]) for gs in CORPUS.values() for t in gs)
    print(f"wrote {len(CORPUS)} files, {n} test cases to {OUT}")


if __name__ == "__main__":
    main()
