"""Builder-level extension hooks, ReadmeGists-style
(``compilers/ReadmeGistsTest.java``):

* custom regex predicate factory (``SchemaBuilder.setRegexFactory`` /
  ``common/regex/RegexFactory.java:19-22``) — governs `pattern`,
  `patternProperties` and format:"regex"; the Column-expression path
  falls back to the kernel so one dialect rules every verdict;
* custom contentEncoding decoders / contentMediaType parsers
  (``SimpleContentValidationRegistry`` / ``MimeTypeValidator``,
  reference CHANGES 1.2.0);
* external resolver id→URI mapping
  (``loaders/ExternalResolversHelper.java:1-101``).
"""

from __future__ import annotations

import json

import pytest

from json_schema_spark.core.registry import SchemaRegistry
from json_schema_spark.core.validator import CompileConfig, compile_schema
from json_schema_spark.plans.runner import SparkValidator

# ------------------------------------------------------- regex factory


def _glob_factory(pattern: str):
    """A deliberately NON-regex dialect: '*' wildcards only, full match,
    and reject any pattern containing '('."""
    if "(" in pattern:
        raise ValueError("parens not supported in glob dialect")
    import fnmatch

    return lambda s: fnmatch.fnmatchcase(s, pattern)


def test_kernel_regex_factory_pattern():
    cfg = CompileConfig(dialect="draft7", regex_factory=_glob_factory)
    cs = compile_schema({"pattern": "ab*"}, config=cfg)
    assert cs.is_valid("abxyz") is True
    assert cs.is_valid("zab") is False  # glob is a full match, unlike re.search
    # default dialect (no factory): '.' etc are regex
    cs2 = compile_schema({"pattern": "ab.*"})
    assert cs2.is_valid("zab") is True


def test_kernel_regex_factory_pattern_properties_and_format():
    cfg = CompileConfig(dialect="draft7", regex_factory=_glob_factory,
                        format_assertions=True)
    cs = compile_schema(
        {"patternProperties": {"k*": {"type": "integer"}}}, config=cfg)
    assert cs.is_valid({"k1": 3}) is True
    assert cs.is_valid({"k1": "x"}) is False
    assert cs.is_valid({"zz": "x"}) is True  # name doesn't glob-match
    # format:"regex" = compilable by the ACTIVE dialect
    fs = compile_schema({"format": "regex"}, config=cfg)
    assert fs.is_valid("a*") is True
    assert fs.is_valid("a(b)") is False  # glob dialect rejects parens


def test_spark_regex_factory_forces_kernel(spark):
    from json_schema_spark.plans.compiler import ExprUnsupported

    from pyspark.sql import functions as F

    v = SparkValidator({"properties": {"s": {"pattern": "ab*"}}},
                       dialect="draft7", regex_factory=_glob_factory)
    with pytest.raises(ExprUnsupported):
        v.json_columns(F.col("doc"))  # expr path must refuse custom dialects
    rows = [(0, json.dumps({"s": "abxyz"})), (1, json.dumps({"s": "zab"}))]
    df = spark.createDataFrame(rows, "i int, doc string")
    got = {r["i"]: r["valid"] for r in v.apply_json(df, "doc").collect()}
    assert got == {0: True, 1: False}
    # typed path falls back to the kernel too
    tdf = spark.createDataFrame([("abxyz",), ("zab",)], "s string")
    got_t = [r["valid"] for r in v.apply_table(tdf).collect()]
    assert got_t == [True, False]


# ------------------------------------------------------ content codecs


def _rot13_decoder(s: str):
    import codecs

    try:
        return codecs.decode(s, "rot13").encode()
    except Exception:
        return None


def _csv_parser(text: str):
    rows = [line.split(",") for line in text.splitlines() if line]
    if not rows or any(len(r) != len(rows[0]) for r in rows):
        return None
    return rows


def test_kernel_custom_content_encoding_and_media_type():
    cfg = CompileConfig(dialect="draft7", content_mode="encoding_and_schema",
                        content_encodings={"rot13": _rot13_decoder},
                        content_media_types={"text/csv": _csv_parser})
    cs = compile_schema(
        {"contentEncoding": "rot13", "contentMediaType": "text/csv",
         "contentSchema": {"type": "array", "minItems": 2}},
        config=cfg)
    import codecs

    good = codecs.encode("a,b\nc,d", "rot13")
    ragged = codecs.encode("a,b\nc", "rot13")
    short = codecs.encode("a,b", "rot13")
    assert cs.is_valid(good) is True
    assert cs.is_valid(ragged) is False   # parser fails
    assert cs.is_valid(short) is False    # contentSchema minItems fails
    # unknown encoding stays annotation-only
    cs2 = compile_schema({"contentEncoding": "rot99"},
                         config=CompileConfig(dialect="draft7",
                                              content_mode="encoding"))
    assert cs2.is_valid("anything") is True


def test_spark_custom_content_rides_to_executors(spark):
    import codecs

    v = SparkValidator(
        {"properties": {"payload": {"contentEncoding": "rot13",
                                    "contentMediaType": "text/csv"}}},
        dialect="2019-09", content_mode="encoding",
        content_encodings={"rot13": _rot13_decoder},
        content_media_types={"text/csv": _csv_parser})
    rows = [(0, json.dumps({"payload": codecs.encode("a,b\nc,d", "rot13")})),
            (1, json.dumps({"payload": codecs.encode("a,b\nc", "rot13")}))]
    df = spark.createDataFrame(rows, "i int, doc string")
    got = {r["i"]: r["valid"] for r in v.apply_json(df, "doc").collect()}
    assert got == {0: True, 1: False}


# ------------------------------------------------------ id→URI mapping


def test_id_to_uri_mapping(tmp_path):
    target = {"$id": "https://example.test/items-schema", "type": "integer"}
    p = tmp_path / "items.json"
    p.write_text(json.dumps(target))
    reg = SchemaRegistry(default_dialect="draft7")
    reg.add_uri_mapping("https://example.test/items-schema", p.as_uri())
    cs = compile_schema(
        {"items": {"$ref": "https://example.test/items-schema"}},
        registry=reg, dialect="draft7")
    assert cs.is_valid([1, 2, 3]) is True
    assert cs.is_valid([1, "x"]) is False


def test_id_to_uri_mapping_unmapped_still_fails(tmp_path):
    from json_schema_spark.core.registry import SchemaResolutionError

    reg = SchemaRegistry(default_dialect="draft7")
    with pytest.raises(SchemaResolutionError):
        compile_schema({"items": {"$ref": "https://example.test/nowhere"}},
                       registry=reg, dialect="draft7")


def test_embedded_original_spec_toggle():
    """SchemaBuilder.allowEmbedOriginalSpec analogue
    (SchemaBuilder.java:141-147): by default a $ref to an official
    json-schema.org spec resolves from the vendored copies without
    network; with embedded_spec_enabled=False the chain returns None
    and compilation fails with a resolution error."""
    from json_schema_spark.core.registry import SchemaResolutionError

    sch = {"$ref": "https://json-schema.org/draft/2020-12/schema"}
    reg = SchemaRegistry(default_dialect="2020-12")
    reg.add(sch)
    kernel = compile_schema(sch, dialect="2020-12", registry=reg)
    assert kernel.is_valid({"type": "string"})
    assert not kernel.is_valid({"type": 12})

    reg_off = SchemaRegistry(default_dialect="2020-12",
                             embedded_spec_enabled=False)
    reg_off.add(sch)
    with pytest.raises(SchemaResolutionError):
        compile_schema(sch, dialect="2020-12", registry=reg_off)


def test_id_mapping_matched_on_raw_ref_path(tmp_path):
    """Mappings are keyed by the RAW ref path, before base resolution
    (ExternalResolversHelper.resolve(foundId) receives
    resolution.getPath() verbatim) — so a relative ref string matches a
    relative mapping key even with no absolute base in scope (where an
    unmapped relative ref is a compile error)."""
    target = {"type": "integer"}
    p = tmp_path / "rel.json"
    p.write_text(json.dumps(target))
    reg = SchemaRegistry(default_dialect="2020-12")
    reg.add_uri_mapping("local/rel-schema", p.as_uri())
    cs = compile_schema({"items": {"$ref": "local/rel-schema"}},
                        registry=reg, dialect="2020-12")
    assert cs.is_valid([1, 2]) is True
    assert cs.is_valid(["x"]) is False


def test_id_mapping_overrides_embedded_resource(tmp_path):
    """resolvePath consults the external resolver BEFORE idToHolders
    (SchemasRegistry.java:307-326): a mapping for an id wins over an
    embedded resource registered under that same id."""
    p = tmp_path / "override.json"
    p.write_text(json.dumps({"type": "string"}))
    reg = SchemaRegistry(default_dialect="2020-12")
    reg.add_uri_mapping("https://example.test/shadowed", p.as_uri())
    cs = compile_schema(
        {"$id": "https://example.test/root",
         "$defs": {"s": {"$id": "https://example.test/shadowed",
                         "type": "integer"}},
         "items": {"$ref": "https://example.test/shadowed"}},
        registry=reg, dialect="2020-12")
    assert cs.is_valid(["x"]) is True       # mapped string schema wins
    assert cs.is_valid([1]) is False        # embedded integer is shadowed


def test_id_to_schema_mapping_direct_and_with_uri():
    """mapIdToSchema / mapIdToUriAndSchema analogues
    (ExternalResolversHelper.java:33-63): a ref whose raw path equals
    the id resolves to the mapped document without loader I/O; the
    with-URI form registers the document under that location so its
    internal relative structure resolves there."""
    reg = SchemaRegistry(default_dialect="2020-12")
    reg.add_schema_mapping("urn:mapped:direct", {"type": "integer"})
    cs = compile_schema({"items": {"$ref": "urn:mapped:direct"}},
                        registry=reg, dialect="2020-12")
    assert cs.is_valid([3]) is True
    assert cs.is_valid(["x"]) is False

    reg2 = SchemaRegistry(default_dialect="2020-12")
    reg2.add_schema_mapping(
        "local/with-uri",
        {"$defs": {"n": {"type": "number"}}, "$ref": "#/$defs/n"},
        uri="https://example.test/located.json")
    cs2 = compile_schema({"items": {"$ref": "local/with-uri"}},
                         registry=reg2, dialect="2020-12")
    assert cs2.is_valid([1.5]) is True
    assert cs2.is_valid(["x"]) is False

    # one resolver per id: a later uri-mapping evicts the schema form
    reg3 = SchemaRegistry(default_dialect="2020-12")
    reg3.add_schema_mapping("urn:m", {"type": "integer"})
    reg3.add_uri_mapping("urn:m", "https://example.test/nowhere")
    assert "urn:m" not in reg3.schema_mappings
