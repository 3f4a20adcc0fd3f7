"""Loader chain, embedded meta-schemas, and $vocabulary enforcement.

Mirrors the reference's resource-loading surface: scheme-dispatched
loaders with user overrides (``loaders/BaseResourceLoader.java:22-60``),
``FileLoader``/``HttpLoader`` (``loaders/FileLoader.java:1-38``,
``HttpLoader.java:18-76`` — exercised against a localhost fixture
server like ``compilers/TestServer.java:1-51``), offline resolution of
the official spec meta-schemas (``loaders/OriginalSpecResolverTest``),
and dialect/vocabulary resolution incl. unknown-required-vocabulary
compile errors (``dialects/DialectResolver.java:53-79``).
"""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from json_schema_spark.core.registry import (
    SchemaDialectError,
    SchemaRegistry,
    SchemaResolutionError,
)
from json_schema_spark.core.validator import compile_schema
from json_schema_spark.metaschemas import embedded_metaschemas
from json_schema_spark.sources.loaders import ResourceLoaderChain, file_loader


# ------------------------------------------------- embedded meta-schemas

DRAFT7_META = "http://json-schema.org/draft-07/schema#"
DRAFT2019_META = "https://json-schema.org/draft/2019-09/schema"
DRAFT2020_META = "https://json-schema.org/draft/2020-12/schema"


def test_embedded_metaschemas_present():
    m = embedded_metaschemas()
    for uri in (
        "http://json-schema.org/draft-07/schema",
        "https://json-schema.org/draft-07/schema",
        "https://json-schema.org/draft/2019-09/schema",
        "https://json-schema.org/draft/2020-12/schema",
        "https://json-schema.org/draft/2020-12/meta/core",
        "https://json-schema.org/draft/2019-09/meta/validation",
    ):
        assert uri in m, uri


@pytest.mark.parametrize("meta", [DRAFT7_META, DRAFT2019_META, DRAFT2020_META])
def test_ref_to_spec_metaschema_resolves_offline(meta):
    """Validating schemas-as-data: $ref to the official meta-schema must
    compile with zero network I/O (OriginalSpecResolver parity)."""
    c = compile_schema({"$ref": meta})
    assert c.is_valid({"type": "string"})
    assert c.is_valid(True)
    assert not c.is_valid({"type": 123})  # type must be (list of) strings
    assert not c.is_valid({"properties": 5})


def test_schema_keyword_official_meta_needs_no_loader():
    c = compile_schema(
        {"$schema": "https://json-schema.org/draft/2020-12/schema", "minimum": 3}
    )
    assert c.is_valid(4) and not c.is_valid(2)


# ----------------------------------------------------------- file loader

def test_file_loader_ref(tmp_path):
    remote = tmp_path / "nonneg.json"
    remote.write_text(json.dumps({"type": "integer", "minimum": 0}))
    uri = remote.as_uri()
    schema = {"properties": {"n": {"$ref": uri}}}
    c = compile_schema(schema)
    assert c.is_valid({"n": 3})
    assert not c.is_valid({"n": -1})
    assert not c.is_valid({"n": "x"})


def test_file_loader_parses(tmp_path):
    f = tmp_path / "s.json"
    f.write_text('{"type": "string"}')
    assert file_loader(f.as_uri()) == {"type": "string"}


# ----------------------------------------------------------- http loader

class _Fixture(http.server.BaseHTTPRequestHandler):
    DOCS = {
        "/nonneg.json": {"type": "integer", "minimum": 0},
        "/folder/name.json": {"type": "string", "minLength": 2},
    }

    def do_GET(self):
        doc = self.DOCS.get(self.path)
        if doc is None:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(doc).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):  # quiet
        pass


@pytest.fixture(scope="module")
def fixture_server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Fixture)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_http_loader_ref(fixture_server):
    schema = {
        "properties": {
            "n": {"$ref": f"{fixture_server}/nonneg.json"},
            "name": {"$ref": f"{fixture_server}/folder/name.json"},
        }
    }
    c = compile_schema(schema)
    assert c.is_valid({"n": 1, "name": "ok"})
    assert not c.is_valid({"n": -2})
    assert not c.is_valid({"name": "x"})


def test_http_loader_missing_raises(fixture_server):
    with pytest.raises(SchemaResolutionError):
        compile_schema({"$ref": f"{fixture_server}/absent.json"}).is_valid(1)


# -------------------------------------------------------- scheme dispatch

def test_user_loader_overrides_builtin_scheme(fixture_server):
    served: list[str] = []

    def my_http(uri: str):
        served.append(uri)
        return {"const": 42}

    reg = SchemaRegistry(loaders={"http": my_http})
    c = compile_schema({"$ref": f"{fixture_server}/nonneg.json"}, registry=reg)
    assert c.is_valid(42) and not c.is_valid(-1)
    assert served  # user loader intercepted the http scheme


def test_catch_all_loader_first():
    chain = ResourceLoaderChain(
        user_loaders={"myscheme": lambda u: {"const": "scheme"}},
        catch_all=lambda u: {"const": "catch"} if "hit" in u else None,
    )
    assert chain("myscheme://hit")["const"] == "catch"
    assert chain("myscheme://other")["const"] == "scheme"
    assert chain("nowhere://x") is None


def test_chain_falls_back_to_embedded():
    chain = ResourceLoaderChain()
    doc = chain("https://json-schema.org/draft/2020-12/meta/core")
    assert doc and "$vocabulary" in doc


# ------------------------------------------------- $vocabulary handling

VOCAB_2020 = "https://json-schema.org/draft/2020-12/vocab"


def _meta(vocab: dict, uri: str = "urn:test:meta") -> dict:
    return {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": uri,
        "$vocabulary": vocab,
    }


def test_unknown_required_vocabulary_is_compile_error():
    reg = SchemaRegistry()
    reg.add(_meta({f"{VOCAB_2020}/core": True, "urn:test:made-up-vocab": True}))
    with pytest.raises(SchemaDialectError):
        reg.add({"$schema": "urn:test:meta", "type": "string"})


def test_unknown_optional_vocabulary_is_fine():
    reg = SchemaRegistry()
    reg.add(_meta({f"{VOCAB_2020}/core": True, "urn:test:made-up-vocab": False}))
    c = compile_schema({"$schema": "urn:test:meta", "minimum": 5}, registry=reg)
    assert c.is_valid(6) and not c.is_valid(1)


def test_custom_meta_sets_dialect_generation():
    """A custom meta built on 2019-09 vocabularies selects the 2019-09
    keyword set (tuple `items`, no prefixItems)."""
    reg = SchemaRegistry()
    reg.add({
        "$schema": "https://json-schema.org/draft/2019-09/schema",
        "$id": "urn:test:meta2019",
        "$vocabulary": {
            "https://json-schema.org/draft/2019-09/vocab/core": True,
            "https://json-schema.org/draft/2019-09/vocab/validation": True,
            "https://json-schema.org/draft/2019-09/vocab/applicator": True,
        },
    })
    schema = {
        "$schema": "urn:test:meta2019",
        "items": [{"const": 1}, {"const": 2}],  # array form only pre-2020
    }
    c = compile_schema(schema, registry=reg)
    assert c.is_valid([1, 2]) and not c.is_valid([2, 1])


def test_format_assertion_vocabulary_turns_assertions_on():
    reg = SchemaRegistry()
    reg.add(_meta({
        f"{VOCAB_2020}/core": True,
        f"{VOCAB_2020}/format-assertion": True,
    }, uri="urn:test:meta-fa"))
    schema = {"$schema": "urn:test:meta-fa", "format": "ipv4"}
    c = compile_schema(schema, registry=reg)
    assert c.is_valid("127.0.0.1")
    assert not c.is_valid("999.1.1.1")
    # without the vocabulary, format stays annotation-only
    base = compile_schema({"$schema": DRAFT2020_META, "format": "ipv4"})
    assert base.is_valid("999.1.1.1")


def test_format_assertion_false_still_asserts():
    """Declaring the format-assertion vocabulary with `false` still
    means the dialect performs assertion (the value marks whether
    support is required of the implementation, not whether to assert)."""
    reg = SchemaRegistry()
    reg.add(_meta({
        f"{VOCAB_2020}/core": True,
        f"{VOCAB_2020}/format-assertion": False,
    }, uri="urn:test:meta-fa2"))
    c = compile_schema({"$schema": "urn:test:meta-fa2", "format": "uuid"}, registry=reg)
    assert not c.is_valid("not-a-uuid")


def test_spark_validator_honors_format_assertion_meta(spark):
    from pyspark.sql import functions as F

    from json_schema_spark.plans.runner import SparkValidator

    reg = SchemaRegistry()
    reg.add(_meta({
        f"{VOCAB_2020}/core": True,
        f"{VOCAB_2020}/format-assertion": True,
    }, uri="urn:test:meta-fa3"))
    v = SparkValidator(
        {"$schema": "urn:test:meta-fa3",
         "properties": {"ip": {"format": "ipv4"}}},
        registry=reg,
    )
    df = spark.createDataFrame(
        [('{"ip": "10.0.0.1"}',), ('{"ip": "999.0.0.1"}',)], "doc string"
    )
    out = v.apply_json(df, "doc", with_violations=False).orderBy("doc")
    got = [r["valid"] for r in out.select("valid").collect()]
    assert got == [True, False]


def test_spark_path_with_remote_loaded_ref(spark, fixture_server):
    """A schema whose $ref was fetched through the loader chain at
    driver-compile time must validate through BOTH Spark engines — the
    resolved resource rides to executors inside the registry docs."""
    import json as _json

    from pyspark.sql import functions as F

    from json_schema_spark.plans.runner import SparkValidator

    schema = {"properties": {"n": {"$ref": f"{fixture_server}/nonneg.json"}},
              "required": ["n"]}
    docs = [{"n": 5}, {"n": -3}, {"x": 1}]
    df = spark.createDataFrame(
        [(i, _json.dumps(d)) for i, d in enumerate(docs)], "i int, doc string"
    )
    for engine in ("expr", "udf"):
        v = SparkValidator(schema, dialect="2020-12", engine=engine)
        out = v.apply_json(df, "doc", with_violations=False).orderBy("i")
        assert [r["valid"] for r in out.collect()] == [True, False, False], engine
