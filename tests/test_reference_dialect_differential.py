"""Custom meta-schema / $vocabulary differential: both engines resolve
an UNKNOWN ``$schema`` URI from the same localhost server and must
agree on the resulting dialect behavior — which keyword vocabularies
apply, the 2020-12 format-assertion vocabulary switch, and the
compile-time rejection of unknown REQUIRED vocabularies
(``DialectResolver.java:53-79`` / ``tryApplyVocabularies``).
"""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from json_schema_spark.core.validator import SchemaCompileError, compile_schema

from tests.test_reference_differential import (  # noqa: F401
    JACKSON,
    pytestmark,
)

V2020 = "https://json-schema.org/draft/2020-12"
META_DOCS: dict[str, dict] = {}


def _meta(path: str, vocab: dict) -> str:
    META_DOCS[path] = {
        "$schema": f"{V2020}/schema",
        "$id": f"__BASE__{path}",
        "$vocabulary": vocab,
        "$dynamicAnchor": "meta",
        "allOf": [{"$ref": f"{V2020}/meta/core"}],
    }
    return path


CORE = f"{V2020}/vocab/core"
VALIDATION = f"{V2020}/vocab/validation"
APPLICATOR = f"{V2020}/vocab/applicator"
FMT_ASSERT = f"{V2020}/vocab/format-assertion"
FMT_ANNOT = f"{V2020}/vocab/format-annotation"

_meta("/meta_full.json", {CORE: True, VALIDATION: True, APPLICATOR: True})
_meta("/meta_fmt_assert.json",
      {CORE: True, VALIDATION: True, FMT_ASSERT: True})
_meta("/meta_unknown_required.json",
      {CORE: True, "https://example.invalid/vocab/custom": True})
_meta("/meta_unknown_optional.json",
      {CORE: True, VALIDATION: True,
       "https://example.invalid/vocab/custom": False})


class _Handler(http.server.BaseHTTPRequestHandler):
    base = ""

    def do_GET(self):
        doc = META_DOCS.get(self.path)
        if doc is None:
            self.send_response(404)
            self.end_headers()
            return
        body = json.dumps(doc).replace("__BASE__", self.base).encode()
        self.send_response(200)
        self.send_header("Content-Type", "application/json")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    _Handler.base = f"http://127.0.0.1:{srv.server_address[1]}"
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield _Handler.base
    srv.shutdown()


def test_custom_meta_dialects_agree(ref, server):
    cases = [
        # validation vocab enabled: minimum asserts
        ({"$schema": f"{server}/meta_full.json", "minimum": 3}, [5, 1]),
        # format-assertion vocabulary via custom meta: format asserts
        # WITHOUT setFormatAssertionsEnabled
        ({"$schema": f"{server}/meta_fmt_assert.json",
          "format": "ipv4"}, ["10.0.0.1", "999.0.0.1"]),
        # full meta without format-assertion: format is annotation-only
        ({"$schema": f"{server}/meta_full.json",
          "format": "ipv4"}, ["999.0.0.1"]),
        # unknown vocab marked OPTIONAL (false): compiles, validation on
        ({"$schema": f"{server}/meta_unknown_optional.json",
          "minimum": 3}, [5, 1]),
    ]
    flat = [(json.dumps(s), json.dumps(d), "2020-12", False)
            for s, docs in cases for d in docs]
    got = ref(flat)
    mismatches = []
    i = 0
    for schema, docs in cases:
        kernel = compile_schema(schema, dialect="2020-12")
        for d in docs:
            mine = "t" if kernel.is_valid(d) else "f"
            if got[i] != mine:
                mismatches.append((schema, d, got[i], mine))
            i += 1
    assert not mismatches, f"dialect differential: {mismatches}"


def test_unknown_required_vocabulary_rejected_both_sides(ref, server):
    schema = {"$schema": f"{server}/meta_unknown_required.json", "minimum": 3}
    assert ref([(json.dumps(schema), "1", "2020-12", False)]) == ["c"]
    with pytest.raises(SchemaCompileError):
        compile_schema(schema, dialect="2020-12")
