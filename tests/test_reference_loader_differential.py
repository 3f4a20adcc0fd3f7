"""Remote-$ref loader differential: the reference's HttpLoader and our
loader chain resolving the SAME localhost fixture server (the analogue
of the reference's own ``compilers/TestServer.java`` setup), with
verdicts compared end to end — redirects, nested remote refs, remote
documents whose ``$id`` differs from their URL, and fragment refs into
remote documents.
"""

from __future__ import annotations

import http.server
import json
import threading

import pytest

from json_schema_spark.core.validator import compile_schema

# reuse the skip conditions; the shared session-scoped `ref`
# probe fixture lives in conftest.py
from tests.test_reference_differential import (  # noqa: F401
    JACKSON,
    pytestmark,
)

DOCS = {
    "/nonneg.json": {"type": "integer", "minimum": 0},
    "/name.json": {"type": "string", "minLength": 2},
    # nested remote ref (relative to the document's URL)
    "/outer.json": {"properties": {"n": {"$ref": "nonneg.json"}}},
    # $id different from the serving URL
    "/aliased.json": {"$id": "https://example.invalid/real-id",
                      "type": "boolean"},
    # fragment target inside a remote document
    "/defs.json": {"$defs": {"pos": {"type": "integer",
                                     "exclusiveMinimum": 0}}},
}


class _Handler(http.server.BaseHTTPRequestHandler):
    def do_GET(self):
        if self.path == "/redirect.json":
            self.send_response(301)
            self.send_header("Location", "/nonneg.json")
            self.end_headers()
            return
        doc = DOCS.get(self.path)
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

    def log_message(self, *a):
        pass


@pytest.fixture(scope="module")
def server():
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _cases(base):
    return [
        ({"$ref": f"{base}/nonneg.json"}, [3, -1, "x"]),
        ({"properties": {"a": {"$ref": f"{base}/name.json"}}},
         [{"a": "ok"}, {"a": "x"}, {"a": 5}, {}]),
        ({"$ref": f"{base}/outer.json"}, [{"n": 1}, {"n": -2}, {"n": "s"}]),
        ({"$ref": f"{base}/redirect.json"}, [2, -2]),
        ({"$ref": f"{base}/aliased.json"}, [True, 1, "x"]),
        ({"$ref": f"{base}/defs.json#/$defs/pos"}, [1, 0, -1]),
        ({"allOf": [{"$ref": f"{base}/nonneg.json"},
                    {"$ref": f"{base}/defs.json#/$defs/pos"}]}, [1, 0]),
    ]


def test_remote_ref_verdicts_match_reference(ref, server):
    flat = []
    for schema, docs in _cases(server):
        for d in docs:
            flat.append((json.dumps(schema), json.dumps(d), "2020-12", False))
    got = ref(flat)
    mismatches = []
    i = 0
    for schema, docs in _cases(server):
        kernel = compile_schema(schema, dialect="2020-12")
        for d in docs:
            g = got[i]
            i += 1
            mine = "t" if kernel.is_valid(d) else "f"
            if g != mine:
                mismatches.append((schema, d, g, mine))
    assert not mismatches, f"loader differential: {mismatches}"


def test_missing_remote_rejected_both_sides(ref, server):
    schema = json.dumps({"$ref": f"{server}/absent.json"})
    assert ref([(schema, "1", "2020-12", False)]) == ["c"]
    with pytest.raises(Exception):
        compile_schema(json.loads(schema)).is_valid(1)
