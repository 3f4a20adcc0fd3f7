"""Embedded official JSON Schema meta-schemas (drafts 7 / 2019-09 /
2020-12 plus their vocabulary subschemas), shipped as package data so
spec ``$ref``s and ``$schema`` URIs resolve with zero network I/O —
the Spark analogue of the reference's ``OriginalSpecResolver``
(``loaders/OriginalSpecResolver.java:43-79``, which serves the same
documents from an embedded ``dialects.zip`` resource).

The documents are the official json-schema.org meta-schemas (public
spec artifacts, vendored verbatim from the ``jsonschema-specifications``
distribution). Both the ``http://`` and ``https://`` forms of each
``$id`` are registered — schemas in the wild use either.
"""

from __future__ import annotations

import json
from importlib import resources
from typing import Any

__all__ = ["embedded_metaschemas"]

_cache: dict[str, Any] | None = None


def _strip_fragment(uri: str) -> str:
    return uri.split("#", 1)[0]


def embedded_metaschemas() -> dict[str, Any]:
    """URI (fragment-stripped, both http/https forms) -> parsed doc."""
    global _cache
    if _cache is None:
        out: dict[str, Any] = {}
        pkg = resources.files(__name__)
        for entry in pkg.iterdir():
            if not entry.name.endswith(".json"):
                continue
            doc = json.loads(entry.read_text())
            uri = _strip_fragment(doc["$id"])
            out[uri] = doc
            if uri.startswith("https://"):
                out["http://" + uri[len("https://"):]] = doc
            elif uri.startswith("http://"):
                out["https://" + uri[len("http://"):]] = doc
        _cache = out
    return _cache
