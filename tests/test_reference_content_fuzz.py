"""Content-vocabulary fuzz against the COMPILED reference: draft-7
asserts contentEncoding/contentMediaType by default, so mutated
payloads through ``{"contentEncoding": ...}`` / ``{"contentMediaType":
"application/json"}`` schemas must produce identical verdicts.

quoted-printable is excluded: the reference's decoder has a verified
off-by-one (it skips the char right after '='; see
``test_reference_differential._REFERENCE_DEFECT_DIVERGENCES``) that the
engine deliberately does not replicate.
"""

from __future__ import annotations

import json
import random

import pytest

from json_schema_spark.core.validator import compile_schema

# reuse the skip conditions; the shared session-scoped `ref`
# probe fixture lives in conftest.py
from tests.test_reference_differential import (  # noqa: F401
    JACKSON,
    pytestmark,
)

B64_SEEDS = ["aGVsbG8=", "aGVsbG8", "aGVs bG8=", "aGVsbG8==", "====",
             "aGVsbG8\n", "+/+/", "-_-_", "YQ", "YQ=", "YQ==", ""]
SEVENBIT_SEEDS = ["plain ascii", "tab\there", "ümlaut", "\x7f", "\x80", ""]
JSON_SEEDS = ['{"a": 1}', "[1, 2]", "true", "null", "42", '"str"',
              "{'a': 1}", "{\"a\": 1,}", "[1 2]", "", "  ", "1 2",
              "NaN", "Infinity", "01", "+1", '{"a": 1} extra',
              '{"a": undefined}', "[1,]", '"\\x41"', '"\\u00e9"']

_ALPHABET = list("AZaz09+/=_- .,:{}[]\"'\\") + ["é", "\x00", "\n"]


def _mutate(rng: random.Random, s: str) -> str:
    if not s:
        return rng.choice(_ALPHABET)
    op = rng.randrange(4)
    i = rng.randrange(len(s))
    if op == 0:
        return s[:i] + rng.choice(_ALPHABET) + s[i:]
    if op == 1:
        return s[:i] + s[i + 1:]
    if op == 2:
        return s[:i] + rng.choice(_ALPHABET) + s[i + 1:]
    return s + rng.choice(_ALPHABET)


CASES = [
    ("base64", {"contentEncoding": "base64"}, B64_SEEDS),
    ("7bit", {"contentEncoding": "7bit"}, SEVENBIT_SEEDS),
    ("json", {"contentMediaType": "application/json"}, JSON_SEEDS),
    ("b64+json", {"contentEncoding": "base64",
                  "contentMediaType": "application/json"},
     B64_SEEDS + ["eyJhIjogMX0=", "bm90IGpzb24="]),
]


@pytest.mark.parametrize("name,schema,seeds", CASES,
                         ids=[c[0] for c in CASES])
def test_content_verdicts_match_reference(ref, name, schema, seeds):
    rng = random.Random(f"content-{name}")
    pool = list(seeds)
    for s in list(pool):
        for _ in range(8):
            pool.append(_mutate(rng, s))
    sj = json.dumps(schema)
    got = ref([(sj, json.dumps(s), "draft7", False) for s in pool])
    kernel = compile_schema(schema, dialect="draft7")
    mismatches = []
    for s, g in zip(pool, got):
        assert g in ("t", "f"), (s, g)
        mine = "t" if kernel.is_valid(s) else "f"
        if mine != g:
            mismatches.append((s, g, mine))
    assert not mismatches, (
        f"{name}: {len(mismatches)}/{len(pool)} content verdicts disagree "
        f"with the compiled reference; first 10: {mismatches[:10]}")
