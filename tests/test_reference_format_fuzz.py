"""Format-validator fuzz against the COMPILED reference.

The 18 ``format`` validators are the hardest parity surface (the
reference hand-rolls ~2.5 kLoC of RFC 3339 / IPv6 / URI-template /
email / IDNA machinery); the hand corpus pins known cases, this fuzz
pushes mutated and cross-format strings through the REAL reference
validators (via ``test_reference_differential``'s build) and asserts
our predicates agree everywhere.

Documented divergences filtered out (see
``test_reference_differential._REFERENCE_DEFECT_DIVERGENCES``):

* idn-hostname / idn-email on inputs containing RTL characters — the
  reference implements NO RFC 5893 bidi rules; our validator does.
* uri-template inputs whose parse crosses the ``{}``-crash defect:
  the probe reports 'e' (uncaught exception), which is skipped and
  counted, never treated as a verdict.
* hostname labels starting ``xn--`` whose remainder contains non-LDH
  characters: the reference's ``Punycode.decodeDigit`` is missing its
  lower-bound guards (``Punycode.java:97-102`` — any codepoint below
  '0' hits the first branch, '@'..'`' return NEGATIVE digits), so
  garbage A-labels "decode" and may validate; our strict RFC 3492
  decode rejects them.
"""

from __future__ import annotations

import json
import random
import re
import unicodedata

import pytest

from json_schema_spark.functions.formats import FORMAT_VALIDATORS

# reuse the skip conditions; the shared session-scoped `ref`
# probe fixture lives in conftest.py
from tests.test_reference_differential import (  # noqa: F401
    JACKSON,
    pytestmark,
)

SEEDS: dict[str, list[str]] = {
    "date": ["2024-02-29", "2023-02-29", "2024-13-01", "0000-01-01"],
    "time": ["23:59:60Z", "12:00:00+05:30", "12:00:00", "24:00:00Z",
             # round-4 fresh-seed finds: BigDecimal seconds run
             "23:59:0Z", "23:59:6Z", "23:59:000Z", "23:59:0.5Z",
             "23:59:.5Z", "23:59:5.Z", "23:59:60.9Z", "23:59:..5Z"],
    "date-time": ["2024-01-02T12:34:56.789Z", "2024-01-02t12:34:56z",
                  "2024-01-02 12:34:56Z"],
    "duration": ["P1Y2M3DT4H5M6S", "PT0.5S", "P", "PT", "P1W", "P1Y1W"],
    "uuid": ["6ba7b810-9dad-11d1-80b4-00c04fd430c8",
             "6BA7B810-9DAD-11D1-80B4-00C04FD430C8"],
    "ipv4": ["192.168.0.1", "255.255.255.255", "256.1.1.1", "01.1.1.1"],
    "ipv6": ["::1", "fe80::1%eth0", "::ffff:192.0.2.1", "1:2:3:4:5:6:7:8",
             "1::2::3", "[::1]",
             # round-4 fresh-seed finds: the gist parser's 4+(-1) bug
             "::fffbf:192.0.2.1", "::f%fff:192.0.2.1", "::_fff:192.0.2.1",
             "1:2:3:fffbf:192.0.2.1", "::1:2:3:4:5:6:7:192.0.2.1", ":::"],
    "uri": ["https://example.com/a?b=c#d", "urn:isbn:0451450523",
            "//missing.scheme", "http://[v7.host]/"],
    "uri-reference": ["/relative/path", "#frag", "?q=1", "a:b"],
    "iri": ["https://exämple.com/päth", "https://例え.jp/"],
    "iri-reference": ["/päth", "#früg"],
    "uri-template": ["http://x.org/{var}", "{/list*}", "{?q,n}",
                     "{+path:6}", "http://x.org/{var"],
    "json-pointer": ["", "/a/b", "/a~0b", "/a~1b", "/a~2b", "a/b"],
    "relative-json-pointer": ["0", "1/a", "0#", "01/a", "-1/a"],
    "regex": ["a+b", "[a-", "(?=x)", "a{1,2}",
              # round-4 fresh-seed finds: unclosed union, non-ASCII
              # quantifier digit, non-ASCII literal escape
              "[[a-", "a{1,2٣}", "\"a\\٣b\"@example.com",
              "[[a-z][0-9]]", "\\é", "a{2,1}", "{2,1}",
              # round-4 reference probes: compile-time-unchecked
              # backrefs, dash-range and union/intersection content
              "\\9", "(a)\\2", "\\10", "(a)(b)\\12", "[a--]", "[!--]",
              "[--/]", "[[a--][0-9]]", "[[a-z][b-a]]", "[a-[b]]",
              "[a&&0-/]", "[a&&b", "[[a-z][0-9]][", "[---]", "[\\--a]"],
    "email": ["a@example.com", "a.b+c@ex.co", "\"quoted\"@example.com",
              "a@[127.0.0.1]", "a@b", "a..b@example.com",
              "\"a b\"@example.com", "\"a\\\"b\"@example.com", ".a@example.com",
              "a.@example.com", "a@example.co1", "a@example.c",
              "a@exa_mple.com", "a@-example.com", "a@example-.com",
              "a@[IPv6:::1]", "a@[IPv6:::]", "a@[IPv6:1::]",
              "a@[IPv6:٣::1]", "a@[IPv6:+fff::1]", "a@[300.1.1.1]", "a!#$%&'*+-/=?^_`{|}~z@example.com",
              "a@" + "b" * 64 + ".com", "a@example..com", "a b@example.com"],
    "idn-email": ["üser@exämple.com", "user@例え.jp", "user@xn--r8jz45g.jp",
                  "üser@-bad.de", "user@例え..jp"],
    "hostname": ["example.com", "a-b.c", "-ab.c", "ab-.c", "a" * 63 + ".c",
                 "a" * 64 + ".c", "xn--nxasmq6b.example", "a.b-", "a..b",
                 "a.123", "1.2.3.4", "a.com.", "xn--a.example",
                 ("a." * 126) + "a", ("a." * 127) + "a"],
    "idn-hostname": ["example.com", "bücher.de", "実例.jp", "xn--bcher-kva.de",
                     "xn--a.de", "a·b.de", "ぁ‌ぃ.jp", "۰۱.ir", "٠١.eg",
                     "০১.bd", "χρόνος.gr", "a‍b.de", "ل‌ا.ir"],
}

_ALPHABET = list("abzAZ09.-:/@%+{}[]~_") + ["é", "٣", "実", "‍", " ", ""]


def _mutate(rng: random.Random, s: str) -> str:
    if not s:
        return rng.choice(_ALPHABET)
    op = rng.randrange(5)
    i = rng.randrange(len(s))
    if op == 0:
        return s[:i] + rng.choice(_ALPHABET) + s[i:]
    if op == 1:
        return s[:i] + s[i + 1:]
    if op == 2:
        return s[:i] + rng.choice(_ALPHABET) + s[i + 1:]
    if op == 3:
        return s.upper() if rng.random() < 0.5 else s.lower()
    return s + rng.choice(_ALPHABET)


def _garbage_alabel(s: str) -> bool:
    """A label routed into the reference's buggy Punycode decode: it
    starts xn-- but carries non-LDH characters."""
    for label in s.lower().split("."):
        if label.startswith("xn--") and re.search(r"[^a-z0-9-]", label[4:]):
            return True
    return False


def _has_rtl(s: str) -> bool:
    return any(unicodedata.bidirectional(c) in ("R", "AL", "AN") for c in s)


@pytest.mark.parametrize("fmt", sorted(FORMAT_VALIDATORS))
def test_format_verdicts_match_reference(ref, fmt):
    rng = random.Random(f"fmt-{fmt}")
    pool = list(SEEDS.get(fmt, []))
    # cross-pollinate with other formats' strings and mutations
    others = [s for k, v in SEEDS.items() if k != fmt for s in v]
    pool += rng.sample(others, min(20, len(others)))
    reps = 10 if fmt in ("email", "idn-email", "hostname", "idn-hostname") else 6
    for s in list(pool):
        for _ in range(reps):
            pool.append(_mutate(rng, s))
    schema = json.dumps({"format": fmt})
    cases = [(schema, json.dumps(s), "2020-12", True) for s in pool]
    got = ref(cases)
    mine = FORMAT_VALIDATORS[fmt]
    mismatches = []
    skipped = 0
    for s, g in zip(pool, got):
        if g == "e":
            skipped += 1  # reference crashed (uri-template {} defect)
            continue
        if fmt in ("idn-hostname", "idn-email") and _has_rtl(s):
            skipped += 1  # reference has no bidi rules; ours does
            continue
        if fmt in ("hostname", "idn-hostname", "email", "idn-email") \
                and _garbage_alabel(s):
            skipped += 1  # reference Punycode decodeDigit defect
            continue
        try:
            v = "t" if mine(s) else "f"
        except Exception as e:  # our validators must never throw
            mismatches.append((s, g, f"raised {e!r}"))
            continue
        if v != g:
            mismatches.append((s, g, v))
    assert not mismatches, (
        f"format {fmt!r}: {len(mismatches)}/{len(pool)} verdicts disagree "
        f"with the compiled reference; first 10: {mismatches[:10]}")
    assert skipped <= len(pool) * 0.5
