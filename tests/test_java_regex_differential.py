"""Differential fuzz: the kernel's Java-dialect regex bridge vs REAL
java.util.regex.

The reference compiles every schema ``pattern`` with
``UNICODE_CASE | UNICODE_CHARACTER_CLASS`` and evaluates it with
``find()`` (``common/regex/RegexFactory.java:19-22``); the kernel
translates that dialect into Python ``re`` via
``json_schema_spark.functions.java_regex``. A JVM ships with Spark, so
instead of trusting the translation we generate (pattern, input) cases
from a grammar spanning the translated constructs — ``\\p{...}``
classes from the vendored JVM tables, ``\\w \\s \\b`` (whose Java sets
differ from Python's), ``\\Q...\\E``, ``\\h \\v \\R``, possessive and
atomic groups, named groups/backrefs, scoped flag groups, anchors over
all five Java line terminators, normalized character classes with
dashes — and assert verdict equality against an actual JVM probe
(``tests/javadiff/RegexProbe.java``), batched through one process.

Tier contracts are asserted too: a :class:`JavaRegexError` from the
bridge means the JVM must also refuse to compile; a
:class:`JavaOnlyRegex` means the JVM MUST compile it (the construct is
valid Java that only the Python kernel cannot express).
"""

from __future__ import annotations

import base64
import os
import random
import re
import shutil
import subprocess

import pytest

from json_schema_spark.functions.java_regex import (
    JavaOnlyRegex,
    JavaRegexError,
    java_dialect_rewrite,
)

JAVA_HOME = os.environ.get("JAVA_HOME", "")
JAVAC = shutil.which("javac") or os.path.join(JAVA_HOME, "bin", "javac")
JAVA = shutil.which("java") or os.path.join(JAVA_HOME, "bin", "java")
HERE = os.path.dirname(__file__)

pytestmark = pytest.mark.skipif(
    not (JAVAC and os.path.exists(JAVAC) and JAVA and os.path.exists(JAVA)),
    reason="no JDK available",
)

TERMINATORS = ["\n", "\r", "\r\n", "\x85", " ", " "]
# ٣ = ARABIC-INDIC THREE (a Unicode \d), é for case/word classes,
# U+0301 combining mark / U+200D ZWJ (Java \w members, Python \w not),
# U+001C (Python \s member, Java \s not), U+1F600 (astral), Greek α
LITERALS = list("abcx01") + ["٣", "é", "α", "\U0001F600"]
EXOTICS = ["́", "‍", "\x1c", "\xa0", "　"]
SAFE_INPUT_CHARS = LITERALS + EXOTICS + list("B C.-$_&"), ["\t"]
SAFE_INPUT_CHARS = SAFE_INPUT_CHARS[0] + SAFE_INPUT_CHARS[1]

P_NAMES = [
    "L", "Lu", "Ll", "N", "Nd", "P", "S", "Zs", "M", "Mn", "C",
    "Alpha", "alpha", "ALPHA", "Digit", "Punct", "Space", "XDigit",
    "IsAlphabetic", "IsWhite_Space", "IsWhiteSpace", "IsLetter",
    "IsGreek", "Isgrek", "IsArabic", "IsCommon", "IsLatin",
    "InBasicLatin", "InBasic_Latin", "InGreek", "InArabic",
    "gc=Lu", "gc=Nd", "sc=Greek", "sc=greek", "script=LATIN",
    "blk=Basic_Latin", "block=basic latin", "all",
    "javaLowerCase", "javaWhitespace",
]

CLASS_ESCAPES = [r"\d", r"\D", r"\w", r"\W", r"\s", r"\S"]


def _gen_atom(rng: random.Random) -> str:
    kind = rng.randrange(14)
    if kind < 4:
        return rng.choice(LITERALS)
    if kind == 4:
        return rng.choice(CLASS_ESCAPES)
    if kind == 5:
        return "."
    if kind == 6:
        return _gen_class(rng)
    if kind == 7:
        return rng.choice([r"\.", r"\$", r"\\", r"\n", r"\t", r"\x41",
                           r"a", r"\cI", r"\01", r"\e", r"\x{1f600}"])
    if kind == 8:
        return f"(?:{_gen_seq(rng, 2)})"
    if kind == 9:
        return f"({_gen_seq(rng, 2)})"
    if kind == 10:
        return "\\p{%s}" % rng.choice(P_NAMES) if rng.random() < 0.8 \
            else "\\P{%s}" % rng.choice(P_NAMES)
    if kind == 11:
        return rng.choice([r"\h", r"\H", r"\v", r"\V", r"\R", r"\b", r"\B"])
    if kind == 12:
        content = "".join(rng.choice(SAFE_INPUT_CHARS)
                          for _ in range(rng.randrange(0, 4)))
        return f"\\Q{content}\\E"
    flags = rng.choice(["i", "s", "m", "i-s", "im", "-i", "sU"])
    return f"(?{flags}:{_gen_seq(rng, 2)})"


def _gen_class(rng: random.Random) -> str:
    neg = "^" if rng.random() < 0.3 else ""
    parts = []
    for _ in range(rng.randrange(1, 4)):
        r = rng.random()
        if r < 0.35:
            parts.append(rng.choice("abcx01٣éα$._&"))
        elif r < 0.55:
            parts.append(rng.choice(["a-d", "0-4", "x-z", "\\u0300-\\u0310"]))
        elif r < 0.75:
            parts.append(rng.choice(CLASS_ESCAPES + [r"\h", r"\v"]))
        elif r < 0.9:
            parts.append("\\p{%s}" % rng.choice(P_NAMES))
        else:
            parts.append(rng.choice(["-", r"\]", r"\[", r"\-", r"\\"]))
    return f"[{neg}{''.join(parts) or 'a'}]"


def _gen_seq(rng: random.Random, max_atoms: int = 4) -> str:
    parts = []
    for _ in range(rng.randrange(1, max_atoms + 1)):
        a = _gen_atom(rng)
        q = rng.random()
        if q < 0.3 and not a.startswith("(?") and a not in (r"\b", r"\B"):
            a += rng.choice(["*", "+", "?", "{1,2}", "{0,1}",
                             "*+", "++", "?+", "*?", "{1,2}+"])
        parts.append(a)
    if rng.random() < 0.2:
        return "|".join(["".join(parts), _gen_atom(rng)])
    return "".join(parts)


def _gen_pattern(rng: random.Random) -> str:
    flags = rng.choice(["", "", "", "(?i)", "(?s)", "(?m)", "(?im)",
                        "(?is)", "(?U)", "(?ms)"])
    body = _gen_seq(rng)
    if rng.random() < 0.1:
        body = f"(?<n{rng.randrange(3)}>{body})"
    if rng.random() < 0.05:
        body = f"(?>{body})"
    if rng.random() < 0.4:
        body = "^" + body
    if rng.random() < 0.4:
        body += rng.choice(["$", r"\Z", r"\z"])
    return flags + body


def _gen_input(rng: random.Random) -> str:
    n = rng.randrange(0, 8)
    s = "".join(rng.choice(SAFE_INPUT_CHARS) for _ in range(n))
    r = rng.random()
    if r < 0.35:
        # tail terminator — the anchor semantics hot spot
        s += rng.choice(TERMINATORS)
    elif r < 0.5 and n > 1:
        k = rng.randrange(1, n)
        s = s[:k] + rng.choice(TERMINATORS) + s[k:]
    return s


def _cases(seed: int, n: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        pat = _gen_pattern(rng)
        for _ in range(3):
            out.append((pat, _gen_input(rng)))
    return out[:n]


@pytest.fixture(scope="module")
def probe(tmp_path_factory):
    d = tmp_path_factory.mktemp("javadiff")
    src = os.path.join(HERE, "javadiff", "RegexProbe.java")
    subprocess.run([JAVAC, "-d", str(d), src], check=True, capture_output=True)

    def run(cases: list[tuple[str, str]]) -> list[str]:
        payload = "\n".join(
            base64.b64encode(p.encode()).decode() + "\t"
            + base64.b64encode(s.encode()).decode()
            for p, s in cases)
        r = subprocess.run(
            [JAVA, "-cp", str(d), "RegexProbe"], input=payload + "\n",
            capture_output=True, text=True, check=True)
        return r.stdout.split()

    return run


@pytest.mark.parametrize("seed", [7, 101, 20260817])
def test_kernel_agrees_with_real_jvm(probe, seed):
    cases = _cases(seed, 4000)
    java = probe(cases)
    assert len(java) == len(cases)
    mismatches = []
    rejected = java_only = 0
    for (pat, s), jv in zip(cases, java):
        try:
            rx = re.compile(java_dialect_rewrite(pat))
        except JavaRegexError:
            rejected += 1
            if jv != "e":
                mismatches.append((pat, s, "java-compiles", "bridge-rejects"))
            continue
        except JavaOnlyRegex:
            java_only += 1
            if jv == "e":
                mismatches.append((pat, s, "java-compile-error", "bridge-says-java-only"))
            continue
        except re.error:
            # the translated pattern must compile unless Java also
            # rejects (e.g. a bad backref surviving translation)
            if jv != "e":
                mismatches.append((pat, s, "java-compiles", "py-re-error"))
            continue
        if jv == "e":
            mismatches.append((pat, s, "java-compile-error", "py-ok"))
            continue
        pv = "t" if rx.search(s) else "f"
        if pv != jv:
            mismatches.append((pat, s, jv, pv))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} mismatches vs the JVM; "
        f"first 10: {mismatches[:10]}")
    # the grammar should mostly generate translatable patterns — a high
    # reject rate would mean the fuzz silently stopped testing verdicts
    assert rejected < len(cases) * 0.05
    assert java_only < len(cases) * 0.30


def test_p_class_tables_match_jvm_spot(probe):
    """Boundary spot-check: for a sample of \\p names, probe the JVM at
    range edges of the vendored tables (start, end, and just outside)."""
    from json_schema_spark.functions.java_regex import _resolve_p, _tables

    names = ["L", "Nd", "Alpha", "IsGreek", "IsWhite_Space",
             "InBasicLatin", "sc=Latin", "Zs", "Po", "javaWhitespace"]
    cases = []
    expected = []
    for name in names:
        ranges = _tables()[_resolve_p(name)]
        sample = list(ranges[:5]) + list(ranges[-5:])
        for s, e in sample:
            for cp, want in ((s, True), (e, True), (s - 1, None), (e + 1, None)):
                if not (0 <= cp <= 0x10FFFF) or 0xD800 <= cp <= 0xDFFF:
                    continue
                inside = any(lo <= cp <= hi for lo, hi in ranges)
                cases.append(("\\p{%s}" % name, chr(cp)))
                expected.append("t" if (want if want is not None else inside) else "f")
    got = probe(cases)
    bad = [(c, e, g) for c, e, g in zip(cases, expected, got) if e != g]
    assert not bad, f"{len(bad)} table/JVM disagreements; first 5: {bad[:5]}"
