"""Differential fuzz: the kernel's Java-dialect regex bridge vs REAL
java.util.regex.

The reference compiles every schema ``pattern`` with
``UNICODE_CASE | UNICODE_CHARACTER_CLASS`` and evaluates it with
``find()`` (``common/regex/RegexFactory.java:19-22``); the kernel
approximates that dialect in Python ``re`` via ``java_dialect_rewrite``
(anchor/dot surgery). A JVM ships with Spark, so instead of trusting
the approximation we generate a few thousand (pattern, input) cases
from a grammar restricted to the constructs the bridge claims to
handle and assert verdict equality against an actual JVM probe
(``tests/javadiff/RegexProbe.java``), batched through one process.

Known, deliberate approximation kept OUT of the grammar: patterns with
an ENABLED MULTILINE flag are passed through unrewritten, so their
``$`` honors only ``\\n`` (Python) rather than all five Java
terminators — for those the input alphabet is restricted to ``\\n``
newlines where both dialects agree.
"""

from __future__ import annotations

import base64
import os
import random
import re
import shutil
import subprocess

import pytest

from json_schema_spark.functions.formats import java_dialect_rewrite

JAVA_HOME = os.environ.get("JAVA_HOME", "")
JAVAC = shutil.which("javac") or os.path.join(JAVA_HOME, "bin", "javac")
JAVA = shutil.which("java") or os.path.join(JAVA_HOME, "bin", "java")
HERE = os.path.dirname(__file__)

pytestmark = pytest.mark.skipif(
    not (JAVAC and os.path.exists(JAVAC) and JAVA and os.path.exists(JAVA)),
    reason="no JDK available",
)

TERMINATORS = ["\n", "\r", "\r\n", "\x85", " ", " "]
# ٣ = ARABIC-INDIC THREE (a Unicode \d), é for case/word classes
LITERALS = list("abcx01") + ["٣", "é"]
SAFE_INPUT_CHARS = LITERALS + list("B C.-$").__add__(["\t"])


def _gen_atom(rng: random.Random) -> str:
    kind = rng.randrange(10)
    if kind < 4:
        return rng.choice(LITERALS)
    if kind == 4:
        return rng.choice([r"\d", r"\D", r"\w", r"\W", r"\s", r"\S"])
    if kind == 5:
        return "."
    if kind == 6:
        inner = "".join(rng.sample("abcx01٣é$.", rng.randrange(1, 4)))
        neg = "^" if rng.random() < 0.3 else ""
        rng_part = rng.choice(["", "a-d", "0-4", ""])
        body = (rng_part + inner) or "a"
        return f"[{neg}{body}]"
    if kind == 7:
        return rng.choice([r"\.", r"\$", r"\\", r"\n", r"\t"])
    if kind == 8:
        return f"(?:{_gen_seq(rng, 2)})"
    return f"({_gen_seq(rng, 2)})"


def _gen_seq(rng: random.Random, max_atoms: int = 4) -> str:
    parts = []
    for _ in range(rng.randrange(1, max_atoms + 1)):
        a = _gen_atom(rng)
        q = rng.random()
        if q < 0.25 and not a.startswith("(?"):
            a += rng.choice(["*", "+", "?", "{1,2}", "{0,1}"])
        parts.append(a)
    if rng.random() < 0.2:
        return "|".join(["".join(parts), _gen_atom(rng)])
    return "".join(parts)


def _gen_pattern(rng: random.Random) -> str:
    flags = rng.choice(["", "", "", "(?i)", "(?s)", "(?m)", "(?im)", "(?is)"])
    body = _gen_seq(rng)
    if rng.random() < 0.4:
        body = "^" + body
    if rng.random() < 0.4:
        body += rng.choice(["$", r"\Z", r"\z"])
    return flags + body


def _gen_input(rng: random.Random, multiline: bool) -> str:
    n = rng.randrange(0, 8)
    s = "".join(rng.choice(SAFE_INPUT_CHARS) for _ in range(n))
    r = rng.random()
    if r < 0.35:
        # tail terminator — the anchor semantics hot spot
        s += "\n" if multiline else rng.choice(TERMINATORS)
    elif r < 0.5 and n > 1:
        mid = "\n" if multiline else rng.choice(TERMINATORS)
        k = rng.randrange(1, n)
        s = s[:k] + mid + s[k:]
    return s


def _enabled_multiline(pattern: str) -> bool:
    m = re.match(r"\(\?([a-zA-Z]*)\)", pattern)
    return bool(m) and "m" in m.group(1)


def _cases(seed: int, n: int) -> list[tuple[str, str]]:
    rng = random.Random(seed)
    out = []
    while len(out) < n:
        pat = _gen_pattern(rng)
        ml = _enabled_multiline(pat)
        for _ in range(3):
            out.append((pat, _gen_input(rng, ml)))
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
    py_compile_fail = 0
    for (pat, s), jv in zip(cases, java):
        try:
            rx = re.compile(java_dialect_rewrite(pat))
        except re.error:
            py_compile_fail += 1
            assert jv == "e", f"Python rejects but Java compiles: {pat!r}"
            continue
        if jv == "e":
            mismatches.append((pat, s, "java-compile-error", "py-ok"))
            continue
        pv = "t" if rx.search(s) else "f"
        if pv != jv:
            mismatches.append((pat, s, jv, pv))
    assert not mismatches, (
        f"{len(mismatches)}/{len(cases)} verdict mismatches vs the JVM; "
        f"first 10: {mismatches[:10]}")
    # the grammar should be compiling nearly everywhere — a high failure
    # rate would mean the fuzz silently stopped testing anything
    assert py_compile_fail < len(cases) * 0.05
