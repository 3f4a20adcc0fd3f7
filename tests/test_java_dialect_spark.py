"""End-to-end integration of the Java regex dialect through BOTH Spark
engines: the expression path evaluates schema patterns with ``rlike``
(the real java.util.regex), the kernel with the translated Python
pattern over the JVM-dumped tables. On every case the two engines must
agree with each other AND with the hand-computed reference verdict —
this exercises the full stack (compiler ``_regex`` gate, ``(?U)``
prefixing, ``java_dialect_rewrite``, vendored tables) on actual Spark
plans, which the pure-Python JVM differential cannot see.
"""

import json

import pytest

from json_schema_spark.core.validator import SchemaCompileError
from json_schema_spark.plans.compiler import ExprUnsupported
from json_schema_spark.plans.runner import SparkValidator

# (pattern, [(instance, expected verdict), ...]) — expectations follow
# java.util.regex with UNICODE_CASE | UNICODE_CHARACTER_CLASS, find()
CASES = [
    (r"^\p{L}+$", [("abcé", True), ("ab1", False), ("α", True), ("", False)]),
    (r"\p{IsGreek}", [("xαx", True), ("xax", False)]),
    (r"\p{Lu}", [("aBc", True), ("abc", False), ("Σx", True)]),
    (r"\P{L}", [("a1", True), ("ab", False)]),
    (r"^\p{Alpha}+$", [("abé", True), ("a b", False)]),
    (r"^\d+$", [("٣٤", True), ("12", True), ("1a", False)]),
    (r"\w", [("́", True), ("‍", True), (".", False)]),  # mark, ZWJ are Java word chars
    (r"\s", [("\x1c", False), (" ", True)]),  # \x1c is Python-\s but not Java-\s
    (r"a\Q.+\Eb", [("a.+b", True), ("axxb", False)]),
    (r"x\hy", [("x\xa0y", True), ("x_y", False)]),
    (r"a\Rb", [("a\r\nb", True), ("a\rb", True), ("a b", False)]),
    (r"(?<dup>ab)\k<dup>", [("abab", True), ("abx", False)]),
    (r"[\w-x]+$", [("-", True), ("a-b", True)]),  # dash literal after class escape
    (r"(?m:^b$)", [("a\rb\rc", True), ("a\rbx", False)]),
    (r"(?i)σ", [("Σ", True), ("s", False)]),  # UNICODE_CASE folding
    (r"a$", [("a\r\n", True), ("a\n\n", False)]),
    (r"😀", [("x😀y", True), ("xy", False)]),  # surrogate pair escapes
    (r"x*+x", [("y", False), ("xx", False)]),  # possessive: no backtrack
]

JAVA_ONLY = [r"[a-z&&[^bc]]", r"\Ga", r"a\X"]  # rlike handles; kernel refuses
JAVA_INVALID = [r"(?P<n>a)", r"a{,2}", r"[a-\w]", r"[\b]"]  # both reject


def _verdicts(spark, pattern, docs, engine):
    sv = SparkValidator({"pattern": pattern}, dialect="2020-12", engine=engine)
    df = spark.createDataFrame(
        [(i, json.dumps(d)) for i, d in enumerate(docs)], ["i", "doc"])
    rows = sv.apply_json(df, "doc").orderBy("i").collect()
    return [r["valid"] for r in rows]


@pytest.mark.parametrize("pattern,cases", CASES,
                         ids=[repr(p) for p, _ in CASES])
def test_expr_and_kernel_agree_with_java(spark, pattern, cases):
    docs = [c[0] for c in cases]
    want = [c[1] for c in cases]
    assert _verdicts(spark, pattern, docs, "expr") == want, "rlike path"
    assert _verdicts(spark, pattern, docs, "udf") == want, "kernel path"


@pytest.mark.parametrize("pattern", JAVA_ONLY, ids=[repr(p) for p in JAVA_ONLY])
def test_java_only_patterns_run_on_expr_and_refuse_on_kernel(spark, pattern):
    # expr path: rlike evaluates the Java-only construct natively
    got = _verdicts(spark, pattern, ["zzz"], "expr")
    assert got == [bool(got[0])]  # ran without raising; verdict is a bool
    with pytest.raises(SchemaCompileError, match="Java-only"):
        _verdicts(spark, pattern, ["zzz"], "udf")


@pytest.mark.parametrize("pattern", JAVA_INVALID,
                         ids=[repr(p) for p in JAVA_INVALID])
def test_java_invalid_patterns_rejected_like_the_reference(spark, pattern):
    # the reference raises at SchemaBuilder.compile; both engines must
    # reject too (the expr compiler punts to the kernel, which raises)
    with pytest.raises((SchemaCompileError, ExprUnsupported)):
        _verdicts(spark, pattern, ["x"], "expr")
    with pytest.raises(SchemaCompileError):
        _verdicts(spark, pattern, ["x"], "udf")
