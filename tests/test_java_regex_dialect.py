"""Unit tests for java_dialect_rewrite — the kernel's bridge to
java.util.regex anchoring/dot semantics (the reference's dialect,
``common/regex/RegexFactory.java:20``). The javaregex_dialect corpus
pins end-to-end verdicts; these pin the string surgery itself."""

import re

import pytest

from json_schema_spark.functions.formats import java_dialect_rewrite as J

TERMS = ["\n", "\r\n", "\r", "\x85", "\u2028", "\u2029"]


@pytest.mark.parametrize("tail", TERMS)
def test_dollar_accepts_each_java_terminator(tail):
    assert re.search(J("a$"), "a" + tail)


def test_dollar_rejects_double_terminator():
    assert not re.search(J("a$"), "a\n\n")
    assert not re.search(J("a$"), "a\r\n\r\n")


def test_escaped_dollar_stays_literal():
    assert re.search(J(r"a\$"), "a$")
    assert not re.search(J(r"a\$"), "a\r\n")


def test_class_dollar_stays_literal():
    assert re.search(J("[$]"), "$")
    assert not re.search(J("[$]"), "a")


def test_class_leading_bracket_literal():
    # ']' first in a class is a literal member — the '$' after it is
    # still inside the class
    assert re.search(J("[]$]*x"), "]$x")
    assert re.search(J("[^]]$"), "a\r\n")


def test_java_Z_and_z():
    assert re.search(J(r"a\Z"), "a\r\n")       # Java \Z tolerates one terminator
    assert not re.search(J(r"a\Z"), "a\nb")
    assert re.search(J(r"a\z"), "a")           # Java \z = absolute end
    assert not re.search(J(r"a\z"), "a\n")


def test_escaped_backslash_before_z_not_an_anchor():
    # "\\z" is literal backslash + z in both dialects
    assert re.search(J(r"a\\z"), "a\\z")
    assert J(r"a\\z") == r"a\\z"


def test_dot_excludes_java_terminators():
    for t in TERMS:
        if t == "\r\n":
            continue
        assert not re.search(J("a.b"), f"a{t}b"), repr(t)
    assert re.search(J("a.b"), "axb")


def test_dot_literal_in_class_and_escape():
    assert re.search(J("a[.]b"), "a.b")
    assert not re.search(J("a[.]b"), "axb")
    assert re.search(J(r"a\.b"), "a.b")
    assert not re.search(J(r"a\.b"), "axb")


def test_inline_flags_disable_the_rewrites():
    assert re.search(J("(?s)a.b"), "a\rb")
    # (?s) disables only the dot rewrite; $ still Java-anchored
    assert re.search(J("(?s)a$"), "a\r\n")


def test_head_multiline_flag_spelled_out():
    # a whole-pattern (?m) is stripped and the Java MULTILINE anchors
    # are spelled out: $ before every terminator (\r is a line break,
    # \r\n one unit), ^ after every terminator EXCEPT at end of input
    # (java.util.regex Caret refuses i == to — even on empty input)
    assert re.search(J("(?m)^b$"), "a\rb\rc")
    assert re.search(J("(?m)a$"), "xa y")
    assert not re.search(J("(?m)^$"), "a\n")   # ^ can't sit at end of input
    assert not re.search(J("(?m)^"), "")       # Java (?m)^ fails on ""
    assert not re.search(J("(?m)a$x"), "a\r\nx")  # no $ between \r and \n


def test_scoped_multiline_group_translated():
    # (?m:...) scoped groups get the Java multiline anchors only inside
    # the scope; outside, $ stays Java-EOL-anchored
    assert re.search(J("(?m:^b$)"), "a\rb\rc")
    assert not re.search(J("(?m:^b$)"), "a\rbx")
    assert re.search(J("(?m:a$)|c$"), "xa\u2028y")
    assert not re.search(J("x(?m:a)$"), "xa\n\n")   # outer $: one terminator
    assert "(?=" in J(r"(?m:^a)\Z")


def test_anchor_free_pattern_verdicts_unchanged():
    # classes are re-emitted normalized now, so pin verdicts, not text
    rx = re.compile(J("abc[0-9]+"))
    assert rx.search("abc42")
    assert not rx.search("abcx")


def test_combined_inline_flags_detected():
    # (?im)/(?is): flag-group parsing must see combined forms; m and s
    # are consumed by the translation, i is re-emitted for Python
    assert J("(?im)^b$").startswith("(?i)")
    assert J("(?is)a.b").startswith("(?i)")
    assert re.search(J("(?im)^b$"), "a\nB\nc")
    assert re.search(J("(?is)a.b"), "a\rb")


def test_disabled_inline_flags_still_rewrite():
    # m/s AFTER the '-' are disabled — the rewrite must still apply
    assert "(?=" in J("(?i-m:x)$")
    assert "[^" in J("(?i-s:a.b)")


def test_only_i_flag_still_rewrites():
    assert re.search(J("(?i)B$"), "b\r\n")


def test_leading_dash_starts_a_range():
    """Java parses a dash at a member boundary as a possible range
    START: "[--X]" is the range '-'..X — so "[--/]" compiles and
    "[--%]" is an illegal (descending) range. JVM-probed (round 4
    fresh-seed fuzz found the engine accepting "[--%/]")."""
    from json_schema_spark.functions.java_regex import JavaRegexError

    assert re.search(J("[--/]"), ".")       # '-'..'/' includes '.'
    assert re.search(J("[--a]"), "X")
    assert re.search(J("[-a]"), "-")        # dash then non-dash: literal
    assert re.search(J("[--]"), "-")        # dash before ]: literal
    assert re.search(J("[----]"), "-")      # range '-'..'-' + literal
    for bad in ("[--%/]", "[a--]", "[--\\w]", "[^--%]", "[a&&--%]"):
        with pytest.raises(JavaRegexError):
            J(bad)
