"""Translate ``java.util.regex`` patterns into Python ``re`` patterns
with verdict-identical ``find()`` semantics.

The reference compiles every schema ``pattern`` / ``patternProperties``
regex with ``UNICODE_CASE | UNICODE_CHARACTER_CLASS`` and evaluates it
as a search predicate (``common/regex/RegexFactory.java:19-22``).
Spark's ``rlike`` runs the very same engine, so the expression path is
Java-native for free; this module is the **kernel's** bridge — it lets
the Arrow-batched Python fallback agree byte-for-byte with the JVM.

Every construct is classified into one of three tiers:

* translated — emitted as an equivalent Python ``re`` pattern
  (anchors, Java ``.``, ``\\p{...}`` classes via vendored JVM tables,
  ``\\w \\W \\s \\S \\b \\B`` via the same tables, ``\\Q...\\E``,
  ``\\h \\v \\R``, named groups, control/hex escapes, surrogate-pair
  joining, normalized character classes);
* :class:`JavaOnlyRegex` — valid Java that Python cannot express
  (class intersection/union ``&&`` / nested ``[...]``, ``\\G``,
  ``\\X``, ``\\b{g}``, mid-pattern global flag groups, UNIX_LINES /
  COMMENTS flags). The expression path still evaluates these natively
  via ``rlike``; the kernel refuses loudly instead of guessing;
* :class:`JavaRegexError` — patterns ``Pattern.compile`` itself
  rejects (Python-only syntax like ``(?P<``, ``\\R``/``\\b`` inside a
  class, ``{,2}``, ``[a-\\w]``); the engine must reject the schema the
  same way the reference does.

The ``\\p{...}`` / ``\\w`` / ``\\s`` codepoint sets are NOT derived
from Python's ``unicodedata`` (a different Unicode version than the
JVM): they are dumped from the running JVM itself by
``scripts/javadump/UnicodeClassDump.java`` into the vendored
``java_unicode_classes.tsv.gz``, so the kernel, ``rlike``, and the
reference share one table. Empirical parse rules (literal ``-`` after
a class escape, no ``$`` between a final ``\\r\\n``, multiline ``^``
never at end-of-input, ``[a-\\w]`` rejected, adjacent ``\\uXXXX``
surrogate escapes joining into one codepoint) were probed against this
JVM and are pinned by ``tests/test_java_regex_differential.py``.
"""

from __future__ import annotations

import gzip
import re
from functools import lru_cache
from importlib import resources

__all__ = [
    "JavaRegexError",
    "JavaOnlyRegex",
    "java_dialect_rewrite",
    "compile_java_pattern",
    "is_regex",
]


class JavaRegexError(ValueError):
    """``java.util.regex.Pattern.compile`` rejects this pattern — the
    engine must reject the schema exactly like the reference does."""


class JavaOnlyRegex(ValueError):
    """Valid Java regex that Python ``re`` cannot express. The JVM
    expression path (``rlike``) evaluates it natively; the Python
    kernel must refuse rather than approximate."""


MAXCP = 0x10FFFF

# ----------------------------------------------------------- JVM tables

_TABLES: dict[str, tuple[tuple[int, int], ...]] | None = None


def _tables() -> dict[str, tuple[tuple[int, int], ...]]:
    global _TABLES
    if _TABLES is None:
        ranges: dict[str, tuple[tuple[int, int], ...]] = {}
        aliases: list[tuple[str, str]] = []
        blob = (resources.files(__package__) / "java_unicode_classes.tsv.gz").read_bytes()
        for line in gzip.decompress(blob).decode("ascii").splitlines():
            kind, key, val = line.split("\t")
            if kind == "R":
                ranges[key] = tuple(
                    (int(s, 16), int(e, 16))
                    for s, e in (part.split("-") for part in val.split(","))
                ) if val else ()
            else:  # A alias -> canonical
                aliases.append((key, val))
        for alias, canon in aliases:
            ranges[alias] = ranges[canon]
        _TABLES = ranges
    return _TABLES


def _resolve_p(name: str) -> str:
    """Resolve a ``\\p{name}`` to a table key, mirroring the JVM's
    name-resolution tiers (probed on this JVM: categories and ``gc=``
    are case-sensitive, POSIX names and scripts/blocks are not)."""
    t = _tables()
    if "=" in name:
        fam, _, val = name.partition("=")
        if fam in ("gc", "general_category"):
            key = "gc:" + val
        elif fam in ("sc", "script"):
            key = "sc:" + val.upper()
        elif fam in ("blk", "block"):
            key = "blk:" + val.upper()
        else:
            raise JavaRegexError(f"unknown property family in \\p{{{name}}}")
        if key in t:
            return key
    elif name.startswith("In"):
        key = "blk:" + name[2:].upper()
        if key in t:
            return key
    elif name.startswith("Is"):
        short = name[2:].upper()
        for key in ("bin:" + short, "sc:" + short):
            if key in t:
                return key
    else:
        for key in ("posix:" + name.upper(), "gc:" + name, "java:" + name):
            if key in t:
                return key
    raise JavaRegexError(f"unknown character property name {{{name}}}")


def _complement(ranges: tuple[tuple[int, int], ...]) -> tuple[tuple[int, int], ...]:
    out = []
    prev = 0
    for s, e in ranges:
        if s > prev:
            out.append((prev, s - 1))
        prev = e + 1
    if prev <= MAXCP:
        out.append((prev, MAXCP))
    return tuple(out)


def _esc(cp: int) -> str:
    return f"\\u{cp:04x}" if cp <= 0xFFFF else f"\\U{cp:08x}"


def _render(ranges: tuple[tuple[int, int], ...]) -> str:
    return "".join(
        _esc(s) if s == e else _esc(s) + "-" + _esc(e) for s, e in ranges
    )


@lru_cache(maxsize=512)
def _p_body(name: str, negated: bool) -> str:
    """Class-body text for ``\\p{name}`` / ``\\P{name}``."""
    ranges = _tables()[_resolve_p(name)]
    if negated:
        ranges = _complement(ranges)
    return _render(ranges)


@lru_cache(maxsize=16)
def _builtin_body(key: str, negated: bool) -> str:
    """Body for the predefined classes whose Java (UCC) and Python sets
    differ: ``\\w`` = Java's WORD property (includes marks and join
    controls — Python's does not), ``\\s`` = WHITE_SPACE (Python adds
    U+001C-001F). ``\\d`` is Nd in both dialects and stays ``\\d``."""
    ranges = _tables()[key]
    if negated:
        ranges = _complement(ranges)
    return _render(ranges)


# Java \h / \v definitions (Pattern javadoc, probed)
_H_RANGES = ((0x09, 0x09), (0x20, 0x20), (0xA0, 0xA0), (0x1680, 0x1680),
             (0x180E, 0x180E), (0x2000, 0x200A), (0x202F, 0x202F),
             (0x205F, 0x205F), (0x3000, 0x3000))
_V_RANGES = ((0x0A, 0x0D), (0x85, 0x85), (0x2028, 0x2029))

# any Java line terminator, \r\n one unit
_R_ATOM = r"(?:\r\n|[\n\x0b\f\r\x85\u2028\u2029])"

# Java default (non-MULTILINE) $ and \Z: before ONE final terminator or
# at absolute end — but NEVER between the \r and \n of a final \r\n
# (java.util.regex Dollar: "No match between \r\n").
_JAVA_EOL = r"(?=(?:\r\n?|(?<!\r)\n|[\x85\u2028\u2029])?\Z)"

# Java MULTILINE $: before EVERY terminator (\r\n one unit) and at end;
# ^: at start and after every terminator, but NEVER at end of input
# (Pattern.Caret refuses i == to, even on the empty string).
_JAVA_ML_DOLLAR = r"(?:(?=[\r\x85\u2028\u2029])|(?<!\r)(?=\n)|\Z)"
_JAVA_ML_CARET = r"(?:^|(?<=[\n\x85\u2028\u2029])|(?<=\r)(?!\n))(?!\Z)"

# Java default . excludes ALL line terminators; Python's only \n
_JAVA_DOT = r"[^\n\r\x85\u2028\u2029]"

_NEVER = r"(?:(?!))"          # empty class, e.g. [\P{all}] (legal Java)
_ANY = r"[\u0000-\U0010ffff]"  # any codepoint (negation of an empty class)

_HEX = set("0123456789abcdefABCDEF")
_JAVA_FLAGS = set("idmsuxU")
_GROUP_NAME = re.compile(r"[a-zA-Z][a-zA-Z0-9]*>")
# [0-9], not \d: Java's counted-closure parser reads ASCII digits only,
# while Python \d would let a Unicode digit (e.g. "a{1,2٣}") form a
# "quantifier" Java rejects as an illegal repetition (fresh-seed fuzz)
_REPETITION = re.compile(r"\{[0-9]+(?:,[0-9]*)?\}")


def _emit_char(cp: int) -> str:
    if 0x20 <= cp < 0x7F:
        return re.escape(chr(cp))
    return _esc(cp)


class _State:
    __slots__ = ("i", "m", "s")

    def __init__(self, i=False, m=False, s=False):
        self.i, self.m, self.s = i, m, s

    def copy(self) -> "_State":
        return _State(self.i, self.m, self.s)


class _Translator:
    def __init__(self, pattern: str):
        self.p = pattern
        self.i = 0
        self.n = len(pattern)
        self.out: list[str] = []
        self.state = _State()
        # group frames: (saved flag state, out index of the '(')
        self.stack: list[tuple[_State, int]] = []
        # last quantifiable position: (out index where the atom starts,
        # Python-quantifiable?) — None at pattern/group/alternation
        # starts, where Java calls a quantifier "dangling"
        self.atom: tuple[int, bool] | None = None
        # quantifier parse state: "none" (fresh atom / nothing),
        # "quant" (quantifier emitted, one +/? modifier allowed),
        # "done" (modifier consumed), "noop" (a Java no-op brace —
        # {n,m} with no atom quantifies an implicit empty node)
        self.qstate = "none"
        # deferred Java-only reason: untranslatable-but-valid constructs
        # (class unions, \X, …) set this and keep PARSING with a
        # placeholder atom so syntax errors later in the pattern are
        # still caught — "[[a-z][0-9]][" must stay a Java error, not a
        # Java-only pass (fresh-seed fuzz, round 4). translate() raises
        # at the end. Parse-mode-changing constructs ((?x), (?d), …)
        # still raise immediately: the remainder cannot be parsed
        # faithfully once the mode is unknown.
        self.java_only: str | None = None
        # capturing groups opened so far (Java capturingGroupCount - 1)
        self.groups = 0

    def _concede(self, reason: str) -> None:
        if self.java_only is None:
            self.java_only = reason

    # -------------------------------------------------- escape reading

    def _hex(self, count: int, what: str) -> int:
        s = self.p[self.i:self.i + count]
        if len(s) < count or any(c not in _HEX for c in s):
            raise JavaRegexError(f"illegal {what} escape near index {self.i}")
        self.i += count
        return int(s, 16)

    def _read_escape(self, in_class: bool):
        """Consume one escape (``self.i`` past the backslash already).
        Returns ("char", cp) | ("body", text) | ("raw", text) |
        ("special", name). ``body`` splices into a class; ``raw`` is
        emitted verbatim outside one."""
        if self.i >= self.n:
            raise JavaRegexError("pattern ends with a bare backslash")
        c = self.p[self.i]
        self.i += 1
        if c == "p" or c == "P":
            if self.i >= self.n or self.p[self.i] != "{":
                # Java also accepts the single-letter \pL form
                if self.i < self.n and self.p[self.i].isalpha():
                    name = self.p[self.i]
                    self.i += 1
                else:
                    raise JavaRegexError("malformed \\p escape")
            else:
                end = self.p.find("}", self.i)
                if end < 0:
                    raise JavaRegexError("unclosed \\p{...}")
                name = self.p[self.i + 1:end]
                self.i = end + 1
            return ("body", _p_body(name, c == "P"))
        if c == "w":
            return ("body", _builtin_body("bin:WORD", False))
        if c == "W":
            return ("body", _builtin_body("bin:WORD", True))
        if c == "s":
            return ("body", _builtin_body("bin:WHITE_SPACE", False))
        if c == "S":
            return ("body", _builtin_body("bin:WHITE_SPACE", True))
        if c == "d":
            # Java UCC \d == gc=Nd == Python \d: no table needed
            return ("body", r"\d") if in_class else ("raw", r"\d")
        if c == "D":
            return ("body", r"\D") if in_class else ("raw", r"\D")
        if c == "h":
            return ("body", _render(_H_RANGES))
        if c == "H":
            return ("body", _render(_complement(_H_RANGES)))
        if c == "v":
            return ("body", _render(_V_RANGES))
        if c == "V":
            return ("body", _render(_complement(_V_RANGES)))
        if c == "u":
            cp = self._hex(4, "\\u")
            # adjacent \uHIGH\uLOW escapes form ONE astral codepoint in
            # Java (patterns are UTF-16); Python must see \U........
            if 0xD800 <= cp <= 0xDBFF and self.p[self.i:self.i + 2] == "\\u":
                save = self.i
                self.i += 2
                low = self._hex(4, "\\u")
                if 0xDC00 <= low <= 0xDFFF:
                    cp = 0x10000 + ((cp - 0xD800) << 10) + (low - 0xDC00)
                else:
                    self.i = save
            return ("char", cp)
        if c == "x":
            if self.i < self.n and self.p[self.i] == "{":
                end = self.p.find("}", self.i)
                if end < 0:
                    raise JavaRegexError("unclosed \\x{...}")
                body = self.p[self.i + 1:end]
                if not body or any(ch not in _HEX for ch in body):
                    raise JavaRegexError("illegal \\x{...} escape")
                cp = int(body, 16)
                if cp > MAXCP:
                    raise JavaRegexError("\\x{...} beyond U+10FFFF")
                self.i = end + 1
                return ("char", cp)
            return ("char", self._hex(2, "\\x"))
        if c == "c":
            if self.i >= self.n:
                raise JavaRegexError("dangling \\c")
            ctl = ord(self.p[self.i]) ^ 64
            self.i += 1
            return ("char", ctl)
        if c == "0":
            j = self.i
            digits = ""
            while j < self.n and self.p[j] in "01234567" and len(digits) < 3:
                digits += self.p[j]
                j += 1
            if not digits:
                raise JavaRegexError("illegal octal escape \\0")
            if len(digits) == 3 and digits[0] > "3":
                digits = digits[:2]
                j -= 1
            self.i = j
            return ("char", int(digits, 8))
        if c == "e":
            return ("char", 0x1B)
        if c == "a":
            return ("char", 0x07)
        if c == "t":
            return ("char", 0x09)
        if c == "n":
            return ("char", 0x0A)
        if c == "f":
            return ("char", 0x0C)
        if c == "r":
            return ("char", 0x0D)
        if c in "123456789":
            if in_class:
                raise JavaRegexError("octal escapes need \\0 in Java")
            # Java backreference (Pattern.ref()): \\1-\\9 ALWAYS parse as
            # backrefs with NO existence check at compile time ("\\9"
            # with zero groups compiles — probed, round 4); further
            # digits extend the number only while it stays <= the
            # groups opened so far. A reference to a not-(yet-)existing
            # group can never match, so it translates to a never-match
            # atom (Python re rejects such patterns at compile).
            ref = ord(c) - 48
            while self.i < self.n and "0" <= self.p[self.i] <= "9":
                ext = ref * 10 + (ord(self.p[self.i]) - 48)
                if ext > self.groups:
                    break
                ref = ext
                self.i += 1
            if ref <= self.groups:
                # wrapped so a following literal digit cannot be
                # re-absorbed into the group number by Python's parser
                # ("(a)(b)\\12" = backref 1 + literal "2" in Java)
                return ("raw", "(?:\\" + str(ref) + ")")
            return ("raw", "(?:(?!))")  # never matches, quantifiable
        if c == "k":
            if in_class:
                raise JavaRegexError("\\k not allowed in a class")
            m = _GROUP_NAME.match(self.p, self.i + 1) if self.p[self.i:self.i + 1] == "<" else None
            if not m:
                raise JavaRegexError("\\k must be \\k<name>")
            self.i = m.end()
            return ("raw", f"(?P={m.group(0)[:-1]})")
        if c == "Q":
            return ("special", "Q")
        if c == "E":
            raise JavaRegexError("unmatched \\E")
        if c in "bBAZz":
            if in_class:
                # probed: Java rejects [\b] [\Z] etc.
                raise JavaRegexError(f"\\{c} not allowed in a class")
            return ("special", c)
        if c == "R":
            if in_class:
                raise JavaRegexError("\\R not allowed in a class")
            return ("raw", _R_ATOM)
        if c == "G":
            if in_class:
                raise JavaRegexError("\\G not allowed in a class")
            self._concede("\\G (end of previous match)")
            return ("raw", "(?:.)")  # placeholder; parsing continues
        if c == "X":
            if in_class:
                raise JavaRegexError("\\X not allowed in a class")
            self._concede("\\X (grapheme cluster)")
            return ("raw", "(?:.)")  # placeholder; parsing continues
        if not ("a" <= c <= "z" or "A" <= c <= "Z" or "0" <= c <= "9"):
            # escaped punctuation AND non-ASCII letters/digits are
            # literals in Java — its "Illegal/unsupported escape
            # sequence" check covers ASCII alphanumerics only, so \٣
            # compiles as a literal ٣ (fresh-seed fuzz, round 4)
            return ("char", ord(c))
        raise JavaRegexError(f"illegal escape sequence \\{c}")

    # ---------------------------------------------------- class parser

    def _parse_class(self) -> str:
        """``self.i`` is just past the ``[``. Parses the whole class and
        re-emits it normalized (every member as an explicit escape), so
        Java-only parses like the literal ``-`` after a class escape in
        ``[\\w-x]`` can't silently change meaning in Python."""
        negated = False
        if self.i < self.n and self.p[self.i] == "^":
            negated = True
            self.i += 1
        # tokens: ("char", cp) | ("body", text) | ("dash", None)
        toks: list[tuple[str, object]] = []
        first = True
        while True:
            if self.i >= self.n:
                raise JavaRegexError("unclosed character class")
            c = self.p[self.i]
            if c == "]" and not first:
                self.i += 1
                break
            first = False
            if c == "[":
                # Java union syntax — untranslatable but only VALID if
                # the nested class itself parses: "[[a-" is "Unclosed
                # character class" and "[[a--][0-9]]" an illegal range
                # in Java, not Java-only passes (fresh-seed fuzz,
                # round 4). Recursively parse (and thereby validate)
                # the nested class, then record it as an opaque member.
                self.i += 1
                self._parse_class()
                self._concede("nested character class (Java union)")
                toks.append(("union", None))
                continue
            if c == "&" and self.p[self.i + 1:self.i + 2] == "&":
                if not toks and self.p[self.i + 2:self.i + 3] == "]":
                    # probed: [&&] alone is "Bad class syntax" in Java,
                    # while [a&&] / [&&a] compile
                    raise JavaRegexError("bad class syntax ([&&])")
                # untranslatable, but the operand on each side must
                # still parse ("[a&&0-/]" is an illegal range, "[a&&b"
                # unclosed — fresh-seed fuzz, round 4): consume the
                # separator, concede, and keep validating members
                self._concede("character class intersection (&&)")
                self.i += 2
                toks.append(("union", None))  # range-opaque separator
                continue
            if c == "\\":
                self.i += 1
                tok = self._read_escape(in_class=True)
                if tok[0] == "special":  # only \Q reaches here
                    end = self.p.find("\\E", self.i)
                    lit = self.p[self.i:end] if end >= 0 else self.p[self.i:]
                    self.i = (end + 2) if end >= 0 else self.n
                    toks.extend(("char", ord(ch)) for ch in lit)
                else:
                    toks.append(tok)
                continue
            if c == "-":
                toks.append(("dash", None))
            else:
                toks.append(("char", ord(c)))
            self.i += 1
        # resolve dashes: char-dash-char = range; a dash adjacent to a
        # class escape or an edge is a literal (probed [\w-x], [a-]);
        # char-dash-classescape is a Java compile error (probed [a-\w])
        bits: list[str] = []
        k = 0
        while k < len(toks):
            kind, val = toks[k]
            if kind == "char":
                nxt = toks[k + 1][0] if k + 1 < len(toks) else None
                nxt2 = toks[k + 2] if k + 2 < len(toks) else None
                if nxt == "dash" and nxt2 is not None:
                    if nxt2[0] in ("char", "dash"):
                        # char-dash-DASH is a range ending at '-' in
                        # Java: "[a--]" is an illegal range (a > '-'),
                        # "[!--]" a valid one (probed, round 4)
                        lo = val
                        hi = nxt2[1] if nxt2[0] == "char" else 0x2D
                        if lo > hi:
                            raise JavaRegexError("illegal character range")
                        bits.append(_esc(lo) + "-" + _esc(hi))
                        k += 3
                        continue
                    if nxt2[0] == "body":
                        raise JavaRegexError("illegal character range (to a class)")
                    # nxt2 is a nested class: the dash is a literal in
                    # Java ("[a-[b]]" compiles — probed, round 4)
                bits.append(_esc(val))
            elif kind == "dash":
                # a dash can START a range too: Java parses "[--X]" as
                # the range '-'..X — "[--/]" compiles, "[--%]" is an
                # illegal (descending) range (fresh-seed fuzz, round 4).
                # Same shape as the char case: dash + dash + member.
                nxt = toks[k + 1][0] if k + 1 < len(toks) else None
                nxt2 = toks[k + 2] if k + 2 < len(toks) else None
                if nxt == "dash" and nxt2 is not None:
                    if nxt2[0] in ("char", "dash"):
                        hi = nxt2[1] if nxt2[0] == "char" else 0x2D
                        if 0x2D > hi:
                            raise JavaRegexError("illegal character range")
                        bits.append(_esc(0x2D) + "-" + _esc(hi))
                        k += 3
                        continue
                    if nxt2[0] == "body":
                        raise JavaRegexError("illegal character range (to a class)")
                bits.append(_esc(0x2D))  # literal dash
            elif kind == "union":
                pass  # opaque member of a conceded Java-only class
            else:  # body
                bits.append(val)
            k += 1
        body = "".join(bits)
        if not body:
            return _ANY if negated else _NEVER
        return ("[^" if negated else "[") + body + "]"

    # ----------------------------------------------------- flag groups

    def _parse_flags(self, spec: str) -> tuple[set, set]:
        if "-" in spec:
            on_s, _, off_s = spec.partition("-")
        else:
            on_s, off_s = spec, ""
        on, off = set(on_s), set(off_s)
        bad = (on | off) - _JAVA_FLAGS
        if bad:
            raise JavaRegexError(f"unknown inline modifier {''.join(sorted(bad))!r}")
        if "d" in on or "d" in off:
            raise JavaOnlyRegex("UNIX_LINES flag (?d)")
        if "x" in on or "x" in off:
            raise JavaOnlyRegex("COMMENTS flag (?x)")
        if "U" in off or "u" in off:
            # the dialect compiles with UNICODE_CHARACTER_CLASS (which
            # implies UNICODE_CASE); scoping them OFF would flip the
            # predefined classes to ASCII mid-pattern
            raise JavaOnlyRegex("disabling (?U)/(?u) mid-pattern")
        on -= {"U", "u"}  # already the dialect default: no-op
        return on, off

    # ------------------------------------------------------ main walk

    def translate(self) -> str:
        p, n = self.p, self.n
        # leading global flag groups (?imsU...) — Java lets them appear
        # anywhere (scoped to the enclosing group); Python only at the
        # very start, so only the head position is translatable
        head_flag = re.compile(r"\(\?([a-zA-Z]*(?:-[a-zA-Z]*)?)\)")
        while True:
            m = head_flag.match(p, self.i)
            if not m or not m.group(1):
                break
            on, off = self._parse_flags(m.group(1))
            for f in on & {"i", "m", "s"}:
                setattr(self.state, f, True)
            for f in off & {"i", "m", "s"}:
                setattr(self.state, f, False)
            self.i = m.end()
        if self.state.i:
            self.out.append("(?i)")

        while self.i < n:
            c = p[self.i]
            if c == "\\":
                self.i += 1
                tok = self._read_escape(in_class=False)
                kind, val = tok
                if kind == "char":
                    self._atom(_emit_char(val))
                elif kind == "raw":
                    self._atom(val)
                elif kind == "body":
                    self._atom(_NEVER if val == "" else f"[{val}]")
                else:  # special
                    if val == "Q":
                        end_q = p.find("\\E", self.i)
                        lit = p[self.i:end_q] if end_q >= 0 else p[self.i:]
                        self.i = (end_q + 2) if end_q >= 0 else n
                        # \Q..\E is transparent in Java: a following
                        # quantifier binds to the quote's LAST char, or
                        # through an empty quote to the previous atom
                        for ch in lit:
                            self._atom(_emit_char(ord(ch)))
                    elif val == "Z":
                        self._atom(_JAVA_EOL, quantifiable=False)
                    elif val == "z":
                        self._atom(r"\Z", quantifiable=False)
                    elif val == "A":
                        self._atom(r"\A", quantifiable=False)
                    elif val == "b":
                        if p[self.i:self.i + 3] == "{g}":
                            self._concede("\\b{g} (grapheme boundary)")
                            self.i += 3
                            self._atom("(?:.)", quantifiable=False)
                            continue
                        w = _builtin_body("bin:WORD", False)
                        self._atom(
                            f"(?:(?<=[{w}])(?![{w}])|(?<![{w}])(?=[{w}]))",
                            quantifiable=False)
                    elif val == "B":
                        w = _builtin_body("bin:WORD", False)
                        self._atom(
                            f"(?:(?<=[{w}])(?=[{w}])|(?<![{w}])(?![{w}]))",
                            quantifiable=False)
                continue
            if c == "[":
                self.i += 1
                self._atom(self._parse_class())
                continue
            if c == "(":
                self._open_group()
                continue
            if c == ")":
                if not self.stack:
                    raise JavaRegexError("unmatched closing parenthesis")
                saved, out_start = self.stack.pop()
                self.state = saved
                self.out.append(")")
                self.atom = (out_start, True)
                self.qstate = "none"
                self.i += 1
                continue
            if c == "$":
                self._atom(_JAVA_ML_DOLLAR if self.state.m else _JAVA_EOL,
                           quantifiable=False)
                self.i += 1
                continue
            if c == "^":
                self._atom(_JAVA_ML_CARET if self.state.m else "^",
                           quantifiable=False)
                self.i += 1
                continue
            if c == ".":
                self._atom(r"[\s\S]" if self.state.s else _JAVA_DOT)
                self.i += 1
                continue
            if c in "*+?":
                self._quantifier(c)
                self.i += 1
                continue
            if c == "{":
                m = _REPETITION.match(p, self.i)
                if not m:
                    # Java: any brace not forming {n}/{n,}/{n,m} is an
                    # "Illegal repetition" error (Python: a literal)
                    raise JavaRegexError(f"illegal repetition near index {self.i}")
                lohi = m.group(0)[1:-1].split(",")
                if len(lohi) == 2 and lohi[1] and int(lohi[1]) < int(lohi[0]):
                    # Java validates the range even on a no-op brace
                    # with no atom ("{2,1}" alone — fresh-seed fuzz)
                    raise JavaRegexError("illegal repetition range")
                self._quantifier(m.group(0))
                self.i = m.end()
                continue
            if c == "|":
                self.out.append("|")
                self.atom = None
                self.qstate = "none"
                self.i += 1
                continue
            self._atom(c)
            self.i += 1
        if self.stack:
            raise JavaRegexError("unclosed group")
        if self.java_only is not None:
            raise JavaOnlyRegex(self.java_only)
        return "".join(self.out)


    def _atom(self, emission: str, quantifiable: bool = True) -> None:
        self.atom = (len(self.out), quantifiable)
        self.qstate = "none"
        self.out.append(emission)

    def _quantifier(self, q: str) -> None:
        """A source quantifier (or possessive/reluctant modifier).
        Empirical java.util.regex rules (probed, fuzz-pinned): Java
        quantifies anchors (^? is legal) where Python refuses — wrap
        those atoms in (?:...); one +/? modifier may follow a
        quantifier; a {n,m} brace directly after a quantifier or with
        no atom at all silently quantifies an implicit EMPTY node (a
        no-op that may itself take a +/? modifier); * in those
        positions is a "Dangling meta character" error."""
        brace = q.startswith("{")
        if self.qstate == "quant" and q in "+?":
            self.out.append(q)  # possessive / reluctant modifier
            self.qstate = "done"
            return
        if self.qstate in ("quant", "done") and brace:
            self.qstate = "noop"  # Java: no-op empty-node quantifier
            return
        if self.qstate == "noop":
            if q in "+?":
                self.qstate = "done"  # swallowed modifier of the no-op
                return
            if brace:
                return  # stacked no-op braces
            raise JavaRegexError(f"dangling quantifier {q!r}")
        if self.qstate == "done" and q in "*+?":
            raise JavaRegexError(f"dangling quantifier {q!r}")
        if self.atom is None:
            if brace:
                self.qstate = "noop"  # {n,m} with nothing before it
                return
            # Java: "Dangling meta character" (also covers \Q\E? at a
            # position with nothing before it)
            raise JavaRegexError(f"dangling quantifier {q!r}")
        start, quantifiable = self.atom
        if not quantifiable:
            self.out[start:] = ["(?:", *self.out[start:], ")"]
            self.atom = (start, True)
        self.out.append(q)
        self.qstate = "quant"


    def _push_group(self, header: str) -> None:
        self.stack.append((self.state.copy(), len(self.out)))
        self.out.append(header)
        self.atom = None
        self.qstate = "none"

    def _open_group(self) -> None:
        p = self.p
        if p[self.i + 1:self.i + 2] != "?":
            self._push_group("(")
            self.groups += 1
            self.i += 1
            return
        two = p[self.i + 2:self.i + 3]
        if two == ":":
            self._push_group("(?:")
            self.i += 3
            return
        if two in ("=", "!"):
            self._push_group("(?" + two)
            self.i += 3
            return
        if two == ">":
            self._push_group("(?>")  # Python >= 3.11 atomic group
            self.i += 3
            return
        if two == "<":
            nxt = p[self.i + 3:self.i + 4]
            if nxt in ("=", "!"):
                self._push_group("(?<" + nxt)
                self.i += 4
                return
            m = _GROUP_NAME.match(p, self.i + 3)
            if not m:
                raise JavaRegexError(
                    "capturing group name must start with a Latin letter")
            self._push_group(f"(?P<{m.group(0)[:-1]}>")
            self.groups += 1  # named groups are numbered in Java too
            self.i = m.end()
            return
        if two in ("P", "#", "("):
            raise JavaRegexError(f"(?{two} is not Java regex syntax")
        # inline flags: (?flags) global or (?flags:...) scoped
        m = re.compile(r"\(\?([a-zA-Z]*(?:-[a-zA-Z]*)?)([):])").match(p, self.i)
        if not m:
            raise JavaRegexError(f"unknown group syntax near index {self.i}")
        on, off = self._parse_flags(m.group(1))
        if m.group(2) == ")":
            # Java scopes a bare (?flags) to the rest of the enclosing
            # group; Python only allows global flags at position 0, and
            # those were already consumed by translate()'s head loop
            raise JavaOnlyRegex("mid-pattern global inline flags")
        new = self.state.copy()
        for f in on & {"i", "m", "s"}:
            setattr(new, f, True)
        for f in off & {"i", "m", "s"}:
            setattr(new, f, False)
        if new.i and not self.state.i:
            self._push_group("(?i:")
        elif self.state.i and not new.i:
            self._push_group("(?-i:")
        else:
            self._push_group("(?:")
        self.state = new
        self.i = m.end()


def java_dialect_rewrite(pattern: str) -> str:
    """Translate ``pattern`` from the Java dialect into Python ``re``.

    Raises :class:`JavaOnlyRegex` for Java-valid constructs Python
    cannot express (the JVM ``rlike`` path still handles those) and
    :class:`JavaRegexError` for patterns Java itself rejects.
    """
    return _Translator(pattern).translate()


@lru_cache(maxsize=4096)
def compile_java_pattern(pattern: str) -> "re.Pattern":
    """Compile a Java-dialect pattern for the Python kernel."""
    rewritten = java_dialect_rewrite(pattern)
    try:
        return re.compile(rewritten)
    except re.error as e:
        if "look-behind requires fixed-width pattern" in str(e):
            # Java allows bounded variable-length lookbehind
            raise JavaOnlyRegex(f"variable-width lookbehind: {pattern!r}") from e
        raise JavaRegexError(f"bad regex {pattern!r}: {e}") from e


def is_regex(s: str) -> bool:
    """``format: "regex"`` — does this compile in the reference's
    regex dialect (``java.util.regex``, FormatCompiler.java:69)?"""
    try:
        compile_java_pattern(s)
        return True
    except JavaOnlyRegex:
        return True  # Java accepts it; only the kernel can't express it
    except JavaRegexError:
        return False
