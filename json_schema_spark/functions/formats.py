"""Built-in ``format`` validators (draft-07 / 2019-09 / 2020-12 set).

Pure-Python predicates, one per format name; consumed by
:mod:`json_schema_spark.core.validator` and wrapped into vectorized
pandas UDFs by the Spark compiler where a format check appears in a
hot path.

Behaviour matches the reference's built-ins
(``compilers/FormatCompiler.java:63-90``,
``common/DateTimeFormatValidation.java``, ``common/Ipv6Validator.java``,
``common/CommonFormatValidations.java``, ``common/email/*``): strict
RFC3339 dates with leap-second awareness, full-match anchored regexes,
URI/IRI parsing, RFC6570 uri-templates. Formats only apply to strings —
non-string instances always pass (spec rule the reference follows).
"""

from __future__ import annotations

import ipaddress
import re
import unicodedata
from typing import Callable, Optional
from urllib.parse import urlsplit

__all__ = ["FORMAT_VALIDATORS", "FORMAT_REGEXES", "is_format_valid"]

# ---------------------------------------------------------------- date/time

# [0-9] (never \d): the reference's DateTimeFormatValidation.parseInt
# walks ASCII '0'..'9' code points, while Python \d (and int()) also
# accept Unicode digits like U+0663 — "٢٠٢٠-٠١-٠١" must NOT validate.
_DATE_RE = re.compile(r"^([0-9]{4})-([0-9]{2})-([0-9]{2})$")
_DAYS = [31, 29, 31, 30, 31, 30, 31, 31, 30, 31, 30, 31]


def _leap(y: int) -> bool:
    return y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)


def _valid_date(y: int, m: int, d: int) -> bool:
    if not (1 <= m <= 12 and d >= 1):
        return False
    if m == 2 and not _leap(y):
        return d <= 28
    return d <= _DAYS[m - 1]


def is_date(s: str) -> bool:
    m = _DATE_RE.match(s)
    return bool(m) and _valid_date(int(m[1]), int(m[2]), int(m[3]))


def is_time(s: str) -> bool:
    """Faithful port of DateTimeFormatValidation.validateTime
    (reference `common/DateTimeFormatValidation.java:31-102`): hour and
    minute are exactly two ASCII digits each followed by ':', but the
    SECONDS field is whatever run of ``[0-9.]`` parses as a Java
    BigDecimal (≤ 1 dot, ≥ 1 digit) — so ``23:59:0Z``, ``23:59:000Z``
    and fractional forms like ``23:59:0.5Z`` are all valid, and the
    leap-second rule applies to the TRUNCATED value (``longValue()``),
    so ``23:59:60.9Z`` is a valid leap second. Found by fresh-seed
    format fuzz vs the compiled reference (round 4)."""
    m = re.match(r"^([0-9]{2}):([0-9]{2}):", s)
    if not m:
        return False
    hh, mm = int(m[1]), int(m[2])
    if hh > 23 or mm > 59:
        return False
    pos = 6
    i = pos
    while i < len(s) and (("0" <= s[i] <= "9") or s[i] == "."):
        i += 1
    run = s[pos:i]
    # Java `new BigDecimal(run)`: at most one '.', at least one digit
    if run.count(".") > 1 or not any("0" <= c <= "9" for c in run):
        return False
    ss = int(run.split(".", 1)[0] or "0")  # BigDecimal.longValue() truncates
    if ss > 60:
        return False
    pos = i
    if len(s) <= pos:
        return False
    ch = s[pos]
    pos += 1
    if ch in "+-":
        om_m = re.match(r"^([0-9]{2}):([0-9]{2})", s[pos:])
        if not om_m:
            return False
        o_h, o_m = int(om_m[1]), int(om_m[2])
        if o_h > 23 or o_m > 59:
            return False
        pos += 5
        off = ch
    elif ch in "zZ":
        o_h = o_m = 0
        off = "z"
    else:
        return False
    if ss == 60:
        total = hh * 60 + mm
        offset = o_h * 60 + o_m
        if off == "-":
            calc = total + offset
        elif off == "+":
            calc = total - offset
        else:
            calc = total
        if calc < 0:
            calc += 1440
        if not (calc // 60 == 23 and calc % 60 == 59):
            return False
    return len(s) == pos


def is_datetime(s: str) -> bool:
    for sep in ("T", "t"):
        if sep in s:
            d, _, t = s.partition(sep)
            return is_date(d) and is_time(t)
    return False


_DURATION_RE = re.compile(
    r"^P(?!$)([0-9]+Y)?([0-9]+M)?([0-9]+D)?"
    r"(T(?=[0-9])([0-9]+H)?([0-9]+M)?([0-9]+(\.[0-9]+)?S)?)?$"
    r"|^P[0-9]+W$"
)


def _dur_int_len(v: str, pos: int):
    """Reference ``parseInt`` (DateTimeFormatValidation.java:220-236):
    ASCII digits; a multi-digit run starting with 0 is rejected; an
    EMPTY run is fine (length 0, value 0)."""
    p = pos
    result = 0
    while p < len(v) and "0" <= v[p] <= "9":
        if p > pos and result == 0:
            return None
        result = result * 10 + (ord(v[p]) - 48)
        p += 1
    return p - pos


def _dur_date(v: str) -> bool:
    if not v or v[0] != "P":
        return False
    pos, bits = 1, 0
    while pos < len(v):
        n = _dur_int_len(v, pos)
        if n is None or pos + n >= len(v):
            return False
        t = v[pos + n]
        if t == "Y":
            bit = 1
        elif t == "M":
            bit = 2
        elif t == "D":
            bit = 4
        elif t == "W":
            bit = 8 if bits == 0 else 0
        else:
            bit = 0
        # strict-< order check: a REPEATED designator passes ("P1M1M")
        if bit == 0 or bit < bits:
            return False
        bits |= bit
        pos += n + 1
    return True


def _dur_time(v: str) -> bool:
    if not v:
        return False
    pos, bits = 0, 0
    while pos < len(v):
        n = pos
        while n < len(v) and (("0" <= v[n] <= "9") or v[n] == "."):
            n += 1
        ln = n - pos
        if ln == 0 or pos + ln >= len(v):
            return False
        seg = v[pos:pos + ln]
        t = v[pos + ln]
        if t in "HM":
            # Long.parseLong: digits only (leading zeros fine), <= 2^63-1
            if not re.fullmatch(r"[0-9]+", seg) or int(seg) > 9223372036854775807:
                return False
            bit = 1 if t == "H" else 2
        elif t == "S":
            # new BigDecimal(chars): "0." and ".5" parse, "." does not
            if not re.fullmatch(r"[0-9]+\.?[0-9]*|\.[0-9]+", seg):
                return False
            bit = 4
        else:
            return False
        if bit <= bits:
            return False
        bits |= bit
        pos += ln + 1
    return True


def is_duration(s: str) -> bool:
    """Mirror of the reference's hand parser (``validateDuration``,
    ``DateTimeFormatValidation.java``), quirks preserved and pinned by
    the reference fuzz: numbers are OPTIONAL before date designators
    ("PW" and "PD" are valid, value 0), multi-digit date numbers must
    not start with 0, a repeated date designator passes ("P1M1M" — the
    date order check is strict-<, the time one is <=), seconds accept
    any BigDecimal shape over [0-9.] ("PT0.S", "PT.5S"), and
    hours/minutes are Long.parseLong (no dot, fits a long)."""
    parts = s.split("T")
    if len(parts) == 1:
        return _dur_date(parts[0]) and len(parts[0]) > 1
    if len(parts) == 2:
        return _dur_date(parts[0]) and _dur_time(parts[1]) and len(s) > 2
    return False


# ---------------------------------------------------------------- regex-able

UUID_RE = r"(?i)^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$"
# [0-9], never \d: the reference's IP4_REGEX is compiled with Java
# default flags (ASCII \d, CommonFormatValidations.java:13), and this
# string is also shipped to rlike where the (?U) prefix would otherwise
# turn \d Unicode. "1٣.0.0.1" must NOT validate.
_IPV4_CORE = (
    r"((25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])"
)
IPV4_RE = "^" + _IPV4_CORE + "$"
# the reference checks ipv4 with asPredicate() (find) and a Java `$`,
# which tolerates ONE final line terminator — "1.2.3.4\n" is valid
# there; Python `$` only tolerates \n, so the kernel spells the Java
# terminator set out (the rlike path gets this behavior natively)
_IPV4_FIND_RE = re.compile(
    "^" + _IPV4_CORE + r"(?:\r\n|[\n\r\x85\u2028\u2029])?\Z")
JSON_POINTER_RE = r"^(/([^/~]|~[01])*)*$"
REL_JSON_POINTER_RE = r"^(0|[1-9][0-9]*)(#|(/([^/~]|~[01])*)*)$"


def is_uuid(s: str) -> bool:
    # the reference uses asMatchPredicate() — the ENTIRE input must
    # match, so a trailing newline rejects (unlike ipv4's find check)
    return re.fullmatch(UUID_RE, s) is not None


def is_ipv4(s: str) -> bool:
    return _IPV4_FIND_RE.match(s) is not None


def _ipv6_colon_part(s: str, from_idx: int) -> int:
    """Port of Ipv6Validator.parseIpv6ColonPart (reference
    `common/Ipv6Validator.java:78-128`): -1 on failure, else
    2 × group-count consumed bytes."""
    if not s:
        return 0
    if from_idx < 0:
        return -1
    fields = s.split(":")  # the reference's custom split KEEPS empties
    for i, field in enumerate(fields):
        if from_idx + 2 * i >= 16:
            return -1
        if len(field) > 4 or not field:
            return -1
        for c in field:
            if not ("0" <= c <= "9" or "a" <= c <= "f" or "A" <= c <= "F"):
                return -1
    return 2 * len(fields)


def _ipv6_ipv4_tail(s: str) -> int:
    """Port of Ipv6Validator.parseIpv4String: -1 on failure, else 4."""
    parts = s.split(".")
    if len(parts) != 4:
        return -1
    for p in parts:
        if not (1 <= len(p) <= 3) or not all("0" <= c <= "9" for c in p):
            return -1
        if p.startswith("0") and len(p) > 1:
            return -1
        if int(p) > 255:
            return -1
    return 4


def is_ipv6(s: str) -> bool:
    """Faithful port of the reference's format-ipv6 checker
    (`common/Ipv6Validator.java`, a vendored gist parser — a DIFFERENT
    implementation from the commons InetAddressValidator the email path
    embeds). Strips one [bracket] layer, allows at most one ``::``,
    and — quirk found by fresh-seed fuzz (round 4) — in the
    hex-groups-before-dotted-quad branch it computes
    ``4 + parseIpv6ColonPart(...)``, so a colon-part FAILURE (-1) is
    absorbed into a consumed-count of 3 instead of propagating; with
    ``::`` present the total-length check is ``< 16`` and such inputs
    VALIDATE (e.g. ``::fffbf:192.0.2.1``, ``::f%fff:192.0.2.1``)."""
    if s.startswith("[") and s.endswith("]"):
        s = s[1:-1]
    if s.count("::") > 1:
        return False
    idx = s.find("::")
    if idx == -1:
        has_dbl = False
        colon_only, colon_and_dot = None, s
    else:
        has_dbl = True
        colon_only, colon_and_dot = s[:idx], s[idx + 2:]
    consumed = _ipv6_colon_part(colon_only, 0) if colon_only else 0
    if consumed == -1:
        return False
    # parseIpv6LastBits
    t = colon_and_dot
    if "." in t:
        dot = t.index(".")
        col = t.rfind(":", 0, dot + 1)
        if col == -1:
            consumed2 = _ipv6_ipv4_tail(t)
        else:
            colon_part, dot_part = t[:col], t[col + 1:]
            if _ipv6_ipv4_tail(dot_part) == -1:
                return False
            groups = len(colon_part.split(":"))
            # the reference ADDS a possible -1 here instead of
            # propagating it — preserved deliberately (see docstring)
            consumed2 = 4 + _ipv6_colon_part(colon_part, 16 - 4 - groups * 2)
    else:
        consumed2 = _ipv6_colon_part(t, 16 - len(t.split(":")) * 2)
    if consumed2 == -1:
        return False
    if has_dbl:
        return consumed + consumed2 < 16
    return consumed + consumed2 == 16


def is_json_pointer(s: str) -> bool:
    return re.fullmatch(JSON_POINTER_RE, s) is not None


def is_relative_json_pointer(s: str) -> bool:
    return re.fullmatch(REL_JSON_POINTER_RE, s) is not None


# The Java regex dialect bridge lives in java_regex.py: schema regexes
# are java.util.regex (RegexFactory.java:20) and the kernel translates
# them into Python `re` with JVM-dumped Unicode tables. Re-exported
# here because this module is the kernel's format/regex surface.
from .java_regex import (  # noqa: F401  (re-exports)
    JavaOnlyRegex,
    JavaRegexError,
    compile_java_pattern,
    is_regex,
    java_dialect_rewrite,
)


# ---------------------------------------------------------------- URI / IRI

_URI_ILLEGAL = re.compile(r"[\x00-\x20<>\"{}|\\^`\x7f]")
_SCHEME_RE = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*$")
_PCT_RE = re.compile(r"%(?![0-9A-Fa-f]{2})")


def _uri_syntax_ok(s: str, ascii_only: bool) -> bool:
    if _URI_ILLEGAL.search(s):
        return False
    if ascii_only and not s.isascii():
        return False
    if _PCT_RE.search(s):
        return False
    if s.count("#") > 1:
        return False  # java.net.URI: '#' is illegal inside a fragment
    try:
        parts = urlsplit(s)
    except ValueError:
        return False
    if parts.scheme and not _SCHEME_RE.match(parts.scheme):
        return False
    if parts.scheme:
        rest = s[len(parts.scheme) + 1:].split("#", 1)[0]
        if rest == "":
            # java.net.URI: "Expected scheme-specific part" — "a:" and
            # "a:#f" both throw (reference-fuzz verified)
            return False
        if not rest.startswith("/"):
            # OPAQUE URI: java.net.URI imposes no authority/path
            # structure on an opaque scheme-specific part, so brackets
            # etc. are plain characters there ("https:[/x" is accepted)
            return True
    if "[" in parts.path or "]" in parts.path:
        # java.net.URI: brackets are reserved (RFC 2732) — legal in the
        # authority (IP-literal) and in query/fragment (uric), but NOT
        # in path segments (pchar)
        return False
    host = parts.netloc
    if host.startswith("[") != host.endswith("]") and ("[" in host or "]" in host):
        return False
    if "[" in host:
        inner = host[host.index("[") + 1 : host.index("]")]
        # java.net.URI supports ONLY IPv6 inside brackets — RFC 3986
        # IPvFuture literals throw ("http://[v7.host]/" is invalid in
        # the reference; reference-fuzz verified)
        try:
            ipaddress.IPv6Address(inner)
        except ValueError:
            return False
    return True


def is_uri(s: str) -> bool:
    if not _uri_syntax_ok(s, ascii_only=True):
        return False
    return bool(re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", s))


def is_uri_reference(s: str) -> bool:
    if not s:
        # parity quirk: the reference gates uri-reference on
        # ^[\x00-\x7f]+$ (one-or-more, CommonFormatValidations.java:12,
        # getURIReferenceValidator), so "" is INVALID — while its
        # iri-reference path (plain URI.create) accepts ""
        return False
    if not _uri_syntax_ok(s, ascii_only=True):
        return False
    # a fragment-only / path-only reference is fine; reject "1st:" style
    # invalid schemes: if a ':' precedes any '/', '?', '#', the prefix
    # must be a valid scheme.
    head = re.split(r"[/?#]", s, 1)[0]
    if ":" in head and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", head):
        return False
    return True


def is_iri(s: str) -> bool:
    return _uri_syntax_ok(s, ascii_only=False) and bool(
        re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", s)
    )


def is_iri_reference(s: str) -> bool:
    if not _uri_syntax_ok(s, ascii_only=False):
        return False
    head = re.split(r"[/?#]", s, 1)[0]
    if ":" in head and not re.match(r"^[A-Za-z][A-Za-z0-9+.-]*:", head):
        return False
    return True


# ---------------------------------------------------------------- uri-template

_TPL_VARCHAR = r"(?:[A-Za-z0-9_]|%[0-9A-Fa-f]{2})"
_TPL_VARNAME = re.compile(rf"{_TPL_VARCHAR}+(?:\.{_TPL_VARCHAR}+)*")
# the reference's operator enum: RFC 6570 level-1..4 ops plus its
# nonstandard ':' (NAMESPACE) — and NOT the RFC's reserved "=,!@|"
# (URITemplateOperator.java:12-24, valueOf matches enum chars only)
_TPL_OPERATORS = frozenset("+./;?&#:")


def _template_varspec_ok(spec: str) -> bool:
    """``URIVarComponent.parse`` semantics: varname over ASCII \\w |
    pct-encoded with dot-separated runs; explode OR a ':' prefix length
    that Integer.parseInt accepts (optional sign, leading zeros) in
    1..10000 inclusive (URIVarComponent.java:80-93)."""
    if not spec:
        return False
    if spec.endswith("*"):
        return _TPL_VARNAME.fullmatch(spec[:-1]) is not None
    idx = spec.find(":", 1)
    if idx == len(spec) - 1:
        return False
    if idx > 0:
        tail = spec[idx + 1:]
        if not re.fullmatch(r"[+-]?[0-9]+", tail) or not 1 <= int(tail) <= 10000:
            return False
        spec = spec[:idx]
    return _TPL_VARNAME.fullmatch(spec) is not None


def _template_expr_ok(expr: str) -> bool:
    if not expr:
        return False
    if expr[0] in _TPL_OPERATORS:
        expr = expr[1:]
        if not expr:
            return False
    parts = expr.split(",")
    # Java String.split(",") drops trailing empty segments, so the
    # reference accepts "{a,}" / "{a,,}" (URITemplateVariable.java:30)
    while len(parts) > 1 and parts[-1] == "":
        parts.pop()
    return all(_template_varspec_ok(p) for p in parts)


def is_uri_template(s: str) -> bool:
    """Brace-structure + varspec check mirroring
    ``common/uritemplate/URITemplateParser.java``: literal text is NOT
    validated (onTextFragment is a no-op in the parse() listener), so
    spaces and other illegal-URI characters are accepted outside
    expressions."""
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "{":
            j = s.find("}", i + 1)
            if j < 0 or not _template_expr_ok(s[i + 1 : j]):
                return False
            i = j + 1
        elif c == "}":
            return False
        else:
            i += 1
    return True


# ---------------------------------------------------------------- hostname

_LDH_LABEL = re.compile(r"^[A-Za-z0-9]([A-Za-z0-9-]{0,61}[A-Za-z0-9])?$")
_LDH_CHARS = re.compile(r"^[0-9a-z-]+$", re.IGNORECASE)


def _hyphens_ok(label: str) -> bool:
    return not (label.startswith("-") or label.endswith("-"))


def _decode_alabel(label: str) -> Optional[str]:
    """Punycode-decode an xn-- A-label; None when not decodable."""
    try:
        return label[4:].encode("ascii").decode("punycode")
    except (UnicodeError, UnicodeDecodeError):
        return None


def _dlh_label_ok(label: str) -> bool:
    """ASCII LDH label per the reference's validateDLHLabel
    (``common/email/HostnameValidator.java:131-152``): xn-- labels
    punycode-decode and validate as unicode labels; others are LDH with
    hyphen rules and no '--' in positions 3-4."""
    # case-SENSITIVE like the reference (HostnameValidator.java:142):
    # an uppercase "XN--" label takes the plain-DLH path below, where
    # the positions-3-4 "--" rule rejects it
    if label.startswith("xn--"):
        decoded = _decode_alabel(label.lower())  # validateALabel lowercases
        if decoded is None or not decoded:
            return False
        return _unicode_label_ok(decoded)
    if not _LDH_CHARS.match(label):
        return False
    if not _hyphens_ok(label):
        return False
    return len(label) <= 3 or not label[2:].startswith("--")


def is_hostname(s: str) -> bool:
    """RFC 1123 LDH hostname per the reference
    (``HostnameValidator.validateHostname``): ASCII-only, ≤253 chars,
    dot-separated non-empty labels ≤63 chars; a trailing dot makes the
    last label empty → invalid; xn-- labels are punycode-decoded and
    checked as unicode labels."""
    if not s or len(s) > 253 or not s.isascii():
        return False
    labels = s.split(".")
    if not labels:
        return False
    for lb in labels:
        if not lb or len(lb) > 63:
            return False
        if not _dlh_label_ok(lb):
            return False
    return True


def _bidi_ok(labels: list[str]) -> bool:
    """RFC 5893 Bidi rule over the whole domain (IDNA.java:8-50 parity
    via stdlib bidi classes instead of vendored Unicode tables): if any
    label contains an R/AL/AN character the domain is a Bidi domain and
    EVERY label must satisfy the per-label rule."""
    import unicodedata as _ud

    cls = _ud.bidirectional
    if not any(cls(c) in ("R", "AL", "AN") for lab in labels for c in lab):
        return True
    for lab in labels:
        if not lab:
            return False
        classes = [cls(c) for c in lab]
        first = classes[0]
        i = len(classes) - 1
        while i >= 0 and classes[i] == "NSM":
            i -= 1
        if first in ("R", "AL"):
            if any(c not in ("R", "AL", "AN", "EN", "ES", "CS", "ET", "ON",
                             "BN", "NSM") for c in classes):
                return False
            if i < 0 or classes[i] not in ("R", "AL", "EN", "AN"):
                return False
            if "EN" in classes and "AN" in classes:
                return False
        elif first == "L":
            if any(c not in ("L", "EN", "ES", "CS", "ET", "ON", "BN", "NSM")
                   for c in classes):
                return False
            if i < 0 or classes[i] not in ("L", "EN"):
                return False
        else:
            return False
    return True


# Joining_Type classifier for the RFC 5892 Appendix A.1/A.2 ZWNJ/ZWJ
# contextual rules, plus the script/virama sets the CONTEXTO rules use.
# unicodedata has no Joining_Type API; the exact UCD DerivedJoiningType /
# Scripts / virama (ccc=9) tables live in the generated
# ``_rfc5892_tables`` module (scripts/dump_rfc5892.py — dumped through
# the reference's public lookup classes, ``common/unicode/JoinType.java``
# / ``Scripts.java`` / ``Unicode.java``, replacing the round-3
# category+cursive-range heuristic).
from . import _rfc5892_tables as _T5892  # noqa: E402


def _range_lookup(table):
    from bisect import bisect_right

    starts = [a for a, _ in table]
    ends = [b for _, b in table]

    def contains(cp: int) -> bool:
        i = bisect_right(starts, cp) - 1
        return i >= 0 and cp <= ends[i]

    return contains


_in_join_t = _range_lookup(_T5892.JOIN_T)
_in_join_d = _range_lookup(_T5892.JOIN_D)
_in_join_r = _range_lookup(_T5892.JOIN_R)
_in_join_l = _range_lookup(_T5892.JOIN_L)
_is_virama_cp = _range_lookup(_T5892.VIRAMA)
_in_greek = _range_lookup(_T5892.SC_GREEK)
_in_hebrew = _range_lookup(_T5892.SC_HEBREW)
_in_hiragana = _range_lookup(_T5892.SC_HIRAGANA)
_in_katakana = _range_lookup(_T5892.SC_KATAKANA)
_in_han = _range_lookup(_T5892.SC_HAN)


def _is_virama(ch: str) -> bool:
    return _is_virama_cp(ord(ch))


def _joining_type(ch: str) -> str:
    cp = ord(ch)
    if _in_join_t(cp):
        return "T"
    if _in_join_d(cp):
        return "D"
    if _in_join_r(cp):
        return "R"
    if _in_join_l(cp):
        return "L"
    return "U"  # incl. ZWNJ (U) and ZWJ (join-causing, never D/L/R/T)


def _zwnj_context_ok(label: str, idx: int) -> bool:
    """RFC 5892 Appendix A.1 regex branch:
    {L,D} T* ZWNJ T* {R,D} (the virama branch is checked separately)."""
    prev = next((c for c in reversed(label[:idx]) if _joining_type(c) != "T"), None)
    nxt = next((c for c in label[idx + 1:] if _joining_type(c) != "T"), None)
    return (prev is not None and nxt is not None
            and _joining_type(prev) in ("L", "D")
            and _joining_type(nxt) in ("R", "D"))


_IDN_DOT = re.compile("[.\u3002\uff0e\uff61]")

_idna_disallowed = _range_lookup(_T5892.IDNA_DISALLOWED)
_idna_unassigned = _range_lookup(_T5892.UNASSIGNED)


def _unicode_label_ok(label: str) -> bool:
    """U-label validation, shared by idn-hostname labels and decoded
    ``xn--`` A-labels (reference ``validateUnicodeLabel``,
    ``HostnameValidator.java:175-207``): hyphen rules, leading-mark
    rejection, NFC requirement (RFC 5891 §4.2.3.1 — stricter than the
    reference, which relies on its derived-property tables alone),
    the exact IDNA2008 derived-property tables (``_rfc5892_tables``:
    unassigned / DISALLOWED, dumped through the reference's
    ``IDNA.java`` + the JVM's ``Character.isDefined`` — replacing the
    round-3 NFKC+category approximation), and the RFC 5892 contextual
    rules with exact joining types."""
    import unicodedata as _ud

    if not label or not _hyphens_ok(label):
        return False
    if _ud.category(label[0]).startswith("M"):
        return False  # leading combining mark (RFC 5891 §4.2.3.2)
    if _ud.normalize("NFC", label) != label:
        return False  # labels must be NFC (RFC 5891 §4.2.3.1)
    if len(label) >= 4 and label[2] == "-" and label[3] == "-":
        return False  # hyphens in positions 3-4 (RFC 5891 §4.2.3.1)
    for ch in label:
        cp = ord(ch)
        # RFC 5891 §4.2.2: unassigned or DISALLOWED rejects; CONTEXTO /
        # CONTEXTJ members are positionally validated below
        if _idna_unassigned(cp) or _idna_disallowed(cp):
            return False
    for idx, ch in enumerate(label):
        if ch == "\u00b7":  # MIDDLE DOT needs l·l context
            if idx == 0 or idx == len(label) - 1:
                return False
            if label[idx - 1] != "l" or label[idx + 1] != "l":
                return False
        elif ch == "\u200c":  # ZWNJ: RFC 5892 Appendix A.1
            if idx == 0:
                return False
            if not _is_virama(label[idx - 1]) and not _zwnj_context_ok(label, idx):
                return False
        elif ch == "\u200d":  # ZWJ: RFC 5892 Appendix A.2 — virama only
            if idx == 0 or not _is_virama(label[idx - 1]):
                return False
        elif ch == "\u0375":  # GREEK LOWER NUMERAL SIGN: Greek follows
            if idx == len(label) - 1 or not _is_greek(label[idx + 1]):
                return False
        elif ch in ("\u05f3", "\u05f4"):  # geresh/gershayim after Hebrew
            if idx == 0 or not _is_hebrew(label[idx - 1]):
                return False
        elif ch == "\u30fb":  # KATAKANA MIDDLE DOT needs Japanese script
            if not any(_is_jpn_han(c2) for c2 in label if c2 != "\u30fb"):
                return False
    # Arabic-Indic vs extended Arabic-Indic digits cannot mix
    has_ai = any("\u0660" <= c <= "\u0669" for c in label)
    has_eai = any("\u06f0" <= c <= "\u06f9" for c in label)
    return not (has_ai and has_eai)


def _is_greek(ch: str) -> bool:
    return _in_greek(ord(ch))


def _is_hebrew(ch: str) -> bool:
    return _in_hebrew(ord(ch))


def _is_jpn_han(ch: str) -> bool:
    cp = ord(ch)
    return _in_hiragana(cp) or _in_katakana(cp) or _in_han(cp)


def is_idn_hostname(s: str) -> bool:
    """IDNA hostname (reference ``validateIDNAHostname``,
    ``HostnameValidator.java:59-93``): ≤253 chars; labels split on "."
    and the ideographic full stops U+3002/FF0E/FF61, each non-empty and
    ≤63; ASCII labels via the LDH/A-label path, others via
    :func:`_unicode_label_ok`; plus the RFC 5893 Bidi rule over the
    decoded labels (the reference omits bidi — kept here because the
    official suite asserts it)."""
    if not s or len(s) > 253:
        return False
    if s.isascii():
        return is_hostname(s)
    labels = _IDN_DOT.split(s)
    if not labels:
        return False
    decoded_labels: list[str] = []
    for label in labels:
        if not label or len(label) > 63:
            return False
        if label.isascii():
            if not _dlh_label_ok(label):
                return False
            if label.startswith("xn--"):
                decoded_labels.append(_decode_alabel(label.lower()) or label)
            else:
                decoded_labels.append(label)
        else:
            if not _unicode_label_ok(label):
                return False
            decoded_labels.append(label)
    return _bidi_ok(decoded_labels)


# ---------------------------------------------------------------- email

# Port of the reference's commons-validator-derived EmailValidator with
# allowLocal=true, allowTld=false — BOTH `email` and `idn-email` route
# there (``compilers/FormatCompiler.java:80``,
# ``common/email/EmailValidator.java:41-53,138-189``,
# ``common/email/DomainValidator.java``).
_EMAIL_SPECIAL = r"\x00-\x1f\x7f()<>@,;:'\\" + "\".\\[\\]"
# Java \s is ASCII-only ([ \t\n\x0B\f\r]); Python \s is Unicode-wide
# and would reject e.g. U+00A0 in the local part where the reference's
# USER_REGEX accepts it — spell the Java class out.
_JAVA_WS = " \\t\\n\\x0b\\f\\r"
_EMAIL_VALID_CHAR = r"(?:\\.|[^" + _JAVA_WS + _EMAIL_SPECIAL + "])"
_EMAIL_QUOTED = r'(?:"(?:\\"|[^"])*")'
_EMAIL_WORD = "(?:(?:" + _EMAIL_VALID_CHAR + "|')+|" + _EMAIL_QUOTED + ")"
_EMAIL_USER_RE = re.compile("^" + _EMAIL_WORD + r"(?:\." + _EMAIL_WORD + ")*$")
# Java's default '.' in EMAIL_REGEX "^(.+)@(\S+)$" excludes ALL line
# terminators (\n \r \x85 \u2028 \u2029) — spell them out; Python '.'
# excludes only \n and would let "a<U+2028>b@x.com" through (the domain
# side is \S = non-ASCII-whitespace, which DOES admit U+2028 — the
# domain validators then reject it, same as the reference).
_EMAIL_RE = re.compile(
    r"^([^\n\r\x85\u2028\u2029]+)@([^" + _JAVA_WS + r"]+)$")

_DOMAIN_LABEL = r"[A-Za-z0-9](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
_TOP_LABEL = r"[A-Za-z](?:[A-Za-z0-9-]{0,61}[A-Za-z0-9])?"
_DOMAIN_NAME_RE = re.compile(rf"^(?:{_DOMAIN_LABEL}\.)+{_TOP_LABEL}\.?$")
_DOMAIN_LABEL_RE = re.compile(rf"^{_DOMAIN_LABEL}$")


def _email_unicode_to_ascii(domain: str) -> str:
    """``DomainValidator.unicodeToASCII``: IDN ToASCII for non-ASCII
    domains, returning the input unchanged when conversion fails (the
    regexes then reject it)."""
    if domain.isascii():
        return domain
    try:
        return domain.encode("idna").decode("ascii")
    except (UnicodeError, UnicodeDecodeError):
        return domain


def _email_domain_ok(domain: str) -> bool:
    """``DomainValidator(allowLocal=true).isValid``: a dotted domain
    whose TLD starts with a letter, or (local) a single LDH label."""
    ascii_d = _email_unicode_to_ascii(domain)
    if len(ascii_d) > 253:
        return False
    if _DOMAIN_NAME_RE.fullmatch(ascii_d):
        return True
    return _DOMAIN_LABEL_RE.fullmatch(ascii_d) is not None


def _java_digit16(ch: str) -> int:
    """Java Character.digit(ch, 16): ASCII hex, ANY Unicode decimal
    digit (category Nd — e.g. ٣ = 3), and fullwidth Latin a-f/A-F.
    Returns -1 when the character is not a base-16 digit."""
    if "0" <= ch <= "9":
        return ord(ch) - 48
    if "a" <= ch <= "f":
        return ord(ch) - 87
    if "A" <= ch <= "F":
        return ord(ch) - 55
    if ("a" <= ch <= "z") or ("A" <= ch <= "Z"):
        return -1  # g..z are >= 16 for radix 16
    d = unicodedata.decimal(ch, -1)
    if d != -1:
        return d
    o = ord(ch)
    if 0xFF21 <= o <= 0xFF3A:  # fullwidth A-Z
        v = o - 0xFF21 + 10
        return v if v < 16 else -1
    if 0xFF41 <= o <= 0xFF5A:  # fullwidth a-z
        v = o - 0xFF41 + 10
        return v if v < 16 else -1
    return -1


def _java_blank(s: str) -> bool:
    """Java String.isBlank: every char passes Character.isWhitespace —
    which EXCLUDES no-break spaces (U+00A0/U+2007/U+202F), unlike
    Python's str.isspace/strip."""
    return all(
        c in "\t\n\x0b\f\r\x1c\x1d\x1e\x1f"
        or (unicodedata.category(c) in ("Zs", "Zl", "Zp")
            and c not in "\xa0  ")
        for c in s
    )


def _java_parse_int16(s: str) -> Optional[int]:
    """Java Integer.parseInt(s, 16) semantics for the commons octet
    check: optional leading ASCII sign, ≥ 1 digit, digits resolved via
    Character.digit (so Unicode decimal digits parse — fresh-seed fuzz
    found the reference accepting ``a@[IPv6:٣::1]``). Returns None on
    NumberFormatException (overflow cannot occur at ≤ 4 chars)."""
    if not s:
        return None
    sign = 1
    body = s
    if s[0] in "+-":
        sign = -1 if s[0] == "-" else 1
        body = s[1:]
        if not body:
            return None
    val = 0
    for ch in body:
        d = _java_digit16(ch)
        if d < 0:
            return None
        val = val * 16 + d
    return sign * val
_COMMONS_IPV4 = re.compile(r"([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})\.([0-9]{1,3})")


def _commons_ipv4_ok(s: str) -> bool:
    m = _COMMONS_IPV4.fullmatch(s)
    if not m:
        return False
    for seg in m.groups():
        if int(seg) > 255 or (len(seg) > 1 and seg.startswith("0")):
            return False
    return True


def _email_ipv6_ok(addr: str) -> bool:
    """Faithful port of the vendored commons
    InetAddressValidator.isValidInet6Address
    (InetAddressValidator.java:134-227), which the email path uses —
    unlike the format-ipv6 Ipv6Validator. Quirks preserved (reference
    format fuzz): optional /prefix (1-3 ASCII digits, <= 128), optional
    %zone (no whitespace, / or %), an exact "IPv6:" prefix stripped, no brackets,
    and each hex group parsed with Integer.parseInt(s, 16) — which
    accepts a LEADING SIGN, so "::+1" is a valid address here."""
    parts = addr.split("/")
    if len(parts) > 2:
        return False
    if len(parts) == 2:
        if not re.fullmatch(r"[0-9]{1,3}", parts[1]) or int(parts[1]) > 128:
            return False
    zparts = parts[0].split("%")
    if len(zparts) > 2 or (len(zparts) == 2
                           and not re.fullmatch(r"[^\s/%]+", zparts[1])):
        return False
    a = zparts[0]
    if a.startswith("IPv6:"):
        a = a[5:]
    compressed = "::" in a
    if compressed and a.find("::") != a.rfind("::"):
        return False
    starts_c = a.startswith("::")
    ends_c = a.endswith("::")
    if (a.startswith(":") and not starts_c) or (a.endswith(":") and not ends_c):
        return False
    octets = a.split(":")
    # Java String.split(":") drops ALL trailing empty segments (so
    # "::" → [] and "1::" → ["1"]) — Python keeps them. Fresh-seed
    # fuzz (round 4): without this, "IPv6:::" and "1::" were rejected
    # as consecutive-empty-chunk errors the reference never sees.
    while octets and octets[-1] == "":
        octets.pop()
    if compressed:
        if ends_c:
            octets.append("")  # the reference re-adds ONE trailing empty
        elif starts_c and octets:
            octets.pop(0)
    if len(octets) > 8:
        return False
    valid = 0
    empty = 0
    for idx, octet in enumerate(octets):
        if _java_blank(octet):  # Java String.isBlank
            empty += 1
            if empty > 1:
                return False
        else:
            empty = 0
            if idx == len(octets) - 1 and "." in octet:
                if not _commons_ipv4_ok(octet):
                    return False
                valid += 2
                continue
            if len(octet) > 4:
                return False
            v = _java_parse_int16(octet)
            if v is None or v < 0 or v > 0xFFFF:
                return False
        valid += 1
    if valid > 8 or (valid < 8 and not compressed):
        return False
    return True


def _email_ok(s: str) -> bool:
    if not s or s.endswith("."):
        return False
    m = _EMAIL_RE.fullmatch(s)
    if not m:
        return False
    user, domain = m.group(1), m.group(2)
    if len(user) > 64 or not _EMAIL_USER_RE.fullmatch(user):
        return False
    if domain.startswith("[") and domain.endswith("]"):
        inner = domain[1:-1]
        if is_ipv4(inner):
            return True
        return _email_ipv6_ok(inner)
    return _email_domain_ok(domain)


def is_email(s: str) -> bool:
    return _email_ok(s)


def is_idn_email(s: str) -> bool:
    # the reference uses ONE validator for both formats
    # (FormatCompiler.java:80)
    return _email_ok(s)


# ---------------------------------------------------------------- registry

FORMAT_VALIDATORS: dict[str, Callable[[str], bool]] = {
    "date": is_date,
    "time": is_time,
    "date-time": is_datetime,
    "duration": is_duration,
    "uuid": is_uuid,
    "ipv4": is_ipv4,
    "ipv6": is_ipv6,
    "uri": is_uri,
    "uri-reference": is_uri_reference,
    "iri": is_iri,
    "iri-reference": is_iri_reference,
    "uri-template": is_uri_template,
    "json-pointer": is_json_pointer,
    "relative-json-pointer": is_relative_json_pointer,
    "regex": is_regex,
    "email": is_email,
    "idn-email": is_idn_email,
    "hostname": is_hostname,
    "idn-hostname": is_idn_hostname,
}

# formats whose check is a single anchored regex — these compile to a
# JVM-side ``rlike`` Column instead of a pandas UDF (SURVEY §2.8).
FORMAT_REGEXES: dict[str, str] = {
    # Java-side (rlike) variants. uuid and the pointers must match the
    # ABSOLUTE end of input like the kernel's fullmatch / the
    # reference's asMatchPredicate()/char-walk, so their `$` (which in
    # Java tolerates a final line terminator) becomes `\z`. ipv4 keeps
    # `$`: the reference checks it with asPredicate() (find), whose
    # terminator tolerance Java `$` reproduces natively.
    "uuid": UUID_RE.replace("$", r"\z"),
    "ipv4": IPV4_RE,
    "json-pointer": JSON_POINTER_RE.replace("$", r"\z"),
    "relative-json-pointer": REL_JSON_POINTER_RE.replace("$", r"\z"),
}


def is_format_valid(name: str, value: object) -> bool:
    """Verdict for ``format`` keyword: unknown formats and non-string
    instances always pass."""
    if not isinstance(value, str):
        return True
    fn = FORMAT_VALIDATORS.get(name)
    return True if fn is None else fn(value)
