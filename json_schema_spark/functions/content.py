"""Content vocabulary: contentEncoding / contentMediaType / contentSchema.

Mirrors the reference's chained pipeline (decode → media-type parse →
subschema) from ``compilers/ContentTypesCompilerFactory.java:31-175`` and
``common/content/ContentUtils.java:22-199``:

* built-in encodings: ``base64`` with java.util.Base64 BASIC-decoder
  semantics (any non-alphabet char rejects — Spark's ``unbase64`` is
  lenient, hence this module — while final padding is optional),
  ``quoted-printable`` (byte-walk of the reference's check), ``7bit``;
* built-in media types: application/*json suffixes + application/jwt,
  parsed with Jackson-readTree defaults;
* assertion levels (``IContentProcessing.java:8-32``): draft-07 asserts
  encoding+mediaType by default, 2019-09/2020-12 treat them as
  annotations unless explicitly enabled.
"""

from __future__ import annotations

import base64
import binascii
import json as json_mod
import re
from decimal import Decimal as _Decimal
from typing import Any, Callable, Optional

__all__ = [
    "DISABLED",
    "DEFAULT",
    "ENCODING",
    "ENCODING_AND_SCHEMA",
    "decode_content",
    "parse_media_type",
    "is_known_media",
    "DECODERS",
    "MEDIA_TYPE_PARSERS",
    "PARSE_FAIL",
]

# assertion levels
DISABLED = "disabled"
DEFAULT = "default"  # dialect decides (draft7 → assert; 2019+ → no)
ENCODING = "encoding"  # assert decode + media type
ENCODING_AND_SCHEMA = "encoding_and_schema"  # additionally run contentSchema

_B64_RE = re.compile(r"^[A-Za-z0-9+/]*={0,2}$")


def decode_base64(s: str) -> Optional[bytes]:
    """``java.util.Base64.getDecoder()`` semantics (the reference's
    checkBase64, ContentUtils.java:195-198): the BASIC decoder, so any
    non-alphabet character — including whitespace — rejects; '=' may
    appear only as final padding; the final padding is OPTIONAL
    ("QQ" decodes like "QQ=="), but explicit padding must complete a
    4-char quad and a 1-char final unit is always illegal."""
    if not _B64_RE.match(s):
        return None
    data_len = len(s.rstrip("="))
    pad = len(s) - data_len
    rem = data_len % 4
    if pad:
        if rem not in (2, 3) or pad != 4 - rem:
            return None
    elif rem == 1:
        return None
    try:
        return base64.b64decode(s[:data_len] + "=" * (-data_len % 4),
                                validate=True)
    except (binascii.Error, ValueError):
        return None


def _hexval(b: int) -> int:
    c = chr(b)
    if "0" <= c <= "9":
        return b - 0x30
    if "a" <= c <= "f":
        return b - 0x57
    if "A" <= c <= "F":
        return b - 0x37
    return -1


def decode_quoted_printable(s: str) -> Optional[bytes]:
    """Byte-walk port of the reference's checkQuotedPrintable
    (ContentUtils.java:140-185): input is byte-ified as US_ASCII with
    '?' substitution for unmappable chars (Java's encoder behavior),
    '=' starts either a soft line break (=\\r, =\\n or =\\r\\n) or a
    hex pair in EITHER case (Character.digit accepts a-f); literal
    bytes are limited to 33-60, 62-126, TAB and SPACE — raw newlines
    are NOT legal outside a soft break."""
    data = s.encode("ascii", errors="replace")
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        c = data[i]
        if c == 0x3D:  # '='
            i += 1
            if i >= n:
                return None  # dangling '='
            nxt = data[i]
            if nxt in (0x0D, 0x0A):  # soft break
                i += 1
                if nxt == 0x0D and i < n and data[i] == 0x0A:
                    i += 1
                continue
            i += 1
            if i >= n:
                return None  # not a full hex pair
            h1, h2 = _hexval(nxt), _hexval(data[i])
            if h1 < 0 or h2 < 0:
                return None
            out.append((h1 << 4) | h2)
            i += 1
        elif 33 <= c <= 60 or 62 <= c <= 126 or c in (9, 32):
            out.append(c)
            i += 1
        else:
            return None
    return bytes(out)


def decode_7bit(s: str) -> Optional[bytes]:
    try:
        b = s.encode("ascii")
    except UnicodeEncodeError:
        return None
    return b if all(x < 0x80 for x in b) else None


DECODERS: dict[str, Callable[[str], Optional[bytes]]] = {
    "base64": decode_base64,
    "quoted-printable": decode_quoted_printable,
    "7bit": decode_7bit,
}


def decode_content(encoding: str, value: str,
                   extra: Optional[dict] = None) -> tuple[bool, Optional[str]]:
    """Returns (decode_ok, decoded_text). Unknown encodings pass with the
    raw value (spec: unknown → annotation only). ``extra`` holds
    user-registered decoders (SimpleContentValidationRegistry analogue)
    consulted before the built-ins."""
    dec = (extra or {}).get(encoding.lower()) or DECODERS.get(encoding.lower())
    if dec is None:
        return True, value
    raw = dec(value)
    if raw is None:
        return False, None
    # the reference builds the decoded text with `new String(data,
    # UTF_8)` (ContentUtils.java:185,197): invalid sequences become
    # U+FFFD, never an error
    return True, raw.decode("utf-8", errors="replace")


class _ParseFail:
    """Sentinel distinguishing 'parse failed' from a parsed JSON null."""


PARSE_FAIL = _ParseFail()


def _reject_nonfinite(name: str):
    # Jackson default: NaN / Infinity / -Infinity are not legal JSON
    raise ValueError(f"non-finite literal {name}")


_JACKSONISH_DECODER = json_mod.JSONDecoder(
    parse_float=_Decimal, parse_constant=_reject_nonfinite)
_JSON_WS = re.compile(r"[ \t\n\r]*")


def parse_json_media(text: str) -> Any:
    """Jackson ``ObjectReader.readTree`` semantics (the reference's
    JsonUtils.parse, pinned by the reference content fuzz on jackson
    2.21). ONE root value is parsed and anything after it is IGNORED
    ('{"a":1} junk', '1 2', 'null.' all parse) — but the root token
    itself must terminate cleanly:

    * a root NUMBER must be followed by whitespace or EOF ("42=",
      "01", "4\x002" all throw "expected space separating root-level
      values" / leading-zero errors);
    * a true/false/null literal must not be followed by an identifier
      character ("trueA" is an unrecognized token; "null." is fine);
    * strings and balanced objects/arrays always end cleanly.

    Non-finite number literals are rejected; EMPTY or whitespace-only
    input parses to MissingNode WITHOUT throwing (represented as None
    here — the contentSchema corner where MissingNode differs from
    JSON null is documented, not modeled). Returns PARSE_FAIL (never
    None — JSON null also parses to None) on failure."""
    start = _JSON_WS.match(text).end()
    if start == len(text):
        return None  # Jackson MissingNode: empty input is parseable
    try:
        v, end = _JACKSONISH_DECODER.raw_decode(text, start)
    except (ValueError, RecursionError):
        return PARSE_FAIL
    nxt = text[end] if end < len(text) else ""
    lead = text[start]
    if lead not in "\"[{":
        if lead in "tfn":  # literal token boundary
            if nxt and (nxt.isalnum() or nxt in "_$"):
                return PARSE_FAIL
        elif nxt and nxt not in " \t\n\r":  # root number needs space
            return PARSE_FAIL
    return v


def is_jsonish_media(media_type: str) -> bool:
    """``MimeType.hasJsonContent`` (MimeType.java:47-49): parameters
    stripped, case-insensitive; application/<...>json (any subtype
    ending in "json", so ld+json / geo+json / plain json) plus the
    reference's application/jwt quirk."""
    mime = media_type.split(";")[0]
    if "/" not in mime:
        return False
    typ, sub = mime.split("/", 1)
    typ, sub = typ.strip().lower(), sub.strip().lower()
    return typ == "application" and (sub.endswith("json") or sub == "jwt")


MEDIA_TYPE_PARSERS: dict[str, Callable[[str], Any]] = {
    "application/json": parse_json_media,
}


def is_known_media(media_type: str, extra: Optional[dict] = None) -> bool:
    """True when some parser (user-registered, built-in, or the JSON
    suffix predicate) handles this media type — i.e. contentSchema has
    a parsed value to validate."""
    return bool((extra or {}).get(media_type.lower())
                or MEDIA_TYPE_PARSERS.get(media_type.lower())
                or is_jsonish_media(media_type))


def parse_media_type(media_type: str, text: str,
                     extra: Optional[dict] = None) -> tuple[bool, Any]:
    """Returns (parse_ok, parsed_value). Unknown media types pass.
    ``extra`` holds user-registered parsers (MimeTypeValidator
    registration analogue) consulted before the built-ins; user parsers
    keep the None-means-failure contract, the built-in JSON parser uses
    the PARSE_FAIL sentinel so JSON null round-trips."""
    parser = ((extra or {}).get(media_type.lower())
              or MEDIA_TYPE_PARSERS.get(media_type.lower()))
    if parser is None and is_jsonish_media(media_type):
        parser = parse_json_media
    if parser is None:
        return True, None
    if text is None:
        return False, None
    v = parser(text)
    if v is PARSE_FAIL:
        return False, None
    if v is None and parser is not parse_json_media:
        return (text.strip() == "null"), None
    return True, v
