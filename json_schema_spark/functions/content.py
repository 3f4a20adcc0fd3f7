"""Content vocabulary: contentEncoding / contentMediaType / contentSchema.

Mirrors the reference's chained pipeline (decode → media-type parse →
subschema) from ``compilers/ContentTypesCompilerFactory.java:31-175`` and
``common/content/ContentUtils.java:22-199``:

* built-in encodings: strict ``base64`` (reject non-alphabet chars and
  bad padding — Spark's ``unbase64`` is lenient, hence this module),
  ``quoted-printable``, ``7bit``;
* built-in media type: JSON;
* assertion levels (``IContentProcessing.java:8-32``): draft-07 asserts
  encoding+mediaType by default, 2019-09/2020-12 treat them as
  annotations unless explicitly enabled.
"""

from __future__ import annotations

import base64
import binascii
import re
from typing import Any, Callable, Optional

from ..core.jsonvalue import parse_json

__all__ = [
    "DISABLED",
    "DEFAULT",
    "ENCODING",
    "ENCODING_AND_SCHEMA",
    "decode_content",
    "parse_media_type",
    "DECODERS",
    "MEDIA_TYPE_PARSERS",
]

# assertion levels
DISABLED = "disabled"
DEFAULT = "default"  # dialect decides (draft7 → assert; 2019+ → no)
ENCODING = "encoding"  # assert decode + media type
ENCODING_AND_SCHEMA = "encoding_and_schema"  # additionally run contentSchema

_B64_RE = re.compile(r"^[A-Za-z0-9+/]*={0,2}$")


def decode_base64(s: str) -> Optional[bytes]:
    s2 = "".join(s.split())
    if len(s2) % 4 != 0 or not _B64_RE.match(s2):
        return None
    try:
        return base64.b64decode(s2, validate=True)
    except (binascii.Error, ValueError):
        return None


_QP_RE = re.compile(r"^(=([0-9A-F]{2}|\r\n)|[\t\r\n\x20-\x3c\x3e-\x7e])*$")


def decode_quoted_printable(s: str) -> Optional[bytes]:
    if not _QP_RE.match(s):
        return None
    out = bytearray()
    i, n = 0, len(s)
    while i < n:
        c = s[i]
        if c == "=":
            if s[i + 1 : i + 3] == "\r\n":
                i += 3
                continue
            out.append(int(s[i + 1 : i + 3], 16))
            i += 3
        else:
            out.append(ord(c))
            i += 1
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
    try:
        return True, raw.decode("utf-8")
    except UnicodeDecodeError:
        return True, None  # decoded but not text; media-type step decides


def parse_json_media(text: str) -> Optional[Any]:
    try:
        return parse_json(text)
    except (ValueError, RecursionError):
        return None


MEDIA_TYPE_PARSERS: dict[str, Callable[[str], Optional[Any]]] = {
    "application/json": parse_json_media,
}


def parse_media_type(media_type: str, text: str,
                     extra: Optional[dict] = None) -> tuple[bool, Optional[Any]]:
    """Returns (parse_ok, parsed_value). Unknown media types pass.
    ``extra`` holds user-registered parsers (MimeTypeValidator
    registration analogue) consulted before the built-ins."""
    parser = ((extra or {}).get(media_type.lower())
              or MEDIA_TYPE_PARSERS.get(media_type.lower()))
    if parser is None:
        return True, None
    if text is None:
        return False, None
    v = parser(text)
    return (v is not None or text.strip() == "null"), v
