"""Content-vocabulary parity with the reference's decoders/parsers.

The reference's contentEncoding validators are java.util.Base64's BASIC
decoder and a byte-walking quoted-printable check
(``ContentUtils.java:140-198``); its JSON media handling is
``MimeType.hasJsonContent`` + Jackson ``readTree`` defaults
(``MimeType.java:47-49``, ``JsonUtils.java:11-19``). These tests pin the
corner semantics the suite corpus can't reach (contentSchema needs the
ENCODING_AND_SCHEMA level, which the suite runner doesn't toggle).
"""

import base64

import pytest

from json_schema_spark.core.validator import CompileConfig, compile_schema
from json_schema_spark.functions import content as C


def _cs(schema, level=C.ENCODING_AND_SCHEMA):
    return compile_schema(
        schema, config=CompileConfig(dialect="2020-12", content_mode=level))


def test_content_schema_validates_json_null():
    """JSON null content must reach the contentSchema — a None parse
    result means 'null', not 'no value' (the old guard skipped it)."""
    cs = _cs({"contentMediaType": "application/json",
              "contentSchema": {"type": "null"}})
    assert cs.is_valid("null") is True
    cs2 = _cs({"contentMediaType": "application/json",
               "contentSchema": {"type": "string"}})
    assert cs2.is_valid("null") is False
    assert cs2.is_valid("\"s\"") is True


def test_content_schema_skipped_for_unknown_media():
    cs = _cs({"contentMediaType": "application/x-unknown",
              "contentSchema": {"type": "string"}})
    # unknown media type: nothing parsed, contentSchema can't run
    assert cs.is_valid("12") is True


def test_invalid_utf8_decodes_with_replacement():
    """new String(data, UTF_8) never throws — bad sequences become
    U+FFFD and flow on to the media-type step."""
    payload = base64.b64encode(b'"\xff"').decode()
    cs = _cs({"contentEncoding": "base64",
              "contentMediaType": "application/json",
              "contentSchema": {"type": "string"}})
    assert cs.is_valid(payload) is True  # parses as the U+FFFD string


@pytest.mark.parametrize("data,ok", [
    ("QQ", True), ("QQ==", True), ("QQQ", True), ("QQQ=", True),
    ("QQ=", False), ("Q", False), ("QQQQ=", False), ("", True),
    ("aGVs bG8=", False), ("aGVsbG8=\n", False), ("QQ==QQ==", False),
])
def test_base64_java_basic_decoder(data, ok):
    assert (C.decode_base64(data) is not None) is ok


@pytest.mark.parametrize("data,ok", [
    ("ab=3d", True), ("ab=3D", True), ("a=\r\nb", True), ("a=\nb", True),
    ("a=\rb", True), ("a\nb", False), ("a\rb", False), ("ab=", False),
    ("a=3", False), ("a=zz", False), ("a\tb c", True), ("a\x07b", False),
])
def test_quoted_printable_reference_walk(data, ok):
    assert (C.decode_quoted_printable(data) is not None) is ok


def test_quoted_printable_non_ascii_byteifies_like_java():
    # Java s.getBytes(US_ASCII) turns unmappable chars into '?'
    assert C.decode_quoted_printable("café") == b"caf?"


@pytest.mark.parametrize("mt,ok", [
    ("application/json", True), ("application/ld+json", True),
    ("Application/GEO+JSON; charset=utf-8", True), ("application/jwt", True),
    ("text/json", False), ("application/xml", False), ("json", False),
])
def test_jsonish_media_predicate(mt, ok):
    assert C.is_jsonish_media(mt) is ok


def test_json_media_jackson_defaults():
    # reference-fuzz-pinned ObjectReader.readTree behavior: one root
    # value, trailing ignored, but root tokens must terminate cleanly
    assert C.parse_json_media("{} junk") == {}
    assert C.parse_json_media("  [1, 2]tail") == [1, 2]
    assert C.parse_json_media('"s"x') == "s"
    assert C.parse_json_media("1 2") == 1          # space-terminated root number
    assert C.parse_json_media("42=") is C.PARSE_FAIL   # root number needs space
    assert C.parse_json_media("01") is C.PARSE_FAIL    # leading zero
    assert C.parse_json_media("trueA") is C.PARSE_FAIL  # unrecognized token
    assert C.parse_json_media("null.") is None     # '.' ends the literal cleanly
    assert C.parse_json_media("NaN") is C.PARSE_FAIL
    assert C.parse_json_media("-Infinity") is C.PARSE_FAIL
    assert C.parse_json_media("") is None          # Jackson MissingNode
    assert C.parse_json_media("   ") is None
    assert C.parse_json_media("null") is None
