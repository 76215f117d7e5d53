"""M3 encoding cascade (SURVEY.md §2.7 item 6)."""

from crawtext_ray.extract.encoding import decode_html, detect_encoding


def test_bom_utf8():
    raw = b"\xef\xbb\xbf<html>caf\xc3\xa9</html>"
    text, enc = decode_html(raw)
    assert enc == "utf-8-sig"
    assert "café" in text
    assert not text.startswith("﻿")


def test_bom_utf16():
    raw = "éx".encode("utf-16-le")
    assert detect_encoding(b"\xff\xfe" + raw) == "utf-16-le"
    raw = b"\xfe\xff" + "éx".encode("utf-16-be")
    text, enc = decode_html(raw)
    assert enc == "utf-16-be"
    assert "éx" in text


def test_meta_charset():
    raw = '<meta charset="ISO-8859-1"><p>caf\xe9</p>'.encode("latin-1")
    text, enc = decode_html(raw)
    assert enc == "iso8859-1"
    assert "café" in text


def test_meta_http_equiv():
    raw = (
        b'<meta http-equiv="Content-Type" content="text/html; charset=iso-8859-1">'
        b"caf\xe9"
    )
    text, enc = decode_html(raw)
    assert enc == "iso8859-1"
    assert "café" in text


def test_strict_utf8_wins_without_meta():
    raw = "<p>café 中文</p>".encode("utf-8")
    text, enc = decode_html(raw)
    assert enc == "utf-8"
    assert "中文" in text


def test_fallback_latin1_never_raises():
    raw = b"\xff\xfb\x01 broken \xfe bytes"
    text, enc = decode_html(raw)
    assert isinstance(text, str) and len(text) > 0


def test_unknown_meta_charset_falls_through():
    raw = b'<meta charset="not-a-codec">plain ascii'
    text, enc = decode_html(raw)
    assert enc == "utf-8"
    assert "plain ascii" in text
