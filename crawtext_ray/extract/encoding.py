"""Encoding detection + decode (SURVEY.md §2.2 M3, contract §2.7 item 6).

Reference behavior: goose: goose/utils/encoding.py (smart_unicode) +
crawtext: page.py charset handling. Our deterministic cascade, frozen for
golden stability:

1. BOM: UTF-8-sig / UTF-16 LE / UTF-16 BE.
2. ``<meta charset=...>`` or http-equiv Content-Type charset regex over the
   first 4096 bytes (ASCII-decoded with replacement for the scan).
3. Strict UTF-8 attempt.
4. charset_normalizer best guess.
5. latin-1 fallback.

All decodes use errors="replace" (except the strict utf-8 probe).
"""

from __future__ import annotations

import codecs
import re

_META_CHARSET = re.compile(
    rb"""<meta[^>]+charset\s*=\s*["']?\s*([A-Za-z0-9_\-:.]+)""", re.IGNORECASE
)
_HEAD_BYTES = 4096


def _lookup(name: str) -> str | None:
    try:
        return codecs.lookup(name.strip().strip('"').strip("'")).name
    except (LookupError, ValueError):
        return None


def detect_encoding(html) -> str:
    """Return the codec name the cascade selects (without decoding).
    Accepts bytes or any bytes-like buffer (e.g. a zero-copy memoryview
    over an Arrow binary column — the hot path never copies the html)."""
    head = bytes(html[:3])
    if head.startswith(codecs.BOM_UTF8):
        return "utf-8-sig"
    if head.startswith(codecs.BOM_UTF16_LE):
        return "utf-16-le"
    if head.startswith(codecs.BOM_UTF16_BE):
        return "utf-16-be"
    m = _META_CHARSET.search(html[:_HEAD_BYTES])
    if m:
        enc = _lookup(m.group(1).decode("ascii", "replace"))
        if enc is not None:
            return enc
    try:
        codecs.decode(html, "utf-8", "strict")
        return "utf-8"
    except (UnicodeDecodeError, ValueError):
        pass
    try:
        from charset_normalizer import from_bytes

        best = from_bytes(bytes(html[: 64 * 1024])).best()
        if best is not None:
            enc = _lookup(best.encoding)
            if enc is not None:
                return enc
    except Exception:
        pass
    return "iso8859-1"


def decode_html(html) -> tuple[str, str]:
    """bytes-like -> (str, codec_used). Never raises."""
    enc = detect_encoding(html)
    if enc in ("utf-16-le", "utf-16-be"):
        # strip the BOM explicitly; -le/-be codecs keep it as a char
        html = html[2:]
    try:
        return codecs.decode(html, enc, "replace"), enc
    except (LookupError, ValueError):  # pragma: no cover - defensive
        return codecs.decode(html, "iso8859-1", "replace"), "iso8859-1"
