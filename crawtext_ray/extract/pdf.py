"""Minimal PDF text extraction (north rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics" — the PDF/layout leg).

No PDF library exists in this environment, so this is a from-scratch
pure-Python extractor for the common machine-generated case:

- objects scanned by ``N G obj ... endobj`` (no xref walking — resilient
  to broken offsets, like the lenient HTML parser);
- ``stream`` payloads inflated with stdlib zlib when the object dict
  says FlateDecode (or tried anyway), used raw otherwise;
- text pulled from BT..ET blocks: ``(...) Tj``, ``(...) '``, ``[...] TJ``
  (with PDF string escapes and octal), hex strings ``<...> Tj``;
- layout heuristic: TJ kerning gaps < -150/1000 em become spaces; text
  line operators (Td/TD/T*/') become newlines; pages (detected via
  /Type /Page count) joined with form feeds is overkill — blocks joined
  with blank lines, matching the extractor's paragraph contract.

Out of scope (returned as ``status="unsupported"`` when nothing could be
decoded): encrypted files, exotic filters (JBIG2/DCT-only), CID/Type0
fonts with non-ASCII code maps. The Ray-side plumbing treats those rows
like parse errors — never a crash.
"""

from __future__ import annotations

import re
import zlib

_OBJ_RE = re.compile(rb"\d+\s+\d+\s+obj(.*?)endobj", re.DOTALL)
_STREAM_RE = re.compile(rb"stream\r?\n(.*?)\r?\nendstream", re.DOTALL)
# /Length-annotated stream head: the payload is EXACTLY Length bytes, so
# compressed data that happens to contain "endstream"/"endobj" cannot
# truncate the scan (a real 1-in-hundreds failure of the delimiter-based
# object regex on Flate output). Flat dicts only — nested-dict heads
# fall back to the delimiter scan.
_LEN_STREAM_RE = re.compile(
    rb"<<(?P<dict>[^<>]*?/Length\s+(?P<len>\d+)(?P<ind>\s+\d+\s+R)?"
    rb"[^<>]*?)>>\s*stream\r?\n"
)
_BT_ET_RE = re.compile(rb"BT(.*?)ET", re.DOTALL)
# (string) Tj | (string) ' | [array] TJ  + text-line operators
_SHOW_RE = re.compile(
    rb"""\((?P<lit>(?:\\.|[^\\()])*)\)\s*(?:Tj|')"""
    rb"""|\[(?P<arr>(?:\\.|[^\]])*)\]\s*TJ"""
    rb"""|<(?P<hex>[0-9A-Fa-f\s]+)>\s*Tj"""
    rb"""|(?P<nl>T\*|Td|TD)""",
    re.DOTALL,
)
_ARR_ITEM_RE = re.compile(
    rb"\((?P<lit>(?:\\.|[^\\()])*)\)|<(?P<hex>[0-9A-Fa-f\s]+)>|(?P<num>-?\d+(?:\.\d+)?)"
)
_ESCAPES = {
    b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
    b"(": b"(", b")": b")", b"\\": b"\\",
}


def _unescape(lit: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(lit):
        c = lit[i : i + 1]
        if c == b"\\" and i + 1 < len(lit):
            nxt = lit[i + 1 : i + 2]
            if nxt in _ESCAPES:
                out += _ESCAPES[nxt]
                i += 2
                continue
            if nxt in b"01234567":  # octal \ddd (1-3 octal digits only;
                # \8 and \9 are invalid octal — fall through to the
                # emit-literal-char branch below, per PDF spec behavior
                j = i + 1
                digits = b""
                while (
                    j < len(lit) and len(digits) < 3 and lit[j : j + 1] in b"01234567"
                ):
                    digits += lit[j : j + 1]
                    j += 1
                out.append(int(digits, 8) & 0xFF)
                i = j
                continue
            if nxt in (b"\n", b"\r"):  # line continuation
                i += 2
                continue
            out += nxt
            i += 2
            continue
        out += c
        i += 1
    return bytes(out)


def _hex_bytes(h: bytes) -> bytes:
    h = re.sub(rb"\s+", b"", h)
    if len(h) % 2:
        h += b"0"
    try:
        return bytes.fromhex(h.decode("ascii"))
    except ValueError:
        return b""


def _content_text(stream: bytes) -> str:
    parts: list[str] = []
    for block in _BT_ET_RE.findall(stream):
        line: list[str] = []
        lines: list[str] = []

        def flush_line() -> None:
            if line:
                lines.append("".join(line).strip())
                line.clear()

        for m in _SHOW_RE.finditer(block):
            if m.group("nl") is not None:
                flush_line()
                continue
            if m.group("lit") is not None:
                line.append(_unescape(m.group("lit")).decode("latin-1"))
            elif m.group("hex") is not None:
                line.append(_hex_bytes(m.group("hex")).decode("latin-1"))
            else:  # TJ array: strings + kerning numbers
                for am in _ARR_ITEM_RE.finditer(m.group("arr")):
                    if am.group("lit") is not None:
                        line.append(_unescape(am.group("lit")).decode("latin-1"))
                    elif am.group("hex") is not None:
                        line.append(_hex_bytes(am.group("hex")).decode("latin-1"))
                    elif float(am.group("num")) < -150:
                        line.append(" ")  # large negative kern = word gap
        flush_line()
        text = "\n".join(l for l in lines if l)
        if text.strip():
            parts.append(text.strip())
    return "\n\n".join(parts)


def extract_pdf_text(data: bytes) -> dict:
    """bytes -> {text, n_pages, status}. Never raises."""
    if not data.startswith(b"%PDF"):
        return {"text": "", "n_pages": 0, "status": "not_pdf"}
    n_pages = len(re.findall(rb"/Type\s*/Page[^s]", data))
    texts: list[str] = []

    def try_stream(head: bytes, raw: bytes) -> bool:
        """True iff the slice is VALIDATED consumed: either Flate
        decompression succeeded (the /Length was provably right) or the
        payload actually yielded text. An uncompressed payload that
        produced nothing is NOT marked consumed — a lying direct /Length
        on a raw stream is undetectable here, so the delimiter scan must
        still get a chance at the full-span slice (the recovery path for
        single-stream malformed PDFs)."""
        validated = False
        if b"/FlateDecode" in head:
            try:
                raw = zlib.decompress(raw)
            except zlib.error:
                return False
            validated = True
        elif b"/Filter" in head:
            return False  # unsupported filter
        if b"BT" not in raw:
            return validated
        try:
            t = _content_text(raw)
        except Exception:
            # malformed content stream — no text, but a Flate-validated
            # slice is still consumed ("never raises")
            return validated
        if t:
            texts.append(t)
            return True
        return validated

    # primary pass: /Length-bounded streams (robust to delimiter bytes
    # inside compressed payloads). Indirect lengths (`/Length 5 0 R`)
    # are skipped here — the captured digits are an object NUMBER, not a
    # byte count — and left to the delimiter scan below.
    consumed: list[tuple[int, int]] = []
    for sm in _LEN_STREAM_RE.finditer(data):
        if sm.group("ind") is not None:
            continue
        n = int(sm.group("len"))
        if try_stream(sm.group("dict"), data[sm.end() : sm.end() + n]):
            consumed.append((sm.end(), sm.end() + n))
    # complementary pass (ALWAYS runs, not only when the primary found
    # nothing): delimiter-based scan over objects the primary pass did
    # NOT consume — PDFs mixing direct-/Length streams with indirect or
    # nested-dict /Length entries keep the latter's text
    for obj in _OBJ_RE.finditer(data):
        body = obj.group(1)
        sm2 = _STREAM_RE.search(body)
        if sm2:
            payload_at = obj.start(1) + sm2.start(1)
            if any(lo <= payload_at < hi for lo, hi in consumed):
                continue
            try_stream(body, sm2.group(1))
    text = "\n\n".join(texts)
    status = "ok" if text else ("unsupported" if n_pages else "empty")
    return {"text": text, "n_pages": max(n_pages, 1 if text else 0),
            "status": status}


# ---------------------------------------------------------------------------
# Deterministic PDF writer (fixtures only): single-page, Helvetica,
# Flate-compressed content stream — the exact common case the extractor
# targets, so tests round-trip real bytes.


def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(paragraphs: list[str]) -> bytes:
    lines: list[str] = []
    for p in paragraphs:
        lines.extend(p.split("\n"))
        lines.append("")  # paragraph gap
    ops = ["BT", "/F1 11 Tf", "72 720 Td"]
    for ln in lines:
        if ln:
            ops.append(f"({_pdf_escape(ln)}) Tj")
        ops.append("0 -14 Td")
    ops.append("ET")
    content = zlib.compress("\n".join(ops).encode("latin-1", "replace"))

    objs = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>",
        b"<< /Length %d /Filter /FlateDecode >>\nstream\n%s\nendstream"
        % (len(content), content),
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offsets = []
    for i, body in enumerate(objs, start=1):
        offsets.append(len(out))
        out += b"%d 0 obj\n" % i + body + b"\nendobj\n"
    xref_at = len(out)
    out += b"xref\n0 %d\n0000000000 65535 f \n" % (len(objs) + 1)
    for off in offsets:
        out += b"%010d 00000 n \n" % off
    out += (
        b"trailer\n<< /Size %d /Root 1 0 R >>\nstartxref\n%d\n%%%%EOF\n"
        % (len(objs) + 1, xref_at)
    )
    return bytes(out)
