"""PDF text extraction (north rule: "PDF/layout parse")."""

from crawtext_ray.extract.pdf import extract_pdf_text, make_pdf


def test_roundtrip_simple():
    paras = ["First paragraph with words.", "Second one."]
    res = extract_pdf_text(make_pdf(paras))
    assert res["status"] == "ok"
    assert res["n_pages"] == 1
    assert "First paragraph with words." in res["text"]
    assert "Second one." in res["text"]


def test_escapes_and_latin1():
    paras = ["Parens (x) and backslash \\ ok.", "café déjà"]
    res = extract_pdf_text(make_pdf(paras))
    assert "Parens (x) and backslash \\ ok." in res["text"]
    assert "café déjà" in res["text"]


def test_non_pdf_and_garbage_never_raise():
    assert extract_pdf_text(b"plain text")["status"] == "not_pdf"
    assert extract_pdf_text(b"")["status"] == "not_pdf"
    assert extract_pdf_text(b"%PDF-1.4 \x00garbage")["status"] in ("empty", "unsupported")
    # truncated real pdf
    pdf = make_pdf(["hello world paragraph"])
    assert isinstance(extract_pdf_text(pdf[: len(pdf) // 2]), dict)


def test_invalid_octal_escape_never_raises():
    # \8 / \9 are not octal digits: the escaped char passes through as a
    # literal instead of raising ValueError out of int(digits, 8)
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 40 >>\nstream\n"
        b"BT (bad \\8 escape and \\9 too) Tj ET\nendstream\nendobj\n"
    )
    res = extract_pdf_text(raw)
    assert "bad 8 escape and 9 too" in res["text"]


def test_valid_octal_escape():
    # \101 = 'A'; \12 = newline (2-digit octal); digit AFTER a full 3-digit
    # escape is literal text
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 40 >>\nstream\n"
        b"BT (oct \\101\\1015 here) Tj ET\nendstream\nendobj\n"
    )
    res = extract_pdf_text(raw)
    assert "oct AA5 here" in res["text"]


def test_uncompressed_stream():
    # hand-built object with an uncompressed content stream
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 44 >>\nstream\n"
        b"BT /F1 12 Tf (Uncompressed text works) Tj ET\nendstream\nendobj\n"
    )
    res = extract_pdf_text(raw)
    assert "Uncompressed text works" in res["text"]


def test_tj_array_kerning_gap():
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 60 >>\nstream\n"
        b"BT [(Hel) -20 (lo) -300 (world)] TJ ET\nendstream\nendobj\n"
    )
    res = extract_pdf_text(raw)
    # small kern joins, large kern becomes a word gap
    assert "Hello world" in res["text"]


def test_ray_pdf_stage(ray_session):
    import ray.data as rd

    from crawtext_ray.stages.pdf_stage import extract_pdf_texts

    rows = [
        {"doc_id": i, "payload": make_pdf([f"Document number {i} body text."])}
        for i in range(20)
    ]
    rows.append({"doc_id": 99, "payload": b"not a pdf"})
    out = extract_pdf_texts(rd.from_items(rows)).to_pandas()
    assert len(out) == 21
    ok = out[out["pdf_status"] == "ok"]
    assert len(ok) == 20
    assert (ok["n_chars"] > 0).all()
    assert out[out["doc_id"] == 99]["pdf_status"].iloc[0] == "not_pdf"


def test_indirect_length_stream():
    # /Length 5 0 R is an indirect reference: the '5' is an object NUMBER,
    # not a byte count — must fall through to the delimiter scan
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 5 0 R >>\nstream\n"
        b"BT (Indirect length text) Tj ET\nendstream\nendobj\n"
        b"5 0 obj\n37\nendobj\n"
    )
    res = extract_pdf_text(raw)
    assert "Indirect length text" in res["text"]


def test_mixed_direct_and_indirect_length_streams():
    # a direct-/Length stream yields text AND an indirect-length stream
    # coexists: the old code only ran the delimiter fallback when the
    # primary pass found nothing, silently losing the indirect stream
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Length 31 >>\nstream\n"
        b"BT (Direct stream text) Tj ET\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 6 0 R >>\nstream\n"
        b"BT (Indirect stream text) Tj ET\nendstream\nendobj\n"
        b"6 0 obj\n33\nendobj\n"
    )
    res = extract_pdf_text(raw)
    assert "Direct stream text" in res["text"]
    assert "Indirect stream text" in res["text"]
    # and no duplication of the direct segment
    assert res["text"].count("Direct stream text") == 1


def test_lying_length_uncompressed_stream_recovered():
    # uncompressed stream whose direct /Length is a lie (too short): the
    # truncated slice yields no text, so it must NOT be marked consumed —
    # the delimiter scan recovers the full span (ADVICE r4 regression)
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length 5 >>\nstream\n"
        b"BT (Lying length text) Tj ET\nendstream\nendobj\n"
    )
    res = extract_pdf_text(raw)
    assert "Lying length text" in res["text"]
    assert res["text"].count("Lying length text") == 1


def test_correct_length_uncompressed_stream_not_duplicated():
    # with a TRUTHFUL /Length on an uncompressed stream the primary pass
    # yields the text and marks the slice consumed — the delimiter scan
    # must not extract it a second time
    payload = b"BT (True length text) Tj ET"
    raw = (
        b"%PDF-1.4\n1 0 obj\n<< /Length " +
        str(len(payload)).encode() + b" >>\nstream\n" +
        payload + b"\nendstream\nendobj\n"
    )
    res = extract_pdf_text(raw)
    assert res["text"].count("True length text") == 1
