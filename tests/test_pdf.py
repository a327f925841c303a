"""PDF census + text extraction (sources/pdf.py) — writer bytes
hand-checked against ISO 32000 structure, extraction driven by
hand-assembled documents (not only the module's own writer)."""

from __future__ import annotations

import zlib

import pytest

from atlas_upscaling_dask_spark.sources.pdf import (
    _decode_pdf_string,
    encode_pdf,
    extract_pdf_text,
    parse_pdf_info,
)


def test_writer_structure_hand_checked():
    pdf = encode_pdf(["hi"], compress=False)
    assert pdf.startswith(b"%PDF-1.4\n")
    assert pdf.rstrip().endswith(b"%%EOF")
    # the xref offset printed after startxref points at the xref table
    start = int(pdf.split(b"startxref\n")[1].split(b"\n")[0])
    assert pdf[start : start + 4] == b"xref"
    # every xref entry points at the right object header
    lines = pdf[start:].split(b"\n")
    n = int(lines[1].split()[1])
    for i, ln in enumerate(lines[3 : 2 + n], start=1):
        off = int(ln.split()[0])
        assert pdf[off:].startswith(f"{i} 0 obj".encode())
    assert b"/Count 1" in pdf
    assert b"(hi) Tj" in pdf


def test_round_trip_escapes_and_multiline():
    text = "a (paren) b \\ back\nline2 \t tab"
    pdf = encode_pdf([text], compress=True)
    got = extract_pdf_text(pdf)
    # \t inside the literal string survives as the raw byte
    assert got == text
    info = parse_pdf_info(pdf)
    assert info["n_pages"] == 1 and not info["encrypted"]


def test_multi_page_and_tj_array():
    pages = ["first page", "second (2)", "third \\ page"]
    for use_tj in (False, True):
        for compress in (False, True):
            pdf = encode_pdf(pages, compress=compress,
                             use_tj_array=use_tj)
            assert extract_pdf_text(pdf) == "\n".join(pages)
            assert parse_pdf_info(pdf)["n_pages"] == 3


def test_pdf_string_decoder_spec_cases():
    # §7.3.4.2: simple escapes, octal (1-3 digits), continuation,
    # lone-backslash passthrough
    assert _decode_pdf_string(rb"a\(b\)c\\d") == b"a(b)c\\d"
    assert _decode_pdf_string(rb"x\n\r\t\b\f") == b"x\n\r\t\x08\x0c"
    assert _decode_pdf_string(rb"\101\102\7a") == b"AB\x07a"
    assert _decode_pdf_string(b"ab\\\ncd") == b"abcd"  # continuation
    assert _decode_pdf_string(b"ab\\\r\ncd") == b"abcd"
    assert _decode_pdf_string(rb"\q") == b"q"  # undefined escape: char


def test_hand_assembled_document_extracts():
    """Extraction must not depend on the module's own writer: a
    hand-assembled object layout with an out-of-order object number,
    a raw stream and the quote operators."""
    content = b"BT /F1 9 Tf 10 700 Td (one) Tj (two) ' (three) \" ET"
    body = (
        b"%PDF-1.1\n"
        b"7 0 obj\n<< /Length " + str(len(content)).encode() +
        b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"1 0 obj\n<< /Type /Catalog >>\nendobj\n"
        b"%%EOF\n"
    )
    # ' and " imply a line move BEFORE showing their string
    assert extract_pdf_text(body) == "one\ntwo\nthree"


def test_flate_stream_and_corruption():
    content = b"BT (ok) Tj ET"
    comp = zlib.compress(content)
    good = (
        b"%PDF-1.3\n1 0 obj\n<< /Length " + str(len(comp)).encode() +
        b" /Filter /FlateDecode >>\nstream\n" + comp +
        b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(good) == "ok"
    bad = good.replace(comp, b"\x00" * len(comp))
    with pytest.raises(ValueError, match="FlateDecode"):
        extract_pdf_text(bad)


def test_unsupported_filter_named_and_objstm_skipped():
    doc = (
        b"%PDF-1.5\n1 0 obj\n<< /Length 4 /Filter /LZWDecode >>\n"
        b"stream\nabcd\nendstream\nendobj\n%%EOF\n"
    )
    with pytest.raises(NotImplementedError, match="LZWDecode"):
        extract_pdf_text(doc)
    # §7.5.7: content streams can't live inside object streams, so a
    # 1.5-style document's top-level text extracts and the ObjStm is
    # skipped (not an error); the census flags the possible page
    # undercount
    objstm = (
        b"%PDF-1.5\n1 0 obj\n<< /Type /ObjStm /N 2 /Length 2 >>\n"
        b"stream\nab\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 13 >>\nstream\nBT (text) Tj ET"
        b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(objstm) == "text"
    info = parse_pdf_info(objstm)
    assert info["has_object_streams"] is True


def test_encrypted_census_and_refusal():
    pdf = encode_pdf(["secret"], encrypt_stub=True)
    info = parse_pdf_info(pdf)
    assert info["encrypted"] is True
    with pytest.raises(NotImplementedError, match="encrypted"):
        extract_pdf_text(pdf)


def test_census_fields_and_not_a_pdf():
    pdf = encode_pdf(["x", "y"], producer="prod (v1.0)")
    info = parse_pdf_info(pdf)
    assert info == {
        "version": "1.4",
        "n_pages": 2,
        "encrypted": False,
        "producer": "prod (v1.0)",
        "n_objects": 8,
        "has_object_streams": False,
    }
    with pytest.raises(ValueError, match="not a PDF"):
        parse_pdf_info(b"GIF89a")
    with pytest.raises(ValueError, match="not a PDF"):
        extract_pdf_text(b"\x89PNG")


def test_page_vs_pages_type_disambiguation():
    # /Type /Pages (the tree node) must not count as a page
    pdf = encode_pdf(["only"])
    assert pdf.count(b"/Type /Pages") == 1
    assert parse_pdf_info(pdf)["n_pages"] == 1


def test_non_stream_objects_skipped():
    """XObject/Metadata streams carry no page text and must be
    skipped, not parsed for operators."""
    noise = b"BT (ghost) Tj ET"
    doc = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /XObject /Subtype /Image /Length "
        + str(len(noise)).encode() + b" >>\nstream\n" + noise +
        b"\nendstream\nendobj\n"
        b"2 0 obj\n<< /Length 13 >>\nstream\nBT (real) Tj ET"
        b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(doc) == "real"
