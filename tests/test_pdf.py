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


def test_encrypted_stub_census_and_refusal():
    # detection-only fixture: /Encrypt present but no /O //U entries,
    # so authentication is impossible -- a named error, not garbage
    pdf = encode_pdf(["secret"], encrypt_stub=True)
    info = parse_pdf_info(pdf)
    assert info["encrypted"] is True
    with pytest.raises(ValueError, match="cannot authenticate"):
        extract_pdf_text(pdf)


def test_census_fields_and_not_a_pdf():
    pdf = encode_pdf(["x", "y"], producer="prod (v1.0)")
    info = parse_pdf_info(pdf)
    assert info == {
        "version": "1.4",
        "n_pages": 2,
        "encrypted": False,
        "encryption": None,
        "producer": "prod (v1.0)",
        "n_objects": 8,
        "has_object_streams": False,
        "has_cid_fonts": False,
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


# ---------------------------------------------------------------------------
# CID / Type0 fonts + /ToUnicode CMaps (ISO 32000 §9.10.3)


def test_cid_fixture_round_trips_exact():
    """Type0/Identity-H writer -> extractor, every emission form: text
    (incl. non-ASCII forced through UTF-16BE) survives bit-exact."""
    pages = ["p0 of (doc 5) \\ end ☃", "café line\nsecond ☃ line"]
    for compress in (True, False):
        for tj in (True, False):
            pdf = encode_pdf(
                pages, compress=compress, use_tj_array=tj, use_cid_font=True
            )
            assert extract_pdf_text(pdf) == "\n".join(pages), (compress, tj)


def test_cid_writer_emits_both_bfrange_forms_and_bfchar():
    # "abcdef" is a consecutive (code, codepoint) run -> bfrange;
    # scattered chars -> bfchar; first run uses the ARRAY form
    pdf = encode_pdf(["abcdef xz"], compress=False, use_cid_font=True)
    assert b"beginbfrange" in pdf and b"beginbfchar" in pdf
    assert b"[" in pdf[pdf.find(b"beginbfrange"):pdf.find(b"endbfrange")]
    assert extract_pdf_text(pdf) == "abcdef xz"


def test_census_has_cid_fonts_flag():
    assert parse_pdf_info(encode_pdf(["x"], use_cid_font=True))["has_cid_fonts"]
    assert not parse_pdf_info(encode_pdf(["x"]))["has_cid_fonts"]


def test_hand_built_cmap_parser_spec_cases():
    """Parser driven by a hand-written CMap, not the module's writer:
    multi-width codespace, bfchar, both bfrange destination forms."""
    from atlas_upscaling_dask_spark.sources.pdf import _parse_cmap

    cmap = (
        b"/CIDInit /ProcSet findresource begin\n"
        b"begincmap\n"
        b"2 begincodespacerange\n<00> <80>\n<8140> <9FFC>\nendcodespacerange\n"
        b"2 beginbfchar\n<41> <0041>\n<8140> <3000>\nendbfchar\n"
        b"1 beginbfrange\n<50> <52> <0061>\nendbfrange\n"
        b"1 beginbfrange\n<8150> <8152> [<4E00> <4E8C> <4E09>]\nendbfrange\n"
        b"endcmap\nend\n"
    )
    ranges, mapping = _parse_cmap(cmap)
    assert (b"\x00", b"\x80") in ranges and (b"\x81\x40", b"\x9f\xfc") in ranges
    assert mapping[b"\x41"] == "A"
    assert mapping[b"\x81\x40"] == "　"
    # plain bfrange: last UTF-16 unit increments
    assert mapping[b"\x50"] == "a" and mapping[b"\x52"] == "c"
    # array bfrange: per-code destinations
    assert mapping[b"\x81\x50"] == "一" and mapping[b"\x81\x52"] == "三"


def test_cid_string_decoder_mixed_width_and_unmapped():
    from atlas_upscaling_dask_spark.sources.pdf import _decode_cid_string

    ranges = [(b"\x00", b"\x80"), (b"\x81\x40", b"\x9f\xfc")]
    mapping = {b"\x41": "A", b"\x81\x40": "　"}
    cmap = (ranges, mapping)
    # 1-byte code, 2-byte code, 1-byte unmapped-in-codespace code
    assert _decode_cid_string(b"\x41\x81\x40\x42", cmap) == "A　�"
    # byte outside every codespace consumes the shortest width
    assert _decode_cid_string(b"\xff\x41", cmap) == "�A"


def test_cid_font_without_tounicode_falls_back():
    """A Type0 font with no /ToUnicode has no public in-file mapping:
    strings keep the latin-1 fallback (lossy, never a crash)."""
    content = b"BT /F1 9 Tf <00410042> Tj ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Contents 2 0 R /Resources "
        b"<< /Font << /F1 3 0 R >> >> >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(content)).encode() +
        b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Type /Font /Subtype /Type0 /Encoding /Identity-H "
        b">>\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(body) == "\x00A\x00B"
    assert parse_pdf_info(body)["has_cid_fonts"]


def test_hand_assembled_cid_document_extracts():
    """CID extraction driven by hand-laid objects (indirect Resources,
    Contents ARRAY, uncompressed CMap) — not the module's writer."""
    cmap = (
        b"begincmap\n1 begincodespacerange\n<0000> <FFFF>\n"
        b"endcodespacerange\n2 beginbfchar\n<0001> <0048>\n<0002> <0069>\n"
        b"endbfchar\nendcmap\n"
    )
    c1 = b"BT /Fx 9 Tf <0001> Tj ET"
    c2 = b"BT /Fx 9 Tf <0002> Tj ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Contents [5 0 R 6 0 R] /Resources 2 0 R "
        b">>\nendobj\n"
        b"2 0 obj\n<< /Font << /Fx 3 0 R >> >>\nendobj\n"
        b"3 0 obj\n<< /Type /Font /Subtype /Type0 /ToUnicode 4 0 R "
        b">>\nendobj\n"
        b"4 0 obj\n<< /Length " + str(len(cmap)).encode() +
        b" >>\nstream\n" + cmap + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Length " + str(len(c1)).encode() +
        b" >>\nstream\n" + c1 + b"\nendstream\nendobj\n"
        b"6 0 obj\n<< /Length " + str(len(c2)).encode() +
        b" >>\nstream\n" + c2 + b"\nendstream\nendobj\n%%EOF\n"
    )
    assert extract_pdf_text(body) == "H\ni"


# ---------------------------------------------------------------------------
# encrypted documents (ISO 32000 §7.6 standard security handler)


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aesv2", "aesv3"])
def test_encrypted_round_trip_all_modes(mode):
    """Writer really encrypts (V1/V2/V4/V5); reader authenticates with
    the empty user password and extracts bit-exact text — including
    through the CID /ToUnicode path, whose CMap stream is itself
    ciphertext."""
    pages = ["p0 of (doc 5) \\ end", "café line\nsecond line"]
    for compress in (True, False):
        for cid in (False, True):
            pdf = encode_pdf(
                pages,
                compress=compress,
                encrypt=mode,
                use_cid_font=cid,
                use_tj_array=cid,
                producer="gen 3",
            )
            # streams must be real ciphertext: plaintext markers absent
            assert b"p0 of" not in pdf
            info = parse_pdf_info(pdf)
            assert info["encrypted"] is True
            assert info["encryption"] == {
                "rc4-40": "RC4-40",
                "rc4-128": "RC4-128",
                "aesv2": "AESV2",
                "aesv3": "AESV3",
            }[mode]
            assert info["producer"] == "gen 3"  # decrypted string
            assert extract_pdf_text(pdf) == "\n".join(pages), (
                mode, compress, cid,
            )


@pytest.mark.parametrize("mode", ["rc4-40", "rc4-128", "aesv2", "aesv3"])
def test_encrypted_password_handling(mode):
    pages = ["secret page"]
    pdf = encode_pdf(pages, encrypt=mode)
    # wrong password: named error, never garbage
    with pytest.raises(ValueError, match="authenticate"):
        extract_pdf_text(pdf, password=b"nope")
    # the OWNER password authenticates too (Algorithm 7)
    assert extract_pdf_text(pdf, password=b"fixture-owner") == "secret page"
    # non-empty user password: empty fails, the right one works
    locked = encode_pdf(pages, encrypt=mode, user_password=b"sekrit")
    with pytest.raises(ValueError, match="authenticate"):
        extract_pdf_text(locked)
    assert extract_pdf_text(locked, password=b"sekrit") == "secret page"
    # census label + producer recovery degrade gracefully when the
    # empty password fails: flavor still reported, producer stays None
    info = parse_pdf_info(locked)
    assert info["encrypted"] and info["encryption"] is not None
    assert info["producer"] is None


def test_encrypted_fixture_bytes_deterministic():
    pages = ["a", "b\nc"]
    for mode in ("rc4-40", "rc4-128", "aesv2", "aesv3"):
        assert encode_pdf(pages, encrypt=mode) == encode_pdf(
            pages, encrypt=mode
        )


def test_nonstandard_handler_named():
    pdf = bytearray(encode_pdf(["x"], encrypt="rc4-40"))
    i = pdf.find(b"/Filter /Standard")
    pdf[i : i + len(b"/Filter /Standard")] = b"/Filter /Custom12"
    with pytest.raises(NotImplementedError, match="security handler"):
        extract_pdf_text(bytes(pdf))


# ---------------------------------------------------------------------------
# PDF 1.5 object streams (§7.5.7) + cross-reference streams (§7.5.8)


def test_objstm_round_trip_census_and_text():
    """Writer packs Info + page dicts into an ObjStm behind a binary
    xref stream; census must COUNT the packed pages (not undercount),
    find the packed Producer, and extraction still works — including
    CID font dicts resolved out of the ObjStm."""
    pages = ["p0 of (doc 5) \\ end", "second\nline two", "third"]
    for compress in (True, False):
        for cid in (False, True):
            pdf = encode_pdf(
                pages,
                compress=compress,
                use_objstm=True,
                use_cid_font=cid,
                use_tj_array=cid,
                producer="gen 4",
            )
            info = parse_pdf_info(pdf)
            assert info["version"] == "1.5"
            assert info["has_object_streams"] is True
            assert info["n_pages"] == 3, (compress, cid, info)
            assert info["producer"] == "gen 4"
            assert info["has_cid_fonts"] is cid
            assert extract_pdf_text(pdf) == "\n".join(pages), (
                compress, cid,
            )


def test_objstm_raw_payload_not_double_counted():
    # an UNCOMPRESSED ObjStm exposes its packed page dicts to naive
    # whole-file scans; the census must still report each page once
    pdf = encode_pdf(["a", "b"], compress=False, use_objstm=True)
    assert parse_pdf_info(pdf)["n_pages"] == 2


def test_objstm_unpacker_hand_built():
    from atlas_upscaling_dask_spark.sources.pdf import _unpack_objstm

    inner = b"<< /A 1 >>\n<< /Type /Page >>"
    pairs = b"7 0 9 11\n"
    stm = pairs + inner
    doc = (
        b"%PDF-1.5\n"
        b"3 0 obj\n<< /Type /ObjStm /N 2 /First "
        + str(len(pairs)).encode()
        + b" /Length " + str(len(stm)).encode() + b" >>\nstream\n"
        + stm + b"\nendstream\nendobj\n%%EOF\n"
    )
    packed = _unpack_objstm(doc)
    assert packed[7] == b"<< /A 1 >>"
    assert packed[9] == b"<< /Type /Page >>"
    # malformed pair table contributes nothing, never raises
    bad = doc.replace(b"7 0 9 11", b"7 x 9 11")
    assert _unpack_objstm(bad) == {}


def test_objstm_encrypt_combination_named():
    with pytest.raises(ValueError, match="combine"):
        encode_pdf(["x"], use_objstm=True, encrypt="rc4-40")
    with pytest.raises(ValueError, match="combine"):
        encode_pdf(["x"], use_objstm=True, encrypt_stub=True)


# ---------------------------------------------------------------------------
# property tests + the encrypted-ObjStm reader path


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=40, deadline=None)
@given(
    text=st.text(
        alphabet=st.characters(
            min_codepoint=0x20, max_codepoint=0x2FFF,
            blacklist_categories=("Cs",),
        ),
        min_size=1,
        max_size=60,
    )
)
def test_property_cid_cmap_round_trip(text):
    """ANY BMP text survives the writer's code assignment + CMap
    emission (bfchar + both bfrange forms) + the parser + the
    string decoder bit-exactly."""
    from atlas_upscaling_dask_spark.sources.pdf import (
        _build_tounicode_cmap,
        _cid_code_table,
        _decode_cid_string,
        _parse_cmap,
    )

    codes = _cid_code_table([text])
    cmap = _parse_cmap(_build_tounicode_cmap(codes))
    raw = b"".join(codes[ch].to_bytes(2, "big") for ch in text)
    assert _decode_cid_string(raw, cmap) == text


def test_encrypted_objstm_reader_path():
    """The WRITER refuses encrypt+objstm, but the READER handles the
    combination (real 1.5 crawl PDFs encrypt their ObjStm payloads):
    hand-assemble one — RC4-encrypt the ObjStm stream under its
    per-object key — and the census must still count the packed page
    and find the packed Producer."""
    from atlas_upscaling_dask_spark.sources.pdf_crypt import (
        compute_file_key,
        compute_o,
        compute_u,
        encrypt_object,
    )

    id0 = bytes(range(16))
    o = compute_o(b"own", b"", 2, 5)
    key = compute_file_key(b"", o, -44, id0, 2, 5)
    u = compute_u(key, id0, 2)
    inner = b"<< /Producer (packed prod) >>\n<< /Type /Page >>"
    pairs = b"7 0 9 30\n"
    stm = encrypt_object(pairs + inner, key, 3, 0, "V2")
    doc = (
        b"%PDF-1.5\n"
        b"3 0 obj\n<< /Type /ObjStm /N 2 /First "
        + str(len(pairs)).encode()
        + b" /Length " + str(len(stm)).encode() + b" >>\nstream\n"
        + stm + b"\nendstream\nendobj\n"
        b"5 0 obj\n<< /Filter /Standard /V 1 /R 2 /P -44 /O <"
        + o.hex().encode() + b"> /U <" + u.hex().encode()
        + b"> >>\nendobj\n"
        b"trailer\n<< /Size 6 /Root 1 0 R /Encrypt 5 0 R /ID [<"
        + id0.hex().encode() + b"> <" + id0.hex().encode()
        + b">] >>\n%%EOF\n"
    )
    info = parse_pdf_info(doc)
    assert info["encrypted"] is True
    assert info["n_pages"] == 1  # packed page counted THROUGH decryption
    assert info["producer"] == "packed prod"


# ---------------------------------------------------------------------------
# simple-font /Encoding (ISO 32000 §9.6.6): WinAnsi, MacRoman, /Differences


def test_winansi_macroman_round_trip():
    """cp1252's 0x80-0x9F window (€ “ ” – — •) is exactly what a
    latin-1 fallback garbles; the /Encoding name must switch the
    decoder — composing with objstm and encryption."""
    pages = ["curly “quotes” – dash € bullet •", "café naïve"]
    for enc in ("winansi", "macroman"):
        assert extract_pdf_text(
            encode_pdf(pages, simple_encoding=enc)
        ) == "\n".join(pages), enc
    assert extract_pdf_text(
        encode_pdf(pages, simple_encoding="winansi", use_objstm=True)
    ) == "\n".join(pages)
    assert extract_pdf_text(
        encode_pdf(pages, simple_encoding="winansi", encrypt="rc4-128")
    ) == "\n".join(pages)


def test_differences_array_hand_built():
    """An encoding DICT with /BaseEncoding + /Differences: glyph names
    resolve via the AGL subset, the uniXXXX rule, and single-char
    names; unmapped names are U+FFFD, bytes outside the differences
    keep the base encoding."""
    content = b"BT /F1 9 Tf (\x80\x81\x82\x83A) Tj ET"
    body = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Page /Contents 2 0 R /Resources "
        b"<< /Font << /F1 3 0 R >> >> >>\nendobj\n"
        b"2 0 obj\n<< /Length " + str(len(content)).encode()
        + b" >>\nstream\n" + content + b"\nendstream\nendobj\n"
        b"3 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Custom "
        b"/Encoding << /BaseEncoding /WinAnsiEncoding /Differences "
        b"[ 128 /Euro /uni0109 /x /glyphnamenobodyknows ] >> "
        b">>\nendobj\n%%EOF\n"
    )
    # 0x80 -> Euro (AGL), 0x81 -> uni0109, 0x82 -> single-char name,
    # 0x83 -> unknown glyph -> replacement, A -> base encoding
    assert extract_pdf_text(body) == "€ĉx�A"


def test_glyph_char_rules():
    from atlas_upscaling_dask_spark.sources.pdf import _glyph_char

    assert _glyph_char("Euro") == "€"
    assert _glyph_char("emdash") == "—"
    assert _glyph_char("uni20AC") == "€"
    assert _glyph_char("u1F600") == "😀"
    assert _glyph_char("Q") == "Q"
    assert _glyph_char("notarealglyph") is None


def test_unknown_simple_encoding_named():
    with pytest.raises(ValueError, match="unknown simple_encoding"):
        encode_pdf(["x"], simple_encoding="latin9")
    with pytest.raises(ValueError, match="simple-font"):
        encode_pdf(["x"], simple_encoding="winansi", use_cid_font=True)
