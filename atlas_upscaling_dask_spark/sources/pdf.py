r"""PDF census + text extraction (ISO 32000 / PDF 1.x), pure Python.

PDFs are one of the dominant document formats in a web crawl, and a
training-data pipeline needs two things from them at 100 TB scale:
a cheap header-level census (version, page count, encryption — decide
what to keep before doing any real work) and text extraction for the
kept ones.  Both run as executor-local kernels over payload bytes,
the same shape as every other codec in sources/.

Scope, from the public spec:

* **Writer** (fixtures): spec-correct minimal documents — catalog,
  pages tree, per-page FlateDecode (stdlib zlib) or raw content
  streams, Helvetica Type1 font, classic xref table + trailer.
* **Census** (`parse_pdf_info`): header version, page-object count,
  `/Encrypt` flag, Producer string from the Info dictionary.
* **Text extraction** (`extract_pdf_text`): content streams located
  by a LINEAR object scan (`N 0 obj … endobj`) rather than the xref —
  crawl PDFs routinely carry broken or incrementally-updated xrefs,
  and the linear scan is the hardened path (the xref is advisory for
  our read side; the writer still emits a correct one).  Streams with
  `/FlateDecode` inflate via stdlib zlib; text-showing operators
  ``Tj``, ``'``, ``"`` and ``TJ`` (array form, kerning numbers
  dropped) are folded in stream order, with PDF string syntax decoded
  (``\\``, ``\(``, ``\)``, ``\n`` etc., octal escapes, line
  continuations); ``Td``/``TD``/``T*``/``BT`` breaks join as spaces.

CID / Type0 composite fonts (the dominant real-crawl font class)
extract through their **/ToUnicode CMap** (ISO 32000 §9.10.3): the
linear scan resolves each page's /Resources /Font table, parses the
referenced CMap stream (codespace ranges, ``bfchar``, both
``bfrange`` destination forms), and maps hex/literal show-strings
code-by-code under whatever font the ``Tf`` operator has made
current; unmapped codes surface as U+FFFD.  The census flags the
class (``has_cid_fonts``).  Simple fonts honor their /Encoding
(§9.6.6): /WinAnsiEncoding decodes as cp1252 — whose 0x80-0x9F
window (€ “ ” – — •) a latin-1 fallback garbles — /MacRomanEncoding
as mac-roman, and /Differences arrays resolve glyph names through an
AGL subset plus the algorithmic uniXXXX rule.

Encrypted documents (ISO 32000 §7.6 standard security handler — the
real crawl population is mostly "encrypted" with an EMPTY user
password) authenticate and decrypt transparently via ``pdf_crypt``:
RC4 (V1/V2), AES-128-CBC (/AESV2, V4), and AES-256 (/AESV3, V5/R6).
The census labels the flavor (``encryption``) and recovers the
Producer string when the password authenticates; extraction takes a
``password`` argument (default empty) and raises a named error when
it authenticates as neither user nor owner password.

Out of contract, documented: non-Standard security handlers and
unknown crypt filters (named errors), non-Flate stream filters
(named error), and CID fonts WITHOUT a usable /ToUnicode (no public
mapping exists in-file; their strings keep the latin-1 fallback —
lossy, flagged by quality screens, never a crash).
PDF 1.5 compressed object
streams are fully handled: §7.5.7 forbids stream objects inside
them, so page CONTENT always sits top-level, and the dict-only
objects they do hold (page dictionaries, font dictionaries, Info)
are UNPACKED (`_unpack_objstm`) into the census page count, the
Producer lookup, and the font-table resolver; the writer emits the
1.5 layout (ObjStm + binary cross-reference stream) as a fixture
mode.  `has_object_streams` still flags the document class.

Reference parity note: the reference repo has no document formats;
this is extension scope alongside WARC/HTML for the crawl-corpus
pipeline.
"""

from __future__ import annotations

import re
import zlib

__all__ = [
    "encode_pdf",
    "parse_pdf_info",
    "extract_pdf_text",
]


# ---------------------------------------------------------------------------
# writer (fixtures)


def _pdf_escape_string(s: str, codec: str = "latin-1") -> bytes:
    out = []
    for ch in s.encode(codec, "replace"):
        if ch in (0x5C, 0x28, 0x29):  # \ ( )
            out.append(0x5C)
            out.append(ch)
        elif ch in (0x0A, 0x0D):
            out.append(0x5C)
            out.append(0x6E if ch == 0x0A else 0x72)  # \n \r
        else:
            out.append(ch)
    return bytes(out)


def _cid_code_table(pages: list[str]) -> dict[str, int]:
    """Deterministic char -> 2-byte code assignment for the CID
    fixture: distinct chars across all pages, sorted, codes from 1."""
    chars = sorted({ch for text in pages for ch in text})
    if len(chars) > 0xFFFE:
        raise ValueError("CID fixture supports at most 65534 distinct chars")
    return {ch: i + 1 for i, ch in enumerate(chars)}


def _build_tounicode_cmap(codes: dict[str, int]) -> bytes:
    """/ToUnicode CMap stream body (ISO 32000 §9.10.3): codespace
    ``<0000> <FFFF>``, consecutive (code, codepoint) runs as
    ``bfrange`` (the FIRST qualifying run uses the ARRAY destination
    form so readers must handle both), singletons as ``bfchar``.
    Blocks chunk at the spec's 100-entry limit."""
    items = sorted((c, ch) for ch, c in codes.items())  # by code
    runs: list[list[tuple[int, str]]] = []
    for code, ch in items:
        if (
            runs
            and code == runs[-1][-1][0] + 1
            and ord(ch) == ord(runs[-1][-1][1]) + 1
            # bfrange must not increment across a 256-boundary of the
            # LAST byte (ISO 32000: the low byte increments)
            and (code & 0xFF) != 0
        ):
            runs[-1].append((code, ch))
        else:
            runs.append([(code, ch)])

    def u16(ch: str) -> str:
        return ch.encode("utf-16-be").hex().upper()

    bfchars: list[bytes] = []
    bfranges: list[bytes] = []
    used_array_form = False
    for run in runs:
        if len(run) == 1:
            code, ch = run[0]
            bfchars.append(f"<{code:04X}> <{u16(ch)}>".encode())
        elif not used_array_form:
            used_array_form = True
            dsts = " ".join(f"<{u16(ch)}>" for _, ch in run)
            bfranges.append(
                f"<{run[0][0]:04X}> <{run[-1][0]:04X}> [{dsts}]".encode()
            )
        else:
            bfranges.append(
                f"<{run[0][0]:04X}> <{run[-1][0]:04X}> "
                f"<{u16(run[0][1])}>".encode()
            )
    out = [
        b"/CIDInit /ProcSet findresource begin",
        b"12 dict begin",
        b"begincmap",
        b"/CIDSystemInfo << /Registry (Adobe) /Ordering (UCS) "
        b"/Supplement 0 >> def",
        b"/CMapName /Adobe-Identity-UCS def",
        b"/CMapType 2 def",
        b"1 begincodespacerange",
        b"<0000> <FFFF>",
        b"endcodespacerange",
    ]
    for kind, entries in ((b"bfchar", bfchars), (b"bfrange", bfranges)):
        for i in range(0, len(entries), 100):
            chunk = entries[i : i + 100]
            out.append(str(len(chunk)).encode() + b" begin" + kind)
            out.extend(chunk)
            out.append(b"end" + kind)
    out += [
        b"endcmap",
        b"CMapName currentdict /CMap defineresource pop",
        b"end",
        b"end",
    ]
    return b"\n".join(out)


_ENCRYPT_MODES = {
    # mode -> (V, R, key bytes, crypt filter method)
    "rc4-40": (1, 2, 5, "V2"),
    "rc4-128": (2, 3, 16, "V2"),
    "aesv2": (4, 4, 16, "AESV2"),
    "aesv3": (5, 6, 32, "AESV3"),
}


def encode_pdf(
    pages: list[str],
    compress: bool = True,
    producer: str = "atlas-upscaling-dask-spark fixture writer",
    use_tj_array: bool = False,
    encrypt_stub: bool = False,
    use_cid_font: bool = False,
    encrypt: str | None = None,
    user_password: bytes = b"",
    owner_password: bytes = b"fixture-owner",
    use_objstm: bool = False,
    simple_encoding: str | None = None,
) -> bytes:
    """A minimal, spec-correct PDF: one text block per page line
    (split on ``\\n``), Helvetica 12pt, classic xref + trailer.
    ``use_tj_array=True`` emits ``TJ`` arrays with kerning numbers
    (exercises the array-form reader); else ``Tj``.
    ``encrypt`` actually encrypts the document under the standard
    security handler (ISO 32000 §7.6): ``'rc4-40'`` (V1/R2),
    ``'rc4-128'`` (V2/R3), ``'aesv2'`` (V4/R4 AES-128-CBC), or
    ``'aesv3'`` (V5/R6 AES-256) — every stream payload and the Info
    strings become real ciphertext under per-object keys, /O //U //ID
    are computed per Algorithms 2-5, and AES IVs derive from the
    object number so fixture bytes stay deterministic.
    ``encrypt_stub=True`` adds only the handler dictionary + trailer
    reference with streams left plaintext (detection-path fixture;
    no /O //U means readers can't authenticate).
    ``use_cid_font=True`` emits a Type0 / Identity-H composite font
    (CIDFontType2 descendant) with a /ToUnicode CMap (bfchar +
    bfrange, array and plain destination forms), and shows text as
    2-byte HEX strings — the dominant real-crawl shape that simple
    latin-1 extraction gets wrong.
    ``use_objstm=True`` writes the PDF 1.5 layout: Info + page
    dictionaries packed into a /Type /ObjStm and a binary
    cross-reference STREAM (type-2 entries) instead of the classic
    table — the shape whose packed page dicts a top-level-only census
    undercounts."""
    if not pages:
        raise ValueError("a PDF needs at least one page")
    if encrypt is not None and encrypt not in _ENCRYPT_MODES:
        raise ValueError(
            f"unknown encrypt mode {encrypt!r} "
            f"(supported: {sorted(_ENCRYPT_MODES)})"
        )
    if use_objstm and (encrypt is not None or encrypt_stub):
        raise ValueError(
            "fixture writer does not combine use_objstm with "
            "encryption (the reader handles the combination; the "
            "suite exercises the modes separately)"
        )
    if simple_encoding not in (None, "winansi", "macroman"):
        raise ValueError(
            f"unknown simple_encoding {simple_encoding!r} "
            "(supported: None, 'winansi', 'macroman')"
        )
    if simple_encoding and use_cid_font:
        raise ValueError("simple_encoding applies to the simple-font form")
    enc_name, enc_codec = {
        None: ("", "latin-1"),
        "winansi": ("/Encoding /WinAnsiEncoding ", "cp1252"),
        "macroman": ("/Encoding /MacRomanEncoding ", "mac_roman"),
    }[simple_encoding]
    objects: list[bytes] = []  # 1-indexed

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, 4 info,
    # then per page: 5+2i page, 6+2i content; CID mode appends
    # descendant font + ToUnicode CMap stream after the pages
    kids = " ".join(f"{5 + 2 * i} 0 R" for i in range(n_pages))
    desc_num = 5 + 2 * n_pages
    touni_num = desc_num + 1
    cid_codes = _cid_code_table(pages) if use_cid_font else {}
    objects.append(
        f"<< /Type /Catalog /Pages 2 0 R >>".encode()
    )
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    if use_cid_font:
        objects.append(
            (
                f"<< /Type /Font /Subtype /Type0 /BaseFont /FixtureCID "
                f"/Encoding /Identity-H "
                f"/DescendantFonts [{desc_num} 0 R] "
                f"/ToUnicode {touni_num} 0 R >>"
            ).encode()
        )
    else:
        objects.append(
            (
                f"<< /Type /Font /Subtype /Type1 {enc_name}"
                f"/BaseFont /Helvetica >>"
            ).encode()
        )
    objects.append(("info", producer))

    def show(segment: str) -> bytes:
        """One string operand: hex CID codes or escaped literal."""
        if use_cid_font:
            return (
                b"<"
                + "".join(f"{cid_codes[ch]:04X}" for ch in segment).encode()
                + b">"
            )
        return b"(" + _pdf_escape_string(segment, enc_codec) + b")"

    for i, text in enumerate(pages):
        content = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j:
                content.append(b"0 -14 Td")
            if use_tj_array:
                # split roughly in half with a kerning adjustment
                mid = len(line) // 2
                content.append(
                    b"[" + show(line[:mid]) + b" -120 "
                    + show(line[mid:]) + b"] TJ"
                )
            else:
                content.append(show(line) + b" Tj")
        content.append(b"ET")
        stream = b"\n".join(content)
        if compress:
            payload = zlib.compress(stream, 6)
            filt = " /Filter /FlateDecode"
        else:
            payload = stream
            filt = ""
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {6 + 2 * i} 0 R >>"
            ).encode()
        )
        objects.append(("stream", filt, payload))

    if use_cid_font:
        objects.append(
            b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /FixtureCID "
            b"/CIDSystemInfo << /Registry (Adobe) /Ordering (Identity) "
            b"/Supplement 0 >> /CIDToGIDMap /Identity >>"
        )
        cmap = _build_tounicode_cmap(cid_codes)
        if compress:
            objects.append(
                ("stream", " /Filter /FlateDecode", zlib.compress(cmap, 6))
            )
        else:
            objects.append(("stream", "", cmap))
    if encrypt_stub:
        objects.append(
            b"<< /Filter /Standard /V 1 /R 2 /P -44 >>"
        )

    # real encryption: compute /ID + handler entries (§7.6.3), then
    # serialize with per-object ciphertext.  The file ID derives from
    # the logical inputs so identical fixtures are byte-identical.
    file_key = b""
    cfm = ""
    id0 = b""
    p_perm = -44
    if encrypt is not None:
        import hashlib

        from .pdf_crypt import (
            aes_encrypt_cbc_nopad,
            compute_file_key,
            compute_o,
            compute_u,
            _hash_2b,
        )

        v, r, klen, cfm = _ENCRYPT_MODES[encrypt]
        id0 = hashlib.md5(
            repr((pages, producer, encrypt, compress)).encode()
        ).digest()
        idhex = id0.hex().upper()
        if v < 5:
            o_entry = compute_o(owner_password, user_password, r, klen)
            file_key = compute_file_key(
                user_password, o_entry, p_perm, id0, r, klen
            )
            u_entry = compute_u(file_key, id0, r)
            edict = (
                f"<< /Filter /Standard /V {v} /R {r} "
                f"/Length {klen * 8} /P {p_perm} "
                f"/O <{o_entry.hex().upper()}> "
                f"/U <{u_entry.hex().upper()}>"
            )
            if v == 4:
                edict += (
                    " /CF << /StdCF << /CFM /AESV2 /Length 16 >> >>"
                    " /StmF /StdCF /StrF /StdCF"
                )
            edict += " >>"
        else:
            # V5/R6 (§7.6.4.4): salts + file key are FIXED fixture
            # constants, not per-document — Algorithm 2.B costs 64+
            # AES-CBC rounds per (password, salt, udata) triple, and
            # per-document salts would pay it for every document in a
            # corpus fixture (measured ~240 ms a call in pure Python).
            # With constants, the memoized hash runs once per worker
            # process while every document still carries real
            # per-stream AES-256 ciphertext (IVs vary by object).
            # Real-world files randomize salts; the unit tests cover
            # distinct-salt authentication.
            file_key = hashlib.sha256(b"fixture-aesv3-file-key").digest()
            uv, uk = b"fixuvslt", b"fixukslt"
            ov, ok_ = b"fixovslt", b"fixokslt"
            upw = user_password[:127]
            opw = owner_password[:127]
            u_entry = _hash_2b(upw, uv, b"") + uv + uk
            ue = aes_encrypt_cbc_nopad(
                _hash_2b(upw, uk, b""), b"\x00" * 16, file_key
            )
            o_entry = _hash_2b(opw, ov, u_entry) + ov + ok_
            oe = aes_encrypt_cbc_nopad(
                _hash_2b(opw, ok_, u_entry), b"\x00" * 16, file_key
            )
            # /Perms (§7.6.4.4.8): AES-ECB(file key) over P + pad
            import struct as _struct

            from .pdf_crypt import _encrypt_block, _key_expansion

            pblock = (
                _struct.pack("<i", p_perm)
                + b"\xff\xff\xff\xff"
                + b"Tadb"
                + hashlib.md5(b"perm" + id0).digest()[:4]
            )
            perms = _encrypt_block(pblock, _key_expansion(file_key))
            edict = (
                f"<< /Filter /Standard /V 5 /R 6 /Length 256 "
                f"/P {p_perm} "
                f"/O <{o_entry.hex().upper()}> "
                f"/U <{u_entry.hex().upper()}> "
                f"/OE <{oe.hex().upper()}> "
                f"/UE <{ue.hex().upper()}> "
                f"/Perms <{perms.hex().upper()}> "
                f"/CF << /StdCF << /CFM /AESV3 /Length 32 >> >>"
                f" /StmF /StdCF /StrF /StdCF >>"
            )
        objects.append(edict.encode())

    def _obj_encrypt(data: bytes, num: int) -> bytes:
        from .pdf_crypt import encrypt_object

        return encrypt_object(data, file_key, num, 0, cfm)

    def _render(num: int, body) -> bytes:
        if isinstance(body, tuple) and body[0] == "stream":
            _, filt, payload = body
            if encrypt is not None:
                payload = _obj_encrypt(payload, num)
            return (
                f"<< /Length {len(payload)}{filt} >>".encode()
                + b"\nstream\n"
                + payload
                + b"\nendstream"
            )
        if isinstance(body, tuple) and body[0] == "info":
            if encrypt is not None:
                penc = _obj_encrypt(
                    body[1].encode("latin-1", "replace"), num
                )
                return (
                    b"<< /Producer <" + penc.hex().upper().encode() + b"> >>"
                )
            return (
                b"<< /Producer ("
                + _pdf_escape_string(body[1])
                + b") >>"
            )
        return body

    enc_obj_num = len(objects) if (encrypt_stub or encrypt) else 0
    enc = f" /Encrypt {enc_obj_num} 0 R" if enc_obj_num else ""
    ids = f" /ID [<{id0.hex().upper()}> <{id0.hex().upper()}>]" if id0 else ""

    if use_objstm:
        # PDF 1.5 layout: Info + page DICTIONARIES packed into a
        # /Type /ObjStm (§7.5.7 — stream objects stay top-level), a
        # binary cross-reference STREAM (§7.5.8, W [1 4 2] with
        # type-2 rows pointing into the ObjStm) instead of the classic
        # table, and the trailer dictionary merged into the xref
        # stream's own dict.
        packed_nums = [4] + [5 + 2 * i for i in range(n_pages)]
        packed = [(num, _render(num, objects[num - 1])) for num in packed_nums]
        objstm_num = len(objects) + 1
        xref_num = len(objects) + 2
        pair_line = (
            " ".join(
                f"{num} {off}"
                for num, off in zip(
                    [n_ for n_, _ in packed],
                    _objstm_offsets([b for _, b in packed]),
                )
            ).encode()
            + b"\n"
        )
        first = len(pair_line)
        stm = pair_line + b"\n".join(b for _, b in packed)
        if compress:
            spayload = zlib.compress(stm, 6)
            sfilt = " /Filter /FlateDecode"
        else:
            spayload = stm
            sfilt = ""

        out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
        offsets: dict[int, int] = {}
        for num, body in enumerate(objects, start=1):
            if num in packed_nums:
                continue
            offsets[num] = len(out)
            out += f"{num} 0 obj\n".encode() + _render(num, body) + b"\nendobj\n"
        offsets[objstm_num] = len(out)
        out += (
            f"{objstm_num} 0 obj\n<< /Type /ObjStm /N {len(packed)} "
            f"/First {first} /Length {len(spayload)}{sfilt} >>"
            f"\nstream\n".encode()
            + spayload
            + b"\nendstream\nendobj\n"
        )
        xref_off = len(out)
        size = len(objects) + 3
        rows = bytearray()
        for num in range(size):
            if num == 0:
                rows += bytes([0]) + (0).to_bytes(4, "big") + (0xFFFF).to_bytes(2, "big")
            elif num in offsets or num == xref_num:
                off = xref_off if num == xref_num else offsets[num]
                rows += bytes([1]) + off.to_bytes(4, "big") + (0).to_bytes(2, "big")
            else:
                idx = packed_nums.index(num)
                rows += (
                    bytes([2])
                    + objstm_num.to_bytes(4, "big")
                    + idx.to_bytes(2, "big")
                )
        out += (
            f"{xref_num} 0 obj\n<< /Type /XRef /Size {size} /W [1 4 2] "
            f"/Root 1 0 R /Info 4 0 R{enc}{ids} "
            f"/Length {len(rows)} >>\nstream\n".encode()
            + rows
            + b"\nendstream\nendobj\n"
        )
        out += f"startxref\n{xref_off}\n%%EOF\n".encode()
        return bytes(out)

    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets_l = [0]
    for num, body in enumerate(objects, start=1):
        offsets_l.append(len(out))
        out += f"{num} 0 obj\n".encode() + _render(num, body) + b"\nendobj\n"
    xref_off = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets_l[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R /Info 4 0 R{enc}{ids} >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


def _objstm_offsets(bodies: list[bytes]) -> list[int]:
    """Relative offsets of each packed body within the ObjStm object
    area (bodies joined by single newlines)."""
    offs = []
    pos = 0
    for b in bodies:
        offs.append(pos)
        pos += len(b) + 1
    return offs


# ---------------------------------------------------------------------------
# census


_OBJ_RE = re.compile(rb"(\d+)\s+(\d+)\s+obj\b")


def parse_pdf_info(data: bytes) -> dict:
    """Header-level census: ``{"version", "n_pages", "encrypted",
    "producer", "n_objects"}``.  Page count is the number of
    ``/Type /Page`` objects found by the linear scan (robust to broken
    xrefs); ``/Count`` in the pages tree is cross-checked when
    present and parseable."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    m = re.match(rb"%PDF-(\d+\.\d+)", data)
    version = m.group(1).decode() if m else "?"
    n_pages = len(
        re.findall(rb"/Type\s*/Page(?![a-zA-Z])", data)
    )
    encrypted = re.search(rb"/Encrypt\b", data) is not None
    producer = None
    pm = re.search(rb"/Producer\s*\(((?:[^()\\]|\\.)*)\)", data)
    if pm:
        producer = _decode_pdf_string(pm.group(1)).decode(
            "latin-1", "replace"
        )
    encryption = None
    if encrypted:
        edict = _find_encrypt_dict(data)
        encryption = _encrypt_label(edict) if edict is not None else "?"
        # strings are ciphertext in an encrypted document; recover the
        # Producer when the empty user password authenticates (the
        # dominant crawl case) — best-effort, never a census crash
        try:
            ctx = _encryption_context(data)
            if ctx is not None:
                for m in _STREAM_OBJ_RE.finditer(data):
                    sm = re.search(
                        rb"/Producer\s*"
                        rb"(?:\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>)",
                        m.group(3),
                    )
                    if sm is None:
                        continue
                    raw = (
                        _decode_pdf_string(sm.group(1))
                        if sm.group(1) is not None
                        else _hexbytes(sm.group(2))
                    )
                    dec = ctx.decryptor(
                        int(m.group(1)), int(m.group(2))
                    )
                    if dec is not None:
                        raw = dec(raw)
                    producer = raw.decode("latin-1", "replace")
                    break
        except (ValueError, NotImplementedError):
            pass
    # PDF 1.5 compressed object streams hold page DICTIONARIES (never
    # content streams, §7.5.7) — unpack them so packed pages COUNT and
    # a packed Info dict still yields the Producer; the flag records
    # the document class either way
    has_objstm = re.search(rb"/Type\s*/ObjStm\b", data) is not None
    if has_objstm:
        try:
            octx = _encryption_context(data) if encrypted else None
            packed = _unpack_objstm(data, octx)
        except (ValueError, NotImplementedError):
            packed = {}
        # re-count top-level pages from the DICT part of each object
        # only: a raw (uncompressed) ObjStm payload sits inside its
        # object's stream body, where the whole-file count above would
        # see the packed page dicts a second time
        n_pages = 0
        for m in _STREAM_OBJ_RE.finditer(data):
            body = m.group(3)
            s = body.find(b"stream")
            scan = body[:s] if s >= 0 else body
            n_pages += len(
                re.findall(rb"/Type\s*/Page(?![a-zA-Z])", scan)
            )
        for body in packed.values():
            n_pages += len(
                re.findall(rb"/Type\s*/Page(?![a-zA-Z])", body)
            )
            if producer is None:
                sm = re.search(
                    rb"/Producer\s*"
                    rb"(?:\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>)",
                    body,
                )
                if sm:
                    raw = (
                        _decode_pdf_string(sm.group(1))
                        if sm.group(1) is not None
                        else _hexbytes(sm.group(2))
                    )
                    producer = raw.decode("latin-1", "replace")
    # Type0 composite fonts = CID-keyed text: extraction quality hinges
    # on a /ToUnicode CMap being present, so the census surfaces the
    # font class for the keep/drop decision
    has_cid = re.search(rb"/Subtype\s*/Type0\b", data) is not None
    return {
        "version": version,
        "n_pages": n_pages,
        "encrypted": encrypted,
        "encryption": encryption,
        "producer": producer,
        "n_objects": len(_OBJ_RE.findall(data)),
        "has_object_streams": has_objstm,
        "has_cid_fonts": has_cid,
    }


# ---------------------------------------------------------------------------
# text extraction


_STREAM_OBJ_RE = re.compile(
    rb"(\d+)\s+(\d+)\s+obj\b(.*?)\bendobj\b", re.DOTALL
)


def _decode_pdf_string(raw: bytes) -> bytes:
    """PDF literal-string unescape (ISO 32000 §7.3.4.2): ``\\``-escaped
    specials, ``\\n``-family, 1-3 digit octal, and backslash-newline
    line continuation."""
    out = bytearray()
    i = 0
    n = len(raw)
    simple = {
        0x6E: 0x0A, 0x72: 0x0D, 0x74: 0x09, 0x62: 0x08, 0x66: 0x0C,
        0x28: 0x28, 0x29: 0x29, 0x5C: 0x5C,
    }
    while i < n:
        c = raw[i]
        if c != 0x5C:
            out.append(c)
            i += 1
            continue
        i += 1
        if i >= n:
            break
        c = raw[i]
        if c in simple:
            out.append(simple[c])
            i += 1
        elif 0x30 <= c <= 0x37:  # octal, up to 3 digits
            val = 0
            k = 0
            while k < 3 and i < n and 0x30 <= raw[i] <= 0x37:
                val = val * 8 + (raw[i] - 0x30)
                i += 1
                k += 1
            out.append(val & 0xFF)
        elif c in (0x0A, 0x0D):  # line continuation
            i += 1
            if c == 0x0D and i < n and raw[i] == 0x0A:
                i += 1
        else:  # lone backslash before other char: char stands
            out.append(c)
            i += 1
    return bytes(out)


def _stream_payload(body: bytes, decrypt=None) -> bytes | None:
    """Decode the stream payload of one object body (the bytes between
    ``obj`` and ``endobj``), or None when the object has no stream.
    The body runs from after ``stream``+EOL to the matching
    ``endstream`` (the /Length value bounds it when sane);
    ``decrypt`` (a per-object callable from the encryption context)
    applies FIRST — §7.6.2 layers encryption OUTSIDE the filters —
    then /FlateDecode inflates; other filters are named contract
    boundaries."""
    s = body.find(b"stream")
    if s < 0:
        return None
    head = body[:s]
    # skip the `stream` keyword + EOL
    p = s + len(b"stream")
    if body[p : p + 2] == b"\r\n":
        p += 2
    elif body[p : p + 1] in (b"\n", b"\r"):
        p += 1
    e = body.rfind(b"endstream")
    if e < 0:
        raise ValueError("stream object without endstream")
    payload = body[p:e]
    lm = re.search(rb"/Length\s+(\d+)\b", head)
    if lm:
        ln = int(lm.group(1))
        if ln <= len(payload):
            payload = payload[:ln]
    if decrypt is not None:
        payload = decrypt(payload)
    if re.search(rb"/Filter\s*(?:\[\s*)?/FlateDecode", head):
        try:
            payload = zlib.decompress(payload)
        except zlib.error as exc:
            raise ValueError(f"corrupt FlateDecode stream: {exc}")
    elif re.search(rb"/Filter\s*/", head):
        fm = re.search(rb"/Filter\s*(?:\[\s*)?/(\w+)", head)
        raise NotImplementedError(
            f"PDF stream filter /{fm.group(1).decode()} is a "
            "documented contract boundary (FlateDecode and raw "
            "streams decode)"
        )
    return payload


def _dict_string_value(d: bytes, key: bytes) -> bytes | None:
    """The value of ``/key`` in dict bytes when it is a literal or hex
    string; None otherwise."""
    m = re.search(
        rb"/" + key + rb"\s*(?:\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>)",
        d,
    )
    if m is None:
        return None
    if m.group(1) is not None:
        return _decode_pdf_string(m.group(1))
    return _hexbytes(m.group(2))


def _dict_int_value(d: bytes, key: bytes) -> int | None:
    m = re.search(rb"/" + key + rb"\s+(-?\d+)\b", d)
    return int(m.group(1)) if m else None


class _EncryptionContext:
    """Authenticated decryption state for one document: the file key
    plus the stream/string crypt filter method, and per-object
    decryptors (Algorithm 1 / 1.A)."""

    __slots__ = ("file_key", "cfm", "label")

    def __init__(self, file_key: bytes, cfm: str, label: str):
        self.file_key = file_key
        self.cfm = cfm
        self.label = label

    def decryptor(self, objnum: int, gen: int):
        if not self.cfm:  # /Identity: data is plaintext
            return None
        from .pdf_crypt import decrypt_object

        key, cfm = self.file_key, self.cfm
        return lambda b: decrypt_object(b, key, objnum, gen, cfm)


def _encrypt_label(edict: bytes) -> str:
    """Human/census label for the encryption flavor, no auth needed."""
    v = _dict_int_value(edict, b"V") or 0
    bits = _dict_int_value(edict, b"Length") or 40
    cm = re.search(rb"/CFM\s*/(\w+)", edict)
    if v >= 4 and cm:
        return cm.group(1).decode()
    if v in (1, 2):
        return f"RC4-{40 if v == 1 else bits}"
    return f"V{v}"


def _find_encrypt_dict(data: bytes) -> bytes | None:
    """The /Encrypt dictionary bytes (trailer reference resolved via
    the linear scan; inline dict supported), or None."""
    rm = re.search(rb"/Encrypt\s+(\d+)\s+(\d+)\s+R", data)
    if rm:
        want = int(rm.group(1))
        for m in _STREAM_OBJ_RE.finditer(data):
            if int(m.group(1)) == want:
                body = m.group(3)
                s = body.find(b"<<")
                if s >= 0:
                    return body[s : _dict_span(body, s)]
    im = re.search(rb"/Encrypt\s*<<", data)
    if im:
        s = im.end() - 2
        return data[s : _dict_span(data, s)]
    return None


def _encryption_context(
    data: bytes, password: bytes = b""
) -> _EncryptionContext | None:
    """None when the document is unencrypted; an authenticated context
    otherwise.  Raises ``ValueError`` when the password (default:
    empty — the dominant crawl case) doesn't authenticate or the
    handler entries are malformed, ``NotImplementedError`` for
    non-Standard handlers or unsupported crypt filters."""
    if re.search(rb"/Encrypt\b", data) is None:
        return None
    edict = _find_encrypt_dict(data)
    if edict is None:
        raise ValueError("/Encrypt reference does not resolve")
    fm = re.search(rb"/Filter\s*/(\w+)", edict)
    if fm is None or fm.group(1) != b"Standard":
        name = fm.group(1).decode() if fm else "?"
        raise NotImplementedError(
            f"PDF security handler /{name} is a documented contract "
            "boundary (the Standard handler authenticates)"
        )
    v = _dict_int_value(edict, b"V") or 0
    r = _dict_int_value(edict, b"R") or 2
    o_entry = _dict_string_value(edict, b"O")
    u_entry = _dict_string_value(edict, b"U")
    p = _dict_int_value(edict, b"P")
    if o_entry is None or u_entry is None or p is None:
        raise ValueError(
            "encrypted PDF: /Encrypt dictionary lacks /O //U //P — "
            "cannot authenticate"
        )
    bits = _dict_int_value(edict, b"Length") or 40
    encrypt_metadata = (
        re.search(rb"/EncryptMetadata\s+false", edict) is None
    )
    # crypt filter method: V1/V2 are RC4 by definition; V4/V5 name it
    if v in (1, 2):
        cfm = "V2"
    elif v in (4, 5):
        sm = re.search(rb"/StmF\s*/(\w+)", edict)
        if sm and sm.group(1) == b"Identity":
            cfm = ""
        else:
            cm = re.search(rb"/CFM\s*/(\w+)", edict)
            cfm = cm.group(1).decode() if cm else "Identity"
            if cfm == "Identity":
                cfm = ""
            elif cfm not in ("V2", "AESV2", "AESV3"):
                raise NotImplementedError(
                    f"PDF crypt filter /{cfm} is a documented "
                    "contract boundary"
                )
    else:
        raise NotImplementedError(
            f"PDF encryption /V {v} is a documented contract boundary"
        )
    id0 = b""
    idm = re.search(
        rb"/ID\s*\[\s*(?:\(((?:[^()\\]|\\.)*)\)|<([0-9A-Fa-f\s]*)>)",
        data,
    )
    if idm:
        id0 = (
            _decode_pdf_string(idm.group(1))
            if idm.group(1) is not None
            else _hexbytes(idm.group(2))
        )
    from .pdf_crypt import authenticate

    key = authenticate(
        password,
        o_entry,
        u_entry,
        p,
        id0,
        r,
        bits // 8,
        encrypt_metadata,
        oe=_dict_string_value(edict, b"OE") or b"",
        ue=_dict_string_value(edict, b"UE") or b"",
    )
    if key is None:
        raise ValueError(
            "encrypted PDF: password does not authenticate (tried as "
            "user and owner password)"
        )
    return _EncryptionContext(key, cfm, _encrypt_label(edict))


def _unpack_objstm(
    data: bytes, ctx: _EncryptionContext | None = None
) -> dict[int, bytes]:
    """objnum -> body bytes for every object packed inside a
    ``/Type /ObjStm`` compressed object stream (ISO 32000 §7.5.7):
    the decoded stream opens with N (objnum, offset) integer pairs,
    object bodies follow from /First.  §7.5.7 forbids STREAM objects
    inside, so every unpacked body is a dict/array/scalar — page
    dictionaries, font dictionaries, Info — exactly the objects the
    census and the font-table resolver otherwise miss.  Encrypted
    documents decrypt the ObjStm payload once; strings inside are NOT
    re-encrypted (§7.6.2 exempts them).  Malformed streams contribute
    nothing rather than raising — crawl hardening."""
    out: dict[int, bytes] = {}
    for m in _STREAM_OBJ_RE.finditer(data):
        body = m.group(3)
        s = body.find(b"stream")
        if s < 0:
            continue
        head = body[:s]
        if not re.search(rb"/Type\s*/ObjStm\b", head):
            continue
        nm = re.search(rb"/N\s+(\d+)\b", head)
        fm = re.search(rb"/First\s+(\d+)\b", head)
        if not nm or not fm:
            continue
        try:
            decrypt = (
                ctx.decryptor(int(m.group(1)), int(m.group(2)))
                if ctx is not None
                else None
            )
            payload = _stream_payload(body, decrypt)
        except (ValueError, NotImplementedError):
            continue
        if payload is None:
            continue
        n, first = int(nm.group(1)), int(fm.group(1))
        pairs = payload[:first].split()
        if len(pairs) < 2 * n:
            continue
        try:
            nums = [int(pairs[2 * i]) for i in range(n)]
            offs = [int(pairs[2 * i + 1]) for i in range(n)]
        except ValueError:
            continue
        for i in range(n):
            lo = first + offs[i]
            hi = first + offs[i + 1] if i + 1 < n else len(payload)
            if lo <= len(payload):
                out[nums[i]] = payload[lo:hi].strip()
    return out


def _iter_content_streams(data: bytes, ctx: _EncryptionContext | None = None):
    """Yield ``(objnum, payload)`` for every candidate content stream,
    via the linear object scan (document order, robust to broken
    xrefs); payloads decrypt under ``ctx`` when given."""
    for m in _STREAM_OBJ_RE.finditer(data):
        body = m.group(3)
        s = body.find(b"stream")
        if s < 0:
            continue
        head = body[:s]
        if re.search(rb"/Type\s*/(XObject|Metadata|ObjStm|XRef)", head):
            # ObjStm/XRef (PDF 1.5 compressed objects) hold only
            # NON-stream objects — §7.5.7 forbids stream objects
            # inside them — so page CONTENT always sits top-level and
            # skipping these loses no text; XObject/Metadata streams
            # carry no page text
            continue
        if re.search(rb"/CMapName\b|/CIDInit\b", head) or (
            re.search(rb"begincmap", body[:s])
        ):
            continue
        decrypt = (
            ctx.decryptor(int(m.group(1)), int(m.group(2)))
            if ctx is not None
            else None
        )
        payload = _stream_payload(body, decrypt)
        if payload is None:
            continue
        if payload.lstrip()[:22].startswith((b"/CIDInit", b"begincmap")):
            # a ToUnicode CMap whose dict carries no identifying name —
            # it is font METADATA, not page content
            continue
        yield int(m.group(1)), payload


# ---------------------------------------------------------------------------
# CID / Type0 fonts: /ToUnicode CMaps (ISO 32000 §9.10.3)


def _skip_pdf_string(data: bytes, i: int) -> int:
    """``i`` at ``(``; return index just past the matching ``)``
    (nesting + backslash escapes per §7.3.4.2)."""
    depth = 0
    n = len(data)
    while i < n:
        c = data[i]
        if c == 0x5C:  # backslash: next char is literal
            i += 2
            continue
        if c == 0x28:
            depth += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return i + 1
        i += 1
    raise ValueError("unterminated PDF string")


def _dict_span(data: bytes, start: int) -> int:
    """``start`` at ``<<``; return index just past the matching
    ``>>`` (nested dicts balanced; literal strings skipped so a
    ``>>`` inside one can't close the dict)."""
    depth = 0
    i = start
    n = len(data)
    while i < n - 1:
        two = data[i : i + 2]
        if two == b"<<":
            depth += 1
            i += 2
        elif two == b">>":
            depth -= 1
            i += 2
            if depth == 0:
                return i
        elif data[i] == 0x28:  # (
            i = _skip_pdf_string(data, i)
        else:
            i += 1
    raise ValueError("unterminated PDF dictionary")


_HEX_TOKEN_RE = re.compile(rb"<([0-9A-Fa-f\s]*)>|\[|\]")


def _hexbytes(tok: bytes) -> bytes:
    h = b"".join(tok.split()).decode("ascii")
    if len(h) % 2:
        h += "0"  # §7.3.4.3: odd final digit pads with 0
    return bytes.fromhex(h)


def _utf16_increment(dst: bytes, i: int) -> str:
    """bfrange destination for offset ``i``: the LAST UTF-16 code unit
    of ``dst`` increments (ISO 32000 §9.10.3 increments the low byte;
    fixtures and real CMaps stay within one 256-run)."""
    if len(dst) < 2:
        dst = b"\x00" + dst
    base = int.from_bytes(dst[-2:], "big") + i
    return (dst[:-2] + base.to_bytes(2, "big")).decode(
        "utf-16-be", "replace"
    )


def _parse_cmap(data: bytes) -> tuple[list[tuple[bytes, bytes]], dict[bytes, str]]:
    """Parse a /ToUnicode CMap stream: returns ``(codespace_ranges,
    code_bytes -> unicode str)``.  Handles ``bfchar``, both ``bfrange``
    destination forms (single hex with last-unit increment, and the
    per-code array), and multi-width codespaces."""
    ranges: list[tuple[bytes, bytes]] = []
    mapping: dict[bytes, str] = {}
    for sec in re.finditer(
        rb"begincodespacerange(.*?)endcodespacerange", data, re.DOTALL
    ):
        toks = re.findall(rb"<([0-9A-Fa-f\s]*)>", sec.group(1))
        for lo, hi in zip(toks[0::2], toks[1::2]):
            ranges.append((_hexbytes(lo), _hexbytes(hi)))
    for sec in re.finditer(rb"beginbfchar(.*?)endbfchar", data, re.DOTALL):
        toks = re.findall(rb"<([0-9A-Fa-f\s]*)>", sec.group(1))
        for src, dst in zip(toks[0::2], toks[1::2]):
            mapping[_hexbytes(src)] = _hexbytes(dst).decode(
                "utf-16-be", "replace"
            )
    for sec in re.finditer(rb"beginbfrange(.*?)endbfrange", data, re.DOTALL):
        body = sec.group(1)
        toks: list = []  # hex bytes or the markers b"[" / b"]"
        for m in _HEX_TOKEN_RE.finditer(body):
            if m.group(0) in (b"[", b"]"):
                toks.append(m.group(0))
            else:
                toks.append(_hexbytes(m.group(1)))
        i = 0
        while i < len(toks):
            lo, hi = toks[i], toks[i + 1]
            lo_i = int.from_bytes(lo, "big")
            hi_i = int.from_bytes(hi, "big")
            width = len(lo)
            if i + 2 < len(toks) and toks[i + 2] == b"[":
                j = i + 3
                k = 0
                while j < len(toks) and toks[j] != b"]":
                    code = (lo_i + k).to_bytes(width, "big")
                    mapping[code] = toks[j].decode("utf-16-be", "replace")
                    j += 1
                    k += 1
                i = j + 1
            else:
                dst = toks[i + 2]
                for k in range(hi_i - lo_i + 1):
                    code = (lo_i + k).to_bytes(width, "big")
                    mapping[code] = _utf16_increment(dst, k)
                i += 3
    if not ranges:
        # degenerate CMaps omit the codespace; infer widths from the
        # mapped codes (2-byte Identity-H in practice)
        widths = {len(c) for c in mapping} or {2}
        for w in widths:
            ranges.append((b"\x00" * w, b"\xff" * w))
    return ranges, mapping


def _decode_cid_string(raw: bytes, cmap) -> str:
    """Map string bytes through a ToUnicode CMap: at each position take
    the (shortest) codespace width whose range contains the next bytes;
    unmapped codes become U+FFFD (§9.10.3's visible-failure choice)."""
    ranges, mapping = cmap
    widths = sorted({len(lo) for lo, _ in ranges})
    out: list[str] = []
    i = 0
    n = len(raw)
    while i < n:
        taken = False
        for w in widths:
            code = raw[i : i + w]
            if len(code) < w:
                continue
            if any(
                len(lo) == w and lo <= code <= hi for lo, hi in ranges
            ):
                out.append(mapping.get(code, "�"))
                i += w
                taken = True
                break
        if not taken:
            # outside every codespace: consume the shortest width
            out.append("�")
            i += widths[0] if widths else 1
    return "".join(out)


def _resolve_dict(body: bytes, key: bytes, objmap: dict[int, bytes]) -> bytes | None:
    """The value of ``/key`` in ``body`` when it is an inline dict or
    an indirect reference to one; None when absent/other."""
    m = re.search(rb"/" + key + rb"\b", body)
    if not m:
        return None
    i = m.end()
    while i < len(body) and body[i : i + 1].isspace():
        i += 1
    if body[i : i + 2] == b"<<":
        return body[i : _dict_span(body, i)]
    rm = re.match(rb"(\d+)\s+\d+\s+R", body[i:])
    if rm:
        ref = objmap.get(int(rm.group(1)))
        if ref is not None:
            ref = ref[1]
            s = ref.find(b"<<")
            if s >= 0:
                return ref[s : _dict_span(ref, s)]
    return None


# The WinAnsi/MacRoman-specific glyph names an extractor meets in
# /Differences arrays — the Adobe Glyph List subset outside latin-1;
# /uniXXXX and /uXXXX(XX) names resolve algorithmically, single-char
# names are their own character.
_AGL_SUBSET = {
    "Euro": "€", "quotesinglbase": "‚", "florin": "ƒ",
    "quotedblbase": "„", "ellipsis": "…", "dagger": "†",
    "daggerdbl": "‡", "circumflex": "ˆ",
    "perthousand": "‰", "Scaron": "Š",
    "guilsinglleft": "‹", "OE": "Œ", "Zcaron": "Ž",
    "quoteleft": "‘", "quoteright": "’",
    "quotedblleft": "“", "quotedblright": "”",
    "bullet": "•", "endash": "–", "emdash": "—",
    "tilde": "˜", "trademark": "™", "scaron": "š",
    "guilsinglright": "›", "oe": "œ", "zcaron": "ž",
    "Ydieresis": "Ÿ", "space": " ", "quotesingle": "'",
    "grave": "`", "fraction": "⁄", "dotlessi": "ı",
}

_ENC_CODECS = {
    b"WinAnsiEncoding": "cp1252",
    b"MacRomanEncoding": "mac_roman",
    b"StandardEncoding": "latin-1",  # close enough for extraction
    b"PDFDocEncoding": "latin-1",
}


def _glyph_char(name: str) -> str | None:
    """Glyph name -> character (AGL subset + the uniXXXX rule)."""
    if name in _AGL_SUBSET:
        return _AGL_SUBSET[name]
    if re.fullmatch(r"uni[0-9A-Fa-f]{4}", name):
        return chr(int(name[3:], 16))
    if re.fullmatch(r"u[0-9A-Fa-f]{4,6}", name):
        return chr(int(name[1:], 16))
    if len(name) == 1:
        return name  # ASCII glyph names are their own character
    return None


def _simple_encoding_table(
    fbody: bytes, objmap: dict[int, tuple[int, bytes]]
) -> list[str] | None:
    """256-entry byte->str table for a simple font's /Encoding (ISO
    32000 §9.6.6): base encoding name (WinAnsi = cp1252, whose
    0x80-0x9F bytes latin-1 gets WRONG; MacRoman) possibly wrapped in
    an encoding dictionary with a /Differences array of
    code/glyph-name runs.  None when the font carries no /Encoding
    worth switching for (callers keep the latin-1 fallback)."""
    m = re.search(rb"/Encoding\b", fbody)
    if m is None:
        return None
    i = m.end()
    while i < len(fbody) and fbody[i : i + 1].isspace():
        i += 1
    edict = None
    nm = re.match(rb"/(\w+)", fbody[i:])
    if nm is not None:
        base = _ENC_CODECS.get(nm.group(1))
        if base is None or base == "latin-1":
            return None
        diffs = {}
    else:
        if fbody[i : i + 2] == b"<<":
            edict = fbody[i : _dict_span(fbody, i)]
        else:
            rm = re.match(rb"(\d+)\s+\d+\s+R", fbody[i:])
            if rm:
                ref = objmap.get(int(rm.group(1)))
                if ref is not None:
                    s = ref[1].find(b"<<")
                    if s >= 0:
                        edict = ref[1][s : _dict_span(ref[1], s)]
        if edict is None:
            return None
        bm = re.search(rb"/BaseEncoding\s*/(\w+)", edict)
        base = _ENC_CODECS.get(bm.group(1), "latin-1") if bm else "latin-1"
        diffs = {}
        dm = re.search(rb"/Differences\s*\[(.*?)\]", edict, re.DOTALL)
        if dm:
            code = 0
            for tok in re.finditer(
                rb"(\d+)|/([^\s/<>\[\]()]+)", dm.group(1)
            ):
                if tok.group(1) is not None:
                    code = int(tok.group(1))
                else:
                    ch = _glyph_char(
                        tok.group(2).decode("latin-1")
                    )
                    diffs[code] = ch if ch is not None else "�"
                    code += 1
        if base == "latin-1" and not diffs:
            return None
    table = [
        diffs.get(b) or bytes([b]).decode(base, "replace")
        for b in range(256)
    ]
    return table


def _font_tables(
    data: bytes, ctx: _EncryptionContext | None = None
) -> dict[int, dict[bytes, tuple]]:
    """content-stream objnum -> {font resource name: decoder} for
    every page the linear scan can resolve.  A decoder is a tagged
    tuple: ``("cmap", parsed_tounicode)`` for CID/Type0 fonts,
    ``("enc", table256)`` for simple fonts whose /Encoding deviates
    from latin-1 (WinAnsi/MacRoman bases, /Differences arrays).
    Fonts needing neither are simply absent (callers fall back to the
    latin-1 path); broken structure never raises — a crawl PDF with a
    damaged pages tree still extracts via the blind path."""
    objmap: dict[int, tuple[int, bytes]] = {}
    for m in _STREAM_OBJ_RE.finditer(data):
        # later (incremental) wins
        objmap[int(m.group(1))] = (int(m.group(2)), m.group(3))
    # /ObjStm-packed objects (page + font dicts routinely live there
    # in PDF 1.5 files) join the map at generation 0, per §7.5.7
    for num, body in _unpack_objstm(data, ctx).items():
        objmap.setdefault(num, (0, body))
    decoders: dict[int, tuple | None] = {}  # font objnum -> decoder

    def font_decoder(font_num: int):
        if font_num in decoders:
            return decoders[font_num]
        dec = None
        fref = objmap.get(font_num)
        if fref is not None:
            tm = re.search(rb"/ToUnicode\s+(\d+)\s+\d+\s+R", fref[1])
            if tm:
                tnum = int(tm.group(1))
                tref = objmap.get(tnum)
                if tref is not None:
                    try:
                        decrypt = (
                            ctx.decryptor(tnum, tref[0])
                            if ctx is not None
                            else None
                        )
                        payload = _stream_payload(tref[1], decrypt)
                        if payload:
                            parsed = _parse_cmap(payload)
                            if parsed[1]:
                                dec = ("cmap", parsed)
                    except (ValueError, NotImplementedError):
                        dec = None
            if dec is None:
                table = _simple_encoding_table(fref[1], objmap)
                if table is not None:
                    dec = ("enc", table)
        decoders[font_num] = dec
        return dec

    tables: dict[int, dict[bytes, tuple]] = {}
    for num, (_gen, body) in objmap.items():
        if not re.search(rb"/Type\s*/Page(?![a-zA-Z])", body):
            continue
        res = _resolve_dict(body, b"Resources", objmap)
        fonts: dict[bytes, tuple] = {}
        if res is not None:
            fdict = _resolve_dict(res, b"Font", objmap)
            if fdict is not None:
                for fm in re.finditer(
                    rb"/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R", fdict
                ):
                    dec = font_decoder(int(fm.group(2)))
                    if dec is not None:
                        fonts[fm.group(1)] = dec
        if not fonts:
            continue
        cm = re.search(rb"/Contents\s+(\d+)\s+\d+\s+R", body)
        if cm:
            tables[int(cm.group(1))] = fonts
        else:
            am = re.search(rb"/Contents\s*\[(.*?)\]", body, re.DOTALL)
            if am:
                for rm in re.finditer(rb"(\d+)\s+\d+\s+R", am.group(1)):
                    tables[int(rm.group(1))] = fonts
    return tables


_TEXT_TOKEN_RE = re.compile(
    rb"\((?P<str>(?:[^()\\]|\\.)*)\)\s*(?P<op>Tj|'|\")"
    rb"|<(?P<hex>[0-9A-Fa-f\s]*)>\s*(?P<hop>Tj|'|\")"
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ"
    rb"|/(?P<fname>[^\s/<>\[\]()]+)\s+[-+.\d]+\s+Tf"
    rb"|(?P<brk>\bT\*|\bTd\b|\bTD\b|\bBT\b|\bET\b)"
)
_ARR_STR_RE = re.compile(
    rb"\((?P<s>(?:[^()\\]|\\.)*)\)|<(?P<h>[0-9A-Fa-f\s]*)>"
)


def extract_pdf_text(data: bytes, password: bytes = b"") -> str:
    """All text shown by the document's content streams, in stream
    order; ``Td``/``TD``/``T*``/``'``/``\"`` line moves become
    newlines, runs inside one line concatenate (``TJ`` kerning numbers
    dropped).  Strings shown under a font that carries a /ToUnicode
    CMap (CID / Type0 composite fonts — ISO 32000 §9.10.3) decode
    code-by-code through the CMap (hex AND literal string forms, any
    codespace width); other strings keep the simple-font latin-1
    fallback.  Font state follows the ``Tf`` operator; pages whose
    resource tree the linear scan cannot resolve fall back to the
    blind path, so broken crawl PDFs still extract.  Encrypted
    documents authenticate through the standard security handler
    (ISO 32000 §7.6 — RC4, AES-128 /AESV2, AES-256 /AESV3; see
    ``pdf_crypt``) with ``password`` (default empty, the dominant
    crawl case) and decrypt transparently; a password that doesn't
    authenticate is a named ``ValueError``."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    ctx = _encryption_context(data, password)
    tables = _font_tables(data, ctx)
    lines: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for objnum, stream in _iter_content_streams(data, ctx):
        fonts = tables.get(objnum, {})
        dec = None  # current font's decoder (None = latin-1 simple)

        def shown(raw: bytes) -> str:
            if dec is not None:
                if dec[0] == "cmap":
                    return _decode_cid_string(raw, dec[1])
                table = dec[1]  # ("enc", 256-entry table)
                return "".join(table[b] for b in raw)
            return raw.decode("latin-1", "replace")

        for m in _TEXT_TOKEN_RE.finditer(stream):
            if m.group("brk") is not None:
                if m.group("brk") != b"ET":
                    flush()
                continue
            if m.group("fname") is not None:
                dec = fonts.get(m.group("fname"))
                continue
            if m.group("op") is not None:
                if m.group("op") in (b"'", b'"'):
                    flush()  # both operators imply a line move first
                cur.append(shown(_decode_pdf_string(m.group("str"))))
            elif m.group("hop") is not None:
                if m.group("hop") in (b"'", b'"'):
                    flush()
                cur.append(shown(_hexbytes(m.group("hex"))))
            elif m.group("arr") is not None:
                for sm in _ARR_STR_RE.finditer(m.group("arr")):
                    if sm.group("s") is not None:
                        cur.append(shown(_decode_pdf_string(sm.group("s"))))
                    else:
                        cur.append(shown(_hexbytes(sm.group("h"))))
        flush()
    return "\n".join(lines)
