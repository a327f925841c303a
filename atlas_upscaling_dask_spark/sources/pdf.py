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

Out of contract, documented: encrypted documents (census flags them,
extraction raises — their streams are ciphertext), non-Flate stream
filters (named error), and non-simple encodings (CID/Type0 fonts'
2-byte strings extract as their raw bytes — lossy, flagged by the
caller's quality screens, never a crash).  PDF 1.5 compressed object
streams are NOT a text barrier: §7.5.7 forbids stream objects inside
them, so page content always sits top-level and extraction skips
/ObjStm safely; only the census page COUNT can undercount (page
dictionaries may be packed), which `has_object_streams` flags.

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


def _pdf_escape_string(s: str) -> bytes:
    out = []
    for ch in s.encode("latin-1", "replace"):
        if ch in (0x5C, 0x28, 0x29):  # \ ( )
            out.append(0x5C)
            out.append(ch)
        elif ch in (0x0A, 0x0D):
            out.append(0x5C)
            out.append(0x6E if ch == 0x0A else 0x72)  # \n \r
        else:
            out.append(ch)
    return bytes(out)


def encode_pdf(
    pages: list[str],
    compress: bool = True,
    producer: str = "atlas-upscaling-dask-spark fixture writer",
    use_tj_array: bool = False,
    encrypt_stub: bool = False,
) -> bytes:
    """A minimal, spec-correct PDF: one text block per page line
    (split on ``\\n``), Helvetica 12pt, classic xref + trailer.
    ``use_tj_array=True`` emits ``TJ`` arrays with kerning numbers
    (exercises the array-form reader); else ``Tj``.
    ``encrypt_stub=True`` adds a standard-security-handler dictionary
    and the trailer ``/Encrypt`` reference so the CENSUS path sees an
    encrypted document (streams are left plaintext — the fixture only
    exercises detection, and extraction refuses before reading them)."""
    if not pages:
        raise ValueError("a PDF needs at least one page")
    objects: list[bytes] = []  # 1-indexed

    n_pages = len(pages)
    # object numbering: 1 catalog, 2 pages, 3 font, 4 info,
    # then per page: 5+2i page, 6+2i content
    kids = " ".join(f"{5 + 2 * i} 0 R" for i in range(n_pages))
    objects.append(
        f"<< /Type /Catalog /Pages 2 0 R >>".encode()
    )
    objects.append(
        f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>".encode()
    )
    objects.append(
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>"
    )
    objects.append(
        b"<< /Producer (" + _pdf_escape_string(producer) + b") >>"
    )
    for i, text in enumerate(pages):
        content = [b"BT /F1 12 Tf 72 720 Td"]
        for j, line in enumerate(text.split("\n")):
            if j:
                content.append(b"0 -14 Td")
            esc = _pdf_escape_string(line)
            if use_tj_array:
                # split roughly in half with a kerning adjustment
                mid = len(line) // 2
                a = _pdf_escape_string(line[:mid])
                b_ = _pdf_escape_string(line[mid:])
                content.append(
                    b"[(" + a + b") -120 (" + b_ + b")] TJ"
                )
            else:
                content.append(b"(" + esc + b") Tj")
        content.append(b"ET")
        stream = b"\n".join(content)
        if compress:
            payload = zlib.compress(stream, 6)
            head = (
                f"<< /Length {len(payload)} /Filter /FlateDecode >>"
            ).encode()
        else:
            payload = stream
            head = f"<< /Length {len(payload)} >>".encode()
        objects.append(
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 3 0 R >> >> "
                f"/Contents {6 + 2 * i} 0 R >>"
            ).encode()
        )
        objects.append(head + b"\nstream\n" + payload + b"\nendstream")

    if encrypt_stub:
        objects.append(
            b"<< /Filter /Standard /V 1 /R 2 /P -44 >>"
        )
    out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
    offsets = [0]
    for num, body in enumerate(objects, start=1):
        offsets.append(len(out))
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_off = len(out)
    n = len(objects) + 1
    out += f"xref\n0 {n}\n".encode()
    out += b"0000000000 65535 f \n"
    for off in offsets[1:]:
        out += f"{off:010d} 00000 n \n".encode()
    enc = f" /Encrypt {len(objects)} 0 R" if encrypt_stub else ""
    out += (
        f"trailer\n<< /Size {n} /Root 1 0 R /Info 4 0 R{enc} >>\n"
        f"startxref\n{xref_off}\n%%EOF\n"
    ).encode()
    return bytes(out)


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
    # PDF 1.5 compressed object streams hold page DICTIONARIES (never
    # content streams, §7.5.7), so n_pages may undercount when present
    # — the flag tells the caller the count is a lower bound
    has_objstm = re.search(rb"/Type\s*/ObjStm\b", data) is not None
    return {
        "version": version,
        "n_pages": n_pages,
        "encrypted": encrypted,
        "producer": producer,
        "n_objects": len(_OBJ_RE.findall(data)),
        "has_object_streams": has_objstm,
    }


# ---------------------------------------------------------------------------
# text extraction


_STREAM_OBJ_RE = re.compile(
    rb"\d+\s+\d+\s+obj\b(.*?)\bendobj\b", re.DOTALL
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


def _iter_content_streams(data: bytes):
    """Yield decoded content-stream bytes via the linear object scan.
    A stream object's dict precedes ``stream``; the body runs to the
    matching ``endstream`` (the /Length value bounds it when sane)."""
    for m in _STREAM_OBJ_RE.finditer(data):
        body = m.group(1)
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
        yield payload


_TEXT_TOKEN_RE = re.compile(
    rb"\((?P<str>(?:[^()\\]|\\.)*)\)\s*(?P<op>Tj|'|\")"
    rb"|\[(?P<arr>(?:[^\[\]\\]|\\.)*)\]\s*TJ"
    rb"|(?P<brk>\bT\*|\bTd\b|\bTD\b|\bBT\b|\bET\b)"
)
_ARR_STR_RE = re.compile(rb"\((?P<s>(?:[^()\\]|\\.)*)\)")


def extract_pdf_text(data: bytes) -> str:
    """All text shown by the document's content streams, in stream
    order; ``Td``/``TD``/``T*``/``'``/``\"`` line moves become
    newlines, runs inside one line concatenate (``TJ`` kerning numbers
    dropped).  Encrypted documents raise (their streams are
    ciphertext)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("not a PDF (missing %PDF- header)")
    if re.search(rb"/Encrypt\b", data):
        raise NotImplementedError(
            "encrypted PDF: content streams are ciphertext (census "
            "flags these; decryption is a documented contract boundary)"
        )
    lines: list[str] = []
    cur: list[str] = []

    def flush():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    for stream in _iter_content_streams(data):
        for m in _TEXT_TOKEN_RE.finditer(stream):
            if m.group("brk") is not None:
                if m.group("brk") != b"ET":
                    flush()
                continue
            if m.group("op") is not None:
                if m.group("op") in (b"'", b'"'):
                    flush()  # both operators imply a line move first
                cur.append(
                    _decode_pdf_string(m.group("str")).decode(
                        "latin-1", "replace"
                    )
                )
            elif m.group("arr") is not None:
                for sm in _ARR_STR_RE.finditer(m.group("arr")):
                    cur.append(
                        _decode_pdf_string(sm.group("s")).decode(
                            "latin-1", "replace"
                        )
                    )
        flush()
    return "\n".join(lines)
