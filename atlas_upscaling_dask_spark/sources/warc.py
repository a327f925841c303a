"""WARC (Web ARChive, ISO 28500) reader/writer — the crawl container.

Training corpora start life as WARC: Common Crawl and every serious
crawler emit it.  A 100 TB ingestion pipeline's first pass is "WARC
bytes → one row per response record (URI, status, content type,
payload)", after which the rest of this repo takes over (HTML text
extraction, URL canonicalization + dedup, quality screens,
`prepare_training_set`).  The reference has no web surface — this is
north-star extension work like the media codecs and the URL family.

Implemented from the public ISO 28500 / WARC 1.1 specification:

* record framing — ``WARC/1.x`` version line, CRLF header block,
  ``Content-Length``-delimited body, CRLF CRLF separator;
* the standard record types (``warcinfo``/``request``/``response``/
  ``resource``/``metadata``/``conversion``) with their named headers;
* member-per-record gzip (the Common Crawl layout: each record its own
  gzip member, concatenated) via stdlib zlib — detected by magic, so
  plain and ``.warc.gz`` payloads both parse;
* ``.warc.zst`` (per-record or whole-file zstd frames) via pyarrow's
  bundled zstd, streaming across concatenated frames; the IIPC
  dictionary skippable-frame convention is a named contract boundary;
* HTTP ``Content-Encoding``: gzip/x-gzip/deflate (stdlib), br and
  zstd (pyarrow's bundled reference codecs, streaming);
* HTTP/1.x response parsing inside ``application/http`` record bodies
  (status line, headers, payload split).

Executor-local stdlib only; the Spark-side entry point is
``warc_records`` (an Arrow-batched ``mapInPandas`` kernel — WARC bytes
never leave the executor, one narrow pass).  A writer assembles
spec-shaped fixtures for tests and oracle queries.
"""

from __future__ import annotations

import re as _re
import zlib
from collections.abc import Iterator

WARC_VERSIONS = (b"WARC/1.0", b"WARC/1.1")


def _split_gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompress a stream of concatenated gzip members one by one."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data[pos:])
        if not d.eof:
            raise ValueError("truncated gzip member in WARC payload")
        yield out + d.flush()
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member consumed no bytes")
        pos += consumed


def iter_warc_records(data: bytes) -> Iterator[tuple[dict, bytes]]:
    """Yield ``(headers, body)`` per record; header names are
    lower-cased, values stripped.  Accepts plain, per-record-gzip, or
    zstd (``.warc.zst``, per-record or whole-file frames) payloads
    (mixed plain text after compressed members is not a thing the
    spec allows, so the magic check is global).

    zstd notes: concatenated frames stream-decode as one sequence
    (records are self-delimiting via Content-Length, so member
    boundaries need not be recovered); a leading SKIPPABLE frame — the
    IIPC ``.warc.zst`` dictionary convention — is a named error, since
    dictionary-trained archives can't decode without external state."""
    if data[:2] == b"\x1f\x8b":
        for member in _split_gzip_members(data):
            yield from _iter_plain(member)
        return
    if data[:4] == b"\x28\xb5\x2f\xfd":
        import pyarrow as pa

        try:
            with pa.input_stream(
                pa.BufferReader(data), compression="zstd"
            ) as fh:
                data = fh.read()
        except (OSError, pa.ArrowInvalid) as exc:
            raise ValueError(f"torn zstd WARC member: {exc}")
        yield from _iter_plain(data)
        return
    if (
        len(data) >= 4
        and data[1:4] == b"\x2a\x4d\x18"
        and 0x50 <= data[0] <= 0x5F
    ):
        raise ValueError(
            "dictionary-bearing .warc.zst (leading skippable frame, "
            "IIPC convention) is a documented contract boundary — "
            "plain zstd frames decode"
        )
    yield from _iter_plain(data)


def _iter_plain(data: bytes) -> Iterator[tuple[dict, bytes]]:
    for _start, _end, headers, body in _iter_plain_spans(data):
        yield headers, body


def _iter_plain_spans(
    data: bytes,
) -> Iterator[tuple[int, int, dict, bytes]]:
    """Like ``_iter_plain`` but yields ``(start, end, headers,
    body)`` — the byte span of each record, which the CDX indexer
    needs for random-access offsets."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLFs
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        start = pos
        eol = data.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated WARC version line")
        version = data[pos:eol]
        if version not in WARC_VERSIONS:
            raise ValueError(f"not a WARC record (version line {version!r})")
        pos = eol + 2
        headers: dict[str, str] = {}
        while True:
            eol = data.find(b"\r\n", pos)
            if eol < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break
            if b":" not in line:
                raise ValueError(f"malformed WARC header line {line!r}")
            name, _, value = line.partition(b":")
            headers[name.decode("latin-1").strip().lower()] = (
                value.decode("latin-1").strip()
            )
        try:
            length = int(headers["content-length"])
        except KeyError:
            raise ValueError("WARC record missing Content-Length") from None
        body = data[pos : pos + length]
        if len(body) != length:
            raise ValueError("truncated WARC record body")
        pos += length
        yield start, pos, headers, body


def parse_http_response(body: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an ``application/http;msgtype=response`` record body into
    (status_code, headers, payload)."""
    sep = body.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("HTTP response without header/body separator")
    head = body[:sep].split(b"\r\n")
    status_parts = head[0].split(None, 2)
    if len(status_parts) < 2 or not status_parts[0].startswith(b"HTTP/"):
        raise ValueError(f"malformed HTTP status line {head[0]!r}")
    status = int(status_parts[1])
    headers: dict[str, str] = {}
    for line in head[1:]:
        name, _, value = line.partition(b":")
        headers[name.decode("latin-1").strip().lower()] = (
            value.decode("latin-1").strip()
        )
    return status, headers, body[sep + 4 :]


def _dechunk(payload: bytes) -> bytes:
    """Decode HTTP/1.1 ``Transfer-Encoding: chunked`` framing
    (RFC 9112 §7.1): size-line (hex, optional extensions), chunk bytes,
    CRLF, terminated by a 0-size chunk + optional trailers."""
    out = bytearray()
    pos = 0
    n = len(payload)
    while True:
        eol = payload.find(b"\r\n", pos)
        if eol < 0:
            raise ValueError("truncated chunked encoding (no size line)")
        size_tok = payload[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(
                f"malformed chunk size line {payload[pos:eol]!r}"
            ) from None
        pos = eol + 2
        if size == 0:
            return bytes(out)  # trailers (if any) are ignored
        if pos + size + 2 > n:
            raise ValueError("truncated chunk body")
        out += payload[pos : pos + size]
        if payload[pos + size : pos + size + 2] != b"\r\n":
            raise ValueError("chunk body missing CRLF terminator")
        pos += size + 2


def _codec_decompress(name: str, payload: bytes) -> bytes:
    """Streaming decompress via pyarrow's bundled reference codecs
    (brotli / zstd ship inside pyarrow — no extra dependency).  The
    STREAMING reader is load-bearing: HTTP payloads don't announce
    their decompressed size, and ``pyarrow.Codec.decompress`` is a
    known-size one-shot API.  Torn or corrupt streams become the same
    named ``ValueError`` family the zlib paths raise, so per-record
    error containment treats all codings alike."""
    import pyarrow as pa

    try:
        with pa.input_stream(
            pa.BufferReader(payload), compression=name
        ) as fh:
            return fh.read()
    except (OSError, pa.ArrowInvalid) as exc:
        raise ValueError(
            f"corrupt content-encoding {name!r} stream: {exc}"
        )


def _codec_compress(name: str, payload: bytes) -> bytes:
    """Writer-side one-shot frame (fixtures): a complete stream the
    streaming reader round-trips."""
    import pyarrow as pa

    return bytes(pa.Codec(name).compress(payload))


def decode_http_payload(headers: dict[str, str], payload: bytes) -> bytes:
    """Undo the transport encodings a real crawl response carries:
    ``Transfer-Encoding: chunked`` framing first (RFC 9112), then
    ``Content-Encoding: gzip | x-gzip | deflate`` (RFC 9110 §8.4 — both
    zlib-wrapped and raw deflate, the web's historical ambiguity),
    ``br`` (RFC 7932) and ``zstd`` (RFC 8878) via pyarrow's bundled
    reference codecs.  Unknown codings raise rather than pass garbage
    downstream."""
    te = headers.get("transfer-encoding", "").lower()
    if te:
        codings = [t.strip() for t in te.split(",") if t.strip()]
        if codings[-1:] == ["chunked"]:
            payload = _dechunk(payload)
            codings = codings[:-1]
        if codings:
            raise ValueError(f"unsupported transfer-encoding {te!r}")
    ce = headers.get("content-encoding", "").lower().strip()
    if ce in ("", "identity"):
        return payload
    if ce in ("gzip", "x-gzip"):
        return zlib.decompress(payload, wbits=47)  # auto gzip/zlib header
    if ce == "deflate":
        try:
            return zlib.decompress(payload, wbits=15)  # zlib-wrapped
        except zlib.error:
            return zlib.decompress(payload, wbits=-15)  # raw deflate
    if ce == "br":
        return _codec_decompress("brotli", payload)
    if ce == "zstd":
        return _codec_decompress("zstd", payload)
    raise ValueError(f"unsupported content-encoding {ce!r}")


#: charset= in a Content-Type header value
_CT_CHARSET = _re.compile(r"charset\s*=\s*\"?([A-Za-z0-9._\-]+)", _re.I)
#: <meta charset=...> / http-equiv content-type, within the sniff window
_META_CHARSET = _re.compile(
    rb"<meta[^>]+charset\s*=\s*[\"']?\s*([A-Za-z0-9._\-]+)", _re.I
)


def sniff_charset(content_type: str | None, payload: bytes) -> str:
    """Charset resolution in the order a browser uses it: BOM, then the
    Content-Type header's ``charset=`` parameter, then a ``<meta
    charset>`` / http-equiv tag in the first 1024 bytes, else UTF-8
    (the WHATWG default for the modern web)."""
    if payload[:3] == b"\xef\xbb\xbf":
        return "utf-8-sig"
    if payload[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return "utf-16"
    if content_type:
        m = _CT_CHARSET.search(content_type)
        if m:
            return m.group(1).lower()
    m = _META_CHARSET.search(payload[:1024])
    if m:
        return m.group(1).decode("ascii", "replace").lower()
    return "utf-8"


def decode_text(payload: bytes, content_type: str | None = None) -> str:
    """Bytes → str with the crawl-grade fallback chain: the sniffed
    charset, then strict UTF-8, then latin-1 (total — never raises).
    Unknown charset NAMES fall through the same chain; a garbled page
    yields replacement-free latin-1 text rather than a dead task."""
    charset = sniff_charset(content_type, payload)
    for enc in (charset, "utf-8"):
        try:
            return payload.decode(enc)
        except (LookupError, UnicodeDecodeError):
            continue
    return payload.decode("latin-1")


def warc_records(media, payload_col: str = "payload"):
    """Arrow-batched WARC → rows: one output row per record, with HTTP
    response fields split out when present.  One narrow pass; archive
    bytes never leave the executor — at 100 TB each task parses its own
    WARC payloads and emits only the compact row.

    ``text`` carries the charset-decoded body (the `decode_text`
    browser chain: BOM → Content-Type charset → <meta> sniff → UTF-8 →
    latin-1) for ``text/*`` responses — the ONE decoder both the batch
    queries and the streaming crawl ingest share, so the same bytes
    never yield two different strings depending on the path.

    Per-record error containment: a malformed HTTP split or an
    unsupported transport coding (e.g. ``Content-Encoding: br``) in
    ONE record must not kill the task that carries the other million —
    such records surface with ``payload``/``text`` NULL and the reason
    in ``error``.  The framing walk itself stays strict
    (`iter_warc_records` raises on truncated/garbled archives): a
    broken container is a data-integrity event, a broken member is
    crawl weather."""
    import pandas as pd

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {
                "media_id": [], "record_idx": [], "warc_type": [],
                "target_uri": [], "warc_date": [], "http_status": [],
                "http_content_type": [], "http_location": [],
                "http_cache_control": [], "http_expires": [],
                "http_last_modified": [], "http_etag": [],
                "payload": [], "text": [], "error": [],
            }
            for mid, payload in zip(pdf["media_id"], pdf[payload_col]):
                for i, (hdrs, body) in enumerate(
                    iter_warc_records(bytes(payload))
                ):
                    rtype = hdrs.get("warc-type", "")
                    status: int | None = None
                    ctype: str | None = None
                    location: str | None = None
                    hh: dict[str, str] = {}
                    content: bytes | None = body
                    text: str | None = None
                    err: str | None = None
                    if rtype == "response" and hdrs.get(
                        "content-type", ""
                    ).startswith("application/http"):
                        try:
                            status, hhdrs, content = parse_http_response(body)
                            hh = hhdrs
                            ctype = hhdrs.get("content-type")
                            location = hhdrs.get("location")
                            content = decode_http_payload(hhdrs, content)
                        except ValueError as e:
                            content = None
                            err = str(e)
                    if (
                        err is None
                        and content is not None
                        and ctype is not None
                        and ctype.split(";", 1)[0].strip().lower()
                        .startswith("text/")
                    ):
                        text = decode_text(content, ctype)
                    rows["media_id"].append(int(mid))
                    rows["record_idx"].append(i)
                    rows["warc_type"].append(rtype)
                    rows["target_uri"].append(hdrs.get("warc-target-uri"))
                    rows["warc_date"].append(hdrs.get("warc-date"))
                    rows["http_status"].append(status)
                    rows["http_content_type"].append(ctype)
                    rows["http_location"].append(location)
                    rows["http_cache_control"].append(hh.get("cache-control"))
                    rows["http_expires"].append(hh.get("expires"))
                    rows["http_last_modified"].append(hh.get("last-modified"))
                    rows["http_etag"].append(hh.get("etag"))
                    rows["payload"].append(content)
                    rows["text"].append(text)
                    rows["error"].append(err)
            yield pd.DataFrame(
                {
                    "media_id": pd.array(rows["media_id"], dtype="int64"),
                    "record_idx": pd.array(rows["record_idx"], dtype="int32"),
                    "warc_type": rows["warc_type"],
                    "target_uri": rows["target_uri"],
                    "warc_date": rows["warc_date"],
                    "http_status": pd.array(rows["http_status"], dtype="Int32"),
                    "http_content_type": rows["http_content_type"],
                    "http_location": rows["http_location"],
                    "http_cache_control": rows["http_cache_control"],
                    "http_expires": rows["http_expires"],
                    "http_last_modified": rows["http_last_modified"],
                    "http_etag": rows["http_etag"],
                    "payload": rows["payload"],
                    "text": rows["text"],
                    "error": rows["error"],
                }
            )

    return media.mapInPandas(
        kernel,
        schema="media_id long, record_idx int, warc_type string, "
        "target_uri string, warc_date string, http_status int, "
        "http_content_type string, http_location string, "
        "http_cache_control string, http_expires string, "
        "http_last_modified string, http_etag string, "
        "payload binary, text string, error string",
    )


# ---------------------------------------------------------------------------
# writer (fixtures / export)


def _record(headers: list[tuple[str, str]], body: bytes) -> bytes:
    head = b"WARC/1.1\r\n"
    for k, v in headers:
        head += f"{k}: {v}\r\n".encode("latin-1")
    head += f"Content-Length: {len(body)}\r\n\r\n".encode()
    return head + body + b"\r\n\r\n"


def encode_warc(
    records: list[dict],
    gzip_per_record: bool = False,
    zstd_per_record: bool = False,
) -> bytes:
    """Assemble a WARC file.  Each record dict:

    ``{"type": "response", "uri": ..., "date": ..., "record_id": ...,
    "status": 200, "http_headers": {...}, "payload": b"..."}`` for
    responses, or ``{"type": ..., "uri": ..., "body": b"..."}`` for
    any other record type."""
    out = bytearray()
    for i, r in enumerate(records):
        rtype = r.get("type", "resource")
        headers = [
            ("WARC-Type", rtype),
            ("WARC-Record-ID",
             r.get("record_id", f"<urn:uuid:fixture-{i:08d}>")),
            ("WARC-Date", r.get("date", "2026-01-01T00:00:00Z")),
        ]
        if "uri" in r:
            headers.append(("WARC-Target-URI", r["uri"]))
        if rtype == "response":
            headers.append(
                ("Content-Type", "application/http;msgtype=response")
            )
            payload = r.get("payload", b"")
            status = r.get("status", 200)
            reason = {200: "OK", 301: "Moved Permanently",
                      404: "Not Found", 500: "Internal Server Error"}.get(
                status, "Status")
            http = f"HTTP/1.1 {status} {reason}\r\n".encode()
            hh = dict(r.get("http_headers", {}))
            hh.setdefault("Content-Type", "text/html; charset=utf-8")
            if r.get("content_encoding") == "gzip":
                co = zlib.compressobj(6, zlib.DEFLATED, 31)
                payload = co.compress(payload) + co.flush()
                hh["Content-Encoding"] = "gzip"
            elif r.get("content_encoding") == "deflate":
                payload = zlib.compress(payload)
                hh["Content-Encoding"] = "deflate"
            elif r.get("content_encoding") == "br":
                payload = _codec_compress("brotli", payload)
                hh["Content-Encoding"] = "br"
            elif r.get("content_encoding") == "zstd":
                payload = _codec_compress("zstd", payload)
                hh["Content-Encoding"] = "zstd"
            if r.get("chunked"):
                # split into a few chunks to make the framing real
                step = max(1, (len(payload) + 2) // 3)
                chunks = [
                    payload[i : i + step] for i in range(0, len(payload), step)
                ] or [b""]
                payload = b"".join(
                    f"{len(c):x}\r\n".encode() + c + b"\r\n" for c in chunks
                ) + b"0\r\n\r\n"
                hh["Transfer-Encoding"] = "chunked"
                hh.pop("Content-Length", None)
            else:
                hh.setdefault("Content-Length", str(len(payload)))
            for k, v in hh.items():
                http += f"{k}: {v}\r\n".encode("latin-1")
            body = http + b"\r\n" + payload
        else:
            body = r.get("body", b"")
            if rtype == "warcinfo":
                headers.append(
                    ("Content-Type", "application/warc-fields")
                )
        rec = _record(headers, body)
        if gzip_per_record:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            rec = co.compress(rec) + co.flush()
        elif zstd_per_record:
            rec = _codec_compress("zstd", rec)
        out += rec
    return bytes(out)
