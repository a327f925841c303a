"""WARC container (ISO 28500): framing, gzip members, HTTP splitting,
the Spark record kernel, and the HTML text extraction expressions.
"""

from __future__ import annotations

import zlib

import pytest

from atlas_upscaling_dask_spark.sources.warc import (
    encode_warc,
    iter_warc_records,
    parse_http_response,
    warc_records,
)

HTML = (
    b"<html><head><title>T &amp; t</title><style>b{}</style></head>"
    b"<body><h1>Head</h1><p>one &lt;two&gt;</p>"
    b"<script>var x = '<p>not text</p>';</script></body></html>"
)


def _fixture_records():
    return [
        {"type": "warcinfo", "body": b"software: fixture\r\n"},
        {"type": "request", "uri": "http://h.io/a", "body": b"GET /a HTTP/1.1\r\n\r\n"},
        {
            "type": "response", "uri": "http://h.io/a", "status": 200,
            "payload": HTML,
        },
        {
            "type": "response", "uri": "http://h.io/missing", "status": 404,
            "http_headers": {"Content-Type": "text/plain"},
            "payload": b"gone",
        },
    ]


def test_roundtrip_plain_and_gzip():
    for gz in (False, True):
        data = encode_warc(_fixture_records(), gzip_per_record=gz)
        if gz:
            assert data[:2] == b"\x1f\x8b"
        recs = list(iter_warc_records(data))
        assert [h["warc-type"] for h, _ in recs] == [
            "warcinfo", "request", "response", "response",
        ]
        h2, body2 = recs[2]
        assert h2["warc-target-uri"] == "http://h.io/a"
        status, hh, payload = parse_http_response(body2)
        assert status == 200
        assert hh["content-type"].startswith("text/html")
        assert payload == HTML
        status4, hh4, payload4 = parse_http_response(recs[3][1])
        assert (status4, payload4) == (404, b"gone")
        assert hh4["content-type"] == "text/plain"


def test_spec_framing_hand_checked():
    # the writer's bytes follow ISO 28500 framing: version line, CRLF
    # headers, Content-Length body, CRLF CRLF separator
    data = encode_warc([{"type": "resource", "uri": "u:1", "body": b"XYZ"}])
    assert data.startswith(b"WARC/1.1\r\n")
    head, _, rest = data.partition(b"\r\n\r\n")
    assert b"\r\nContent-Length: 3\r\n" in head + b"\r\n"
    assert rest == b"XYZ\r\n\r\n"


def test_content_length_is_authoritative():
    # a body containing CRLF CRLF must not end the record early
    body = b"A\r\n\r\nB"
    data = encode_warc([
        {"type": "resource", "uri": "u:1", "body": body},
        {"type": "resource", "uri": "u:2", "body": b"second"},
    ])
    recs = list(iter_warc_records(data))
    assert recs[0][1] == body
    assert recs[1][1] == b"second"


def test_malformed_inputs_raise():
    with pytest.raises(ValueError, match="version line"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\n"))
    good = encode_warc([{"type": "resource", "uri": "u:1", "body": b"abcde"}])
    with pytest.raises(ValueError, match="truncated WARC record body"):
        list(iter_warc_records(good[:-9]))  # cut into the body
    # truncated gzip member
    gz = encode_warc([{"type": "resource", "body": b"x" * 100}], gzip_per_record=True)
    with pytest.raises(ValueError, match="gzip"):
        list(iter_warc_records(gz[: len(gz) // 2]))
    with pytest.raises(ValueError, match="Content-Length"):
        list(iter_warc_records(b"WARC/1.1\r\nWARC-Type: resource\r\n\r\n"))
    with pytest.raises(ValueError, match="separator"):
        parse_http_response(b"HTTP/1.1 200 OK")


def test_http_transport_decodings():
    from atlas_upscaling_dask_spark.sources.warc import decode_http_payload

    body = b"Hello transport world" * 20
    for enc in (None, "gzip", "deflate", "br", "zstd"):
        for chunked in (False, True):
            data = encode_warc([
                {"type": "response", "uri": "u:1", "status": 200,
                 "payload": body, "content_encoding": enc,
                 "chunked": chunked},
            ])
            hdrs, rec_body = next(iter_warc_records(data))
            status, hh, raw = parse_http_response(rec_body)
            if chunked:
                assert hh["transfer-encoding"] == "chunked"
                assert raw != body
            if enc:
                assert hh["content-encoding"] == enc
            assert decode_http_payload(hh, raw) == body, (enc, chunked)


def test_http_transport_decode_errors():
    from atlas_upscaling_dask_spark.sources.warc import decode_http_payload

    with pytest.raises(ValueError, match="unsupported content-encoding"):
        decode_http_payload({"content-encoding": "compress"}, b"x")
    # supported codings with corrupt streams are the SAME named family
    with pytest.raises(ValueError, match="corrupt content-encoding 'brotli'"):
        decode_http_payload({"content-encoding": "br"}, b"x")
    with pytest.raises(ValueError, match="corrupt content-encoding 'zstd'"):
        decode_http_payload({"content-encoding": "zstd"}, b"xx")
    with pytest.raises(ValueError, match="unsupported transfer-encoding"):
        decode_http_payload({"transfer-encoding": "gzip, chunked"},
                            b"0\r\n\r\n")
    with pytest.raises(ValueError, match="size line"):
        decode_http_payload({"transfer-encoding": "chunked"}, b"5")
    with pytest.raises(ValueError, match="malformed chunk size"):
        decode_http_payload({"transfer-encoding": "chunked"}, b"zz\r\n")
    with pytest.raises(ValueError, match="truncated chunk body"):
        decode_http_payload({"transfer-encoding": "chunked"}, b"ff\r\nabc")
    with pytest.raises(ValueError, match="CRLF terminator"):
        decode_http_payload(
            {"transfer-encoding": "chunked"}, b"3\r\nabcXX0\r\n\r\n"
        )


def test_warc_records_kernel_decodes_transport(spark):
    from atlas_upscaling_dask_spark.sources.warc import warc_records as wr

    data = encode_warc([
        {"type": "response", "uri": "u:1", "status": 200, "payload": HTML,
         "content_encoding": "gzip", "chunked": True},
    ])
    media = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, payload binary"
    )
    row = wr(media).collect()[0]
    assert bytes(row["payload"]) == HTML


def test_warc_records_kernel(spark):
    data = encode_warc(_fixture_records(), gzip_per_record=True)
    media = spark.createDataFrame(
        [(5, bytearray(data))], "media_id long, payload binary"
    )
    rows = warc_records(media).orderBy("record_idx").collect()
    assert [r["warc_type"] for r in rows] == [
        "warcinfo", "request", "response", "response",
    ]
    assert rows[2]["http_status"] == 200
    assert rows[2]["http_content_type"].startswith("text/html")
    assert bytes(rows[2]["payload"]) == HTML
    assert rows[3]["http_status"] == 404
    assert rows[0]["http_status"] is None
    assert rows[1]["target_uri"] == "http://h.io/a"


def test_warc_records_kernel_charset_text_column(spark):
    # text/* responses carry the charset-decoded body in `text` —
    # the single decoder shared by batch queries and streaming ingest
    body = "<p>café €</p>".encode("windows-1252")
    data = encode_warc([
        {"type": "response", "uri": "u:1", "status": 200,
         "http_headers": {"Content-Type": "text/html; charset=windows-1252"},
         "payload": body},
        {"type": "response", "uri": "u:2", "status": 200,
         "http_headers": {"Content-Type": "image/png"},
         "payload": b"\x89PNG\r\n\x1a\n"},
    ])
    media = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, payload binary"
    )
    rows = warc_records(media).orderBy("record_idx").collect()
    assert rows[0]["text"] == "<p>café €</p>"
    assert rows[0]["error"] is None
    assert rows[1]["text"] is None  # non-text media stays bytes-only
    assert bytes(rows[1]["payload"]) == b"\x89PNG\r\n\x1a\n"


def test_warc_records_emits_location_header(spark):
    data = encode_warc([
        {"type": "response", "uri": "u:1", "status": 301,
         "http_headers": {"Location": "https://moved.example/new"},
         "payload": b""},
        {"type": "response", "uri": "u:2", "status": 200,
         "payload": b"<p>x</p>"},
    ])
    media = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, payload binary"
    )
    rows = warc_records(media).orderBy("record_idx").collect()
    assert rows[0]["http_status"] == 301
    assert rows[0]["http_location"] == "https://moved.example/new"
    assert rows[1]["http_location"] is None


def test_warc_records_per_record_error_containment(spark):
    # one undecodable member (brotli transport coding) must NOT kill
    # the task carrying the rest of the archive: its row surfaces with
    # payload/text NULL and the reason in `error`, neighbors intact
    data = encode_warc([
        {"type": "response", "uri": "u:ok", "status": 200,
         "payload": b"<p>fine</p>"},
        {"type": "response", "uri": "u:br", "status": 200,
         "http_headers": {"Content-Encoding": "br"},
         "payload": b"\x1b\x03\x00not-really-brotli"},
        {"type": "response", "uri": "u:ok2", "status": 200,
         "payload": b"<p>also fine</p>"},
    ])
    media = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, payload binary"
    )
    rows = warc_records(media).orderBy("record_idx").collect()
    assert rows[0]["error"] is None and rows[0]["text"] == "<p>fine</p>"
    assert rows[2]["error"] is None and rows[2]["text"] == "<p>also fine</p>"
    assert rows[1]["payload"] is None and rows[1]["text"] is None
    assert "br" in rows[1]["error"]
    assert rows[1]["target_uri"] == "u:br"  # row survives with identity


def test_html_text_extraction(spark):
    from atlas_upscaling_dask_spark.extensions.text import extract_html_text

    df = spark.createDataFrame(
        [(1, HTML.decode())], "doc_id long, html string"
    )
    row = extract_html_text(df).collect()[0]
    assert row["title"] == "T & t"
    assert row["text"] == "T & t Head one <two>"
    # script/style content is gone
    assert "not text" not in row["text"] and "b{}" not in row["text"]


def test_html_extraction_plan_is_jvm_only(spark):
    from atlas_upscaling_dask_spark.extensions.text import extract_html_text

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = extract_html_text(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_html_entity_order_amp_last(spark):
    from atlas_upscaling_dask_spark.extensions.text import extract_html_text

    df = spark.createDataFrame(
        [(1, "<p>&amp;lt; &nbsp; &quot;q&quot;</p>")], "doc_id long, html string"
    )
    row = extract_html_text(df).collect()[0]
    assert row["text"] == '&lt; "q"'


# media census (lives here with the other round-9 format tests)


def test_parse_png_wav_info_header_only():
    import numpy as np

    from atlas_upscaling_dask_spark.sources.png import (
        encode_png,
        parse_png_info,
    )
    from atlas_upscaling_dask_spark.sources.wav import (
        encode_wav,
        parse_wav_info,
    )

    png = encode_png(np.zeros((5, 9, 3), np.uint8), interlace=True)
    info = parse_png_info(png)
    assert (info["width"], info["height"]) == (9, 5)
    assert info["color_type"] == 2 and info["n_channels"] == 3
    assert info["interlaced"] is True
    with pytest.raises(ValueError, match="signature"):
        parse_png_info(b"nope")

    wav = encode_wav(np.zeros((480, 2), np.int16), 16000)
    w = parse_wav_info(wav)
    assert (w.sample_rate, w.n_channels, w.bits, w.n_frames) == (
        16000, 2, 16, 480,
    )
    with pytest.raises(ValueError, match="fmt or data"):
        parse_wav_info(b"RIFF\x04\x00\x00\x00WAVE")


def test_media_info_dispatch_and_unknown():
    import numpy as np

    from atlas_upscaling_dask_spark.extensions.multimodal import media_info
    from atlas_upscaling_dask_spark.sources.avi import encode_avi
    from atlas_upscaling_dask_spark.sources.gif import encode_gif
    from atlas_upscaling_dask_spark.sources.jpeg import encode_jpeg
    from atlas_upscaling_dask_spark.sources.mp4 import encode_mp4_stub
    from atlas_upscaling_dask_spark.sources.png import encode_png
    from atlas_upscaling_dask_spark.sources.wav import encode_wav

    img = np.zeros((6, 7), np.uint8)
    cases = {
        "png": encode_png(img),
        "jpeg": encode_jpeg(img),
        "gif": encode_gif([img], palette=np.zeros((2, 3), np.uint8)),
        "avi": encode_avi([b"f1", b"f2"], width=7, height=6),
        "wav": encode_wav(np.zeros(100, np.int16), 8000),
        "mp4": encode_mp4_stub(width=7, height=6, n_video_samples=9),
    }
    for fmt, payload in cases.items():
        info = media_info(payload)
        assert info["format"] == fmt, fmt
        if fmt == "wav":
            assert info["sample_rate"] == 8000 and info["n_frames"] == 100
        else:
            assert (info["width"], info["height"]) == (7, 6), fmt
    with pytest.raises(ValueError, match="unrecognized"):
        media_info(b"\x00" * 32)


def test_charset_sniff_and_decode():
    from atlas_upscaling_dask_spark.sources.warc import (
        decode_text,
        sniff_charset,
    )

    # header param beats meta tag; meta used when header silent
    assert sniff_charset(
        "text/html; charset=ISO-8859-1", b'<meta charset="utf-8">'
    ) == "iso-8859-1"
    assert sniff_charset("text/html", b'<meta charset="windows-1252">x') == (
        "windows-1252"
    )
    assert sniff_charset(None, b"plain") == "utf-8"
    # BOM wins over everything
    assert sniff_charset("text/html; charset=latin-1",
                         b"\xef\xbb\xbfx") == "utf-8-sig"
    assert decode_text("café".encode("latin-1"),
                       "text/html; charset=ISO-8859-1") == "café"
    assert decode_text("café €".encode("cp1252"),
                       "text/html") != "café €"  # no declaration -> mojibake
    assert decode_text(
        b'<meta charset=windows-1252>caf\xe9 \x80', "text/html"
    ) == "<meta charset=windows-1252>café €"
    # unknown charset name falls back down the chain, never raises
    assert decode_text(b"abc", "text/html; charset=klingon") == "abc"
    assert decode_text(b"\xff\x00garbage", "text/html; charset=utf-8")


def test_extract_main_content_drops_boilerplate(spark):
    from atlas_upscaling_dask_spark.extensions.text import extract_main_content

    html = (
        '<div><a href="/">Home</a> <a href="/a">About</a></div>'
        "<p>First long content paragraph with plenty of prose to keep "
        "around for sure.</p>"
        '<p>Second long paragraph has <a href="/r">one inline link</a> '
        "inside much longer surrounding text that survives.</p>"
        '<footer><a href="/t">Terms</a> <a href="/p">Privacy</a></footer>'
        '<script>var x = "<p>never appears in any output at all</p>";</script>'
    )
    df = spark.createDataFrame([(1, html)], "doc_id long, html string")
    got = extract_main_content(df).collect()[0]["main_text"]
    lines = got.split("\n")
    assert len(lines) == 2
    assert lines[0].startswith("First long content")
    assert "inline link" in lines[1]
    assert "Home" not in got and "Terms" not in got
    assert "never appears" not in got


def test_extract_main_content_link_density_threshold(spark):
    from atlas_upscaling_dask_spark.extensions.text import extract_main_content

    # a LONG but link-saturated block (tag cloud) still drops; the same
    # text without links survives
    cloud = "<p>" + " ".join(
        f'<a href="/t{i}">topic-word-{i:02d}</a>' for i in range(12)
    ) + "</p>"
    prose = "<p>" + " ".join(f"topic-word-{i:02d}" for i in range(12)) + "</p>"
    df = spark.createDataFrame(
        [(0, cloud), (1, prose)], "doc_id long, html string"
    )
    got = {r["doc_id"]: r["main_text"] for r in extract_main_content(df).collect()}
    assert got[0] == ""
    assert got[1].startswith("topic-word-00")


def test_extract_page_metadata(spark):
    from atlas_upscaling_dask_spark.extensions.text import (
        extract_page_metadata,
    )

    html = (
        '<html lang="EN-us"><head>'
        '<meta property="og:title" content="OG Title &amp; more"/>'
        '<meta content="Reversed og desc" property="og:description">'
        '<meta name="description" content="Classic   desc">'
        '<link href="https://ex.com/canon" rel="canonical"/>'
        "</head></html>"
    )
    df = spark.createDataFrame(
        [(1, html), (2, "<p>no meta at all</p>")], "doc_id long, html string"
    )
    rows = {r["doc_id"]: r for r in extract_page_metadata(df).collect()}
    r1 = rows[1]
    assert r1["og_title"] == "OG Title & more"
    assert r1["og_description"] == "Reversed og desc"  # reversed attr order
    assert r1["meta_description"] == "Classic desc"
    assert r1["canonical_link"] == "https://ex.com/canon"  # href-first order
    assert r1["page_lang"] == "en-us"
    r2 = rows[2]
    assert all(
        r2[c] is None
        for c in ("og_title", "og_description", "meta_description",
                  "canonical_link", "page_lang")
    )
    plan = extract_page_metadata(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan and "Exchange" not in plan


def test_warc_zstd_members_round_trip():
    """.warc.zst: per-record zstd frames concatenate and stream-decode
    (records are self-delimiting, so member boundaries need not be
    recovered); torn streams and the IIPC dictionary skippable-frame
    convention are named errors."""
    import struct

    recs = [
        {"type": "response", "uri": "u:1", "status": 200,
         "payload": b"<p>one</p>"},
        {"type": "response", "uri": "u:2", "status": 200,
         "payload": b"<p>two</p>", "content_encoding": "zstd"},
    ]
    z = encode_warc(recs, zstd_per_record=True)
    assert z[:4] == b"\x28\xb5\x2f\xfd"  # zstd frame magic
    got = list(iter_warc_records(z))
    assert [h["warc-target-uri"] for h, _ in got] == ["u:1", "u:2"]
    with pytest.raises(ValueError):
        list(iter_warc_records(z[: len(z) // 2]))
    sk = b"\x50\x2a\x4d\x18" + struct.pack("<I", 4) + b"dict" + z
    with pytest.raises(ValueError, match="skippable"):
        list(iter_warc_records(sk))
