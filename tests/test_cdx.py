"""CDXJ capture index: SURT transform, offsets, random-access fetch."""

import pytest

from atlas_upscaling_dask_spark.sources.cdx import (
    build_cdxj,
    cdxj_lines,
    fetch_warc_record,
    surt,
    warc_cdx_index,
)
from atlas_upscaling_dask_spark.sources.warc import (
    encode_warc,
    parse_http_response,
)

RECS = [
    {"type": "response", "uri": "http://E0.Example.com/P/7?b=2&a=1",
     "status": 200, "payload": b"<p>seven</p>",
     "date": "2026-03-04T05:06:07Z"},
    {"type": "request", "uri": "http://ignored/"},
    {"type": "response", "uri": "http://E0.Example.com/Q/7",
     "status": 404, "payload": b"nope",
     "date": "2026-03-04T05:06:08Z", "content_encoding": "br"},
]


def test_surt_transform_rules():
    assert (
        surt("http://E1.Example.COM/Path/X?b=2&a=1#frag")
        == "com,example,e1)/path/x?a=1&b=2"
    )
    assert surt("https://host.com:443/") == "com,host)/"  # default port
    assert surt("http://host.com:8080/p") == "com,host:8080)/p"
    assert surt("http://h.com") == "com,h)/"  # empty path -> /
    assert surt("mailto:x@y") == "mailto:x@y"  # no ://: verbatim-lower


@pytest.mark.parametrize("gz", [False, True])
def test_index_and_random_access_fetch(gz):
    """Both offset-bearing layouts: every indexed (offset, length)
    slice must decode to exactly its record WITHOUT touching the rest
    of the archive — the replay-service contract."""
    data = encode_warc(RECS, gzip_per_record=gz)
    idx = build_cdxj(data, filename="t.warc.gz" if gz else "t.warc")
    assert [e["status"] for e in idx] == [200, 404]  # requests skipped
    e = idx[0]
    assert e["surt"] == "com,example,e0)/p/7?a=1&b=2"
    assert e["ts"] == "20260304050607"
    assert e["mime"] == "text/html"
    assert e["digest"].startswith("sha1:") and len(e["digest"]) == 37
    for e in idx:
        hdrs, body = fetch_warc_record(data, e["offset"], e["length"])
        assert hdrs["warc-target-uri"] == e["url"]
        status, _hh, _payload = parse_http_response(body)
        assert status == e["status"]
    lines = cdxj_lines(idx)
    assert lines == sorted(lines)
    assert lines[0].startswith("com,example,e0)/p/7?a=1&b=2 20260304050607 {")


def test_zstd_archives_index_without_offsets():
    z = encode_warc(RECS, zstd_per_record=True)
    idx = build_cdxj(z)
    assert len(idx) == 2
    assert all(e["offset"] is None and e["length"] is None for e in idx)
    assert idx[0]["digest"].startswith("sha1:")  # content fields intact


def test_spark_cdx_index(spark):
    data = encode_warc(RECS, gzip_per_record=True)
    media = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, payload binary"
    )
    rows = warc_cdx_index(media).orderBy("surt").collect()
    assert len(rows) == 2
    assert rows[0]["surt"] == "com,example,e0)/p/7?a=1&b=2"
    assert rows[0]["status"] == 200 and rows[1]["status"] == 404
    assert rows[0]["offset"] is not None
