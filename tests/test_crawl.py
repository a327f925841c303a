"""HTTP cache-semantics recrawl scheduling (extensions/crawl.py)."""

from __future__ import annotations


def test_recrawl_schedule_precedence(spark):
    from atlas_upscaling_dask_spark.extensions.crawl import recrawl_schedule

    fetch = 1_700_000_000
    rows = [
        # (id, cache_control, expires, last_modified)
        (0, "max-age=300, public", None, None),
        # no-cache beats the max-age next to it (RFC 9111 §5.2.2)
        (1, "no-store, max-age=500", None, None),
        # Expires: 2026-01-01T00:00:00Z = 1767225600
        (2, None, "Thu, 01 Jan 2026 00:00:00 GMT", None),
        # stale Expires floors at 0
        (3, None, "Wed, 01 Jan 2020 00:00:00 GMT", None),
        # heuristic: 10% of Last-Modified age (2020-01-01 = 1577836800)
        (4, None, None, "Wed, 01 Jan 2020 00:00:00 GMT"),
        # nothing declared -> default
        (5, None, None, None),
        # malformed header values parse to NULL -> default
        (6, "public", "soon", "yesterday"),
        # max-age beats Expires when both present
        (7, "max-age=60", "Thu, 01 Jan 2026 00:00:00 GMT", None),
    ]
    df = spark.createDataFrame(
        [(i, fetch, cc, ex, lm) for i, cc, ex, lm in rows],
        "id long, fetch_ts long, http_cache_control string, "
        "http_expires string, http_last_modified string",
    )
    got = {
        r["id"]: (r["ttl_sec"], r["next_fetch_ts"], r["freshness_source"])
        for r in recrawl_schedule(df, default_ttl=7200).collect()
    }
    assert got[0] == (300, fetch + 300, "max-age")
    assert got[1] == (0, fetch, "no-cache")
    assert got[2] == (1767225600 - fetch, 1767225600, "expires")
    assert got[3] == (0, fetch, "expires")
    heur = int((fetch - 1577836800) * 0.1)
    assert got[4] == (heur, fetch + heur, "heuristic")
    assert got[5] == (7200, fetch + 7200, "default")
    assert got[6] == (7200, fetch + 7200, "default")
    assert got[7] == (60, fetch + 60, "max-age")


def test_recrawl_schedule_plan_is_jvm_only(spark):
    from atlas_upscaling_dask_spark.extensions.crawl import recrawl_schedule

    df = spark.createDataFrame(
        [(1, 1000, "max-age=5", None, None)],
        "id long, fetch_ts long, http_cache_control string, "
        "http_expires string, http_last_modified string",
    )
    plan = (
        recrawl_schedule(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_warc_records_emits_caching_headers(spark):
    from atlas_upscaling_dask_spark.sources.warc import (
        encode_warc,
        warc_records,
    )

    data = encode_warc([
        {"type": "response", "uri": "u:1", "status": 200,
         "http_headers": {
             "Cache-Control": "max-age=120",
             "Expires": "Thu, 01 Jan 2026 00:00:00 GMT",
             "Last-Modified": "Wed, 01 Jan 2020 00:00:00 GMT",
             "ETag": '"abc123"',
         },
         "payload": b"<p>x</p>"},
    ])
    media = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, payload binary"
    )
    row = warc_records(media).collect()[0]
    assert row["http_cache_control"] == "max-age=120"
    assert row["http_expires"] == "Thu, 01 Jan 2026 00:00:00 GMT"
    assert row["http_last_modified"] == "Wed, 01 Jan 2020 00:00:00 GMT"
    assert row["http_etag"] == '"abc123"'
