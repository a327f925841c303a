"""Crawl scheduling: HTTP cache-semantics → recrawl times.

A continuous crawl is a scheduling problem: the fetch loop needs, per
URL, WHEN the page is worth fetching again.  HTTP already answers it —
RFC 9111's freshness model (``Cache-Control: max-age``, ``Expires``,
and the heuristic from ``Last-Modified`` age) is the publisher's own
declaration of how long the response stays fresh, and every serious
recrawl policy starts from it.  The reference has no web surface; this
is north-star extension work alongside the URL family and the WARC
reader (which now surfaces the caching headers per record).

Everything here is pure built-in expressions (one codegen'd
projection, no Python, no shuffle): header strings in, epoch seconds
out.  Pair with `urls.robots_crawl_delays` (per-host politeness
floor) and the frontier ledger for the full scheduling loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

#: RFC 9110 §5.6.7 IMF-fixdate minus the day name — Spark 3+'s
#: DateTimeFormatter treats day-of-week as a formatting-only field, so
#: the redundant ``EEE,`` prefix is stripped before parsing
_HTTP_DATE = "dd MMM yyyy HH:mm:ss zzz"


def _parse_http_date(col):
    """IMF-fixdate string → epoch seconds (NULL on malformed input —
    crawl headers carry garbage; ``try_to_timestamp`` keeps ANSI mode
    from killing the task over one bad ``Expires``)."""
    return F.unix_timestamp(
        F.try_to_timestamp(
            F.regexp_replace(col, r"^[A-Za-z]{3},\s*", ""),
            F.lit(_HTTP_DATE),
        )
    )


def recrawl_schedule(
    df: DataFrame,
    fetch_ts_col: str = "fetch_ts",
    cache_control_col: str = "http_cache_control",
    expires_col: str = "http_expires",
    last_modified_col: str = "http_last_modified",
    default_ttl: int = 86400,
    heuristic_fraction: float = 0.1,
) -> DataFrame:
    """Add ``ttl_sec``, ``next_fetch_ts`` (epoch seconds) and
    ``freshness_source`` from the response's caching headers, with the
    RFC 9111 precedence:

    1. ``no-store`` / ``no-cache`` → TTL 0 (always revalidate), even
       when a ``max-age`` is also present (§5.2.2);
    2. ``Cache-Control: max-age=N`` → N seconds (§4.2.1);
    3. ``Expires`` (IMF-fixdate) → its distance from the fetch time,
       floored at 0 for already-stale responses (§5.3);
    4. heuristic freshness: ``heuristic_fraction`` of the
       ``Last-Modified`` age (§4.2.2's "typically 10%" guidance);
    5. ``default_ttl`` when the response declares nothing.

    ``fetch_ts_col`` is epoch seconds (long).  One narrow projection —
    regex extracts and timestamp parses, all JVM-side."""
    cc = F.col(cache_control_col)
    fetch = F.col(fetch_ts_col).cast("long")
    no_cache = cc.rlike(r"(?i)\bno-(store|cache)\b")
    max_age = F.nullif(
        F.regexp_extract(cc, r"(?i)\bmax-age\s*=\s*(\d+)", 1), F.lit("")
    ).cast("long")
    exp_ts = _parse_http_date(F.col(expires_col))
    lm_ts = _parse_http_date(F.col(last_modified_col))
    ttl = (
        F.when(no_cache, F.lit(0).cast("long"))
        .when(max_age.isNotNull(), max_age)
        .when(exp_ts.isNotNull(), F.greatest(exp_ts - fetch, F.lit(0)))
        .when(
            lm_ts.isNotNull(),
            F.floor(
                F.greatest(fetch - lm_ts, F.lit(0)) * F.lit(heuristic_fraction)
            ).cast("long"),
        )
        .otherwise(F.lit(int(default_ttl)).cast("long"))
    )
    source = (
        F.when(no_cache, F.lit("no-cache"))
        .when(max_age.isNotNull(), F.lit("max-age"))
        .when(exp_ts.isNotNull(), F.lit("expires"))
        .when(lm_ts.isNotNull(), F.lit("heuristic"))
        .otherwise(F.lit("default"))
    )
    return (
        df.withColumn("ttl_sec", ttl)
        .withColumn("next_fetch_ts", fetch + ttl)
        .withColumn("freshness_source", source)
    )
