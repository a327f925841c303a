"""URL canonicalization / registrable-domain / URL-dedup operators.

All-JVM expressions (no Python kernels): asserted behavior per RFC 3986
§6 normalization plus the crawl extras, and the broadcast-join
public-suffix longest-match rule.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from atlas_upscaling_dask_spark.extensions.urls import (
    canonicalize_urls,
    registrable_domains,
    suffix_frame,
    url_dedup,
)


def _canon(spark, urls):
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    rows = canonicalize_urls(df).orderBy("doc_id").collect()
    return [r["canonical_url"] for r in rows]


CASES = [
    # scheme + host case, fragment dropped
    ("HTTPS://WWW.Example.COM/Path#frag", "https://www.example.com/Path"),
    # default ports stripped; non-default kept; foreign scheme untouched
    ("http://a.com:80/x", "http://a.com/x"),
    ("https://a.com:443/x", "https://a.com/x"),
    ("https://a.com:8443/x", "https://a.com:8443/x"),
    ("ftp://a.com:21/x", "ftp://a.com:21/x"),
    # dot-segments, duplicate + trailing slashes
    ("http://h.io/a/./b/../c/", "http://h.io/a/c"),
    ("http://h.io/a//b///c", "http://h.io/a/b/c"),
    ("http://h.io/../..", "http://h.io/"),
    ("http://h.io", "http://h.io/"),
    ("http://h.io/.", "http://h.io/"),
    # trailing host dot
    ("http://h.io./x", "http://h.io/x"),
    # tracking params dropped, rest sorted, empty query dropped
    (
        "http://h.io/p?utm_source=rss&b=2&a=1&fbclid=XYZ",
        "http://h.io/p?a=1&b=2",
    ),
    ("http://h.io/p?UTM_CAMPAIGN=x&GCLID=1", "http://h.io/p"),
    ("http://h.io/p?z=1&y=&x=3", "http://h.io/p?x=3&y=&z=1"),
    ("http://h.io/p?", "http://h.io/p"),
    # whitespace trim
    ("  http://h.io/x  ", "http://h.io/x"),
    # no scheme: pass through trimmed-verbatim
    ("not a url", "not a url"),
    ("  bare-id-123 ", "bare-id-123"),
    # percent-encoding: unreserved escapes decode (§6.2.2.2)...
    ("http://h.io/%7Euser/%41%62%30%2Dx%2e%5F", "http://h.io/~user/Ab0-x._"),
    # ...reserved escapes keep the escape, hex uppercased (§6.2.2.1)
    ("http://h.io/a%3ab?k=%2fv%2F", "http://h.io/a%3Ab?k=%2Fv%2F"),
    # malformed triplets verbatim; trailing % survives
    ("http://h.io/a%zzb%1", "http://h.io/a%zzb%1"),
    ("http://h.io/x%", "http://h.io/x%"),
    # scheme-less: percent spelling left untouched too
    ("opaque%7Eid", "opaque%7Eid"),
    # IPv6 literal hosts: bracketed form kept, default port stripped,
    # hex case folded, non-default port kept
    ("http://[::1]/x", "http://[::1]/x"),
    ("http://[::1]:80/x", "http://[::1]/x"),
    ("https://[2001:DB8::7]:443/a/../b", "https://[2001:db8::7]/b"),
    ("http://[2001:db8::7]:8080/x", "http://[2001:db8::7]:8080/x"),
]


def test_canonicalize_cases(spark):
    got = _canon(spark, [c[0] for c in CASES])
    for (raw, want), g in zip(CASES, got):
        assert g == want, raw


def test_canonicalize_is_idempotent(spark):
    canon = _canon(spark, [c[0] for c in CASES])
    again = _canon(spark, canon)
    assert again == canon


def test_canonicalize_plan_is_jvm_only(spark):
    # one codegen'd projection: no Python UDF, no exchange
    df = spark.createDataFrame([(1, "http://a.com/x")], "doc_id long, url string")
    plan = canonicalize_urls(df)._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan


@pytest.mark.parametrize(
    "host,want",
    [
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("a.b.site.co.uk", "site.co.uk"),
        ("site.co.uk", "site.co.uk"),
        ("co.uk", None),  # the host IS a public suffix
        ("com", None),
        ("deep.x.y.blog.example.org", "example.org"),
        ("noSuffix.internal", None),  # unknown TLD -> no match
        ("UPPER.Example.COM", "example.com"),  # case-folded
    ],
)
def test_registrable_domain_longest_match(spark, host, want):
    df = spark.createDataFrame([(host,)], "host string")
    got = registrable_domains(df).collect()[0]["registrable_domain"]
    assert got == want, host


def test_registrable_domain_plan_broadcast_no_shuffle(spark):
    df = spark.createDataFrame(
        [(f"s{i}.example.com",) for i in range(10)], "host string"
    )
    out = registrable_domains(df)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "SortMergeJoin" not in plan


def test_registrable_domain_custom_suffixes(spark):
    df = spark.createDataFrame([("a.b.custom.tld",)], "host string")
    sfx = suffix_frame(spark, ("tld", "custom.tld"))
    got = registrable_domains(df, suffixes=sfx).collect()[0][
        "registrable_domain"
    ]
    assert got == "b.custom.tld"


ROBOTS = """
# fixture robots
User-agent: evil-bot
Disallow: /

User-agent: atlas
User-agent: other-bot
Disallow: /secret

User-agent: *
Disallow: /private
Allow: /private/ok
Disallow: /*.tmp$
Crawl-delay: 10
"""


def test_resolve_redirects_chains(spark):
    from atlas_upscaling_dask_spark.extensions.urls import resolve_redirects

    rows = [
        # 3-hop chain with relative + case-shifted spellings
        ("HTTP://A.com/0", 301, "/1"),
        ("http://a.com/1", 302, "http://A.com/2"),
        ("http://a.com/2", 307, "/3"),
        ("http://a.com/3", 200, None),
        # chain leaving the crawl: last known target reported, resolved
        ("http://b.com/x", 308, "http://elsewhere.com/y"),
        # 200 with a (stale) Location header is NOT a redirect
        ("http://c.com/ok", 200, "/ignored"),
        # 2-cycle: unresolved, hops pinned at the cap
        ("http://d.com/p", 301, "/q"),
        ("http://d.com/q", 301, "/p"),
    ]
    df = spark.createDataFrame(
        rows, "url string, http_status int, http_location string"
    )
    got = {
        r["url_canonical"]: (r["final_url"], r["n_hops"], r["unresolved"])
        for r in resolve_redirects(df, max_hops=16).collect()
    }
    assert got["http://a.com/0"] == ("http://a.com/3", 3, False)
    assert got["http://a.com/1"] == ("http://a.com/3", 2, False)
    assert got["http://a.com/3"] == ("http://a.com/3", 0, False)
    assert got["http://b.com/x"] == ("http://elsewhere.com/y", 1, False)
    assert got["http://c.com/ok"] == ("http://c.com/ok", 0, False)
    # 16 mod 2 = 0: the doubling terminus of a 2-cycle is the row itself
    assert got["http://d.com/p"] == ("http://d.com/p", 16, True)
    assert got["http://d.com/q"] == ("http://d.com/q", 16, True)


PSL_SNIPPET = """\
// ===BEGIN ICANN DOMAINS===
com
// a comment between rules
uk
co.uk
jp
kobe.jp
*.kobe.jp
!city.kobe.jp
ck  // trailing cruft is ignored per spec (rule = first token)
*.ck
!www.ck
// ===END ICANN DOMAINS===
// ===BEGIN PRIVATE DOMAINS===
github.io
// ===END PRIVATE DOMAINS===
"""


def test_parse_psl_format():
    from atlas_upscaling_dask_spark.extensions.urls import parse_psl

    rules = dict(parse_psl(PSL_SNIPPET))
    assert rules["com"] == "plain"
    assert rules["*.ck"] == "wildcard"
    assert rules["www.ck"] == "exception"  # '!' stripped
    assert rules["city.kobe.jp"] == "exception"
    assert rules["github.io"] == "plain"  # PRIVATE section loads too
    assert "//" not in "".join(rules)  # comments gone
    assert len(rules) == 11


def test_load_psl_wildcard_exception_semantics(spark):
    # expectations are publicsuffix.org's own published test vectors
    # for the kobe.jp / ck rule cluster
    from atlas_upscaling_dask_spark.extensions.urls import load_psl

    sfx = load_psl(spark, text=PSL_SNIPPET)
    hosts = [
        ("www.example.com", "example.com"),
        ("example.com", "example.com"),
        ("com", None),  # is itself a public suffix
        ("blog.github.io", "blog.github.io"),  # private-section rule
        ("github.io", None),
        ("www.ck", "www.ck"),  # exception beats the *.ck wildcard
        ("a.www.ck", "www.ck"),
        ("other.ck", None),  # wildcard makes it a public suffix
        ("foo.other.ck", "foo.other.ck"),
        ("kobe.jp", None),
        ("c.kobe.jp", None),  # *.kobe.jp
        ("b.c.kobe.jp", "b.c.kobe.jp"),
        ("city.kobe.jp", "city.kobe.jp"),  # !city.kobe.jp
        ("www.city.kobe.jp", "city.kobe.jp"),
        ("nomatch.zz", None),  # no rule: documented strict NULL
    ]
    df = spark.createDataFrame(
        [(i, h) for i, (h, _) in enumerate(hosts)], "i long, host string"
    )
    got = {
        r["host"]: r["registrable_domain"]
        for r in registrable_domains(df, suffixes=sfx).collect()
    }
    assert got == {h: want for h, want in hosts}


def test_parse_robots_groups():
    from atlas_upscaling_dask_spark.extensions.urls import parse_robots

    # unknown agent -> the * group (comments and crawl-delay ignored)
    assert parse_robots(ROBOTS, "somebody") == [
        (False, "/private"), (True, "/private/ok"), (False, "/*.tmp$"),
    ]
    # longest agent-token substring match wins over *
    assert parse_robots(ROBOTS, "evil-bot/2.0") == [(False, "/")]
    # a group header with TWO user-agent lines covers both agents
    assert parse_robots(ROBOTS, "atlas-crawler") == [(False, "/secret")]
    assert parse_robots(ROBOTS, "other-bot") == [(False, "/secret")]
    # empty Disallow contributes no rule
    assert parse_robots("User-agent: *\nDisallow:\n", "x") == []
    # no matching group at all -> no rules
    assert parse_robots("User-agent: a\nDisallow: /\n", "b") == []


def test_robots_pattern_regex():
    from atlas_upscaling_dask_spark.extensions.urls import (
        _robots_pattern_to_regex as rx,
    )
    import re

    assert re.search(rx("/private"), "/private/x")
    assert not re.search(rx("/private"), "/pub/private")
    assert re.search(rx("/*.tmp$"), "/a/b/file.tmp")
    assert not re.search(rx("/*.tmp$"), "/a/b/file.tmpx")
    assert re.search(rx("/a*b"), "/aXXXb/c")
    # regex metacharacters in the path are literals
    assert re.search(rx("/p+q"), "/p+q/r")
    assert not re.search(rx("/p+q"), "/ppq/r")


def test_filter_urls_by_robots(spark):
    from atlas_upscaling_dask_spark.extensions.urls import (
        filter_urls_by_robots,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [("h.io", ROBOTS)], "host string, robots_txt string"
    )
    rules = robots_rules(robots, agent="somebody")
    urls = spark.createDataFrame(
        [
            (0, "http://h.io/public/x"),
            (1, "http://h.io/private/x"),
            (2, "http://h.io/private/ok/y"),       # allow beats disallow
            (3, "http://H.IO:80/cache/f.tmp"),     # host case/port folded
            (4, "http://h.io/private/x?q=1#f"),    # query/fragment ignored
            (5, "http://other.example/private/x"), # no robots -> allowed
            (6, "http://h.io"),                    # bare host -> path "/"
        ],
        "doc_id long, url string",
    )
    got = {
        r["doc_id"]: r["allowed"]
        for r in filter_urls_by_robots(urls, rules).collect()
    }
    assert got == {0: True, 1: False, 2: True, 3: False, 4: False,
                   5: True, 6: True}


def test_filter_urls_by_robots_plan_broadcast(spark):
    from atlas_upscaling_dask_spark.extensions.urls import (
        filter_urls_by_robots,
        robots_rules,
    )

    robots = spark.createDataFrame(
        [("h.io", ROBOTS)], "host string, robots_txt string"
    )
    urls = spark.createDataFrame(
        [(i, f"http://h.io/p{i}") for i in range(10)],
        "doc_id long, url string",
    )
    out = filter_urls_by_robots(urls, robots_rules(robots))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_url_dedup_survivor_and_counts(spark):
    urls = [
        (0, "http://h.io/a?utm_source=x"),
        (1, "HTTP://h.io:80/a"),
        (2, "http://h.io/b/../a#frag"),
        (3, "http://h.io/other"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    rows = {
        r["canonical_url"]: (r["survivor_doc_id"], r["n_dups"])
        for r in url_dedup(df).collect()
    }
    assert rows == {
        "http://h.io/a": (0, 3),
        "http://h.io/other": (3, 1),
    }


def test_extract_links_resolution_cases(spark):
    from atlas_upscaling_dask_spark.extensions.urls import extract_links

    html = (
        '<a href="http://ext.example.org/a">x</a>'
        '<a class="c" href="/r/1?utm_source=z">y</a>'
        "<a href='sub/p'>z</a>"
        '<a href="//cdn.example.net/lib">w</a>'
        '<a href="#frag">self</a>'
        '<a href="mailto:a@b.c">m</a>'
        '<a href="javascript:void(0)">j</a>'
        '<a href="../up">u</a>'
    )
    df = spark.createDataFrame(
        [(1, "https://Crawl.Example.com:443/w/3?q=1#f", html)],
        "doc_id long, url string, html string",
    )
    got = sorted(
        r["link_url"] for r in extract_links(df).select("link_url").collect()
    )
    assert got == [
        "http://ext.example.org/a",
        "https://cdn.example.net/lib",
        "https://crawl.example.com/r/1",
        "https://crawl.example.com/up",
        "https://crawl.example.com/w/sub/p",
    ]


def test_extract_links_plan_is_jvm_only(spark):
    from atlas_upscaling_dask_spark.extensions.urls import extract_links

    df = spark.createDataFrame(
        [(1, "http://h.io/a", '<a href="/x">l</a>')],
        "doc_id long, url string, html string",
    )
    plan = extract_links(df)._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in plan
    assert "Exchange" not in plan


def test_extract_sitemap_urls_and_robots_directive(spark):
    from atlas_upscaling_dask_spark.extensions.urls import (
        extract_sitemap_urls,
        parse_robots_sitemaps,
    )

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> HTTP://H.io/a?utm_source=x&amp;k=1 </loc></url>"
        "<url><loc>http://h.io/b/../c</loc></url>"
        "</urlset>"
    )
    idx = (
        "<sitemapindex><sitemap><loc>http://h.io/maps/part1.xml</loc>"
        "</sitemap></sitemapindex>"
    )
    df = spark.createDataFrame(
        [(0, xml), (1, idx)], "doc_id long, xml string"
    )
    got = sorted(
        (r["doc_id"], r["url"])
        for r in extract_sitemap_urls(df).collect()
    )
    assert got == [
        (0, "http://h.io/a?k=1"),
        (0, "http://h.io/c"),
        (1, "http://h.io/maps/part1.xml"),
    ]

    robots = "User-agent: *\nDisallow: /x\nSitemap: http://h.io/s.xml\n# c\n"
    assert parse_robots_sitemaps(robots) == ["http://h.io/s.xml"]
    assert parse_robots_sitemaps("User-agent: *\n") == []


def test_extract_sitemap_entries_fields(spark):
    from atlas_upscaling_dask_spark.extensions.urls import (
        extract_sitemap_entries,
    )

    xml = (
        '<?xml version="1.0"?><urlset>'
        "<url><loc> http://A.com/x </loc>"
        "<lastmod>2026-03-05T08:00:00+02:00</lastmod>"
        "<changefreq>WEEKLY</changefreq><priority>0.8</priority></url>"
        "<url><loc>http://a.com/y?a=1&amp;b=2</loc></url>"
        "<url><lastmod>2026-01-01</lastmod></url>"  # no loc: dropped
        "</urlset>"
    )
    df = spark.createDataFrame([(1, xml)], "doc_id long, xml string")
    rows = extract_sitemap_entries(df).orderBy("url").collect()
    assert len(rows) == 2
    assert rows[0]["url"] == "http://a.com/x"
    assert str(rows[0]["lastmod_date"]) == "2026-03-05"
    assert rows[0]["changefreq"] == "weekly"
    assert rows[0]["priority"] == 0.8
    assert rows[1]["url"] == "http://a.com/y?a=1&b=2"
    assert rows[1]["lastmod_date"] is None
    assert rows[1]["changefreq"] is None
    assert rows[1]["priority"] == 0.5  # the spec default


def test_parse_robots_crawl_delay_group_selection():
    from atlas_upscaling_dask_spark.extensions.urls import (
        parse_robots_crawl_delay,
    )

    txt = (
        "User-agent: fastbot\nCrawl-delay: 2\nDisallow: /x\n\n"
        "User-agent: *\nCrawl-delay: 9\n"
    )
    assert parse_robots_crawl_delay(txt, "fastbot") == 2.0
    assert parse_robots_crawl_delay(txt, "otherbot") == 9.0
    # matched specific group without a delay: NULL, not the * fallback
    txt2 = "User-agent: fastbot\nDisallow: /z\n\nUser-agent: *\nCrawl-delay: 3\n"
    assert parse_robots_crawl_delay(txt2, "fastbot") is None
    assert parse_robots_crawl_delay(txt2, "nomatch") == 3.0
    # fractional + non-numeric ignored + last-wins within a group
    txt3 = "User-agent: *\nCrawl-delay: abc\nCrawl-delay: 0.25\n"
    assert parse_robots_crawl_delay(txt3, "x") == 0.25
    assert parse_robots_crawl_delay("", "x") is None


def test_robots_group_formation_parity():
    """r10 advice: a Crawl-delay record must end the user-agent run in
    BOTH parsers, so rules and politeness budgets attribute to the
    same group shapes for the same file."""
    from atlas_upscaling_dask_spark.extensions.urls import (
        parse_robots,
        parse_robots_crawl_delay,
    )

    txt = "User-agent: a\nCrawl-delay: 5\nUser-agent: b\nDisallow: /x\n"
    # a and b are now SEPARATE groups in the rule parser too: the
    # crawl-delay ends a's startgroupline run, so b starts fresh.
    assert parse_robots(txt, "a") == []
    assert parse_robots(txt, "b") == [(False, "/x")]
    assert parse_robots_crawl_delay(txt, "a") == 5.0
    assert parse_robots_crawl_delay(txt, "b") is None
    # adjacent user-agent lines (no intervening record) still merge
    merged = "User-agent: a\nUser-agent: b\nCrawl-delay: 7\nDisallow: /y\n"
    for agent in ("a", "b"):
        assert parse_robots(merged, agent) == [(False, "/y")]
        assert parse_robots_crawl_delay(merged, agent) == 7.0


def test_url_dedup_canonical_consolidates_variants(spark):
    from atlas_upscaling_dask_spark.extensions.urls import url_dedup_canonical

    rows = [
        # three variants of one article, all declaring the canonical
        (0, "http://www.site.com/a", "HTTP://Site.com/a#top"),
        (1, "http://m.site.com/a?utm_source=x", "http://site.com/a"),
        (2, "http://amp.site.com/a", "http://site.com/a"),
        # no canonical declared -> fetch-URL identity only
        (3, "http://www.site.com/a", None),
        (4, "http://other.com/b", None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, canonical_link string")
    got = {
        r["canonical_url"]: (r["survivor_doc_id"], r["n_dups"], r["n_declared"])
        for r in url_dedup_canonical(df).collect()
    }
    assert got == {
        "http://site.com/a": (0, 3, 3),
        "http://www.site.com/a": (3, 1, 0),
        "http://other.com/b": (4, 1, 0),
    }


def test_url_dedup_canonical_resolves_relative_links(spark):
    """A relative <link rel=canonical> (common on real pages) must be
    resolved against the fetch URL, never used verbatim as the group
    key — verbatim keying collides unrelated hosts that share a path
    shape and never matches any absolute fetch-URL key."""
    from atlas_upscaling_dask_spark.extensions.urls import url_dedup_canonical

    rows = [
        # two hosts both declaring the relative canonical /story/3:
        # MUST stay separate groups, each resolved onto its own host
        (0, "http://alpha.com/story/3?utm_source=x", "/story/3"),
        (1, "http://beta.com/amp/story/3", "/story/3"),
        # ...and the relative canonical joins the host's absolute group
        (2, "http://alpha.com/story/3", "http://alpha.com/story/3"),
        # non-hierarchical scheme -> unusable, falls back to fetch URL
        (3, "http://gamma.com/x", "mailto:editor@gamma.com"),
        # scheme-less fetch URL gives resolution no origin -> fallback
        (4, "opaque-id-77", "/story/3"),
        # dot-segments in the relative link resolve via the canonical
        # fold (base dir of /a/b/page.html is /a/b)
        (5, "http://delta.com/a/b/page.html", "../c"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string, canonical_link string")
    got = {
        r["canonical_url"]: (r["survivor_doc_id"], r["n_dups"], r["n_declared"])
        for r in url_dedup_canonical(df).collect()
    }
    assert got == {
        "http://alpha.com/story/3": (0, 2, 2),
        "http://beta.com/story/3": (1, 1, 1),
        "http://gamma.com/x": (3, 1, 0),
        "opaque-id-77": (4, 1, 0),
        "http://delta.com/a/c": (5, 1, 1),
    }
