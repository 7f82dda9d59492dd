"""robots.txt semantics (reference internal/robots/cache.go + its fixture)."""

from ant_spark.operators.robots import RobotsData, allowed_one, delay_one

# /root/reference/internal/robots/testdata/robots.txt (verbatim)
FIXTURE = "\nUser-Agent: badbot\nCrawl-Delay: 1\n\nUser-Agent: *\nDisallow: /search\n"

# /root/reference/testdata/example.com/robots.txt (verbatim)
EXAMPLE = "\nUser-Agent: antbot\nDisallow: /search.html\n"


def test_fixture_star_group_disallow():
    rd = RobotsData.parse(FIXTURE)
    assert rd.allowed("/", "somebot") is True
    assert rd.allowed("/search", "somebot") is False
    assert rd.allowed("/search/deep", "somebot") is False
    assert rd.allowed("/searching", "somebot") is False  # prefix match
    assert rd.allowed("/sea", "somebot") is True


def test_fixture_badbot_crawl_delay():
    rd = RobotsData.parse(FIXTURE)
    assert rd.delay("badbot") == 1.0
    assert rd.delay("goodbot") is None  # star group has no delay
    # badbot group has no Disallow → badbot may fetch /search
    assert rd.allowed("/search", "badbot") is True


def test_example_com_antbot():
    rd = RobotsData.parse(EXAMPLE)
    assert rd.allowed("/search.html", "antbot") is False
    assert rd.allowed("/about.html", "antbot") is True
    # other UAs: no matching group ⇒ allow-all
    assert rd.allowed("/search.html", "otherbot") is True


def test_path_leading_slash_coerced():
    # cache.go:94-100
    rd = RobotsData.parse("User-agent: *\nDisallow: /x\n")
    assert rd.allowed("x", "ua") is False


def test_status_gte_400_allows_all():
    # cache.go:159-163
    assert allowed_one("User-agent: *\nDisallow: /", 404, "/anything", "ua") is True
    assert allowed_one("User-agent: *\nDisallow: /", 200, "/anything", "ua") is False
    assert delay_one("User-agent: *\nCrawl-delay: 9", 500, "ua") is None


def test_no_robots_row_allows_all():
    assert allowed_one(None, None, "/x", "ua") is True


def test_longest_match_wins_allow_tie():
    body = "User-agent: *\nDisallow: /a\nAllow: /a/b\n"
    rd = RobotsData.parse(body)
    assert rd.allowed("/a/c", "ua") is False
    assert rd.allowed("/a/b/c", "ua") is True


def test_wildcards_and_anchor():
    body = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /tmp*\n"
    rd = RobotsData.parse(body)
    assert rd.allowed("/doc.pdf", "ua") is False
    assert rd.allowed("/doc.pdfx", "ua") is True
    assert rd.allowed("/tmp/x", "ua") is False


def test_agent_prefix_longest():
    body = (
        "User-agent: a\nDisallow: /one\n\n"
        "User-agent: antbot\nDisallow: /two\n\n"
        "User-agent: *\nDisallow: /three\n"
    )
    rd = RobotsData.parse(body)
    assert rd.allowed("/two", "antbot-v2") is False  # longest prefix: antbot
    assert rd.allowed("/one", "antbot-v2") is True
    assert rd.allowed("/three", "zzz") is False  # star fallback


def test_empty_disallow_means_allow():
    rd = RobotsData.parse("User-agent: *\nDisallow:\n")
    assert rd.allowed("/anything", "ua") is True


def test_multiple_agents_one_group():
    rd = RobotsData.parse("User-agent: a\nUser-agent: b\nDisallow: /x\n")
    assert rd.allowed("/x", "a") is False
    assert rd.allowed("/x", "b") is False


def test_robots_ttl_flip_mid_crawl(spark):
    """CrawlConfig.robots_max_age_seconds (internal/robots/cache.go:36-78,
    1h expiry → re-fetch): the robots feed flips to Disallow at round 1;
    with a 2-round TTL the cached allow-all expires exactly when
    /blocked.html becomes eligible (round 2) and the flip takes effect —
    the page is denied. With a TTL longer than the crawl the original
    snapshot rules throughout and the same page is fetched."""
    import datetime as dt

    import pandas as pd

    from ant_spark import schemas
    from ant_spark.engine import CrawlConfig, Engine
    from ant_spark.functions.htmldom import parse as _parse
    from ant_spark.functions.htmldom import text as _text

    chain = {
        "/": '<html><head><title>t</title></head><body>'
             '<a href="/mid.html">m</a></body></html>',
        "/mid.html": '<html><head><title></title></head><body>'
                     '<a href="/blocked.html">b</a></body></html>',
        "/blocked.html": '<html><head><title></title></head><body>end</body></html>',
    }
    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    pages = spark.createDataFrame(
        pd.DataFrame(
            [
                {
                    "url": f"http://example.com{p}",
                    "warc_ts": base,
                    "html": h.encode(),
                    "text": _text(_parse(h)),
                    "lang": "en",
                    "status": 200,
                    "ok_after_attempt": None,
                }
                for p, h in chain.items()
            ]
        ),
        schema=schemas.PAGES,
    )
    feed = spark.createDataFrame(
        [
            ("example.com", 200, "User-Agent: *\nDisallow:\n", None, None, 0),
            ("example.com", 200, "User-Agent: antbot\nDisallow: /blocked.html\n",
             None, None, 1),
        ],
        "host string, status int, body string, crawl_delay double, "
        "fetched_round int, valid_from_round int",
    )
    seeds = ["http://example.com/"]

    def crawl(ttl):
        res = Engine(
            spark, pages, feed,
            CrawlConfig(max_rounds=8, robots_max_age_seconds=ttl),
        ).run(seeds)
        return {
            r["url"].rsplit("/", 1)[-1] or "/"
            for r in res.fetched_log.collect()
        }, res

    got_short, res_short = crawl(2.0)  # ttl = 2 rounds at round_seconds=1
    assert got_short == {"/", "mid.html"}  # flip applied at round 2

    got_long, _ = crawl(100.0)  # never expires → original allow-all rules
    assert got_long == {"/", "mid.html", "blocked.html"}


def test_sitemap_directive_parsed():
    """REP: Sitemap is group-independent (before, inside or after a group)
    and absolute; 4xx robots expose none via the Spark helper's status
    policy (covered e2e in test_sitemap.py::test_robots_sitemap_seeded)."""
    from ant_spark.operators.robots import RobotsData

    body = (
        "Sitemap: http://a.test/s1.xml\n"
        "User-Agent: *\nDisallow: /private\n"
        "Sitemap: http://a.test/s2.xml.gz\n"
        "User-Agent: otherbot\nDisallow: /\n"
        "Sitemap: http://a.test/s3.xml\n"
    )
    r = RobotsData.parse(body)
    assert r.sitemaps == [
        "http://a.test/s1.xml", "http://a.test/s2.xml.gz",
        "http://a.test/s3.xml",
    ]
    # the directive does not perturb group structure
    assert not r.allowed("/private/x", "antbot")
    assert r.allowed("/ok", "antbot")
    assert not r.allowed("/ok", "otherbot")
