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
