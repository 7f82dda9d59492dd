"""URL normalization golden tests.

The 11 named cases are the reference's own goldens
(/root/reference/internal/normalize/url_test.go:10-70); the extras pin the
Go net/url round-trip behaviors the engine depends on.
"""

import pytest

from ant_spark.functions.urlnorm import normalize_or_none, normalize_url

GOLDEN = [
    # (title, input, expected) — url_test.go:15-69
    ("uppercase-pct", "http://example.com/foo%2a", "http://example.com/foo%2A"),
    ("lower-scheme-host", "HTTP://User@Example.COM/Foo", "http://User@example.com/Foo"),
    ("decode-unreserved", "http://example.com/%7Efoo", "http://example.com/~foo"),
    ("dot-segments", "http://example.com/foo/./bar/baz/../qux", "http://example.com/foo/bar/qux"),
    ("empty-path", "http://example.com", "http://example.com/"),
    ("strip-80", "http://example.com:80/", "http://example.com/"),
    ("strip-443", "https://example.com:443/", "https://example.com/"),
    ("keep-8080", "http://example.com:8080/", "http://example.com:8080/"),
    ("bare-query", "http://example.com/?", "http://example.com/"),
    ("sort-query", "http://example.com/?a=1&c=3&b=2", "http://example.com/?a=1&b=2&c=3"),
    ("drop-fragment", "http://example.com/#foo", "http://example.com/"),
]


@pytest.mark.parametrize("title,raw,expected", GOLDEN, ids=[g[0] for g in GOLDEN])
def test_golden(title, raw, expected):
    assert normalize_url(raw) == expected


def test_trailing_slash_stripped():
    # Go path.Join drops trailing slashes (url.go:61-69)
    assert normalize_url("http://example.com/a/") == "http://example.com/a"
    assert normalize_url("http://example.com/a/b///c/") == "http://example.com/a/b/c"


def test_invalid_inputs_rejected():
    # engine_test.go:146-174: '\x00' and bad percent-encodings error
    assert normalize_or_none("\x00") is None
    assert normalize_or_none("http://example.com/a%zz") is None
    assert normalize_or_none(None) is None


def test_schemeless_and_nonhttp_pass_through():
    # Go url.Parse succeeds on these; the *scheme filter* rejects them later
    assert normalize_or_none("foo") == "foo"
    assert normalize_or_none("wss://x.com/y") == "wss://x.com/y"


def test_userinfo_case_preserved():
    assert normalize_url("HTTP://UsEr@HOST.COM/") == "http://UsEr@host.com/"


def test_path_reencodes_uppercase_hex():
    assert normalize_url("http://e.com/a%c3%a9") == "http://e.com/a%C3%A9"


def test_query_not_reencoded_only_sorted():
    assert (
        normalize_url("http://e.com/?b=%2a&a=x")
        == "http://e.com/?a=x&b=%2a"  # query bytes untouched (RawQuery kept)
    )


def test_normalize_udf_spark(spark):
    from pyspark.sql import functions as F

    from ant_spark.functions.urlnorm import normalize_udf

    df = spark.createDataFrame(
        [(g[1],) for g in GOLDEN] + [("\x00",)], "url string"
    ).withColumn("n", normalize_udf(F.col("url")))
    got = [r["n"] for r in df.collect()]
    assert got[: len(GOLDEN)] == [g[2] for g in GOLDEN]
    assert got[-1] is None


def test_strip_tracking_params():
    """Opt-in 10th rule: tracking keys drop AFTER reference normalization;
    sorted-param invariant and bare-? drop are preserved; non-tracking
    params (incl. ones merely containing 'utm') survive."""
    from ant_spark.functions.urlnorm import normalize_url, strip_tracking

    u = normalize_url(
        "http://a.test/p?utm_source=x&b=2&gclid=abc&a=1&UTM_campaign=y&fbclid=z"
    )
    # key match is case-insensitive (UTM_campaign drops too: the reference
    # keeps query bytes raw, but a tracker is a tracker in any case)
    assert strip_tracking(u) == "http://a.test/p?a=1&b=2"
    assert strip_tracking("http://a.test/p?utm_source=x") == "http://a.test/p"
    assert strip_tracking("http://a.test/p") == "http://a.test/p"
    assert strip_tracking("http://a.test/p?autumn=1") == "http://a.test/p?autumn=1"
    assert strip_tracking("http://a.test/p?myutm_x=1") == "http://a.test/p?myutm_x=1"
