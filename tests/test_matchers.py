"""Matcher semantics (reference matchers.go + matchers_test.go)."""

import re

import pytest

from ant_spark.operators.matchers import glob_to_regex, match_regexp


def g(pattern, subject):
    return re.match(glob_to_regex(pattern), subject) is not None and re.fullmatch(
        glob_to_regex(pattern)[1:-1], subject
    ) is not None


def test_glob_star():
    assert g("example.com/*", "example.com/a/b")
    assert g("example.com/*", "example.com/")
    assert not g("example.com/*", "sub.example.com/")


def test_glob_question():
    assert g("a?c", "abc")
    assert not g("a?c", "abbc")


def test_glob_full_match():
    # tidwall/match is full-string: no implicit prefix semantics
    assert not g("example.com", "example.com/path")


def test_match_regexp_invalid_raises():
    with pytest.raises(re.error):
        match_regexp("[")


def test_spark_predicates(spark):
    from pyspark.sql import functions as F

    from ant_spark.operators.matchers import (
        match_hostname,
        match_pattern,
        match_regexp,
    )

    df = spark.createDataFrame(
        [
            ("http://example.com/",),
            ("http://example.com/a/b",),
            ("http://sub.example.com/",),
            ("https://example.com:8080/x",),
        ],
        "url string",
    )

    def urls(pred):
        return sorted(
            r["url"] for r in df.filter(pred(F.col("url"))).collect()
        )

    # MatchHostname: exact host, subdomains do NOT match (matchers_test.go:18)
    assert urls(match_hostname("example.com")) == [
        "http://example.com/",
        "http://example.com/a/b",
    ]
    # host includes the port (url.Host semantics)
    assert urls(match_hostname("example.com:8080")) == ["https://example.com:8080/x"]
    # MatchPattern over host+path, no scheme/query
    assert urls(match_pattern("example.com/*")) == [
        "http://example.com/",
        "http://example.com/a/b",
    ]
    assert urls(match_pattern("*.example.com/*")) == ["http://sub.example.com/"]
    # MatchRegexp is an unanchored search
    assert urls(match_regexp("example\\.com/a")) == ["http://example.com/a/b"]
