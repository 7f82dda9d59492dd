"""Cache operators: freshness, merge, and RFC7234 revalidation decisions
(reference antcache/httpcache.go:214-271, aggressive.go:69-76)."""

import datetime as dt

import pandas as pd
import pytest
from pyspark.sql import functions as F


BASE = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
NOW = BASE + dt.timedelta(hours=10)


def _df(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(
            rows, columns=["url", "warc_ts", "status", "etag", "last_modified"]
        ),
        schema="url string, warc_ts timestamp, status int, etag string, "
               "last_modified string",
    )


def test_revalidate_decisions(spark):
    from ant_spark.operators.cache import revalidate

    stale = BASE  # 10h old, max_age 1h → stale
    fresh_ts = NOW - dt.timedelta(minutes=10)
    cached = _df(spark, [
        ("u/fresh",      fresh_ts, 200, "e1", "lm1"),
        ("u/etag-same",  stale,    200, "e1", "lm1"),
        ("u/etag-diff",  stale,    200, "e1", "lm1"),  # etag wins over lm
        ("u/lm-same",    stale,    200, None, "lm1"),
        ("u/lm-diff",    stale,    200, None, "lm1"),
        ("u/no-valid",   stale,    200, None, None),   # no validators → 200 replaces
        ("u/origin-5xx", stale,    200, "e1", "lm1"),
        ("u/origin-404", stale,    200, "e1", "lm1"),  # not storable → miss
        ("u/gone",       stale,    200, "e1", "lm1"),  # no origin row
    ])
    t2 = NOW + dt.timedelta(hours=1)
    origin = _df(spark, [
        ("u/fresh",      t2, 200, "e9", "lm9"),  # never consulted: fresh
        ("u/etag-same",  t2, 200, "e1", "lm9"),
        ("u/etag-diff",  t2, 200, "e2", "lm1"),  # lm matches but etag decides
        ("u/lm-same",    t2, 200, "e2", "lm1"),
        ("u/lm-diff",    t2, 200, "e2", "lm2"),
        ("u/no-valid",   t2, 200, "e2", "lm2"),
        ("u/origin-5xx", t2, 503, "e1", "lm1"),
        ("u/origin-404", t2, 404, "e1", "lm1"),
    ])
    out = revalidate(cached, origin, F.lit(NOW), max_age_seconds=3600)
    d = {r["url"]: r for r in out.collect()}
    assert d["u/fresh"]["decision"] == "fresh"
    assert d["u/etag-same"]["decision"] == "revalidated"
    assert d["u/etag-diff"]["decision"] == "replaced"
    assert d["u/lm-same"]["decision"] == "revalidated"
    assert d["u/lm-diff"]["decision"] == "replaced"
    assert d["u/no-valid"]["decision"] == "replaced"
    assert d["u/origin-5xx"]["decision"] == "error"
    assert d["u/origin-404"]["decision"] == "miss"
    assert d["u/gone"]["decision"] == "miss"
    # a 304 serves the stored body but adopts the origin's fresher ts
    # (merge(resp.Header, newresp.Header) — httpcache.go:247)
    assert d["u/etag-same"]["serve_warc_ts"] == t2.replace(tzinfo=None)
    assert d["u/etag-same"]["serve_status"] == 200
    # fresh rows serve the stored ts untouched
    assert d["u/fresh"]["serve_warc_ts"] == fresh_ts.replace(tzinfo=None)
    # 5xx surfaces the origin status
    assert d["u/origin-5xx"]["serve_status"] == 503


def test_revalidate_stale_if_error(spark):
    from ant_spark.operators.cache import revalidate

    cached = _df(spark, [("u/x", BASE, 200, "e1", None)])
    origin = _df(spark, [("u/x", NOW, 500, "e1", None)])
    out = revalidate(
        cached, origin, F.lit(NOW), max_age_seconds=3600, stale_if_error=True
    ).collect()[0]
    # stale-if-error: act as if the server failed to respond and serve the
    # previously stored response (httpcache.go:236-239)
    assert out["decision"] == "stale_error_served"
    assert out["serve_status"] == 200
    assert out["serve_warc_ts"] == BASE.replace(tzinfo=None)
