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


def test_fresh_only_fractional_max_age(spark):
    """Sub-second max_age must not truncate to 0s (the old f-string INTERVAL
    cast did): a row 0.3s old is fresh under max_age=0.5 and stale under 0.2."""
    from ant_spark.operators.cache import fresh_only

    pages = spark.createDataFrame(
        [("http://x/1", BASE)], "url string, warc_ts timestamp"
    )
    now = BASE + dt.timedelta(milliseconds=300)
    assert fresh_only(pages, F.lit(now), max_age_seconds=0.5).count() == 1
    assert fresh_only(pages, F.lit(now), max_age_seconds=0.2).count() == 0


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


def test_cc_directive_parsing(spark):
    from ant_spark.operators.cache import cc_duration_seconds, cc_has

    df = spark.createDataFrame(
        [
            (0, "no-store"),
            (1, " Max-Age=60 , no-cache"),
            (2, "max-age=abc"),
            (3, None),
            (4, "public, max-age=-5"),
        ],
        "i long, cc string",
    )
    out = {
        r["i"]: r
        for r in df.select(
            "i",
            cc_has(F.col("cc"), "no-store").alias("ns"),
            cc_has(F.col("cc"), "no-cache").alias("nc"),
            cc_duration_seconds(F.col("cc"), "max-age").alias("ma"),
        ).collect()
    }
    assert out[0]["ns"] and not out[0]["nc"] and out[0]["ma"] is None
    assert not out[1]["ns"] and out[1]["nc"] and out[1]["ma"] == 60
    assert out[2]["ma"] is None  # unparseable → duration not ok
    assert not out[3]["ns"] and out[3]["ma"] is None
    assert out[4]["ma"] == -5  # ParseInt accepts sign (directives.go:46)


def test_revalidate_directives_and_vary(spark):
    """C9 directive/Vary subset: no-store bypass, per-row max-age override,
    no-cache forced validation, Vary selecting-header mismatch."""
    from ant_spark.operators.cache import revalidate

    mid = NOW - dt.timedelta(minutes=30)  # fresh under 1h, stale under 60s

    def hdr(v):
        return {"accept": v}

    rows = [
        # url, ts, status, etag, lm, cc, vary, req_h, resp_h
        ("u/nostore", mid, 200, "e1", None, "no-store", None, hdr("a"), hdr("a")),
        ("u/maxage-short", mid, 200, "e1", None, "max-age=60", None, hdr("a"), hdr("a")),
        ("u/maxage-long", BASE, 200, "e1", None, "max-age=999999", None, hdr("a"), hdr("a")),
        ("u/nocache", mid, 200, "e1", None, "no-cache", None, hdr("a"), hdr("a")),
        ("u/vary-miss", mid, 200, "e1", None, None, "Accept", hdr("a"), hdr("b")),
        ("u/vary-hit", mid, 200, "e1", None, None, "Accept", hdr("a"), hdr("a")),
    ]
    cached = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "url", "warc_ts", "status", "etag", "last_modified", "cc",
            "vary", "req_h", "resp_h",
        ]),
        schema="url string, warc_ts timestamp, status int, etag string, "
               "last_modified string, cc string, vary string, "
               "req_h map<string,string>, resp_h map<string,string>",
    )
    origin = _df(spark, [
        ("u/nostore", NOW, 200, "e1", None),
        ("u/maxage-short", NOW, 200, "e1", None),
        ("u/nocache", NOW, 200, "e2", None),
        ("u/vary-miss", NOW, 200, "e1", None),
    ])
    out = revalidate(
        cached, origin, F.lit(NOW), max_age_seconds=3600,
        cc_col="cc", vary_col="vary",
        req_headers_col="req_h", resp_headers_col="resp_h",
    )
    d = {r["url"]: r["decision"] for r in out.collect()}
    assert d["u/nostore"] == "no_store"  # bypassed even though validators match
    assert d["u/maxage-short"] == "revalidated"  # 30min > 60s → validate
    assert d["u/maxage-long"] == "fresh"  # 10h stale globally, fresh per-row
    assert d["u/nocache"] == "replaced"  # forced validation, etag changed
    # Vary mismatch is transparent (rfc7234.go:84-86): the stored variant
    # is unusable even for validation — full refetch, not a 304
    assert d["u/vary-miss"] == "miss"
    assert d["u/vary-hit"] == "fresh"


def test_revalidate_random_vs_reference(spark):
    """400 random (cached, origin) rows vs a pure-Python reference of the
    documented decision chain — covers every combination of freshness,
    origin presence, status class and validator agreement."""
    import numpy as np

    rng = np.random.default_rng(7)
    n = 400
    statuses = [200, 200, 200, 304, 404, 410, 500, 503]
    etags = [None, "e1", "e2"]
    lms = [None, "lm1", "lm2"]

    cached_rows, origin_rows, expect = [], [], {}
    for i in range(n):
        url = f"u/{i}"
        fresh = bool(rng.integers(2))
        c_ts = NOW - dt.timedelta(minutes=int(10 if fresh else 600))
        c_etag = etags[rng.integers(3)]
        c_lm = lms[rng.integers(3)]
        cached_rows.append((url, c_ts, 200, c_etag, c_lm))
        has_origin = bool(rng.integers(4))  # 3/4 present
        o_status = int(statuses[rng.integers(len(statuses))])
        o_etag = etags[rng.integers(3)]
        o_lm = lms[rng.integers(3)]
        if has_origin:
            origin_rows.append((url, NOW, o_status, o_etag, o_lm))
        # pure-Python reference of cache.revalidate's decision chain
        if fresh:
            d = "fresh"
        elif not has_origin:
            d = "miss"
        elif 500 <= o_status < 600:
            d = "error"
        elif o_status != 200:
            d = "miss"
        elif (c_etag is not None and c_etag == o_etag) or (
            c_etag is None and c_lm is not None and c_lm == o_lm
        ):
            d = "revalidated"
        else:
            d = "replaced"
        expect[url] = d

    from ant_spark.operators.cache import revalidate

    out = revalidate(
        _df(spark, cached_rows), _df(spark, origin_rows),
        F.lit(NOW), max_age_seconds=3600,
    )
    got = {r["url"]: r["decision"] for r in out.collect()}
    assert got == expect

def test_revalidate_header_freshness(spark):
    """C9 completion: Date/Expires freshness lifetime + request-side
    directives (rfc7234.go:104-141) + the cache() Authorization bypass
    (rfc7234.go:17-23)."""
    from ant_spark.operators.cache import revalidate

    mid = NOW - dt.timedelta(hours=2)  # age 2h vs default lifetime 1h

    rows = [
        # url, warc_ts, etag, date_h, expires_h, req_cc, auth
        # Date null → can never be fresh → validates (304)
        ("u/no-date", mid, "e1", None, None, None, None),
        # Expires = date + 3h > 2h age → fresh despite the 1h default
        ("u/expires-ok", mid, "e1", mid, mid + dt.timedelta(hours=3), None, None),
        # Expires = date + 1h < 2h age → stale → validates
        ("u/expires-old", mid, "e1", mid, mid + dt.timedelta(hours=1), None, None),
        # bare max-stale accepts ANY staleness → fresh
        ("u/max-stale", mid, "e1", mid, None, "max-stale", None),
        # max-stale=7200 subtracts from age: 2h - 2h < 1h lifetime → fresh
        ("u/max-stale-n", mid, "e1", mid, None, "max-stale=7200", None),
        # min-fresh adds to age: needs 9h margin → stale → validates
        ("u/min-fresh", NOW, "e1", NOW, None, "min-fresh=32400", None),
        # request max-age beats everything: 10h allowance on a 2h age
        ("u/req-max-age", mid, "e1", mid, None, "max-age=36000", None),
        # only-if-cached serves stored unconditionally
        ("u/only-cached", mid, "e1", mid, None, "only-if-cached", None),
        # request no-store → cache() false → bypass
        ("u/req-no-store", mid, "e1", mid, None, "no-store", None),
        # Authorization header → cache() false → bypass
        ("u/auth", mid, "e1", mid, None, None, "Bearer tok"),
    ]
    cached = spark.createDataFrame(
        pd.DataFrame(rows, columns=[
            "url", "warc_ts", "etag", "date_h", "expires_h", "req_cc", "auth",
        ]),
        schema="url string, warc_ts timestamp, etag string, "
               "date_h timestamp, expires_h timestamp, req_cc string, "
               "auth string",
    ).withColumn("status", F.lit(200)).withColumn(
        "last_modified", F.lit(None).cast("string")
    )
    origin = _df(spark, [(r[0], NOW, 200, r[2], None) for r in rows])
    out = revalidate(
        cached, origin, F.lit(NOW), max_age_seconds=3600,
        date_col="date_h", expires_col="expires_h",
        req_cc_col="req_cc", authorization_col="auth",
    )
    d = {r["url"]: r["decision"] for r in out.collect()}
    assert d["u/no-date"] == "revalidated"
    assert d["u/expires-ok"] == "fresh"
    assert d["u/expires-old"] == "revalidated"
    assert d["u/max-stale"] == "fresh"
    assert d["u/max-stale-n"] == "fresh"
    assert d["u/min-fresh"] == "revalidated"
    assert d["u/req-max-age"] == "fresh"
    assert d["u/only-cached"] == "fresh"
    assert d["u/req-no-store"] == "bypass"
    assert d["u/auth"] == "bypass"


def test_revalidate_strict_no_heuristic_lifetime(spark):
    """max_age_seconds=None (reference-exact strict mode): a response with
    a Date but no max-age/Expires gets NO heuristic lifetime — fresh() in
    rfc7234.go:104-116 leaves lifetime zero and the row validates; rows
    with an explicit lifetime behave as before. Legacy (non-faithful) mode
    rejects None outright."""
    import pytest

    from ant_spark.operators.cache import revalidate

    recent = NOW - dt.timedelta(minutes=30)
    rows = [
        # date-only, 30min old: heuristic default 3600 would call it fresh
        ("u/date-only", recent, "e1", recent, None),
        # explicit Expires 3h out: fresh either way
        ("u/expires-ok", recent, "e1", recent, recent + dt.timedelta(hours=3)),
    ]
    cached = spark.createDataFrame(
        pd.DataFrame(rows, columns=["url", "warc_ts", "etag", "date_h", "expires_h"]),
        schema="url string, warc_ts timestamp, etag string, "
               "date_h timestamp, expires_h timestamp",
    ).withColumn("status", F.lit(200)).withColumn(
        "last_modified", F.lit(None).cast("string")
    )
    origin = _df(spark, [(r[0], NOW, 200, r[2], None) for r in rows])

    heur = revalidate(cached, origin, F.lit(NOW), max_age_seconds=3600,
                      date_col="date_h", expires_col="expires_h")
    d = {r["url"]: r["decision"] for r in heur.collect()}
    assert d["u/date-only"] == "fresh"  # the deliberate extension

    strict = revalidate(cached, origin, F.lit(NOW), max_age_seconds=None,
                        date_col="date_h", expires_col="expires_h")
    d = {r["url"]: r["decision"] for r in strict.collect()}
    assert d["u/date-only"] == "revalidated"  # reference-exact
    assert d["u/expires-ok"] == "fresh"

    with pytest.raises(ValueError, match="faithful"):
        revalidate(cached, origin, F.lit(NOW), max_age_seconds=None)
