"""Fixed schemas for every engine table.

The reference compiles Go struct tags once per type
(``/root/reference/internal/scan/scanner.go:36-47``); the Spark-native
equivalent is static StructTypes declared once here and used everywhere.

Column conventions
------------------
- ``url``       : normalized absolute http(s) URL (the dedupe key's preimage).
- ``url_hash``  : xxhash64(url) — join/bucket key for frontier/seen at scale.
- ``host``      : lowercased hostname[:port] — politeness partition key.
- ``depth``     : BFS depth from the seed set (seeds are depth 0).
- ``seq``       : global BFS sequence number; reproduces the reference's
  sequential FIFO order (queue.go:108-110 with Workers=1).
- ``attempt``   : fetch attempt counter (1-based like fetcher.go:131-172).
- ``not_before``: epoch-millis gate for retry backoff (fetcher.go:248-270).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    MapType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --------------------------------------------------------------------------
# pages — the crawlable web (BASELINE.json input_hint), i.e. the simulated
# fetch universe. ``status``/``ok_after_attempt`` extend the hint to drive
# the retry path (reference fetcher.go:63-69: 503/504/429 are temporary).
PAGES = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), True),
        StructField("html", BinaryType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
        StructField("status", IntegerType(), True),  # 200/404-absent/503...
        StructField("ok_after_attempt", IntegerType(), True),  # flaky 5xx
    ]
)

# frontier — the queue (reference queue.go memoryQueue), one row per
# yet-to-be-fetched URL.
FRONTIER = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("seq", LongType(), False),
        StructField("priority", DoubleType(), False),
        StructField("attempt", IntegerType(), False),
        StructField("not_before", LongType(), False),  # epoch millis
    ]
)

# seen — the dedupe membership set (reference dedupe.go DedupeMap).
SEEN = StructType(
    [
        StructField("url_hash", LongType(), False),
        StructField("url", StringType(), False),
        StructField("round", IntegerType(), False),
    ]
)

# fetched_log — one row per completed fetch (the crawl's output fact table;
# doubles as the HTTP cache, reference antcache/httpcache.go).
FETCHED_LOG = StructType(
    [
        StructField("url", StringType(), False),
        StructField("url_hash", LongType(), False),
        StructField("host", StringType(), False),
        StructField("depth", IntegerType(), False),
        StructField("seq", LongType(), False),
        StructField("round", IntegerType(), False),
        StructField("status", IntegerType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("n_links", IntegerType(), True),
        StructField("text", StringType(), True),
        StructField("lang", StringType(), True),
    ]
)

# robots — per-host robots.txt (reference internal/robots/cache.go).
ROBOTS = StructType(
    [
        StructField("host", StringType(), False),
        StructField("status", IntegerType(), True),
        StructField("body", StringType(), True),
        StructField("crawl_delay", DoubleType(), True),
        StructField("fetched_round", IntegerType(), True),
    ]
)

# metrics — per-round, per-partition lineage counters (north_rule).
METRICS = StructType(
    [
        StructField("round", IntegerType(), False),
        StructField("partition", IntegerType(), False),
        StructField("stage", StringType(), False),
        StructField("n", LongType(), False),
    ]
)

# extracted — scrape-spec output rows (reference Page.Scan / JSON scraper).
EXTRACTED = StructType(
    [
        StructField("url", StringType(), False),
        StructField("seq", LongType(), False),
        StructField("round", IntegerType(), False),
        StructField("data", MapType(StringType(), StringType()), True),
    ]
)

# Output struct of the fused parse UDF (functions/parse.py): one HTML parse
# per row produces links + text + scraped fields together (the reference
# parses lazily exactly once, page.go:61-69 — we fuse for the same reason).
PARSE_OUT = StructType(
    [
        StructField("links", ArrayType(StringType()), True),
        StructField("text", StringType(), True),
        StructField("title", StringType(), True),
        StructField("scraped", MapType(StringType(), StringType()), True),
    ]
)
