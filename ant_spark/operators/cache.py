"""Fetched-table-as-HTTP-cache semantics.

The reference wraps its HTTP client in a cache (``antcache/httpcache.go``):
a stored response is served while fresh, revalidated/replaced otherwise. In
the Spark engine, the ``fetched``/``pages`` table IS the cache; these
operators give the two cache behaviors that survive the translation
(SURVEY.md §2.1 S5):

- **freshness** (aggressive mode, ``antcache/aggressive.go:69-76``): a row is
  served from cache iff ``warc_ts`` is within ``max_age`` of the round time;
  stale rows fall out of the join and become refetch candidates.
- **revalidate/replace** (``MERGE INTO`` analogue): upsert newly fetched rows
  over stale ones by url, latest ``warc_ts`` wins — plain parquet stand-in
  for an Iceberg MERGE.

RFC 7234 header plumbing (Vary, directives — ``antcache/rfc7234.go``) is
intentionally collapsed to the warc_ts age predicate; per-response cache
directives don't survive into a WARC-style corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def fresh_only(
    pages: DataFrame, as_of_ts: Column, max_age_seconds: float
) -> DataFrame:
    """Cache-fresh rows only: warc_ts ≥ as_of − max_age (aggressive mode).

    Stays a plain predicate so Catalyst pushes it into the parquet scan
    (partition pruning when the table is date-partitioned on warc_ts).
    """
    cutoff = as_of_ts - F.expr(f"INTERVAL {int(max_age_seconds)} SECONDS")
    return pages.filter(F.col("warc_ts") >= cutoff)


def merge_fetched(existing: DataFrame, refetched: DataFrame) -> DataFrame:
    """Upsert by url, newest warc_ts wins (ties → refetched side).

    Equivalent Iceberg: MERGE INTO existing USING refetched ON url WHEN
    MATCHED AND refetched.warc_ts >= existing.warc_ts THEN UPDATE ... WHEN
    NOT MATCHED THEN INSERT.
    """
    tagged = existing.withColumn("_src", F.lit(0)).unionByName(
        refetched.withColumn("_src", F.lit(1))
    )
    w = Window.partitionBy("url").orderBy(
        F.col("warc_ts").desc_nulls_last(), F.col("_src").desc()
    )
    return (
        tagged.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn", "_src")
    )


def cache_key(url_col: Column, method: str = "GET") -> Column:
    """The cache key (reference murmur3 of 'METHOD:url',
    antcache/utils.go:30-34; xxhash64 here — the key never leaves the
    engine, so hash-function parity is not required)."""
    return F.xxhash64(F.concat(F.lit(method + ":"), url_col))
