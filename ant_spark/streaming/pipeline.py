"""Structured Streaming ingest of fetched pages.

The reference engine is a continuous system in spirit (unbounded URL stream,
backpressure semaphore — engine.go:230-241) but the crawl loop itself is
iterative-with-barrier, so the batch engine (ant_spark.engine) is the crawl
substrate (SURVEY.md §2.9). Streaming still has a real job here: the
*downstream* of a crawl — pages landing continuously in the fetched store —
feeds extraction/analytics incrementally. This module is that surface:

- ``stream_pages``: readStream over the fetched parquet directory;
- ``stream_extract``: parse UDF → per-page text features, append sink;
- ``stream_host_counts``: event-time windowed counts per host with a
  watermark on ``warc_ts`` (late-data bound) — the metrics rollup as a
  streaming agg.

Tests run with ``trigger(availableNow=True)`` so the unbounded pipeline
drains the existing data and stops (same code path as a live stream).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ant_spark import schemas
from ant_spark.functions.parse import make_parse_udf
from ant_spark.functions.urlnorm import host_of


def stream_pages(spark: SparkSession, pages_dir: str) -> DataFrame:
    """Unbounded pages source (one file-batch per micro-batch)."""
    return (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 8)
        .parquet(pages_dir)
    )


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    available_now: bool = True,
):
    """Continuous parse/extract: html → (text, title, n_links) appended to
    parquet. Exactly-once via the streaming checkpoint (the streaming twin
    of the engine's round snapshots)."""
    pages = stream_pages(spark, pages_dir)
    udf = make_parse_udf(None)
    parsed = pages.withColumn("parsed", udf(F.col("url"), F.col("html"))).select(
        "url",
        host_of(F.col("url")).alias("host"),
        "warc_ts",
        F.size("parsed.links").alias("n_links"),
        F.col("parsed.title").alias("title"),
        F.col("parsed.text").alias("text"),
    )
    writer = (
        parsed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_host_counts(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Event-time windowed per-host page counts with late-data watermark —
    returns the started query writing to an in-memory sink named
    'host_counts' (query with spark.sql('select * from host_counts'))."""
    pages = stream_pages(spark, pages_dir)
    counts = (
        pages.withWatermark("warc_ts", watermark)
        .groupBy(
            F.window("warc_ts", window).alias("w"),
            host_of(F.col("url")).alias("host"),
        )
        .agg(F.count("*").alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"), "host", "n_pages"
        )
    )
    writer = (
        counts.writeStream.format("memory")
        .queryName("host_counts")
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
