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
  streaming agg;
- ``stream_sessionize``: CUSTOM STATEFUL operator via
  ``applyInPandasWithState`` — per-host crawl sessions closed by an
  event-time timeout when a host goes quiet (the streaming twin of the
  batch ``events_sessionize`` query; state = (start, last, n) per host);
- ``stream_url_dedupe``: streaming seen-set via
  ``dropDuplicatesWithinWatermark`` — first occurrence per
  (url_hash, url) with watermark-bounded state (the streaming twin of the
  batch engine's J1 anti-join).

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


SESSION_OUT = (
    "host string, session_start timestamp, session_end timestamp, "
    "n_pages long"
)
_SESSION_STATE = "start long, last long, n long"


def stream_sessionize(
    spark: SparkSession,
    pages_dir: str,
    checkpoint_dir: str,
    gap_minutes: int = 30,
    watermark: str = "10 minutes",
    available_now: bool = True,
    query_name: str = "crawl_sessions",
):
    """Per-host crawl sessions as a custom stateful streaming operator.

    ``applyInPandasWithState`` keeps (start, last, n) per host; a session is
    emitted when the event-time watermark passes ``last + gap`` (the host
    went quiet). This is the pattern for any reference-style continuous
    per-key state the built-in windowed aggs can't express — state is
    Arrow-batched per key, never per-row Python. Sessions still open at
    shutdown stay in the state store (resume via checkpoint).

    Watermark-vs-gap semantics (deliberate deviation from pure gap
    semantics, for crash avoidance): the state store rejects a timeout
    at/behind the current watermark, so a session whose ``last + gap``
    deadline already trails the watermark is FORCE-CLOSED — either emitted
    immediately (``last + gap <= wm``) or timed out at the next watermark
    advance (timeout clamped to ``wm + 1``). Consequence: a late-but-
    within-watermark event for the same host arriving in a later batch
    starts a NEW session rather than extending the force-closed one, where
    un-clamped gap semantics would have merged them. This only affects
    hosts whose events arrive out of order across micro-batches by more
    than the watermark delay minus the gap.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    gap_ms = gap_minutes * 60 * 1000

    def fn(key, pdfs, state):
        def emit(start, last, n):
            return pd.DataFrame(
                {
                    "host": [key[0]],
                    "session_start": [pd.Timestamp(start, unit="ms")],
                    "session_end": [pd.Timestamp(last, unit="ms")],
                    "n_pages": [n],
                }
            )

        if state.hasTimedOut:
            start, last, n = state.get
            state.remove()
            yield emit(start, last, n)
            return
        ts: list[int] = []
        for pdf in pdfs:
            ts.extend((pdf["warc_ts"].astype("int64") // 10**6).tolist())
        if not ts:
            return
        ts.sort()
        if state.exists:
            start, last, n = state.get
        else:
            start, last, n = ts[0], ts[0], 0
        # gap-split INSIDE the data too: a page arriving more than `gap`
        # after the session's last page closes it immediately (the timeout
        # only covers hosts that go quiet with no further input).
        for t in ts:
            if t - last > gap_ms:
                yield emit(start, last, n)
                start, last, n = t, t, 1
            else:
                last, n = max(last, t), n + 1
        # the state store rejects a timeout at/behind the already-advanced
        # watermark (out-of-order FILE arrival can deliver a batch whose max
        # event time trails it) — close such a session now instead of
        # crashing the query, and clamp otherwise.
        wm = state.getCurrentWatermarkMs()
        if last + gap_ms <= wm:
            if state.exists:
                state.remove()
            yield emit(start, last, n)
        else:
            state.update((start, last, n))
            state.setTimeoutTimestamp(max(last + gap_ms, wm + 1))

    pages = (
        spark.readStream.schema(schemas.PAGES)
        .option("maxFilesPerTrigger", 1)  # preserve file order → the
        # watermark advances between micro-batches and fires the timeouts
        .parquet(pages_dir)
    )
    sessions = (
        pages.select(host_of(F.col("url")).alias("host"), "warc_ts")
        .withWatermark("warc_ts", watermark)
        .groupBy("host")
        .applyInPandasWithState(
            fn,
            SESSION_OUT,
            _SESSION_STATE,
            "append",
            GroupStateTimeout.EventTimeTimeout,
        )
    )
    writer = (
        sessions.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("append")
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_url_dedupe(
    spark: SparkSession,
    pages_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Streaming seen-set: first occurrence per (url_hash, url) wins — the
    Structured-Streaming twin of the batch engine's seen anti-join (J1).

    ``dropDuplicatesWithinWatermark`` keeps per-key state only until the
    event-time watermark passes, so state is bounded by the watermark
    horizon instead of growing with the whole crawl — the right semantics
    for a continuous ingest where re-fetches of the same URL cluster in
    time (the batch engine, whose rounds CAN hold the full 10^10 seen set
    as a bucketed table, remains the crawl-wide exact dedupe). Keyed on
    (url_hash, url): hash for state-size, full url against collisions —
    same collision-safe pair as operators/dedupe.exact_new."""
    from ant_spark.functions.urlnorm import url_hash

    pages = stream_pages(spark, pages_dir)
    deduped = (
        pages.select(
            "url", url_hash(F.col("url")).alias("url_hash"), "warc_ts"
        )
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["url_hash", "url"])
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_curate(
    spark: SparkSession,
    warc_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    langs: tuple = ("en",),
    min_quality: float = 0.5,
    watermark: str = "2 hours",
    available_now: bool = True,
    text_mode: str = "scan",
    gopher_rules: bool = False,
):
    """Incremental curation over LANDING WARC segments — the streaming
    composition of the round-5 ingest + curation stack: ``stream_warc``
    (exactly-once per segment file) → per-row enrichment (language id,
    quality score, token count — all native exprs, codegen inside the
    micro-batch) → lang/quality floor → exact content dedupe via
    ``dropDuplicatesWithinWatermark`` on the (fingerprint) key, so a page
    re-crawled across nearby segments is curated ONCE and state stays
    bounded by the watermark horizon instead of the corpus.

    The near-dup LSH chain deliberately stays a BATCH job over landed
    segments (operators/curation.curate): banded self-joins need the
    candidate universe, which a watermark-bounded stream cannot hold —
    the standard lambda split (stream = cheap exact delta, batch = deep
    dedupe sweep). Output parquet rows: (doc_key, warc_ts, lang_id,
    quality, n_tokens, text).

    ``text_mode='main'`` curates on boilerplate-stripped body text
    (functions/readability) instead of full scan.Text; ``gopher_rules``
    ANDs the integer-exact Gopher rule set into the admission floor —
    both per-row, so the streaming state shape is unchanged.
    """
    from ant_spark.functions.parse import make_text_udf
    from ant_spark.operators import textops as T
    from ant_spark.sources.warc import stream_warc

    recs = stream_warc(spark, warc_dir)
    if text_mode == "main":
        from ant_spark.functions.readability import make_main_text_udf

        text_udf = make_main_text_udf()  # boilerplate-stripped body
    else:
        text_udf = make_text_udf()  # scan.Text extraction, Arrow-batched
    # Event-time policy: the lenient WARC reader emits NULL warc_ts for
    # malformed WARC-Date records; a NULL event time inside a watermarked
    # stateful dedupe is dropped rather than curated, silently losing an
    # otherwise-valid document. Substitute the segment file's mtime (the
    # landing time — always present, monotone per segment) so those rows
    # stay inside the watermark horizon and are curated normally.
    docs = recs.select(
        F.col("url").alias("doc_key"),
        F.coalesce("warc_ts", "segment_mtime").alias("warc_ts"),
        text_udf(F.col("html")).alias("text"),
    )
    enriched = docs.select(
        "doc_key",
        "warc_ts",
        "text",
        T.language_id(F.col("text")).alias("lang_id"),
        T.quality_score(F.col("text")).alias("quality"),
        T.token_count(F.col("text")).alias("n_tokens"),
        T.fingerprint(F.col("text")).alias("fp"),
    )
    admit = F.col("lang_id").isin(*langs) & (F.col("quality") >= min_quality)
    if gopher_rules:
        admit = admit & T.gopher_quality_flags(F.col("text")).getField("keep")
    kept = (
        enriched.filter(admit)
        .withWatermark("warc_ts", watermark)
        .dropDuplicatesWithinWatermark(["fp"])
        .select("doc_key", "warc_ts", "lang_id", "quality", "n_tokens", "text")
    )
    writer = (
        kept.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
