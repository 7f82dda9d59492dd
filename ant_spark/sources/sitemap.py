"""Sitemap (sitemaps.org XML) seed source.

Production crawls bootstrap their frontier from the sites' own published
sitemaps — a `<urlset>` of page URLs (optionally lastmod/changefreq/
priority) or a `<sitemapindex>` pointing at more sitemap files, plain or
gzipped. This module reads them Spark-first and feeds the engine's bulk
seed path (``Engine.run`` accepts a seeds DataFrame — the reference's
``Engine.Enqueue`` loop analogue for huge seed sets):

- ``parse_sitemap_bytes(buf)`` — lenient record parser: one dict per
  ``<url>``/``<sitemap>`` entry (kind='url'|'sitemap'); namespace-agnostic
  (any sitemaps.org schema version), gzip-aware, and malformed XML yields
  whatever parsed instead of killing the file's task (the WARC-source
  policy).
- ``read_sitemap(spark, path)`` — binaryFile scan → Arrow-batched parser:
  (loc, kind, lastmod, changefreq, priority). File = task granularity,
  same as the WARC source; a 50k-URL sitemap file is one task.
- ``crawl_sitemaps(spark, paths, max_levels=2)`` — whole-tree reader:
  walks ``<sitemapindex>`` levels (one distributed read_sitemap pass per
  level; cycle-safe), unions the url entries.
- ``sitemap_seeds(df)`` — the engine adapter: page URLs only, one ``url``
  column, ready for ``Engine.run(seeds_df)``.

The reference has no sitemap support (its Enqueue takes caller URLs);
this is a beyond-reference source in the same spirit as WARC — the
offline-corpus analogues of how a production crawl actually starts.
"""

from __future__ import annotations

import gzip
import io
import re
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

SITEMAP_RECORDS = StructType(
    [
        StructField("loc", StringType(), True),
        StructField("kind", StringType(), True),  # 'url' | 'sitemap'
        StructField("lastmod", StringType(), True),
        StructField("changefreq", StringType(), True),
        StructField("priority", DoubleType(), True),
    ]
)

_TAG_NS = re.compile(r"^\{.*\}")  # strip any xmlns


def _local(tag: str) -> str:
    return _TAG_NS.sub("", tag).lower()


def parse_sitemap_bytes(buf: bytes) -> Iterator[dict]:
    """Parse one sitemap / sitemap-index file (plain or gzip).

    Lenient: gzip or XML corruption yields the entries parsed so far;
    a <url> without <loc> is skipped; priority that does not parse as a
    float becomes NULL. Namespace- and version-agnostic (matches on local
    tag names only)."""
    import xml.etree.ElementTree as ET

    if buf[:2] == b"\x1f\x8b":
        try:
            buf = gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
        except (OSError, EOFError):
            return
    # incremental pull parse: a truncated/corrupt tail keeps every entry
    # whose </url> closed before the damage
    parser = ET.XMLPullParser(events=("end",))
    try:
        parser.feed(buf)
        parser.close()
    except ET.ParseError:
        pass
    events = []
    try:
        for ev in parser.read_events():  # re-raises the buffered error
            events.append(ev)
    except ET.ParseError:
        pass
    for _, elem in events:
        tag = _local(elem.tag)
        if tag not in ("url", "sitemap"):
            continue
        rec = {"loc": None, "kind": "url" if tag == "url" else "sitemap",
               "lastmod": None, "changefreq": None, "priority": None}
        for child in elem:
            ct = _local(child.tag)
            val = (child.text or "").strip()
            if ct == "loc" and val:
                rec["loc"] = val
            elif ct == "lastmod" and val:
                rec["lastmod"] = val
            elif ct == "changefreq" and val:
                rec["changefreq"] = val
            elif ct == "priority" and val:
                try:
                    rec["priority"] = float(val)
                except ValueError:
                    pass
        if rec["loc"]:
            yield rec


def read_sitemap(spark: SparkSession, path: str | list[str]) -> DataFrame:
    """Sitemap source: binaryFile scan → Arrow-batched XML record parser.

    ``path`` is a file/glob or a list of them (one task per file)."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out = []
            for content in b["content"]:
                out.extend(parse_sitemap_bytes(bytes(content)))
            yield pd.DataFrame(
                out, columns=["loc", "kind", "lastmod", "changefreq", "priority"]
            )

    return files.mapInPandas(fn, SITEMAP_RECORDS)


def crawl_sitemaps(
    spark: SparkSession,
    paths: str | list[str],
    max_levels: int = 2,
    loc_to_path=None,
) -> DataFrame:
    """Read a whole sitemap TREE — index files recursed, url entries unioned.

    ``<sitemapindex>`` entries point at further sitemap files; this walks
    them level by level (``max_levels`` index hops past the root, 2 by the
    sitemaps.org convention — trees are index → urlset). Each level is one
    distributed ``read_sitemap`` pass over that level's file list; only the
    (small, spec-capped at 50k/index) list of child-file locations passes
    through the driver — the same granularity any Spark read's path list
    has. Already-visited paths are skipped, so a cyclic index terminates.

    ``loc_to_path`` maps a ``<loc>`` value to a readable path for offline
    corpora (default: strip a ``file://`` scheme, else use the loc as-is —
    live crawls fetch locs over HTTP and hand the landed files back in).
    Returns the union of url-kind records in the ``read_sitemap`` schema;
    feed through ``sitemap_seeds`` → ``Engine.run(seeds_df)``.
    """
    if loc_to_path is None:
        def loc_to_path(loc: str) -> str:
            return loc[7:] if loc.startswith("file://") else loc

    frontier = [paths] if isinstance(paths, str) else list(paths)
    visited: set[str] = set()
    levels: list[DataFrame] = []
    for _ in range(max_levels + 1):
        frontier = [p for p in frontier if p not in visited]
        if not frontier:
            break
        visited.update(frontier)
        df = read_sitemap(spark, frontier)
        levels.append(df.filter(F.col("kind") == "url"))
        children = df.filter(F.col("kind") == "sitemap").select("loc").collect()
        frontier = [loc_to_path(r["loc"]) for r in children]
    if not levels:
        return spark.createDataFrame([], SITEMAP_RECORDS)
    out = levels[0]
    for df in levels[1:]:
        out = out.unionByName(df)
    return out


def sitemap_seeds(df: DataFrame) -> DataFrame:
    """Page-URL rows as the engine's bulk-seed shape: (url, priority).

    The sitemap ``<priority>`` hint (default 0.5 per the spec) rides into
    ``Engine.run(seeds_df)``'s optional priority column — under
    ``queue_policy='priority'`` the crawler fetches the site's
    self-declared important pages first, which is exactly what the hint
    is for."""
    return df.filter(F.col("kind") == "url").select(
        F.col("loc").alias("url"),
        F.coalesce(F.col("priority"), F.lit(0.5)).alias("priority"),
    )
