"""WARC (ISO 28500) source/sink — the Common Crawl interchange format.

The reference crawls the live web; the 100 TB offline analogue crawls a
Common-Crawl-style snapshot, and that snapshot ships as WARC: concatenated
``WARC/1.0`` records, usually one gzip member per record. This module makes
the engine runnable straight off such files:

- ``read_warc(spark, path)`` — Spark source: ``binaryFile`` scan →
  Arrow-batched ``mapInPandas`` record parser (pure python; ``warcio`` is
  not in this container and is not needed for the record framing). Emits
  one row per ``response`` record: (url, warc_ts, status, html, n_bytes).
  Parallelism note: ``binaryFile`` reads each file whole, so at scale the
  unit of parallelism is the FILE — Common Crawl ships ~1 GB segment files
  in the tens of thousands per snapshot, which is exactly the right task
  granularity for a 1000-executor cluster. (Splitting inside one gzip
  member is not possible anyway — gzip members are the seek points.)
- ``warc_to_pages(df)`` — adapter to the engine's pages-table shape
  (adds the text/lang/ok_after_attempt columns the fetch join expects).
- ``write_warc(rows, path)`` — sink/test-fixture writer: serializes
  (url, warc_ts, status, html) rows as WARC response records, optionally
  one gzip member per record (the CC convention). Driver-side by design —
  tests and small exports.
- ``write_warc_distributed(df, dir_path)`` — the production sink: one
  ``part-NNNNN.warc[.gz]`` file per partition (executors stream rows;
  only a (part, count) row per partition returns to the driver for
  MANIFEST assembly), one gzip member per record, plus a
  ``MANIFEST.json`` with per-part record counts. ``dir_path`` must be a
  filesystem all executors share (as with any Spark file output).

Malformed-record policy (real Common-Crawl segments contain occasional
broken records): ``parse_warc_bytes`` never lets one bad record kill the
file's task — header bytes decode as latin-1, a bad Content-Length or
framing error skips ahead to the next ``WARC/1.`` marker, and an
unparseable WARC-Date yields a NULL timestamp. Mirrors the
``on_unsupported='skip'`` philosophy in operators/multimodal.py.

Record framing per ISO 28500: ``WARC/1.0\\r\\n`` + headers +
``\\r\\n\\r\\n`` + Content-Length payload + ``\\r\\n\\r\\n``; a response
record's payload is the raw HTTP response (status line, headers, body).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

WARC_RECORDS = StructType(
    [
        StructField("url", StringType(), True),
        StructField("warc_ts", TimestampType(), True),
        StructField("status", IntegerType(), True),
        StructField("html", BinaryType(), True),
        StructField("n_bytes", LongType(), True),
        # HTTP Content-Type of the response — the TRANSPORT layer of the
        # WHATWG charset sniff (functions/encoding.py): pass it to
        # decode_html(html, transport=content_type) when decoding bodies.
        StructField("content_type", StringType(), True),
        # Location header of a 3xx response — feeds the redirect-chain
        # collapse (operators/redirects.py) via warc_to_pages.
        StructField("redirect_to", StringType(), True),
    ]
)

# streaming variant adds the segment file's mtime: the landing time is the
# event-time fallback for records whose WARC-Date failed to parse (NULL
# warc_ts) — see stream_curate's watermark policy in streaming/pipeline.py.
WARC_STREAM_RECORDS = StructType(
    WARC_RECORDS.fields
    + [StructField("segment_mtime", TimestampType(), True)]
)

_CRLF = b"\r\n"


def _record_bytes(url: str, ts_iso: str, status: int, html: bytes,
                  content_type: str = "text/html",
                  location: str | None = None) -> bytes:
    """One WARC/1.0 response record (http payload framed per ISO 28500)."""
    loc_hdr = f"Location: {location}\r\n" if location else ""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: {content_type}\r\n{loc_hdr}"
        f"Content-Length: {len(html)}\r\n\r\n"
    ).encode() + html
    headers = (
        f"WARC/1.0\r\n"
        f"WARC-Type: response\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Date: {ts_iso}\r\n"
        f"Content-Type: application/http;msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n\r\n"
    ).encode()
    return headers + http + _CRLF + _CRLF


def write_warc(rows, path: str, compress: bool = True) -> int:
    """Write (url, warc_ts, status, html) rows as a WARC file; one gzip
    member per record when ``compress`` (the Common Crawl convention —
    members are the seek/split points). Returns the record count."""
    n = 0
    with open(path, "wb") as f:
        for r in rows:
            ts = r["warc_ts"]
            ts_iso = ts.strftime("%Y-%m-%dT%H:%M:%SZ")
            rec = _record_bytes(r["url"], ts_iso, int(r["status"]), bytes(r["html"]))
            f.write(gzip.compress(rec) if compress else rec)
            n += 1
    return n


def write_warc_distributed(df: DataFrame, dir_path: str, compress: bool = True) -> int:
    """Distributed WARC sink: one part-file per partition — the production
    shape for a 100 TB export.

    Each executor streams its partition's (url, warc_ts, status, html) rows
    straight to ``part-NNNNN.warc[.gz]`` (one gzip member per record, the CC
    seek-point convention), writing to a temp name that embeds the task
    attempt id (retried / speculative attempts never collide) and renaming
    on close so readers never see a half-written part. Per-part record
    counts travel back as the task results of a ``mapPartitions`` — a
    one-row-per-partition collect — so ``MANIFEST.json`` assembly needs no
    driver-side directory listing of sidecar files (object-store friendly).
    Empty partitions write nothing. Rows whose ``warc_ts`` is NULL (the
    lenient reader emits those for malformed WARC-Date records) are written
    with the epoch sentinel ``1970-01-01T00:00:00Z``, consistent with the
    module's keep-don't-crash policy.

    ``dir_path`` must be a POSIX path visible to all executors (shared FS /
    fuse mount); raises if it already holds part files or a manifest (a
    reused dir would keep stale parts the new MANIFEST doesn't reflect).
    Returns the total record count. Read back with
    ``read_warc(spark, dir_path + "/part-*.warc.gz")``.
    """
    import json
    import os

    os.makedirs(dir_path, exist_ok=True)
    stale = [
        fn for fn in os.listdir(dir_path)
        if fn.startswith("part-") or fn == "MANIFEST.json"
    ]
    if stale:
        raise ValueError(
            f"write_warc_distributed: {dir_path} already contains "
            f"{sorted(stale)[:3]}... — refusing to mix runs; use a fresh dir"
        )
    ext = ".warc.gz" if compress else ".warc"
    rows = df.select("url", "warc_ts", "status", "html")

    def write_part(it):
        from pyspark import TaskContext

        ctx = TaskContext.get()
        name = f"part-{ctx.partitionId():05d}{ext}"
        tmp = os.path.join(dir_path, f".{name}.{ctx.taskAttemptId()}.tmp")
        n = 0
        f = None
        try:
            for r in it:
                if f is None:
                    f = open(tmp, "wb")
                ts = r["warc_ts"]
                ts_iso = (
                    ts.strftime("%Y-%m-%dT%H:%M:%SZ")
                    if ts is not None
                    else "1970-01-01T00:00:00Z"
                )
                rec = _record_bytes(r["url"], ts_iso, int(r["status"]), bytes(r["html"]))
                f.write(gzip.compress(rec) if compress else rec)
                n += 1
        finally:
            if f is not None:
                f.close()
        if n:
            os.replace(tmp, os.path.join(dir_path, name))
            yield (name, n)

    parts = dict(rows.rdd.mapPartitions(write_part).collect())
    total = sum(parts.values())
    with open(os.path.join(dir_path, "MANIFEST.json"), "w") as mf:
        json.dump({"records": total, "parts": parts}, mf, indent=1, sort_keys=True)
    return total


def parse_warc_bytes(buf: bytes) -> Iterator[dict]:
    """Parse concatenated WARC records (plain or multi-member gzip).

    Lenient by design (see module docstring): a record with an unparseable
    Content-Length or truncated framing is skipped by resyncing to the next
    ``WARC/1.`` marker; header bytes decode as latin-1 (never raises); a
    corrupt gzip stream yields whatever decompressed cleanly before the
    corruption. Real CC segments contain such records and one of them must
    not kill the whole file's task.
    """
    if buf[:2] == b"\x1f\x8b":
        # GzipFile reads across concatenated members; chunked so a corrupt
        # member keeps everything that decompressed before it.
        import zlib

        gz = gzip.GzipFile(fileobj=io.BytesIO(buf))
        chunks = []
        try:
            while True:
                c = gz.read(1 << 20)
                if not c:
                    break
                chunks.append(c)
        except (OSError, EOFError, zlib.error):
            pass
        buf = b"".join(chunks)
    pos, n = 0, len(buf)
    while pos < n:
        if not buf.startswith(b"WARC/", pos):
            nxt = buf.find(b"WARC/1.", pos + 1)
            if nxt < 0:
                return
            pos = nxt
        hdr_end = buf.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            return
        headers: dict[str, str] = {}
        for line in buf[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode("latin-1")
        try:
            length = int(headers.get("content-length", "0"))
            if length < 0:
                raise ValueError(length)
        except ValueError:
            # unframeable record: resync to the next WARC marker
            pos = hdr_end + 4
            continue
        payload = buf[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4  # skip the two trailing CRLFs
        if headers.get("warc-type") != "response":
            continue
        status = None
        content_type = None
        location = None
        body = payload
        if payload[:5] == b"HTTP/":
            pe = payload.find(b"\r\n\r\n")
            if pe >= 0:
                http_head = payload[:pe].split(_CRLF)
                status_line = http_head[0].decode("latin-1")
                parts = status_line.split(" ")
                try:
                    status = int(parts[1]) if len(parts) > 1 else None
                except ValueError:
                    status = None
                for line in http_head[1:]:
                    k, _, v = line.partition(b":")
                    key = k.strip().lower()
                    if key == b"content-type" and content_type is None:
                        content_type = v.strip().decode("latin-1")
                    elif key == b"location" and location is None:
                        location = v.strip().decode("latin-1")
                body = payload[pe + 4 :]
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "status": status,
            "content_type": content_type,
            "redirect_to": location,
            "html": body,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: binaryFile scan → Arrow-batched record parser.

    One output row per ``response`` record; html is the raw HTTP body.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        def parse_ts(s):
            if not s:
                return None
            try:
                ts = pd.Timestamp(s)
            except (ValueError, TypeError):  # malformed WARC-Date → NULL ts
                return None
            return ts.tz_localize(None) if ts.tzinfo is not None else ts

        for b in batches:
            out = []
            for content in b["content"]:
                for rec in parse_warc_bytes(bytes(content)):
                    out.append(
                        {
                            "url": rec["url"],
                            "warc_ts": parse_ts(rec["warc_date"]),
                            "status": rec["status"],
                            "html": rec["html"],
                            "n_bytes": len(rec["html"]),
                            "content_type": rec["content_type"],
                            "redirect_to": rec["redirect_to"],
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "status", "html", "n_bytes",
                    "content_type", "redirect_to",
                ],
            )

    return files.mapInPandas(fn, WARC_RECORDS)


def warc_to_pages(df: DataFrame) -> DataFrame:
    """Adapt WARC records to the engine's pages-table shape (schemas.PAGES):
    the fetch join needs (url, warc_ts, html, status, ok_after_attempt).
    The Location column rides along as ``redirect_to`` so the engine's
    redirect-chain collapse activates for WARC-sourced crawls."""
    cols = [
        F.col("url"),
        F.col("warc_ts"),
        F.col("html"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        F.col("status"),
        F.lit(None).cast("int").alias("ok_after_attempt"),
    ]
    if "redirect_to" in df.columns:
        cols.append(F.col("redirect_to"))
    return df.select(*cols)


def stream_warc(spark: SparkSession, path: str) -> DataFrame:
    """Streaming WARC source: the continuous-ingest twin of ``read_warc``.

    Common Crawl-style pipelines land new ``.warc.gz`` segment files into a
    directory as the crawl progresses; ``readStream.format('binaryFile')``
    discovers each exactly once (checkpointed file index) and the SAME
    Arrow-batched record parser emits rows — so a downstream curation or
    dedup stage (streaming/pipeline.py) runs incrementally over segments
    as they arrive instead of re-scanning the corpus. Unit of parallelism
    is still the file (gzip members are the only seek points).
    """
    import pandas as pd

    from pyspark.sql.types import StructType

    file_schema = (
        StructType()
        .add("path", "string")
        .add("modificationTime", "timestamp")
        .add("length", "long")
        .add("content", "binary")
    )
    files = (
        spark.readStream.format("binaryFile")
        .schema(file_schema)
        .load(path)
        .select("content", "modificationTime")
    )

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        def parse_ts(s):
            if not s:
                return None
            try:
                ts = pd.Timestamp(s)
            except (ValueError, TypeError):
                return None
            return ts.tz_localize(None) if ts.tzinfo is not None else ts

        def naive(ts):
            return ts.tz_localize(None) if getattr(ts, "tzinfo", None) else ts

        for b in batches:
            out = []
            for content, mtime in zip(b["content"], b["modificationTime"]):
                for rec in parse_warc_bytes(bytes(content)):
                    out.append(
                        {
                            "url": rec["url"],
                            "warc_ts": parse_ts(rec["warc_date"]),
                            "status": rec["status"],
                            "html": rec["html"],
                            "n_bytes": len(rec["html"]),
                            "content_type": rec["content_type"],
                            "redirect_to": rec["redirect_to"],
                            "segment_mtime": naive(mtime),
                        }
                    )
            yield pd.DataFrame(
                out,
                columns=[
                    "url", "warc_ts", "status", "html", "n_bytes",
                    "content_type", "redirect_to", "segment_mtime",
                ],
            )

    return files.mapInPandas(fn, WARC_STREAM_RECORDS)
