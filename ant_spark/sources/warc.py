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
  tests and small exports; a distributed sink would wrap the same
  ``_record_bytes`` per partition via ``foreachPartition``.

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
    ]
)

_CRLF = b"\r\n"


def _record_bytes(url: str, ts_iso: str, status: int, html: bytes) -> bytes:
    """One WARC/1.0 response record (http payload framed per ISO 28500)."""
    http = (
        f"HTTP/1.1 {status} OK\r\n"
        f"Content-Type: text/html\r\n"
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


def parse_warc_bytes(buf: bytes) -> Iterator[dict]:
    """Parse concatenated WARC records (plain or multi-member gzip)."""
    if buf[:2] == b"\x1f\x8b":
        # GzipFile reads across concatenated members
        buf = gzip.GzipFile(fileobj=io.BytesIO(buf)).read()
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
            headers[k.strip().lower().decode()] = v.strip().decode()
        length = int(headers.get("content-length", "0"))
        payload = buf[hdr_end + 4 : hdr_end + 4 + length]
        pos = hdr_end + 4 + length + 4  # skip the two trailing CRLFs
        if headers.get("warc-type") != "response":
            continue
        status = None
        body = payload
        if payload[:5] == b"HTTP/":
            pe = payload.find(b"\r\n\r\n")
            if pe >= 0:
                status_line = payload[: payload.find(_CRLF)].decode("latin-1")
                parts = status_line.split(" ")
                status = int(parts[1]) if len(parts) > 1 else None
                body = payload[pe + 4 :]
        yield {
            "url": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "status": status,
            "html": body,
        }


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC source: binaryFile scan → Arrow-batched record parser.

    One output row per ``response`` record; html is the raw HTTP body.
    """
    import pandas as pd

    files = spark.read.format("binaryFile").load(path).select("content")

    def fn(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for b in batches:
            out = []
            for content in b["content"]:
                for rec in parse_warc_bytes(bytes(content)):
                    out.append(
                        {
                            "url": rec["url"],
                            "warc_ts": pd.Timestamp(rec["warc_date"]).tz_localize(None)
                            if rec["warc_date"]
                            else None,
                            "status": rec["status"],
                            "html": rec["html"],
                            "n_bytes": len(rec["html"]),
                        }
                    )
            yield pd.DataFrame(
                out, columns=["url", "warc_ts", "status", "html", "n_bytes"]
            )

    return files.mapInPandas(fn, WARC_RECORDS)


def warc_to_pages(df: DataFrame) -> DataFrame:
    """Adapt WARC records to the engine's pages-table shape (schemas.PAGES):
    the fetch join needs (url, warc_ts, html, status, ok_after_attempt)."""
    return df.select(
        "url",
        "warc_ts",
        "html",
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("lang"),
        "status",
        F.lit(None).cast("int").alias("ok_after_attempt"),
    )
