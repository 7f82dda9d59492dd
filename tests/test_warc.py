"""WARC source/sink: round-trip fidelity + crawling straight off a WARC.

The Spark-heavy bodies (two e2e crawls, the distributed sink round-trips,
the streaming ingest) run CONCURRENTLY in one session (contract-suite
pattern); pure-python parser tests stay plain."""

import pytest

from ant_spark import schemas
from ant_spark.engine import CrawlConfig, Engine
from ant_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_to_pages,
    write_warc,
)
from ant_spark.sources.webgraph import example_site


@pytest.fixture(scope="module")
def warc_file(tmp_path_factory):
    pages_pdf, _, _ = example_site()
    path = str(tmp_path_factory.mktemp("warc") / "site.warc.gz")
    n = write_warc(pages_pdf.to_dict("records"), path, compress=True)
    assert n == 6
    return path, pages_pdf


def test_warc_roundtrip_bytes(warc_file):
    """Writer → parser: every page's exact html bytes, url, ts and status
    survive the WARC framing (incl. multi-member gzip)."""
    path, pages_pdf = warc_file
    recs = list(parse_warc_bytes(open(path, "rb").read()))
    assert len(recs) == 6
    by_url = {r["url"]: r for r in recs}
    for row in pages_pdf.to_dict("records"):
        rec = by_url[row["url"]]
        assert rec["html"] == bytes(row["html"])  # byte-identical body
        assert rec["status"] == row["status"]
        assert rec["warc_date"].startswith("2025-01-01T")


def _w_read_source(spark, tmp, warc_file):
    path, pages_pdf = warc_file
    df = read_warc(spark, path)
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 6
    for row in pages_pdf.to_dict("records"):
        got = rows[row["url"]]
        assert bytes(got["html"]) == bytes(row["html"])
        assert got["n_bytes"] == len(row["html"])
        assert got["warc_ts"] == row["warc_ts"].replace(tzinfo=None)


def _w_crawl(spark, tmp, warc_file):
    """The offline-CC workflow end-to-end: WARC → pages table → the same
    golden crawl output as the in-memory fixture (robots-denied page and
    all: the robots dim still comes from its own table)."""
    import pandas as pd

    path, _ = warc_file
    pages = warc_to_pages(read_warc(spark, path))
    _, robots_pdf, seeds = example_site()
    robots = spark.createDataFrame(robots_pdf, schema=schemas.ROBOTS)
    res = Engine(
        spark, pages, robots, CrawlConfig(max_rounds=6, ordering="bfs")
    ).run(seeds)
    rows = res.fetched_log.orderBy("seq").collect()
    assert [r["url"].rsplit("/", 1)[-1] or "/" for r in rows] == [
        "/", "about.html", "products.html", "a.html", "b.html"
    ]
    assert [r["seq"] for r in rows] == [0, 1, 2, 4, 5]


def test_parse_warc_malformed_records():
    """Real-CC leniency: a bad Content-Length, non-UTF8 header bytes, or a
    truncated record must not kill the parse — bad records skip (resync to
    the next WARC marker), good neighbours survive."""
    from ant_spark.sources.warc import _record_bytes

    good1 = _record_bytes("http://a/", "2025-01-01T00:00:00Z", 200, b"<p>a</p>")
    good2 = _record_bytes("http://b/", "2025-01-01T00:00:00Z", 200, b"<p>b</p>")
    bad_len = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://bad/\r\n"
        b"Content-Length: oops\r\n\r\nHTTP/1.1 200 OK\r\n\r\nx\r\n\r\n"
    )
    bad_hdr = (  # latin-1 high bytes in a header value: decodes, not raises
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://\xe9\xfc/\r\n"
        b"Content-Length: 3\r\n\r\nxyz\r\n\r\n"
    )
    recs = list(parse_warc_bytes(good1 + bad_len + bad_hdr + good2))
    urls = [r["url"] for r in recs]
    assert "http://a/" in urls and "http://b/" in urls
    assert "http://bad/" not in urls  # unframeable → skipped
    assert any(u.startswith("http://\xe9") for u in urls)  # latin-1 decoded
    # corrupt gzip: yields nothing, raises nothing
    assert list(parse_warc_bytes(b"\x1f\x8b\x08" + b"\x00" * 40)) == []
    # bad status line: record survives with NULL status
    bad_status = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: http://s/\r\nContent-Length: 27\r\n\r\n"
        b"HTTP/1.1 2x0 OK\r\n\r\n<p>s</p>\r\n\r\n"
    )
    (rec,) = parse_warc_bytes(bad_status)
    assert rec["url"] == "http://s/" and rec["status"] is None


def _w_malformed_date(spark, tmp_path, warc_file):
    """A malformed WARC-Date yields a NULL warc_ts row, not a task kill."""
    from ant_spark.sources.warc import _record_bytes

    rec = _record_bytes("http://d/", "not-a-date", 200, b"<p>d</p>")
    p = tmp_path / "bad_date.warc"
    p.write_bytes(rec)
    (row,) = read_warc(spark, str(p)).collect()
    assert row["url"] == "http://d/" and row["warc_ts"] is None
    assert bytes(row["html"]) == b"<p>d</p>"


def _w_dist_roundtrip(spark, tmp_path, warc_file):
    """Production sink: foreachPartition part-files + MANIFEST; read_warc
    over the part glob recovers every record byte-identically."""
    import json

    from ant_spark.sources.warc import write_warc_distributed

    pages_pdf, _, _ = example_site()
    df = spark.createDataFrame(pages_pdf, schema=schemas.PAGES).repartition(3)
    out_dir = str(tmp_path / "warc_out")
    n = write_warc_distributed(df, out_dir)
    assert n == 6
    manifest = json.load(open(f"{out_dir}/MANIFEST.json"))
    assert manifest["records"] == 6
    assert sum(manifest["parts"].values()) == 6
    assert all(k.startswith("part-") for k in manifest["parts"])
    back = {r["url"]: r for r in read_warc(spark, f"{out_dir}/part-*.warc.gz").collect()}
    assert len(back) == 6
    for row in pages_pdf.to_dict("records"):
        got = back[row["url"]]
        assert bytes(got["html"]) == bytes(row["html"])
        assert got["status"] == row["status"]
        assert got["warc_ts"] == row["warc_ts"].replace(tzinfo=None)


def _w_tag_soup(spark, tmp, warc_file):
    """Real-web hardening e2e: a WARC whose pages are all out-of-subset
    HTML5 (foster-parented links, RAWTEXT fake links, plaintext, CDATA) —
    the crawl must follow exactly the real links (fostered link FIRST, per
    foster-parented DOM order), never the raw-text decoys, and the logged
    extracted text must byte-match the fixture's reference text."""
    from ant_spark.sources.warc import write_warc
    from ant_spark.sources.webgraph import example_soup_site

    pages_pdf, _, seeds = example_soup_site()
    path = str(tmp / "soup.warc.gz")
    write_warc(pages_pdf.to_dict("records"), path, compress=True)
    pages = warc_to_pages(read_warc(spark, path))
    res = Engine(
        spark, pages, None, CrawlConfig(max_rounds=6, ordering="bfs")
    ).run(seeds)
    rows = res.fetched_log.orderBy("seq").collect()
    assert [(r["seq"], r["url"].rsplit("/", 1)[-1] or "/") for r in rows] == [
        (0, "/"), (1, "fostered.html"), (2, "cell.html"), (3, "deep.html"),
    ]
    assert [r["n_links"] for r in rows] == [2, 1, 1, 0]
    ref_text = dict(zip(pages_pdf.url, pages_pdf.text))
    for r in rows:
        assert r["text"] == ref_text[r["url"]]  # byte-identical invariant
    # the decoys never got fetched or even enqueued
    assert not any("fake" in r["url"] for r in rows)
    assert res.metrics  # crawl produced lineage counters


def _w_stream_incremental(spark, tmp_path, warc_file):
    """Streaming WARC ingest: segments dropped into a directory are parsed
    exactly once per micro-batch; a second availableNow pass over the same
    checkpoint picks up ONLY the newly landed segment."""
    from ant_spark.sources.warc import stream_warc

    seg_dir = tmp_path / "segments"
    seg_dir.mkdir()
    ckpt = str(tmp_path / "ckpt")
    pages_pdf, _, _ = example_site()
    recs = pages_pdf.to_dict("records")
    write_warc(recs[:4], str(seg_dir / "seg-00000.warc.gz"))

    out_dir = str(tmp_path / "out")

    def drain():
        q = (
            stream_warc(spark, str(seg_dir))
            .select("url", "n_bytes")
            .writeStream.format("parquet")
            .outputMode("append")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            r["url"]: r["n_bytes"]
            for r in spark.read.parquet(out_dir).collect()
        }

    got = drain()
    assert len(got) == 4
    write_warc(recs[4:], str(seg_dir / "seg-00001.warc.gz"))
    got = drain()
    assert len(got) == 6  # +2 from the new segment only (exactly-once)
    for row in recs:
        assert got[row["url"]] == len(row["html"])


def _w_dist_null_ts(spark, tmp_path, warc_file):
    """Round-5 ADVICE regression: NULL warc_ts rows (the lenient reader
    emits those for malformed WARC-Date) are written with the epoch
    sentinel instead of crashing the task; a second write into the same
    dir refuses (stale parts from a prior run would not be reflected in
    the new MANIFEST)."""
    import datetime as dt

    from ant_spark.sources.warc import write_warc_distributed

    rows = [
        ("http://n.test/ok", dt.datetime(2025, 1, 1), 200, b"<p>ok</p>"),
        ("http://n.test/bad-date", None, 200, b"<p>bad</p>"),
    ]
    df = spark.createDataFrame(
        rows, "url string, warc_ts timestamp, status int, html binary"
    )
    out = str(tmp_path / "w")
    assert write_warc_distributed(df, out) == 2
    back = {
        r["url"]: r
        for r in read_warc(spark, out + "/part-*.warc.gz").collect()
    }
    assert back["http://n.test/bad-date"]["warc_ts"] == dt.datetime(1970, 1, 1)
    assert bytes(back["http://n.test/bad-date"]["html"]) == b"<p>bad</p>"
    assert back["http://n.test/ok"]["warc_ts"] == dt.datetime(2025, 1, 1)
    with pytest.raises(ValueError, match="refusing"):
        write_warc_distributed(df, out)


_WORKERS = {
    "read_source": _w_read_source,
    "crawl": _w_crawl,
    "malformed_date": _w_malformed_date,
    "dist_roundtrip": _w_dist_roundtrip,
    "tag_soup": _w_tag_soup,
    "stream_incremental": _w_stream_incremental,
    "dist_null_ts": _w_dist_null_ts,
}


@pytest.fixture(scope="module")
def warc_runs(spark, warc_file, tmp_path_factory):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_WORKERS)) as ex:
        futs = {
            n: ex.submit(fn, spark, tmp_path_factory.mktemp(f"warc_{n}"), warc_file)
            for n, fn in _WORKERS.items()
        }
    return futs


def test_read_warc_spark_source(warc_runs):
    warc_runs["read_source"].result()


def test_crawl_from_warc(warc_runs):
    warc_runs["crawl"].result()


def test_read_warc_malformed_date(warc_runs):
    warc_runs["malformed_date"].result()


def test_write_warc_distributed_roundtrip(warc_runs):
    warc_runs["dist_roundtrip"].result()


def test_crawl_tag_soup_from_warc(warc_runs):
    warc_runs["tag_soup"].result()


def test_stream_warc_incremental(warc_runs):
    warc_runs["stream_incremental"].result()


def test_write_warc_distributed_null_ts_and_fresh_dir_guard(warc_runs):
    warc_runs["dist_null_ts"].result()
