"""WARC source/sink: round-trip fidelity + crawling straight off a WARC."""

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


def test_read_warc_spark_source(spark, warc_file):
    path, pages_pdf = warc_file
    df = read_warc(spark, path)
    rows = {r["url"]: r for r in df.collect()}
    assert len(rows) == 6
    for row in pages_pdf.to_dict("records"):
        got = rows[row["url"]]
        assert bytes(got["html"]) == bytes(row["html"])
        assert got["n_bytes"] == len(row["html"])
        assert got["warc_ts"] == row["warc_ts"].replace(tzinfo=None)


def test_crawl_from_warc(spark, warc_file):
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
