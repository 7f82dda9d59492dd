"""S4 render seam (operators/render.py): the antcdp analogue — a pluggable
kernel whose output changes the crawl frontier (client.go:1-20)."""

import pytest
from pyspark.sql import functions as F

from ant_spark import schemas
from ant_spark.engine import CrawlConfig, Engine
from ant_spark.operators.render import (
    cdp_renderer,
    fake_js_renderer,
    make_render_udf,
)
from ant_spark.sources.webgraph import example_js_site


def test_fake_js_renderer_kernel():
    html = (
        b"<body><a href='/x'>s</a>"
        b"<script>document.write('<a href=\"/late\">l</a>');</script>"
        b"<script type='text/javascript'>var untouched = 1;</script></body>"
    )
    out = fake_js_renderer(html)
    assert b'href="/late"' in out  # document.write spliced into the DOM
    assert b"untouched" not in out  # leftover script bodies stripped
    assert b"/x" in out  # static content intact
    assert fake_js_renderer(None) is None


def test_cdp_renderer_marks_real_boundary():
    with pytest.raises(NotImplementedError, match="chrome"):
        cdp_renderer(b"<html></html>")


def _w_render_seam(spark):
    """The semantics the reference's CDP client exists for: a link present
    only after JS execution is crawled WITH the renderer and missed
    WITHOUT it."""
    pages_pdf, _, seeds = example_js_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)

    static = Engine(
        spark, pages, None, CrawlConfig(max_rounds=6, ordering="bfs")
    ).run(seeds)
    static_urls = {r["url"] for r in static.fetched_log.collect()}
    assert "http://js.example.com/js-only.html" not in static_urls
    assert "http://js.example.com/static.html" in static_urls

    rendered = Engine(
        spark, pages, None,
        CrawlConfig(max_rounds=6, ordering="bfs", render_fn=fake_js_renderer),
    ).run(seeds)
    rows = rendered.fetched_log.orderBy("seq").collect()
    assert [r["url"] for r in rows] == [
        "http://js.example.com/",
        "http://js.example.com/static.html",
        "http://js.example.com/js-only.html",
    ]
    assert [r["seq"] for r in rows] == [0, 1, 2]
    # rendered text drops script source (a real render leaves none behind)
    seed_text = rows[0]["text"]
    assert "document.write" not in seed_text


def _w_render_when(spark):
    """render_when restricts the kernel to matching rows — here a
    never-true predicate, so the JS link stays undiscovered even with a
    renderer configured (the per-row generalization of the reference's
    whole-fetcher swap)."""
    pages_pdf, _, seeds = example_js_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)
    res = Engine(
        spark, pages, None,
        CrawlConfig(
            max_rounds=6,
            ordering="bfs",
            render_fn=fake_js_renderer,
            render_when=lambda: F.col("host") == "other.example.com",
        ),
    ).run(seeds)
    urls = {r["url"] for r in res.fetched_log.collect()}
    assert "http://js.example.com/js-only.html" not in urls


@pytest.fixture(scope="module")
def render_runs(spark):
    from concurrent.futures import ThreadPoolExecutor

    works = {"seam": _w_render_seam, "when": _w_render_when}
    with ThreadPoolExecutor(max_workers=len(works)) as ex:
        futs = {n: ex.submit(fn, spark) for n, fn in works.items()}
    return futs


def test_render_seam_changes_crawl_frontier(render_runs):
    render_runs["seam"].result()


def test_render_when_gates_per_row(render_runs):
    render_runs["when"].result()
