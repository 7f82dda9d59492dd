"""Sitemap seed source: XML parsing, index handling, engine composition.

The two sitemap-fed e2e crawls run CONCURRENTLY in one Spark session
(contract-suite pattern)."""

import gzip

import pytest

from ant_spark import schemas
from ant_spark.engine import CrawlConfig, Engine
from ant_spark.sources.sitemap import (
    parse_sitemap_bytes,
    read_sitemap,
    sitemap_seeds,
)
from ant_spark.sources.webgraph import example_site

_SM = (
    b'<?xml version="1.0" encoding="UTF-8"?>\n'
    b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">\n'
    b'  <url><loc>http://example.com/about.html</loc>'
    b'<lastmod>2025-01-01</lastmod><priority>0.4</priority></url>\n'
    b'  <url><loc>http://example.com/</loc><priority>0.9</priority></url>\n'
    b'  <url><loc>http://example.com/products.html</loc>'
    b'<priority>bogus</priority></url>\n'
    b'</urlset>\n'
)


def test_parse_sitemap_lenient():
    recs = list(parse_sitemap_bytes(_SM))
    assert [r["loc"] for r in recs] == [
        "http://example.com/about.html",
        "http://example.com/",
        "http://example.com/products.html",
    ]
    assert recs[0]["priority"] == 0.4 and recs[0]["lastmod"] == "2025-01-01"
    assert recs[2]["priority"] is None  # bogus float -> NULL, not a crash
    # gzip transparently; garbage and truncation never raise
    assert list(parse_sitemap_bytes(gzip.compress(_SM))) == recs
    assert list(parse_sitemap_bytes(b"not xml")) == []
    cut = _SM.index(b"</url>") + len(b"</url>") + 4  # inside entry #2
    truncated = list(parse_sitemap_bytes(_SM[:cut]))
    assert [r["loc"] for r in truncated] == ["http://example.com/about.html"]
    # sitemapindex entries come back kind='sitemap'
    idx = (b'<sitemapindex><sitemap><loc>http://example.com/s1.xml.gz</loc>'
           b'</sitemap></sitemapindex>')
    (rec,) = parse_sitemap_bytes(idx)
    assert rec["kind"] == "sitemap"


def _w_seeded_crawl(spark, tmp_path):
    """Bulk-seed composition: read_sitemap → sitemap_seeds (url, priority)
    → Engine.run under queue_policy='priority' with a 1-fetch/round host
    budget — fetch ROUNDS follow the site's own <priority> hints (0.9 /,
    default-0.5 products, 0.4 about), then the discovered pages; the full
    reachable set is still crawled exactly once."""
    p = tmp_path / "site.xml.gz"
    p.write_bytes(gzip.compress(_SM))
    sm = read_sitemap(spark, str(p))
    assert sm.count() == 3
    seeds = sitemap_seeds(sm)
    got = {r["url"]: r["priority"] for r in seeds.collect()}
    assert got == {
        "http://example.com/": 0.9,
        "http://example.com/products.html": 0.5,  # NULL -> spec default
        "http://example.com/about.html": 0.4,
    }
    pages_pdf, robots_pdf, _ = example_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)
    robots = spark.createDataFrame(robots_pdf, schema=schemas.ROBOTS)
    res = Engine(
        spark, pages, robots,
        CrawlConfig(max_rounds=12, queue_policy="priority",
                    host_rates={"example.com": 1}),
    ).run(seeds)
    rows = res.fetched_log.orderBy("round").collect()
    order = [r["url"].rsplit("/", 1)[-1] or "/" for r in rows]
    assert order[:3] == ["/", "products.html", "about.html"]  # hint order
    assert set(order[3:]) == {"a.html", "b.html"}  # discovered afterwards
    assert len(set(order)) == len(order)  # exactly-once


def _w_two_level_tree(spark, tmp_path):
    """Sitemap-index recursion as a first-class helper: a gzipped
    sitemapindex pointing at two child urlsets (one gzipped, one plain,
    one loc with a file:// scheme) reads as ONE DataFrame of url entries;
    the tree feeds Engine.run end-to-end. A self-referencing index entry
    must terminate (cycle guard), and max_levels bounds the walk."""
    from ant_spark.sources.sitemap import crawl_sitemaps

    s1 = tmp_path / "s1.xml.gz"
    s1.write_bytes(gzip.compress(
        b'<urlset><url><loc>http://example.com/</loc>'
        b'<priority>0.9</priority></url></urlset>'
    ))
    s2 = tmp_path / "s2.xml"
    s2.write_bytes(
        b'<urlset><url><loc>http://example.com/about.html</loc>'
        b'<priority>0.4</priority></url>'
        b'<url><loc>http://example.com/products.html</loc></url></urlset>'
    )
    idx = tmp_path / "index.xml.gz"
    idx.write_bytes(gzip.compress(
        b'<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
        + f'<sitemap><loc>{s1}</loc></sitemap>'.encode()
        + f'<sitemap><loc>file://{s2}</loc></sitemap>'.encode()
        + f'<sitemap><loc>{idx}</loc></sitemap>'.encode()  # cycle
        + b'</sitemapindex>'
    ))
    tree = crawl_sitemaps(spark, str(idx))
    got = {r["loc"]: r["priority"] for r in tree.collect()}
    assert got == {
        "http://example.com/": 0.9,
        "http://example.com/about.html": 0.4,
        "http://example.com/products.html": None,
    }
    assert tree.filter(tree.kind != "url").count() == 0
    # max_levels=0 stops at the root: index entries only, no urls surface
    assert crawl_sitemaps(spark, str(idx), max_levels=0).count() == 0

    pages_pdf, robots_pdf, _ = example_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)
    robots = spark.createDataFrame(robots_pdf, schema=schemas.ROBOTS)
    res = Engine(
        spark, pages, robots,
        CrawlConfig(max_rounds=12, queue_policy="priority",
                    host_rates={"example.com": 1}),
    ).run(sitemap_seeds(tree))
    order = [r["url"].rsplit("/", 1)[-1] or "/"
             for r in res.fetched_log.orderBy("round").collect()]
    assert order[:3] == ["/", "products.html", "about.html"]
    assert len(set(order)) == len(order)


def _w_robots_sitemap_seeded(spark, tmp_path):
    """Discovery composition: robots.txt Sitemap directives → crawl_sitemaps
    index recursion → sitemap_seeds → Engine.run. The crawl is seeded
    entirely from what the robots feed advertises, priority hints intact,
    and the robots rules still deny their paths during the crawl."""
    from ant_spark.operators.robots import robots_sitemaps
    from ant_spark.sources.sitemap import crawl_sitemaps

    sm = tmp_path / "adv.xml.gz"
    sm.write_bytes(gzip.compress(_SM))
    robots_body = (
        f"User-Agent: *\nDisallow: /search.html\n"
        f"Sitemap: {sm}\n"
    )
    robots = spark.createDataFrame(
        [("example.com", 200, robots_body, None, None)],
        schema=schemas.ROBOTS,
    )
    # a 4xx robots row advertises nothing
    robots_bad = spark.createDataFrame(
        [("dead.test", 404, "Sitemap: http://dead.test/s.xml\n", None, None)],
        schema=schemas.ROBOTS,
    )
    adv = robots_sitemaps(robots.unionByName(robots_bad))
    got = [(r["host"], r["sitemap_url"]) for r in adv.collect()]
    assert got == [("example.com", str(sm))]

    tree = crawl_sitemaps(spark, [r["sitemap_url"] for r in adv.collect()])
    seeds = sitemap_seeds(tree)
    pages_pdf, _, _ = example_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)
    res = Engine(
        spark, pages, robots,
        CrawlConfig(max_rounds=12, queue_policy="priority",
                    host_rates={"example.com": 1}),
    ).run(seeds)
    order = [r["url"].rsplit("/", 1)[-1] or "/"
             for r in res.fetched_log.orderBy("round").collect()]
    assert order[:3] == ["/", "products.html", "about.html"]  # hint order
    assert "search.html" not in order  # robots deny still enforced
    assert len(set(order)) == len(order)


@pytest.fixture(scope="module")
def sm_runs(spark, tmp_path_factory):
    from concurrent.futures import ThreadPoolExecutor

    works = {
        "seeded_crawl": _w_seeded_crawl,
        "two_level_tree": _w_two_level_tree,
        "robots_sitemap": _w_robots_sitemap_seeded,
    }
    with ThreadPoolExecutor(max_workers=len(works)) as ex:
        futs = {
            n: ex.submit(fn, spark, tmp_path_factory.mktemp(f"sm_{n}"))
            for n, fn in works.items()
        }
    return futs


def test_sitemap_seeded_crawl(sm_runs):
    sm_runs["seeded_crawl"].result()


def test_crawl_sitemaps_two_level_tree(sm_runs):
    sm_runs["two_level_tree"].result()


def test_robots_sitemap_seeded(sm_runs):
    sm_runs["robots_sitemap"].result()
