"""Priority queue policy (SURVEY §2.10: pluggable Queue — fifo vs priority)."""

from pyspark.sql import functions as F

from ant_spark import schemas
from ant_spark.engine import CrawlConfig, Engine
from ant_spark.sources.webgraph import example_site


def test_priority_dequeue_order(spark):
    """With budget 1/round and priority = 'products first', products.html is
    fetched before about.html even though about was discovered first."""
    pages_pdf, robots_pdf, seeds = example_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)
    robots = spark.createDataFrame(robots_pdf, schema=schemas.ROBOTS)

    def prio():
        return F.when(F.col("url").contains("products"), F.lit(-1.0)).otherwise(
            F.lit(0.0)
        )

    cfg = CrawlConfig(
        max_rounds=12,
        host_rates={"example.com": 1},  # 1 fetch/round → order observable
        queue_policy="priority",
        priority_fn=prio,
    )
    res = Engine(spark, pages, robots, cfg).run(seeds)
    order = [r["url"] for r in res.fetched_log.orderBy("round").collect()]
    assert order[0] == "http://example.com/"
    assert order[1] == "http://example.com/products.html"  # jumped the queue
    assert set(order) == {
        "http://example.com/",
        "http://example.com/products.html",
        "http://example.com/about.html",
        "http://example.com/a.html",
        "http://example.com/b.html",
    }


def test_pagerank_fed_priority_crawl(spark):
    """The graph-signal composition end-to-end (graphops module promise):
    PageRank over the site's own link graph feeds rank_priority_fn;
    under a 1-fetch/round budget the high-rank hub (in-degree 3) and its
    child jump the queue ahead of the earlier-discovered p1/p2, while
    FIFO fetches in discovery order."""
    from ant_spark.functions.parse import make_links_udf
    from ant_spark.operators.graphops import pagerank, rank_priority_fn
    from ant_spark.sources.webgraph import example_hub_site

    pages_pdf, robots_pdf, seeds = example_hub_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)

    links_udf = make_links_udf()
    edges = pages.select(
        F.col("url").alias("src"),
        F.explode(links_udf(F.col("url"), F.col("html"))).alias("dst"),
    )
    ranks = pagerank(edges, n_iter=3)
    prio = rank_priority_fn(ranks, key_col="url")

    base = dict(max_rounds=12, host_rates={"example.com": 1}, ordering="bfs")
    res_pr = Engine(
        spark, pages, None,
        CrawlConfig(queue_policy="priority", priority_fn=prio, **base),
    ).run(seeds)
    order_pr = [
        r["url"].rsplit("/", 1)[-1] or "/"
        for r in res_pr.fetched_log.orderBy("round").collect()
    ]
    assert order_pr == ["/", "hub.html", "x.html", "p1.html", "p2.html"]

    res_fifo = Engine(spark, pages, None, CrawlConfig(**base)).run(seeds)
    order_fifo = [
        r["url"].rsplit("/", 1)[-1] or "/"
        for r in res_fifo.fetched_log.orderBy("round").collect()
    ]
    assert order_fifo == ["/", "p1.html", "p2.html", "hub.html", "x.html"]


def test_priority_join_table_matches_literal_map(spark):
    """The frontier-scale composition: the SAME PageRank signal fed as a
    joined (url, priority) table (CrawlConfig.priority_join) reproduces the
    literal-map (rank_priority_fn) crawl order exactly — hub and its child
    jump the queue."""
    from ant_spark.functions.parse import make_links_udf
    from ant_spark.operators.graphops import pagerank, rank_priority_table
    from ant_spark.sources.webgraph import example_hub_site

    pages_pdf, _, seeds = example_hub_site()
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)
    links_udf = make_links_udf()
    edges = pages.select(
        F.col("url").alias("src"),
        F.explode(links_udf(F.col("url"), F.col("html"))).alias("dst"),
    )
    ptab = rank_priority_table(pagerank(edges, n_iter=3))
    res = Engine(
        spark, pages, None,
        CrawlConfig(
            max_rounds=12, host_rates={"example.com": 1}, ordering="bfs",
            queue_policy="priority", priority_join=ptab,
        ),
    ).run(seeds)
    order = [
        r["url"].rsplit("/", 1)[-1] or "/"
        for r in res.fetched_log.orderBy("round").collect()
    ]
    assert order == ["/", "hub.html", "x.html", "p1.html", "p2.html"]
