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
