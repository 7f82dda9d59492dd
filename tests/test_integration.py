"""Full-pipeline integration: crawl → extracted text → curation → packing.

The repo's two halves — the crawl engine (frontier/fetch/parse) and the
training-data operators (language-id, quality, dedup, packing) — must
compose: the fetched_log's extracted text IS the documents table of the
downstream pipeline. This is the end-to-end path a real corpus build runs.
"""

from pyspark.sql import functions as F

from ant_spark import schemas
from ant_spark.engine import CrawlConfig, Engine
from ant_spark.sources.webgraph import GraphConfig, generate


def test_crawl_to_curation_to_packing(spark):
    cfg = GraphConfig(n_pages=200, n_hosts=4, crawl_delay_hosts=0,
                      robots_disallow_hosts=1, flaky_every=0,
                      para_min=30, para_max=60, n_paras=3)
    pages_pdf, robots_pdf, seeds = generate(cfg)
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES)
    robots = spark.createDataFrame(robots_pdf, schema=schemas.ROBOTS)

    res = Engine(spark, pages, robots, CrawlConfig(max_rounds=20)).run(seeds)
    n_fetched = res.pages_fetched
    assert n_fetched > 100

    # crawl output → documents shape (doc_id, text, source)
    docs = res.fetched_log.select(
        F.col("seq").alias("doc_id"),
        "text",
        F.col("host").alias("source"),
    )

    # curation over the crawled corpus
    from ant_spark.operators.curation import curate

    kept, stats = curate(docs, langs=("en",), min_quality=0.2,
                         jaccard_threshold=0.8, n_hashes=8, n_bands=4, k=3)
    st = {r["stage"]: r["n"] for r in stats.collect()}
    assert st["input"] == n_fetched
    n_kept = st["kept"]
    assert 0 < n_kept <= n_fetched

    # packing plan over the curated set (join back for text)
    from ant_spark.operators.textops import pack_plan

    curated_docs = docs.join(kept.select("doc_id"), "doc_id")
    plan = pack_plan(curated_docs, capacity=256)
    rows = plan.collect()
    assert len(rows) == n_kept
    # cross-row invariant: per source, the layout reconstructs the running
    # token cumsum exactly — start_pack*cap + offset must equal the sum of
    # n_tokens of all earlier docs in that source (doc_id order)
    by_src: dict = {}
    for r in sorted(rows, key=lambda r: (r["source"], r["doc_id"])):
        cum = by_src.get(r["source"], 0)
        assert r["start_pack"] * 256 + r["offset"] == cum, r
        expect_wins = (cum + max(r["n_tokens"] - 1, 0)) // 256 - cum // 256 + 1
        assert r["n_windows"] == expect_wins, r
        by_src[r["source"]] = cum + r["n_tokens"]
    assert sum(by_src.values()) > 0

    # content screening composes on the same table
    from ant_spark.operators.textops import content_flags

    flagged = curated_docs.select(
        "doc_id", content_flags(F.col("text")).alias("f")
    ).filter(F.col("f.has_pii"))
    assert flagged.count() == 0  # synthetic corpus carries no PII
