"""Contract suite for pluggable strategies — the reference ships a reusable
conformance test any Queue implementation must pass (anttest/queue.go:19-131);
this is the engine-level analogue: EVERY dedupe mode x queue policy
combination must uphold the crawl contract.

Contracts (reference semantics):
- exactly-once: no URL is ever fetched twice (dedupe.go Test-then-Add);
- robots deny is enforced regardless of strategy;
- seq values are globally unique (the budget anti-joins key on seq);
- exact/prefilter modes visit EXACTLY the reachable public set;
- *_drop modes (reference DedupeBF parity) may drop URLs on filter false
  positives — never over-crawl, and with a generously sized filter the
  loss stays negligible.
"""

import pytest

from ant_spark import schemas
from ant_spark.engine import CrawlConfig, Engine
from ant_spark.sources.webgraph import GraphConfig, generate

DEDUPE_MODES = [
    "exact", "bloom_prefilter", "bloom_drop", "cuckoo_prefilter", "cuckoo_drop"
]
QUEUE_POLICIES = ["fifo", "priority"]


@pytest.fixture(scope="module")
def contract_results(spark):
    """Run ALL 10 matrix crawls CONCURRENTLY in one Spark session (separate
    driver threads; the scheduler interleaves their stages — engine rounds
    are scheduling-bound, not CPU-bound, at this graph size). Serially the
    matrix dominated the whole test suite's wall-clock (~5 min); concurrent
    it finishes in roughly the time of the slowest crawl."""
    from concurrent.futures import ThreadPoolExecutor

    cfg = GraphConfig(n_pages=60, n_hosts=2, crawl_delay_hosts=0,
                      robots_disallow_hosts=1, flaky_every=0)
    pages_pdf, robots_pdf, seeds = generate(cfg)
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES).persist()
    robots = spark.createDataFrame(robots_pdf, schema=schemas.ROBOTS)
    pages.count()
    public = {u for u in pages_pdf.url if "/private/" not in u}

    def crawl(combo):
        dedupe, queue_policy = combo
        res = Engine(
            spark, pages, robots,
            CrawlConfig(
                max_rounds=40,
                dedupe=dedupe,
                queue_policy=queue_policy,
                # a binding global budget so the two queue policies actually
                # dequeue in different orders (priority vs fifo under
                # deferral)
                global_rate=25,
                bloom_bits=1 << 18,
            ),
        ).run(seeds)
        return combo, res.fetched_log.collect()

    combos = [(d, q) for d in DEDUPE_MODES for q in QUEUE_POLICIES]
    with ThreadPoolExecutor(max_workers=5) as pool:
        results = dict(pool.map(crawl, combos))
    return results, public


@pytest.mark.parametrize("queue_policy", QUEUE_POLICIES)
@pytest.mark.parametrize("dedupe", DEDUPE_MODES)
def test_dedupe_queue_contract(spark, contract_results, dedupe, queue_policy):
    results, public = contract_results
    log = results[(dedupe, queue_policy)]
    urls = [r["url"] for r in log]
    assert sorted(set(urls)) == sorted(urls), "URL fetched twice"
    assert all("/private/" not in u for u in urls), "robots deny violated"
    seqs = [r["seq"] for r in log]
    assert len(set(seqs)) == len(seqs), "seq collision"
    if dedupe.endswith("_drop"):
        assert set(urls) <= public, "drop mode over-crawled"
        assert len(urls) >= len(public) * 0.8, "filter fp loss too high"
    else:
        assert set(urls) == public, "lossless mode missed pages"
