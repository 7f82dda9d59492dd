"""Warm same-session adjudication of the headline `crawl` bench number.

BENCH_r04 recorded 44.1s for the sf0.1 bench crawl vs 35.0s in r03 on
byte-identical engine code (round-4 verdict, "What's wrong" #1).  This VM's
cold cross-invocation variance is ±15% (co-tenant spikes can double it), so
per the r2→r3 md5-LSH protocol the adjudication is: ONE SparkSession, a
discarded warm-up run, then >=N timed trials of the exact bench.py crawl
invocation, reporting every trial plus the median.  If the warm median sits
in the historical 35-52s cold band, the r04 number was invocation variance;
BENCH.md records the warm median as the reference point for ±15% bands.

Usage: python tools/crawl_warm_ab.py [n_trials]   (default 5)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n_trials = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf = 0.1

    from ant_spark import schemas
    from ant_spark.engine import CrawlConfig, Engine
    from ant_spark.session import get_spark
    from ant_spark.sources.webgraph import GraphConfig, generate

    spark = get_spark(
        app_name="crawl_warm_ab",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(8, cpus))},
    )

    # identical graph + config to bench.py's headline crawl at sf0.1
    n_pages = int(os.environ.get("BENCH_CRAWL_PAGES", str(max(2000, int(200_000 * sf)))))
    cfg = GraphConfig(
        n_pages=n_pages,
        n_hosts=max(16, n_pages // 400),
        fanout=8,
        crawl_delay_hosts=0,
        robots_disallow_hosts=2,
        flaky_every=0,
    )
    pages_pdf, robots_pdf, seeds = generate(cfg)
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES).persist()
    robots = spark.createDataFrame(robots_pdf, schema=schemas.ROBOTS)
    pages.count()

    def one_run() -> tuple[float, int]:
        t0 = time.time()
        res = Engine(
            spark,
            pages,
            robots,
            CrawlConfig(ordering="partitioned", max_rounds=64),
        ).run(seeds)
        return time.time() - t0, res.pages_fetched

    warm_sec, warm_fetched = one_run()  # discarded warm-up
    print(f"warm-up (discarded): {warm_sec:.1f}s fetched={warm_fetched}", flush=True)

    trials = []
    for i in range(n_trials):
        sec, fetched = one_run()
        trials.append(round(sec, 2))
        print(f"trial {i + 1}/{n_trials}: {sec:.1f}s fetched={fetched}", flush=True)

    st = sorted(trials)
    median = st[len(st) // 2] if len(st) % 2 else (st[len(st) // 2 - 1] + st[len(st) // 2]) / 2
    print(
        json.dumps(
            {
                "trials_sec": trials,
                "warm_median_sec": median,
                "pages_fetched": warm_fetched,
                "warm_median_urls_per_sec": round(warm_fetched / median, 1),
                "n_pages": n_pages,
                "cpus": cpus,
            }
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
