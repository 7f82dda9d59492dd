"""A/B: parquet vs bucketed seen-state backend, measured in the REAL engine.

Runs the same steady-state crawl (every page seeded → one wide round, then a
dedupe-heavy second round where ~all discovered links are already seen)
under both `state_backend` modes, with broadcast disabled so the dedupe
anti-join's physical plan is the honest sort-merge path it would take at a
10^10-URL seen set. Reports per-backend round wall-clock and the Exchange
count of the engine's own dedupe anti-join plan (via the
ANT_SPARK_EXPLAIN_DEDUPE hook).

Expected: bucketed plans show ZERO Exchange on the dedupe join — the seen
side is read storage-partitioned (the plain-Spark stand-in for an Iceberg
bucket(N, url_hash) table); the candidate side's bucket shuffle is folded
into the per-round staging write.

Usage: python tools/bucketed_engine_ab.py [n_pages] (default 240000)
"""

from __future__ import annotations

import io
import json
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["ANT_SPARK_EXPLAIN_DEDUPE"] = "1"


def main() -> None:
    n_pages = int(sys.argv[1]) if len(sys.argv) > 1 else 240_000

    from ant_spark import schemas
    from ant_spark.engine import Engine, CrawlConfig
    from ant_spark.session import get_spark
    from ant_spark.sources.webgraph import GraphConfig, generate

    spark = get_spark(
        app_name="bucketed_engine_ab",
        master="local[32]",
        extra_conf={
            "spark.sql.shuffle.partitions": "32",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    )
    cfg = GraphConfig(
        n_pages=n_pages, n_hosts=max(32, n_pages // 400), fanout=12,
        crawl_delay_hosts=0, robots_disallow_hosts=0, flaky_every=0,
        dangling_every=0,
    )
    pages_pdf, _, _ = generate(cfg)
    pages = spark.createDataFrame(pages_pdf, schema=schemas.PAGES).persist()
    pages.count()
    del pages_pdf
    seeds_df = pages.select("url")

    results = {}
    for backend in ("parquet", "bucketed", "parquet", "bucketed"):
        eng = Engine(
            spark, pages, None,
            CrawlConfig(max_rounds=2, state_backend=backend),
        )
        buf = io.StringIO()
        t0 = time.time()
        with redirect_stdout(buf):
            res = eng.run(seeds_df)
        wall = time.time() - t0
        exchanges = [
            int(m) for m in re.findall(r"Exchanges=(\d+)", buf.getvalue())
        ]
        r = results.setdefault(
            backend, {"walls": [], "crawl_walls": [], "exchanges": []}
        )
        r["exchanges"].extend(exchanges)  # keep EVERY run's plan evidence
        r["walls"].append(round(wall, 2))
        r["crawl_walls"].append(res.crawl_wall_sec)
        r["urls_per_sec"] = round(res.pages_fetched / res.crawl_wall_sec, 1)
        r["pages"] = res.pages_fetched
        print(
            f"{backend}: wall={wall:.1f}s crawl_wall={res.crawl_wall_sec}s "
            f"dedupe-join Exchanges/round={exchanges}",
            flush=True,
        )

    print("RESULT " + json.dumps({"n_pages": n_pages, "backends": results}))
    ok = all(x == 0 for x in results["bucketed"]["exchanges"])
    print("PASS: bucketed dedupe join is Exchange-free in the engine"
          if ok else "FAIL: bucketed plan still contains Exchanges")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
