"""Evidence for the bucketed storage-partitioned dedupe join (ARCHITECTURE §2).

Writes `seen` and `links` as tables bucketed by url_hash (the plain-Spark
stand-in for Iceberg `bucket(N, url_hash)` partitioning), then compares the
anti-join plan and wall-clock against unbucketed parquet:

- unbucketed: both sides get an Exchange (shuffle) before the join;
- bucketed:   zero Exchange — the join reads co-located buckets directly.

At a 10^10-URL seen-set the Exchange IS the round's dominant cost, so this
is the scale path the engine's state layout is designed for.

Usage: python tools/bucketed_join_demo.py [n_rows]
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    from pyspark.sql import functions as F

    from ant_spark.session import get_spark

    spark = get_spark(
        app_name="bucketed_join_demo",
        master="local[8]",
        extra_conf={
            "spark.sql.shuffle.partitions": "16",
            "spark.sql.autoBroadcastJoinThreshold": "-1",  # force non-broadcast
            "spark.sql.sources.bucketing.enabled": "true",
            # join keys (url_hash, url) ⊇ bucket cols (url_hash): allow
            # subset co-partitioning so the bucketed layout is honored
            "spark.sql.requireAllClusterKeysForCoPartition": "false",
        },
    )
    import shutil

    spark.sql("DROP TABLE IF EXISTS seen_b")
    spark.sql("DROP TABLE IF EXISTS links_b")
    wh = spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:")
    for t in ("seen_b", "links_b"):  # drop leaves orphan dirs across sessions
        shutil.rmtree(os.path.join(wh, t), ignore_errors=True)

    seen = spark.range(n).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url"),
    )
    links = spark.range(n // 2, n + n // 2).select(
        F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
        F.concat(F.lit("http://h/"), F.col("id").cast("string")).alias("url"),
    )

    # unbucketed baseline
    seen.write.mode("overwrite").parquet("/tmp/bjd_seen")
    links.write.mode("overwrite").parquet("/tmp/bjd_links")
    s0 = spark.read.parquet("/tmp/bjd_seen")
    l0 = spark.read.parquet("/tmp/bjd_links")
    anti0 = l0.join(s0, ["url_hash", "url"], "left_anti")
    p0 = plan_of(anti0)
    t = time.time()
    n0 = anti0.count()
    t0 = time.time() - t

    # bucketed: both sides bucketed by url_hash → storage-partitioned join
    seen.write.mode("overwrite").bucketBy(16, "url_hash").sortBy("url_hash").saveAsTable("seen_b")
    links.write.mode("overwrite").bucketBy(16, "url_hash").sortBy("url_hash").saveAsTable("links_b")
    s1 = spark.table("seen_b")
    l1 = spark.table("links_b")
    anti1 = l1.join(s1, ["url_hash", "url"], "left_anti")
    p1 = plan_of(anti1)
    t = time.time()
    n1 = anti1.count()
    t1 = time.time() - t

    ex0 = p0.count("Exchange")
    ex1 = p1.count("Exchange")
    print(f"rows: {n:,}; anti-join survivors: {n0:,} (must equal {n1:,})")
    print(f"unbucketed: {ex0} Exchange(s), {t0:.2f}s")
    print(f"bucketed:   {ex1} Exchange(s), {t1:.2f}s")
    assert n0 == n1, "bucketed join changed results!"
    ok = ex1 == 0 and ex0 >= 1
    print("PASS: bucketed anti-join is shuffle-free" if ok
          else "FAIL: expected 0 Exchanges in the bucketed plan")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
