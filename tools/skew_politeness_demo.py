"""Politeness-window skew evidence: Catalyst's WindowGroupLimit vs salting.

The north rule calls for skew-aware scheduling windows. The hand-rolled
answer is the salted two-phase window (politeness.budget_per_host with
salt>1). The Spark-native answer is to let Catalyst do it: for
``row_number() OVER (PARTITION BY host ORDER BY seq)`` filtered to
``rk <= budget``, Spark ≥3.5 inserts a **map-side WindowGroupLimit** that
prunes every host to ≤ budget rows per input partition BEFORE the shuffle —
the hot host never materializes as one giant window partition.

This tool builds a deliberately skewed frontier (one host owns 90% of N
rows), runs split_by_budget at salt=1 (single window + pushdown) vs salt=8
(manual two-phase), asserts the admitted sets are IDENTICAL, reports
wall-clock for each, and asserts the salt=1 plan actually contains the
map-side WindowGroupLimit (the property the engine's salt=1 default
relies on).

Measured (40M rows, 90% on one host, local[32], warm): salt=1 1.28s vs
salt=8 2.55s — the optimizer's pushdown beats manual salting ~2×.

Usage: python tools/skew_politeness_demo.py [n_rows] (default 4_000_000)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from pyspark.sql import functions as F

    from ant_spark.operators.politeness import split_by_budget
    from ant_spark.session import get_spark

    spark = get_spark(
        app_name="skew_politeness_demo",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "64"},
    )
    # 90% of rows on one hot host, the rest spread over 1000 cold hosts
    frontier = (
        spark.range(n)
        .select(
            F.col("id").alias("seq"),
            F.xxhash64(F.col("id").cast("string")).alias("url_hash"),
            F.when(F.col("id") % 10 < 9, F.lit("hot.test"))
            .otherwise(
                F.concat(F.lit("cold"), F.pmod(F.col("id"), F.lit(1000)).cast("string"))
            )
            .alias("host"),
        )
        .persist()
    )
    frontier.count()
    budget = F.lit(1000)

    results = {}
    for salt in (1, 8, 1, 8):  # alternate; first pair is warm-up
        t = time.time()
        admitted, _ = split_by_budget(frontier, budget, ["seq"], salt=salt)
        got = admitted.agg(
            F.count("*").alias("n"), F.sum("seq").alias("s")
        ).collect()[0]
        dt = time.time() - t
        results.setdefault(salt, []).append((round(dt, 2), got["n"], got["s"]))
        print(f"salt={salt}: {dt:.2f}s admitted={got['n']} seqsum={got['s']}")

    # identical admitted sets (count + seq checksum) across strategies
    sig = {(v[-1][1], v[-1][2]) for v in results.values()}
    assert len(sig) == 1, f"salted window changed the admitted set: {results}"

    # the engine's salt=1 default relies on the map-side group-limit pushdown
    import io
    from contextlib import redirect_stdout

    admitted, _ = split_by_budget(frontier, budget, ["seq"], salt=1)
    buf = io.StringIO()
    with redirect_stdout(buf):
        admitted.explain("formatted")
    n_wgl = buf.getvalue().count("WindowGroupLimit")
    assert n_wgl >= 2, "expected map+reduce side WindowGroupLimit in the plan"

    t1, t8 = results[1][-1][0], results[8][-1][0]
    print(
        f"PASS: identical admitted sets; WindowGroupLimit x{n_wgl} in the "
        f"salt=1 plan; single-window {t1}s vs salted {t8}s on a "
        f"90%-one-host frontier of {n:,} rows"
    )


if __name__ == "__main__":
    main()
