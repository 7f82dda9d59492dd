"""Politeness-window skew evidence: budget-cap WindowGroupLimit vs salting.

The north rule calls for skew-aware scheduling windows. Catalyst's
InferWindowGroupLimit (Spark ≥3.5) prunes every host to ≤ k rows per input
partition BEFORE the shuffle — but ONLY for ``rank <= literal`` filters.
The engine's real budget is a PER-ROW column (derived from crawl_delay /
host_rates), which alone gets NO pushdown; the engine therefore passes a
driver-computed foldable ``budget_cap`` (the max budget any limited row can
have — Engine._politeness_budget_cap) so the literal conjunct restores the
map-side pruning, and routes unlimited rows around the window entirely.

This tool reproduces that plan with the ENGINE-SHAPED budget (a per-row
column, not a literal) on a deliberately skewed frontier (one host owns 90%
of N rows) and checks, for capped-single-window vs manual salted two-phase
vs naive uncapped:

- all three admit IDENTICAL sets;
- the capped plan contains the map+reduce WindowGroupLimit PAIR (asserted
  as ≥2 distinct plan nodes; "formatted" explain prints each node twice);
- the naive per-row-budget plan contains NONE (the pitfall);
- wall-clock for each.

Usage: python tools/skew_politeness_demo.py [n_rows] (default 4_000_000)
"""

from __future__ import annotations

import io
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def n_wgl_nodes(df) -> int:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    # formatted explain mentions each node twice (tree + detail header)
    return buf.getvalue().count("WindowGroupLimit") // 2


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    from pyspark.sql import functions as F

    from ant_spark.operators.politeness import host_budget_expr, split_by_budget
    from ant_spark.session import get_spark

    spark = get_spark(
        app_name="skew_politeness_demo",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "64"},
    )
    # 90% of rows on one hot host, the rest spread over 1000 cold hosts;
    # per-row crawl_delay column → ENGINE-SHAPED per-row budget expression
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
            F.when(F.col("id") % 10 < 9, F.lit(0.06)).otherwise(F.lit(0.3)).alias(
                "crawl_delay"
            ),
        )
        .persist()
    )
    frontier.count()
    # budget = floor(60s round / crawl_delay): hot host 1000/round, cold 200
    budget = host_budget_expr(60.0, 1 << 30, F.col("crawl_delay"))
    wb = frontier.withColumn("_b", budget)
    cap = 1000  # = Engine._politeness_budget_cap for this config

    variants = {
        "naive (per-row budget, no cap)": dict(salt=1, budget_cap=None),
        "capped single window": dict(salt=1, budget_cap=cap),
        "salted two-phase": dict(salt=8, budget_cap=None),
    }
    results = {}
    for round_ in range(2):  # first pass is warm-up
        for name, kw in variants.items():
            t = time.time()
            admitted, _ = split_by_budget(wb, F.col("_b"), ["seq"], **kw)
            got = admitted.agg(
                F.count("*").alias("n"), F.sum("seq").alias("s")
            ).collect()[0]
            dt = time.time() - t
            results[name] = (round(dt, 2), got["n"], got["s"])
            if round_:
                print(f"{name}: {dt:.2f}s admitted={got['n']} seqsum={got['s']}")

    sig = {(v[1], v[2]) for v in results.values()}
    assert len(sig) == 1, f"strategies disagree on the admitted set: {results}"

    adm_naive, _ = split_by_budget(wb, F.col("_b"), ["seq"], salt=1, budget_cap=None)
    adm_cap, _ = split_by_budget(wb, F.col("_b"), ["seq"], salt=1, budget_cap=cap)
    n_naive, n_cap = n_wgl_nodes(adm_naive), n_wgl_nodes(adm_cap)
    print(f"WindowGroupLimit nodes: naive(per-row)={n_naive} capped={n_cap}")
    assert n_naive == 0, "expected NO pushdown for a bare per-row budget"
    assert n_cap >= 2, "expected map+reduce WindowGroupLimit with the cap"

    t_cap = results["capped single window"][0]
    t_salt = results["salted two-phase"][0]
    print(
        f"PASS: identical admitted sets; capped window {t_cap}s vs salted "
        f"{t_salt}s on a 90%-one-host frontier of {n:,} rows "
        f"(pushdown verified on the engine-shaped per-row budget)"
    )

    # --- rule_budget (LimitPattern/LimitRegexp) skew case ------------------
    # ONE rule matching EVERY row is the worst case: without the foldable
    # cap the whole frontier lands in a single `_rule` window partition.
    # rule_budget now caps with max(rule budgets) — assert the pushdown
    # fires and the one-partition window still returns in bounded time.
    from ant_spark.operators.politeness import rule_budget

    rules = [("regexp", "hot|cold", 500)]  # matches every synthetic URL
    fr_urls = frontier.withColumn(
        "url", F.concat(F.lit("http://"), F.col("host"), F.lit("/p"),
                        F.col("seq").cast("string"))
    )
    t = time.time()
    adm_r, def_r = rule_budget(fr_urls, rules, round_seconds=1.0)
    n_adm = adm_r.count()
    dt_rule = time.time() - t
    n_wgl = n_wgl_nodes(adm_r)
    print(
        f"rule_budget one-rule-matches-all: {dt_rule:.2f}s admitted={n_adm} "
        f"WindowGroupLimit nodes={n_wgl} (n={n:,} rows through ONE rule)"
    )
    assert n_adm == 500, f"rule budget must admit exactly 500, got {n_adm}"
    assert n_wgl >= 2, "expected map+reduce WindowGroupLimit in rule_budget"


if __name__ == "__main__":
    main()
