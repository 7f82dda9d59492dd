"""Per-query isolation bench (guide §1.4): times individual queries()
entries with the noop sink and optionally dumps .explain('formatted').

This file is NOT the driver's bench — bench.py stays frozen; numbers from
here feed OPTIMIZATION_r07.md and plans/r07/.

Usage:
  python bench_extra.py <query> [query ...]       # time with noop sink
  BENCH_EXTRA_EXPLAIN=1 python bench_extra.py q   # also dump formatted plan
  BENCH_EXTRA_TRIALS=3 python bench_extra.py q    # repeat trials
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    trials = int(os.environ.get("BENCH_EXTRA_TRIALS", "1"))
    explain = os.environ.get("BENCH_EXTRA_EXPLAIN") == "1"
    out_dir = os.environ.get("BENCH_EXTRA_PLAN_DIR", "")

    import __spark_entry__ as entrymod
    from ant_spark.session import get_spark

    spark = get_spark(
        app_name="ant_spark_bench_extra",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(8, cpus))},
    )
    qs = entrymod.queries()
    names = sys.argv[1:] or []
    results: dict[str, list[float]] = {}
    for name in names:
        fn = qs[name]
        if explain:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            plan = buf.getvalue()
            if out_dir:
                os.makedirs(out_dir, exist_ok=True)
                with open(os.path.join(out_dir, f"{name}.txt"), "w") as f:
                    f.write(plan)
            else:
                print(f"===== plan: {name} =====\n{plan}", flush=True)
        samples = []
        for i in range(trials):
            # drop any cache left by a previous trial: CacheManager matches
            # canonicalized plans, so a re-built identical DataFrame would
            # silently reuse the previous trial's persisted intermediates
            spark.catalog.clearCache()
            spark.sparkContext.setJobDescription(f"bench_extra:{name}#{i}")
            t = time.time()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            samples.append(round(time.time() - t, 3))
            spark.sparkContext.setJobDescription(None)
        results[name] = samples
        print(f"{name}: {samples}", flush=True)
    print(json.dumps({"sf_dir": sf_dir, "results": results}))


if __name__ == "__main__":
    main()
