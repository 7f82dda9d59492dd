"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry at a given sf_dir AND its
oracle_sql() on DuckDB over the same parquet views, then compares
row-count, column names, and order-insensitive values.

Usage: python tools/check_oracle.py [sf_dir] [only_query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


def canon(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.9g}"
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rowset(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted("|".join(canon(r[i]) for i in order) for r in rows)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from ant_spark.session import get_spark

    spark = get_spark(
        master="local[8]", extra_conf={"spark.sql.shuffle.partitions": "4"}
    )
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            cols = df.columns
            rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ROWS  {name}: {len(rows)} rows (no oracle) "
                  f"[{time.time()-t0:.1f}s]")
            continue
        try:
            res = con.execute(oracles[name])
            ocols = [d[0] for d in res.description]
            orows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            failures += 1
            continue
        ok_cols = sorted(cols) == sorted(ocols)
        s_rows, o_rows = rowset(rows, cols), rowset(orows, ocols)
        ok_vals = s_rows == o_rows
        if ok_cols and ok_vals:
            print(f"OK    {name}: {len(rows)} rows [{time.time()-t0:.1f}s]")
        else:
            failures += 1
            print(f"FAIL  {name}: cols_match={ok_cols} "
                  f"spark={len(rows)} oracle={len(orows)}")
            if not ok_cols:
                print(f"      spark cols:  {sorted(cols)}")
                print(f"      oracle cols: {sorted(ocols)}")
            for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                if a != b:
                    print(f"      first diff @{i}:\n        spark:  {a}\n        oracle: {b}")
                    break
            if len(s_rows) != len(o_rows):
                extra = set(s_rows) ^ set(o_rows)
                print(f"      symmetric diff size: {len(extra)}; sample: {list(extra)[:2]}")
    print(f"\n{'ALL OK' if failures == 0 else f'{failures} FAILURES'}")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
