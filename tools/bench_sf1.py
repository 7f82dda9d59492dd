"""sf1 (10x) bench rung — superlinearity probe for the top operator queries.

The driver ships parquet up to sf0.1 (5,000 docs / 2,000 x 64-d vectors);
this tool builds a DETERMINISTIC 10x table pair in /tmp and times the most
expensive queries at both scales in ONE session (warm-up pass first), so any
superlinear term (md5 CPU in LSH banding, window caps, candidate-pair
blow-up) shows up before a cluster finds it.

Scaling construction (pure column arithmetic, no randomness):
- documents: 10 replicas, ``doc_id' = doc_id + rep*1e6``; for rep>0 every
  WORD gets a per-replica suffix (``w -> w~r<rep>``), which (a) preserves
  each replica's internal near-dup structure exactly (Jaccard is invariant
  under a bijective token rename), and (b) makes cross-replica similarity
  zero — so true near-dup pair counts scale LINEARLY (10x), and any
  superlinear wall-clock is the implementation's, not the data's.
- embeddings: 10 replicas, ``vec_id' = vec_id + rep*1e6``; each replica's
  vectors are dimension-ROTATED by ``rep`` positions (norms and all
  within-replica angles preserved; cross-replica directions decorrelated).

Usage: python tools/bench_sf1.py   # prints one JSON line; ~6 min
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

QUERIES = [
    "text_minhash_lsh_pairs",
    "text_simhash",
    "text_simhash_near_dup",
    "text_pack_plan",
    "emb_cosine_topk",
    "emb_ivf_topk",
    # round-6 per-row screening family: embarrassingly parallel by
    # construction, so the 10x ratio should sit near the scan ratio —
    # any higher reading means a regex/HOF term grew superlinear
    "text_gopher_flags",
    "text_screening",
]


def build_sf1(spark, src_dir: str, out_dir: str, reps: int = 10) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{src_dir}/documents.parquet")
    emb = spark.read.parquet(f"{src_dir}/embeddings.parquet")
    doc_parts = []
    emb_parts = []
    for rep in range(reps):
        if rep == 0:
            d = docs
            e = emb
        else:
            d = docs.withColumn(
                "text",
                F.concat_ws(
                    " ",
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda x: F.concat(x, F.lit(f"~r{rep}")),
                    ),
                ),
            )
            e = emb.withColumn(
                "embedding",
                F.concat(
                    F.slice(F.col("embedding"), rep + 1, 64 - rep),
                    F.slice(F.col("embedding"), 1, rep),
                ),
            )
        doc_parts.append(d.withColumn("doc_id", F.col("doc_id") + rep * 1_000_000))
        emb_parts.append(e.withColumn("vec_id", F.col("vec_id") + rep * 1_000_000))
    out_docs = doc_parts[0]
    for p in doc_parts[1:]:
        out_docs = out_docs.unionByName(p)
    out_emb = emb_parts[0]
    for p in emb_parts[1:]:
        out_emb = out_emb.unionByName(p)
    out_docs.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")
    out_emb.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")


def main() -> None:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    sf01 = "/root/testdata/sf0.1"
    sf001 = "/root/testdata/sf0.01"

    import __spark_entry__ as entrymod
    from ant_spark.session import get_spark

    spark = get_spark(
        app_name="bench_sf1",
        master=f"local[{cpus}]",
        extra_conf={"spark.sql.shuffle.partitions": str(max(8, cpus))},
    )
    qs = entrymod.queries()

    sf1_dir = tempfile.mkdtemp(prefix="ant_sf1_")
    t0 = time.time()
    build_sf1(spark, sf01, sf1_dir)
    stage_sec = round(time.time() - t0, 1)
    print(f"sf1 staging: {stage_sec}s -> {sf1_dir}", flush=True)

    def run_pass(sf_dir: str) -> dict[str, float]:
        out = {}
        for name in QUERIES:
            t = time.time()
            qs[name](spark, sf_dir).write.format("noop").mode("overwrite").save()
            out[name] = round(time.time() - t, 2)
        return out

    run_pass(sf001)  # warm-up (JIT/codegen), discarded
    t01 = run_pass(sf01)
    t1 = run_pass(sf1_dir)
    ratios = {k: round(t1[k] / t01[k], 2) if t01[k] > 0 else None for k in QUERIES}
    print(
        json.dumps(
            {
                "sf0.1_sec": t01,
                "sf1_sec": t1,
                "ratio_10x": ratios,
                "stage_sec": stage_sec,
                "cpus": cpus,
            }
        ),
        flush=True,
    )
    shutil.rmtree(sf1_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
