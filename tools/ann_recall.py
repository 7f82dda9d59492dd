"""ANN recall evidence: LSH-bucketed search vs exact brute force.

Quantifies the approximation the scale path trades for: recall@k of
``lsh_topk`` across plane counts (bucket granularity) and of the
multi-table OR composition ``lsh_topk_tables`` (the recall lever), plus
pair-recall of ``cosine_near_dup_pairs`` vs the exact all-pairs threshold
set — all against ground truth from ``brute_force_topk`` on the synthetic
embeddings. Also reports the candidate-set size (the cost the bucketing
saves: candidates/query vs N for brute force).

Results are recorded in BENCH.md and justify the shipped defaults
(6 planes single-table for near-dup; 8 planes × 4 tables when recall@10
matters).

Usage: python tools/ann_recall.py [sf_dir] [k] (default /root/testdata/sf0.1, 10)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    k = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from collections import defaultdict

    from pyspark.sql import functions as F

    from ant_spark.operators.similarity import (
        brute_force_topk,
        cosine_near_dup_pairs,
        lsh_signature,
        lsh_topk,
        lsh_topk_tables,
        make_hyperplanes,
    )
    from ant_spark.session import get_spark

    spark = get_spark(
        app_name="ann_recall",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])
    print(f"{n} vectors, dim {dim}, k={k}")

    def topk_sets(df):
        out = defaultdict(set)
        for r in df.collect():
            out[r["query_id"]].add(r["neighbor_id"])
        return out

    t0 = time.time()
    truth = topk_sets(brute_force_topk(emb, emb, k=k))
    t_brute = time.time() - t0
    print(f"brute force ground truth: {t_brute:.1f}s ({n}x{n} pairs)")

    def recall_of(approx):
        hits = tot = 0
        for q, tset in truth.items():
            hits += len(tset & approx.get(q, set()))
            tot += len(tset)
        return hits / tot if tot else 0.0

    report = {"n": n, "k": k, "brute_sec": round(t_brute, 1), "topk": []}

    # single-table recall across plane counts
    for n_planes in (4, 6, 8):
        planes = make_hyperplanes(dim, n_planes, seed=42)
        sig = lsh_signature(F.col("embedding"), planes)
        cands = (
            emb.select(sig.alias("b"))
            .groupBy("b")
            .count()
            .agg(F.sum(F.col("count") * F.col("count")))
            .collect()[0][0]
        )
        t0 = time.time()
        approx = topk_sets(lsh_topk(emb, emb, planes, k=k))
        dt = time.time() - t0
        rec = recall_of(approx)
        row = {
            "planes": n_planes, "tables": 1, "recall": round(rec, 3),
            "cand_per_query": round(cands / n, 1), "sec": round(dt, 1),
        }
        report["topk"].append(row)
        print(f"lsh_topk planes={n_planes}: recall@{k}={rec:.3f} "
              f"candidates/query={cands / n:.0f} (vs {n} brute) {dt:.1f}s")

    # multi-table OR composition at 8 planes
    for n_tables in (2, 4, 8):
        tables = [
            make_hyperplanes(dim, 8, seed=42 + 1000 * t) for t in range(n_tables)
        ]
        t0 = time.time()
        approx = topk_sets(lsh_topk_tables(emb, emb, tables, k=k))
        dt = time.time() - t0
        rec = recall_of(approx)
        row = {
            "planes": 8, "tables": n_tables, "recall": round(rec, 3),
            "sec": round(dt, 1),
        }
        report["topk"].append(row)
        print(f"lsh_topk_tables 8 planes x {n_tables}: recall@{k}={rec:.3f} {dt:.1f}s")

    # IVF probe path: candidate fraction ~nprobe/n_cells REGARDLESS of the
    # data distribution — the uncorrelated-data ANN tool (sign-LSH recall
    # decays as p^h there; see the table above).
    from ant_spark.operators.similarity import ivf_topk

    for n_cells, nprobe in ((8, 1), (8, 2), (8, 4), (16, 4)):
        cents = make_hyperplanes(dim, n_cells, seed=7)
        t0 = time.time()
        approx = topk_sets(ivf_topk(emb, emb, cents, k=k, nprobe=nprobe))
        dt = time.time() - t0
        rec = recall_of(approx)
        row = {
            "ivf_cells": n_cells, "nprobe": nprobe, "recall": round(rec, 3),
            "cand_frac": round(nprobe / n_cells, 3), "sec": round(dt, 1),
        }
        report["topk"].append(row)
        print(f"ivf_topk cells={n_cells} nprobe={nprobe}: recall@{k}={rec:.3f} "
              f"(~{nprobe}/{n_cells} of corpus probed) {dt:.1f}s")

    # near-dup pair recall: exact threshold pairs vs bucketed pairs.
    # threshold chosen at the ~99.9th percentile of the synthetic cosine
    # distribution so the exact set is non-trivial but bounded.
    from ant_spark.operators.similarity import cosine

    a = emb.select(F.col("vec_id").alias("da"), F.col("embedding").alias("va"))
    b = emb.select(F.col("vec_id").alias("db"), F.col("embedding").alias("vb"))
    allp = (
        a.crossJoin(b)
        .filter(F.col("da") < F.col("db"))
        .withColumn("_s", cosine(F.col("va"), F.col("vb")))
    )
    thr = allp.select(F.expr("percentile_approx(_s, 0.999)")).collect()[0][0]
    exact_pairs = {
        (r["da"], r["db"]) for r in allp.filter(F.col("_s") >= thr).collect()
    }
    report["near_dup"] = {"threshold": round(thr, 4), "exact_pairs": len(exact_pairs)}
    for n_planes in (4, 6, 8):
        planes = make_hyperplanes(dim, n_planes, seed=42)
        got = {
            (r["doc_a"], r["doc_b"])
            for r in cosine_near_dup_pairs(emb, planes, threshold=thr).collect()
        }
        rec = len(got & exact_pairs) / len(exact_pairs) if exact_pairs else 1.0
        report["near_dup"][f"planes_{n_planes}_recall"] = round(rec, 3)
        print(f"near_dup planes={n_planes}: pair recall={rec:.3f} "
              f"({len(got)} found / {len(exact_pairs)} exact @ cos>={thr:.3f})")

    # --- planted near-duplicates: the operator's actual use-case ----------
    # The synthetic corpus is near-uniform random (max cos ~0.49): neighbors
    # at θ≈68° give per-plane collision p = 1-θ/π ≈ 0.62, so recall ≈ p^h is
    # LOW by the LSH math — that's the honest story above. Deduplication
    # targets REAL near-dups (cos ≥ 0.95, θ ≤ 18°, p ≈ 0.90): plant 200 of
    # them and measure pair recall there, incl. OR-composed tables.
    import numpy as np

    rng = np.random.default_rng(7)
    base = emb.orderBy("vec_id").limit(200).collect()
    planted = []
    for r in base:
        v = np.array(r["embedding"], dtype=np.float64)
        g = rng.standard_normal(dim)
        g *= 0.18 * np.linalg.norm(v) / np.linalg.norm(g)
        planted.append((int(r["vec_id"]) + 1_000_000, [float(x) for x in (v + g)]))
    pl = spark.createDataFrame(planted, "vec_id long, embedding array<float>")
    corpus2 = emb.select("vec_id", "embedding").unionByName(pl)
    pl_pairs = {(int(r["vec_id"]), int(r["vec_id"]) + 1_000_000) for r in base}
    mean_cos = float(np.mean([
        r["cos_sim"] for r in cosine_near_dup_pairs(
            corpus2.filter(
                (F.col("vec_id") < 200) | (F.col("vec_id") >= 1_000_000)
            ),
            make_hyperplanes(dim, 1, seed=1), threshold=0.9,
        ).filter(F.col("doc_b") - F.col("doc_a") == 1_000_000).collect()
    ]))
    report["planted"] = {"n_pairs": len(pl_pairs), "mean_cos": round(mean_cos, 3)}
    print(f"planted {len(pl_pairs)} near-dup pairs, mean cos={mean_cos:.3f}")
    for n_planes in (4, 6, 8):
        for n_tables in (1, 2, 4):
            got: set = set()
            for t in range(n_tables):
                planes = make_hyperplanes(dim, n_planes, seed=42 + 1000 * t)
                got |= {
                    (r["doc_a"], r["doc_b"])
                    for r in cosine_near_dup_pairs(
                        corpus2, planes, threshold=0.9
                    ).collect()
                }
            rec = len(got & pl_pairs) / len(pl_pairs)
            report["planted"][f"p{n_planes}_t{n_tables}_recall"] = round(rec, 3)
            print(f"planted near_dup planes={n_planes} tables={n_tables}: "
                  f"recall={rec:.3f}")

    print("RESULT " + json.dumps(report))


if __name__ == "__main__":
    main()
