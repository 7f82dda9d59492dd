"""Trained vs random IVF centroids: recall@k at the same probe budget.

Measures whether data-driven (Lloyd k-means, similarity.train_centroids)
coarse cells beat the seeded random-hyperplane centroids at identical
nprobe/n_cells — the round-4 verdict item. Ground truth is brute-force
cosine top-k. Results recorded in BENCH.md next to the ann_recall tables.

Usage: python tools/ivf_trained_recall.py [sf_dir] [k]
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

    from ant_spark.operators.similarity import (
        brute_force_topk,
        ivf_topk,
        make_hyperplanes,
        train_centroids,
    )
    from ant_spark.session import get_spark

    spark = get_spark(
        app_name="ivf_trained_recall",
        master="local[32]",
        extra_conf={"spark.sql.shuffle.partitions": "32"},
    )
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").persist()
    n = emb.count()
    dim = len(emb.select("embedding").first()[0])

    def topk_sets(df):
        out = defaultdict(set)
        for r in df.collect():
            out[r["query_id"]].add(r["neighbor_id"])
        return out

    t0 = time.time()
    truth = topk_sets(brute_force_topk(emb, emb, k=k))
    print(f"{n} vectors dim {dim}; brute truth {time.time() - t0:.1f}s")

    def recall_of(approx):
        hits = tot = 0
        for q, tset in truth.items():
            hits += len(tset & approx.get(q, set()))
            tot += len(tset)
        return hits / tot if tot else 0.0

    rows = []
    for n_cells, nprobe in ((8, 1), (8, 2), (16, 4)):
        rand_c = make_hyperplanes(dim, n_cells, seed=7)
        t0 = time.time()
        rec_r = recall_of(topk_sets(ivf_topk(emb, emb, rand_c, k=k, nprobe=nprobe)))
        dt_r = time.time() - t0
        t0 = time.time()
        trained = train_centroids(emb, n_cells=n_cells, n_iter=5, seed=42)
        dt_train = time.time() - t0
        t0 = time.time()
        rec_t = recall_of(topk_sets(ivf_topk(emb, emb, trained, k=k, nprobe=nprobe)))
        dt_t = time.time() - t0
        row = {
            "cells": n_cells, "nprobe": nprobe,
            "recall_random": round(rec_r, 3), "recall_trained": round(rec_t, 3),
            "train_sec": round(dt_train, 1),
            "sec_random": round(dt_r, 1), "sec_trained": round(dt_t, 1),
        }
        rows.append(row)
        print(
            f"cells={n_cells} nprobe={nprobe}: random={rec_r:.3f} "
            f"trained={rec_t:.3f} (train {dt_train:.1f}s)"
        )
    print(json.dumps({"n": n, "k": k, "rows": rows}))


if __name__ == "__main__":
    main()
