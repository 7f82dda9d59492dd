"""Similarity search over embedding columns (array<float>).

Two paths, per the scale ladder:
- **brute-force cosine top-k** — the correctness baseline: cross-join query
  rows against the corpus, dot products via native ``F.zip_with`` +
  ``F.aggregate`` (whole-stage codegen, no Python), window top-k per query.
  O(Q·N) — fine for Q small; the oracle (DuckDB list_* functions) verifies
  values.
- **random-hyperplane LSH buckets** — the scale path: h deterministic
  hyperplanes (seeded, generated on the driver, shipped as literals) give a
  h-bit signature; candidates share a bucket; exact cosine re-rank inside
  buckets only. The bucket join shuffles on the signature key instead of
  cross-joining, turning O(Q·N) into O(Q·N/2^h) expected.
- **embedding-cosine near-dup**: all pairs above a cosine threshold within
  LSH buckets (the embedding analogue of minhash near-dup).
- **multi-table LSH** (``lsh_topk_tables``): OR-composed plane sets — the
  recall lever for near-dup search (measured in tools/ann_recall.py).
- **IVF probe** (``ivf_assign`` + ``ivf_topk``): coarse cells + nprobe
  nearest-cell search — the ANN tool for UNCORRELATED vectors, where
  sign-LSH recall decays as p^h (BENCH.md recall tables separate the two
  regimes).
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ with left-to-right accumulation (matches the SQL oracle's
    list_dot_product evaluation order for reproducible floats)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _py_norm(vec: list[float]) -> float:
    """Driver-side norm of a literal vector with EXACTLY the accumulation
    order of ``norm`` (left-to-right acc += x*x, then sqrt): Python floats
    are IEEE doubles and Java's Math.sqrt is correctly rounded, so the
    result is bit-identical to evaluating ``norm(lit_array)`` per row —
    which Catalyst does NOT constant-fold (higher-order functions are
    non-foldable), i.e. without this every row paid the constant norm."""
    import math

    acc = 0.0
    for x in vec:
        acc += float(x) * float(x)
    return math.sqrt(acc)


def cosine_pre(a: Column, b: Column, na: Column, nb: Column) -> Column:
    """cosine with PRE-COMPUTED norms: dot/(na*nb) — same operations in the
    same order as ``cosine`` (bit-identical), but the norms are evaluated
    once per ROW (projection) instead of once per candidate PAIR (r7: the
    bucket/cross joins paid 2 full-vector norm aggregates per pair)."""
    return dot(a, b) / (na * nb)


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Top-k cosine neighbours per query (excluding self by id).

    Output: (query_id, neighbor_id, rank, cos_sim rounded 4dp). Ranking uses
    full precision; ties break on neighbor_id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        q.crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_sim",
            cosine_pre(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_sim"), 4).alias("cos_sim"),
        )
    )


def make_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic random hyperplanes (driver-side, shipped as literals —
    both to the Spark plan and to the SQL oracle string)."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in rng.standard_normal(dim)] for _ in range(n_planes)]


def lsh_signature(vec_col: Column, planes: list[list[float]]) -> Column:
    """Sign-bit signature as a bigint bucket key."""
    acc = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(x) for x in p])
        bit = F.when(dot(vec_col, plane) >= 0, F.lit(1).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        acc = acc + F.shiftleft(bit, i)
    return acc


def lsh_topk(
    queries: DataFrame,
    corpus: DataFrame,
    planes: list[list[float]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """ANN top-k: exact cosine re-rank *within* the query's LSH bucket.

    Recall < 1 by construction (that's the approximation); the bucket join
    replaces the cross join — at 10^10 vectors the corpus side is written
    bucketed by ``bucket`` so the probe is storage-partitioned.
    """
    sig = lambda df, idn, vn, nn: df.select(
        F.col(id_col).alias(idn),
        F.col(vec_col).alias(vn),
        norm(F.col(vec_col)).alias(nn),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    q = sig(queries, "query_id", "_qv", "_qn")
    c = sig(corpus, "neighbor_id", "_cv", "_cn")
    scored = (
        q.join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_sim",
            cosine_pre(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_sim"), 4).alias("cos_sim"),
        )
    )


def lsh_topk_tables(
    queries: DataFrame,
    corpus: DataFrame,
    tables: list[list[list[float]]],
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Multi-table (OR-composed) LSH ANN: the standard recall lever — a
    candidate passes if it shares a bucket with the query in ANY of the
    ``tables`` independent plane sets, then exact cosine re-ranks the union
    (Indyk/Motwani LSH; recall grows as 1-(1-p^h)^T while the candidate set
    stays ~T·N/2^h). Each table's join shuffles only on its own bucket key;
    the candidate union is distinct-ed on (query_id, neighbor_id) BEFORE
    the cosine re-rank so duplicates don't pay the dot product.

    Recall/latency trade-off measured in tools/ann_recall.py (BENCH.md)."""
    cand = None
    for t, planes in enumerate(tables):
        q = queries.select(
            F.col(id_col).alias("query_id"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
        c = corpus.select(
            F.col(id_col).alias("neighbor_id"),
            lsh_signature(F.col(vec_col), planes).alias("bucket"),
        )
        p = q.join(c, "bucket").select("query_id", "neighbor_id")
        cand = p if cand is None else cand.unionByName(p)
    cand = cand.filter(F.col("query_id") != F.col("neighbor_id")).distinct()
    qv = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    cv = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        norm(F.col(vec_col)).alias("_cn"),
    )
    scored = (
        cand.join(qv, "query_id")
        .join(cv, "neighbor_id")
        .withColumn(
            "_sim",
            cosine_pre(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_sim"), 4).alias("cos_sim"),
        )
    )


def cosine_near_dup_pairs(
    corpus: DataFrame,
    planes: list[list[float]],
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold within LSH buckets.

    Returns (doc_a, doc_b, cos_sim) with doc_a < doc_b. The bucket
    restriction bounds the pair blow-up; multiple plane sets (OR-composed)
    raise recall when needed.
    """
    c = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("_n"),
        lsh_signature(F.col(vec_col), planes).alias("bucket"),
    )
    a = c.select(
        F.col("id").alias("doc_a"), F.col("v").alias("_va"),
        F.col("_n").alias("_na"), "bucket",
    )
    b = c.select(
        F.col("id").alias("doc_b"), F.col("v").alias("_vb"),
        F.col("_n").alias("_nb"), "bucket",
    )
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn(
            "_sim",
            cosine_pre(
                F.col("_va"), F.col("_vb"), F.col("_na"), F.col("_nb")
            ),
        )
        .filter(F.col("_sim") >= threshold)
        .select(
            "doc_a", "doc_b", F.round(F.col("_sim"), 4).alias("cos_sim")
        )
    )


def ivf_topk(
    queries: DataFrame,
    corpus: DataFrame,
    centroids: list[list[float]],
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF ANN top-k: coarse-quantize the corpus once (``ivf_assign``),
    probe each query's ``nprobe`` nearest cells, exact-cosine re-rank the
    probed candidates. The candidate set is ~nprobe/n_cells of the corpus
    regardless of data distribution — the right scale tool for
    UNCORRELATED vectors where sign-LSH recall decays as p^h
    (tools/ann_recall.py measures both). At 10^10 vectors the corpus is
    written partitioned by ``cell`` so each probe reads only its cells.

    Ties rank (cos desc, cell asc) / (cos desc, neighbor_id asc) —
    deterministic and oracle-reproducible.
    """
    spark = queries.sparkSession
    cent_rows = [(i, [float(x) for x in c]) for i, c in enumerate(centroids)]
    cents = spark.createDataFrame(cent_rows, "cell int, cvec array<double>")
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        norm(F.col(vec_col)).alias("_qn"),
    )
    # probe selection: Q × n_cells tiny cross join (the centroid dim is
    # driver-known small — broadcast), rank cells per query; centroid norms
    # ride as a broadcast column (once per centroid, not per pair)
    cents = cents.withColumn("_cvn", norm(F.col("cvec")))
    wq = Window.partitionBy("query_id").orderBy(
        F.col("_csim").desc(), F.col("cell")
    )
    probes = (
        q.crossJoin(F.broadcast(cents))
        .withColumn(
            "_csim",
            cosine_pre(
                F.col("_qv"), F.col("cvec"), F.col("_qn"), F.col("_cvn")
            ),
        )
        .withColumn("_crk", F.row_number().over(wq))
        .filter(F.col("_crk") <= nprobe)
        .select("query_id", "_qv", "_qn", "cell")
    )
    # ONE corpus scan: ivf_assign carries the vector through (keep_vec), so
    # the probe path needs no second scan + id-keyed shuffle to recover it
    # (round-3 verdict nit). At 10^10 vectors, read the cell-partitioned
    # table written from this same projection instead.
    c = ivf_assign(corpus, centroids, id_col, vec_col, keep_vec=True).select(
        F.col("id").alias("neighbor_id"), "cell", F.col("v").alias("_cv"),
        norm(F.col("v")).alias("_cn"),
    )
    scored = (
        probes.join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn(
            "_sim",
            cosine_pre(
                F.col("_qv"), F.col("_cv"), F.col("_qn"), F.col("_cn")
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("_sim").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            F.round(F.col("_sim"), 4).alias("cos_sim"),
        )
    )


def train_centroids(
    corpus: DataFrame,
    n_cells: int,
    n_iter: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> list[list[float]]:
    """Spark-native Lloyd k-means for data-driven IVF coarse centroids.

    Each iteration is ONE distributed pass: assign every vector to its
    nearest current centroid (``ivf_assign`` — the linear-array argmax,
    all codegen, centroids shipped as literals), then recompute cell means
    with a single map-side-combinable groupBy-agg (``posexplode(v)`` →
    ``avg`` per (cell, dim)). Only the k·dim centroid floats ever reach
    the driver — no driver-side loop touches corpus rows. Initialization
    is deterministic (seeded ``make_hyperplanes``); empty cells keep their
    previous centroid.

    Scale: cost is ``n_iter`` corpus scans; at 10^10 vectors pass
    ``sample_fraction`` — coarse centroids only need the density shape,
    and k-means on a uniform sample converges to the same cells. The
    returned list plugs straight into ``ivf_assign``/``ivf_topk`` (and,
    frozen as literals, into the SQL oracle).

    NOTE: distributed float ``avg`` is not bit-deterministic across
    partitionings — freeze (round + commit) trained centroids before
    using them in an oracle-checked query (tools/train_ivf.py).
    """
    df = corpus.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
    if sample_fraction is not None:
        df = df.sample(fraction=sample_fraction, seed=seed)
    head = df.select(F.size("v").alias("d")).first()
    if head is None:
        raise ValueError("train_centroids: empty corpus")
    dim = int(head["d"])
    cents = make_hyperplanes(dim, n_cells, seed)
    df = df.persist()
    try:
        for _ in range(n_iter):
            assigned = ivf_assign(df, cents, id_col="id", vec_col="v", keep_vec=True)
            means = (
                assigned.select("cell", F.posexplode("v").alias("pos", "val"))
                .groupBy("cell", "pos")
                .agg(F.avg("val").alias("m"))
                .collect()
            )
            by_cell: dict[int, dict[int, float]] = {}
            for r in means:
                by_cell.setdefault(r["cell"], {})[r["pos"]] = r["m"]
            cents = [
                [float(by_cell[c][p]) for p in range(dim)]
                if c in by_cell
                else list(cents[c])
                for c in range(n_cells)
            ]
    finally:
        df.unpersist()
    return cents


def ivf_assign(
    corpus: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    keep_vec: bool = False,
) -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (literal centroid list — at scale, k-means output broadcast as literals
    or a small joined dim). Output (id, cell, cos_to_centroid), plus the
    vector itself as ``v`` when ``keep_vec`` (lets ivf_topk re-rank without
    a second corpus scan — this is also the projection to WRITE when
    materializing the cell-partitioned corpus table).

    Argmax is the LINEAR array formulation — sims array + array_max +
    first-index — because a when(sim > best, ...).otherwise(best) fold
    embeds the previous best TWICE per step, an O(2^n_centroids) expression
    tree that OOMs the driver past ~12 centroids (found at 16 in
    tools/ann_recall.py). array_position returns the FIRST index of the
    max, preserving the first-wins tie semantics of the oracle's CASE."""
    out = corpus.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        norm(F.col(vec_col)).alias("_vn"),
    )
    # centroid norms are constants, but norm(lit_array) is a higher-order
    # function Catalyst cannot constant-fold — every row paid n_centroids
    # constant norm aggregates. _py_norm reproduces the accumulation
    # bit-for-bit on the driver; the row norm is hoisted to one column.
    sims = F.array(
        *[
            cosine_pre(
                F.col("v"),
                F.array(*[F.lit(x) for x in cvec]),
                F.col("_vn"),
                F.lit(_py_norm(cvec)),
            )
            for cvec in centroids
        ]
    )
    out = out.withColumn("_sims", sims)
    best = F.array_max(F.col("_sims"))
    cell = (F.array_position(F.col("_sims"), best) - 1).cast("int")
    cols = [
        F.col("id"),
        cell.alias("cell"),
        F.round(best, 4).alias("cos_to_centroid"),
    ]
    if keep_vec:
        cols.append(F.col("v"))
    return out.select(*cols)
