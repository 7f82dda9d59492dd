"""Document-curation pipeline: crawl output → training-set candidate table.

Composes the training-data operators into the standard pre-training curation
sequence, all native expressions end-to-end (one plan, no driver loops):

1. language filter (language_id ∈ wanted);
2. quality floor (quality_score ≥ min_quality);
3. exact dedup (md5 fingerprint, keep lowest doc_id per group);
4. near-dup removal (MinHash+LSH candidates → exact k-shingle Jaccard ≥
   threshold → drop the higher doc_id of each confirmed pair);
5. stats rollup for lineage (counts per rejection reason).

Scale shape: steps 1-2 are per-row (codegen); step 3 shuffles on the
fingerprint; step 4 shuffles on LSH band keys then joins pairs back —
both near-uniform keys. At 10^10 docs each shuffle is bucketable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ant_spark.operators import textops as T


def curate(
    docs: DataFrame,
    langs: tuple[str, ...] = ("en",),
    min_quality: float = 0.5,
    jaccard_threshold: float = 0.8,
    n_hashes: int = 8,
    n_bands: int = 4,
    k: int = 3,
    hash_fn: str = "md5",
    max_repetition: float | None = None,
    drop_pii: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """→ (kept_docs, stats). ``kept_docs`` = (doc_id, lang_id, quality,
    n_tokens); ``stats`` = (stage, n) rejection lineage.

    ``hash_fn='xxhash64'`` switches the near-dup stage to 64-bit JVM hashes
    (the scale mode); 'md5' keeps the full chain DuckDB-oracle-reproducible.
    ``max_repetition`` drops docs whose duplicate k-gram fraction exceeds it
    (Gopher-style boilerplate rule); ``drop_pii`` drops docs whose
    content_flags has_pii fires. Both optional stages are per-row native
    exprs — they extend the codegen span, not the shuffle count.
    """
    enriched = docs.select(
        "doc_id",
        "text",
        T.language_id(F.col("text")).alias("lang_id"),
        T.quality_score(F.col("text")).alias("quality"),
        T.token_count(F.col("text")).alias("n_tokens"),
        T.fingerprint(F.col("text")).alias("fp"),
        T.repetition_score(F.col("text"), k).alias("_rep"),
        T.content_flags(F.col("text")).getField("has_pii").alias("_pii"),
    )

    lang_ok = enriched.filter(F.col("lang_id").isin(*langs))
    qual_ok = lang_ok.filter(F.col("quality") >= min_quality)
    if max_repetition is not None:
        qual_ok = qual_ok.filter(F.col("_rep") <= max_repetition)
    if drop_pii:
        qual_ok = qual_ok.filter(~F.col("_pii"))

    # exact dedup: keep the lowest doc_id per fingerprint
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    exact_kept = (
        qual_ok.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # near-dup: minhash candidates → exact jaccard → drop higher doc_id
    pairs = T.minhash_candidate_pairs(
        exact_kept, "text", n_hashes, n_bands, k, hash_fn
    )
    confirmed = T.jaccard_pairs(exact_kept, pairs, "text", k).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    drop_ids = confirmed.select(F.col("doc_b").alias("doc_id")).distinct()
    kept = exact_kept.join(drop_ids, "doc_id", "left_anti").select(
        "doc_id", "lang_id", "quality", "n_tokens"
    )

    def n(df):
        return df.select(F.count("*").alias("n"))

    stats = (
        n(docs).withColumn("stage", F.lit("input"))
        .unionByName(n(lang_ok).withColumn("stage", F.lit("lang_ok")))
        .unionByName(n(qual_ok).withColumn("stage", F.lit("quality_ok")))
        .unionByName(n(exact_kept).withColumn("stage", F.lit("exact_unique")))
        .unionByName(n(kept).withColumn("stage", F.lit("kept")))
        .select("stage", "n")
    )
    return kept, stats
