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
    gopher_rules: bool = False,
    near_dup: str = "pairwise",
) -> tuple[DataFrame, DataFrame]:
    """→ (kept_docs, stats). ``kept_docs`` = (doc_id, lang_id, quality,
    n_tokens); ``stats`` = (stage, n) rejection lineage.

    ``hash_fn='xxhash64'`` switches the near-dup stage to 64-bit JVM hashes
    (the scale mode); 'md5' keeps the full chain DuckDB-oracle-reproducible.
    ``max_repetition`` drops docs whose duplicate k-gram fraction exceeds it
    (Gopher-style boilerplate rule); ``drop_pii`` drops docs whose
    content_flags has_pii fires; ``gopher_rules=True`` additionally
    requires the full integer-exact Gopher rule set
    (textops.gopher_quality_flags — word-count band, mean word length,
    symbol/bullet/ellipsis ratios, alpha fraction, stop words). All
    optional stages are per-row native exprs — they extend the codegen
    span, not the shuffle count.

    ``near_dup`` picks the drop policy over confirmed duplicate pairs:

    - ``'pairwise'`` (default): drop doc_b of every pair — one pass, but
      over-deletes on duplicate chains a-b, b-c (b AND c drop);
    - ``'components'``: cluster pairs via connected components and keep
      exactly one representative (min doc_id) per cluster — chain-correct,
      at the cost of the O(diameter) label-propagation rounds.
    """
    if near_dup not in ("pairwise", "components"):
        raise ValueError(f"near_dup must be 'pairwise' or 'components', got {near_dup!r}")
    enriched = docs.select(
        "doc_id",
        "text",
        T.language_id(F.col("text")).alias("lang_id"),
        T.quality_score(F.col("text")).alias("quality"),
        T.token_count(F.col("text")).alias("n_tokens"),
        T.fingerprint(F.col("text")).alias("fp"),
        T.repetition_score(F.col("text"), k).alias("_rep"),
        T.content_flags(F.col("text")).getField("has_pii").alias("_pii"),
        T.gopher_quality_flags(F.col("text")).getField("keep").alias("_gopher"),
    )

    lang_cond = F.col("lang_id").isin(*langs)
    row_cond = lang_cond & (F.col("quality") >= min_quality)
    if max_repetition is not None:
        row_cond = row_cond & (F.col("_rep") <= max_repetition)
    if drop_pii:
        row_cond = row_cond & ~F.col("_pii")
    if gopher_rules:
        row_cond = row_cond & F.col("_gopher")
    qual_ok = enriched.filter(row_cond)

    # exact dedup: keep the lowest doc_id per fingerprint
    from pyspark.sql import Window

    w = Window.partitionBy("fp").orderBy("doc_id")
    exact_kept = (
        qual_ok.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )

    # near-dup: minhash candidates → exact jaccard → confirmed pairs →
    # drop per `near_dup` policy. drop_ids is EAGERLY local-checkpointed
    # (tiny — ids only): the LSH+Jaccard subtree is the pipeline's
    # expensive part and both `kept` and the stats rollup reference it,
    # so it must compute ONCE; unlike a bare persist() the checkpoint
    # blocks release with the returned DataFrames (GC-cleaned), not at
    # session end — no cache leak per curate() call.
    pairs = T.minhash_candidate_pairs(
        exact_kept, "text", n_hashes, n_bands, k, hash_fn
    )
    confirmed = T.jaccard_pairs(exact_kept, pairs, "text", k).filter(
        F.col("jaccard") >= jaccard_threshold
    )
    if near_dup == "components":
        comp = T.connected_components(confirmed)  # checkpointed, ids only
        drop_ids = comp.filter(F.col("doc_id") != F.col("component")).select(
            "doc_id"
        )
    else:
        drop_ids = (
            confirmed.select(F.col("doc_b").alias("doc_id"))
            .distinct()
            .localCheckpoint(eager=True)
        )
    kept = exact_kept.join(drop_ids, "doc_id", "left_anti").select(
        "doc_id", "lang_id", "quality", "n_tokens"
    )

    # Stage counts in ONE conditional aggregation over the enrichment scan —
    # the stages are sequential filters over per-row predicates, so each
    # count is a conditional sum (and exact_unique a conditional distinct
    # count) instead of a separate count(*) job that would re-execute the
    # chain up to that stage (round-3 verdict: n('kept') re-ran the whole
    # LSH pass). kept = exact_unique − |drop_ids| exactly (drop_ids ⊆
    # exact_kept by construction).
    agg = enriched.agg(
        F.count("*").alias("input"),
        F.sum(lang_cond.cast("long")).alias("lang_ok"),
        F.sum(row_cond.cast("long")).alias("quality_ok"),
        F.count_distinct(F.when(row_cond, F.col("fp"))).alias("exact_unique"),
    )
    n_drop = drop_ids.agg(F.count("*").alias("n_dropped"))
    stats = agg.crossJoin(n_drop).select(
        F.expr(
            "stack(5, 'input', input, 'lang_ok', lang_ok, "
            "'quality_ok', quality_ok, 'exact_unique', exact_unique, "
            "'kept', exact_unique - n_dropped) AS (stage, n)"
        )
    )
    return kept, stats
