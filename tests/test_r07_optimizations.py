"""Round-7 optimization equivalence pins.

Every optimization that changed an operator's INTERNALS keeps a test here
asserting the fast path equals its reference formulation on adversarial
inputs (NULL/empty/short text, duplicate shingles, tie cases, multi-band
collisions). The DuckDB oracle sweep covers the end-to-end values; these
pin the internal equivalences directly so a future refactor can't drift
one path without tripping a focused failure.
"""

import sys

sys.path.insert(0, "/root/repo")

import pytest
from pyspark.sql import functions as F


EDGE_TEXTS = [
    (1, "the cat and the hat is on the mat and the cat sat"),
    (2, ""),
    (3, None),
    (4, "one two"),
    (5, "  padded   whitespace  runs   here  "),
    (6, "solo"),
    (7, "a b c a b c a b c a b c a b c"),  # heavy duplicate shingles
    (8, "der die und nicht das le les des est une"),  # lang tie material
    (9, "x " * 200),  # long repetitive
    (10, "Ünïcode wörds façade naïve …ellipsis… #tag ... dots"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(EDGE_TEXTS, "doc_id long, text string")


def test_shingle_rows_equals_exploded_ngram_shingles(spark, docs):
    """The zero-lambda explode path emits exactly posexplode(ngram_shingles)."""
    from ant_spark.operators import textops as T

    ref = docs.select(
        "doc_id",
        F.posexplode(T.ngram_shingles(F.col("text"), 3)).alias("pos", "sh"),
    )
    fast = T.shingle_rows(docs, "text", 3)
    assert sorted(map(tuple, ref.collect())) == sorted(
        map(tuple, fast.collect())
    )


def test_ngram_shingles_matches_legacy_transform_form(spark, docs):
    """arrays_zip construction == the pre-r7 transform(sequence, slice)."""
    from ant_spark.operators import textops as T

    def legacy(text_col, k=3):
        w = F.split(T.normalized_text(text_col), " ")
        n = F.size(w)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(0), n - k),
                lambda i: F.concat_ws(" ", F.slice(w, i + 1, k)),
            ),
        ).otherwise(F.array(F.concat_ws(" ", w)))

    for k in (2, 3, 13):
        out = docs.select(
            T.ngram_shingles(F.col("text"), k).alias("new"),
            legacy(F.col("text"), k).alias("old"),
        ).collect()
        for r in out:
            assert r["new"] == r["old"], (k, r)


def test_repetition_score_single_pass_matches_naive(spark, docs):
    """_let_arr-bound repetition == the naive 3-reference formulation."""
    from ant_spark.operators import textops as T

    def naive(text_col, k=3):
        sh = T.ngram_shingles(text_col, k)
        total = F.size(sh)
        uniq = F.size(F.array_distinct(sh))
        return F.when(
            total > 0, F.round(F.lit(1.0) - uniq / total, 4)
        ).otherwise(F.lit(0.0))

    out = docs.select(
        T.repetition_score(F.col("text"), 3).alias("new"),
        naive(F.col("text"), 3).alias("old"),
    ).collect()
    for r in out:
        assert r["new"] == r["old"], r


def test_language_id_argmax_matches_case_chain(spark, docs):
    """array_position argmax == the pre-r7 greatest+CASE chain, incl. the
    NULL-text → 'und' policy and LANG_ORDER tie-breaks."""
    from ant_spark.operators.textops import (
        LANG_MARKERS, LANG_ORDER, language_id, marker_hits,
    )

    def legacy(text_col):
        scores = {
            lang: marker_hits(text_col, m) for lang, m in LANG_MARKERS.items()
        }
        best = F.greatest(*[scores[lang] for lang in LANG_ORDER])
        expr = F.when(best <= 0, F.lit("und"))
        for lang in LANG_ORDER:
            expr = expr.when(scores[lang] == best, F.lit(lang))
        return expr.otherwise(F.lit("und"))

    out = docs.select(
        language_id(F.col("text")).alias("new"),
        legacy(F.col("text")).alias("old"),
    ).collect()
    for r in out:
        assert r["new"] == r["old"], r


def test_simhash_bit_probe_matches_modulo_form(spark, docs):
    """(h>>b)&1 == ((h>>b)%2)==1 over the whole simhash pipeline."""
    from ant_spark.operators import textops as T

    def legacy_flat(d):
        toks = d.select(
            F.col("doc_id"),
            F.explode(
                F.array_distinct(
                    F.split(T.normalized_text(F.col("text")), " ")
                )
            ).alias("tok"),
        )
        h = F.conv(
            F.substring(F.md5(F.col("tok")), 1, 15), 16, 10
        ).cast("long")
        bits = toks.select(
            "doc_id",
            *[
                ((F.shiftright(h, b) % 2) == 1).cast("long").alias(f"b{b}")
                for b in range(60)
            ],
        )
        agg = bits.groupBy("doc_id").agg(
            F.count("*").alias("n"),
            *[F.sum(f"b{b}").alias(f"b{b}") for b in range(60)],
        )
        acc = F.lit(0).cast("long")
        for b in range(60):
            bit = F.when(
                F.col(f"b{b}") * 2 > F.col("n"), F.lit(1).cast("long")
            ).otherwise(F.lit(0).cast("long"))
            acc = acc + F.shiftleft(bit, b)
        return agg.select("doc_id", acc.alias("simhash"))

    new = {r["doc_id"]: r["simhash"] for r in T.simhash64_flat(docs).collect()}
    old = {r["doc_id"]: r["simhash"] for r in legacy_flat(docs).collect()}
    assert new == old


def test_salted_simhash_pairs_match_unsalted_distinct_form(spark):
    """The 8x8 grid-salted, first-agreeing-band join emits exactly the
    unsalted join's distinct pair set — and emits each pair ONCE."""
    from ant_spark.operators import textops as T

    # clusters of near-identical docs → hot band buckets + multi-band hits
    rows = [(i, "the quick brown fox jumps over the lazy dog " + ("x" if i % 7 == 0 else "")) for i in range(60)]
    rows += [(100 + i, f"completely different text number {i} with words") for i in range(20)]
    d = spark.createDataFrame(rows, "doc_id long, text string")

    fast = T.simhash_near_dup_pairs(d, "text", max_hamming=3, n_bands=4)
    fast_rows = [tuple(r) for r in fast.collect()]
    # once each: no duplicates even without a distinct
    assert len(fast_rows) == len(set(fast_rows))

    # reference: unsalted banded join + distinct
    sims = T.simhash64_flat(d, "text")
    width, mask = 15, (1 << 15) - 1
    band_cols = [
        (
            F.shiftrightunsigned(F.col("simhash"), width * b).bitwiseAND(
                F.lit(mask)
            )
        ).alias(f"k{b}")
        for b in range(4)
    ]
    banded = sims.select("doc_id", "simhash", *band_cols).unpivot(
        ["doc_id", "simhash"], [f"k{b}" for b in range(4)],
        "band_idx", "band_key",
    )
    a, b = banded.alias("a"), banded.alias("b")
    ref = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= 3)
        .distinct()
    )
    assert set(fast_rows) == {tuple(r) for r in ref.collect()}


def test_cosine_pre_bit_identical_to_cosine(spark):
    """Hoisted-norm cosine == per-pair cosine to the last bit (same ops,
    same IEEE order)."""
    import random

    from ant_spark.operators.similarity import (
        _py_norm, cosine, cosine_pre, norm,
    )

    random.seed(7)
    vecs = [
        (i, [random.uniform(-1, 1) for _ in range(16)]) for i in range(30)
    ]
    d = spark.createDataFrame(vecs, "id long, v array<double>")
    a = d.select(F.col("id").alias("ia"), F.col("v").alias("va"),
                 norm(F.col("v")).alias("na"))
    b = d.select(F.col("id").alias("ib"), F.col("v").alias("vb"),
                 norm(F.col("v")).alias("nb"))
    j = a.crossJoin(b).filter(F.col("ia") < F.col("ib"))
    out = j.select(
        cosine(F.col("va"), F.col("vb")).alias("ref"),
        cosine_pre(
            F.col("va"), F.col("vb"), F.col("na"), F.col("nb")
        ).alias("fast"),
    ).collect()
    for r in out:
        assert r["ref"] == r["fast"]  # exact, not approx

    # _py_norm == Spark-evaluated norm on literal vectors, bit for bit
    for _, v in vecs[:5]:
        spark_val = spark.range(1).select(
            norm(F.array(*[F.lit(x) for x in v])).alias("n")
        ).collect()[0]["n"]
        assert spark_val == _py_norm(v)


def test_pagerank_materialize_edges_flag_is_result_invariant(spark):
    from ant_spark.operators.graphops import pagerank

    edges = spark.createDataFrame(
        [(i % 7, (i * 3) % 7) for i in range(50) if i % 7 != (i * 3) % 7],
        "src long, dst long",
    )
    on = {(r["id"], r["rank_scaled"])
          for r in pagerank(edges, n_iter=3, materialize_edges=True).collect()}
    off = {(r["id"], r["rank_scaled"])
           for r in pagerank(edges, n_iter=3, materialize_edges=False).collect()}
    assert on == off


def test_gopher_literal_counts_match_regex_form(spark, docs):
    """replace()+length-delta symbol counts == regexp_extract_all counts."""
    from ant_spark.operators.textops import gopher_quality_flags

    t = F.coalesce(F.col("text"), F.lit(""))
    legacy_symbols = (
        F.size(F.regexp_extract_all(t, F.lit(r"#"), 0))
        + F.size(F.regexp_extract_all(t, F.lit("\\.\\.\\.|…"), 0))
    )
    # the struct only exposes symbol_ok; compare the raw counts directly
    n_len = F.length(t)
    n_hash = n_len - F.length(F.replace(t, F.lit("#")))
    n_dots = n_len - F.length(F.replace(t, F.lit("...")))
    n_ell = n_len - F.length(F.replace(t, F.lit("…")))
    fast_symbols = n_hash + F.floor(n_dots / 3).cast("int") + n_ell
    out = docs.select(
        legacy_symbols.alias("old"), fast_symbols.alias("new"),
        gopher_quality_flags(F.col("text")).alias("g"),
    ).collect()
    for r in out:
        assert r["old"] == r["new"], r
