"""Text-analysis + dedup-family operators over a small in-memory corpus."""

import pytest
from pyspark.sql import functions as F

from ant_spark.operators import textops as T

DOCS = [
    (0, "The quick brown fox and the lazy dog of the north is to be seen."),
    (1, "Der Hund und die Katze, das ist nicht der Fall und die Regel."),
    (2, "Le chat et les chiens est une des merveilles, les voila."),
    (3, "El perro y los gatos es una de las maravillas, los aqui."),
    (4, "xyzzy plugh qwerty"),  # no markers → und
    (5, "The quick brown fox and the lazy dog of the north is to be seen."),  # dup of 0
    (6, "The quick brown fox and the lazy dog of the north is to be SEEN."),  # near-dup
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_language_id(spark, docs):
    got = {
        r["doc_id"]: r["lang"]
        for r in docs.select(
            "doc_id", T.language_id(F.col("text")).alias("lang")
        ).collect()
    }
    assert got[0] == "en" and got[1] == "de" and got[2] == "fr" and got[3] == "es"
    assert got[4] == "und"


def test_quality_and_tokens(spark, docs):
    rows = docs.select(
        "doc_id",
        T.quality_score(F.col("text")).alias("q"),
        T.token_count(F.col("text")).alias("tok"),
        T.n_words(F.col("text")).alias("w"),
    ).collect()
    by = {r["doc_id"]: r for r in rows}
    assert 0.0 <= by[0]["q"] <= 1.0
    assert by[0]["q"] > by[4]["q"]  # english prose beats gibberish
    assert by[4]["w"] == 3 and by[4]["tok"] == 3
    # punctuation counts as separate BPE-ish tokens
    assert by[1]["tok"] > by[1]["w"]


def test_fingerprint_exact_dups(spark, docs):
    groups = T.exact_dup_groups(docs).collect()
    assert len(groups) == 1
    # fingerprint normalizes case: doc 6 ('SEEN.') collapses with 0 and 5
    assert groups[0]["doc_ids"] == [0, 5, 6]


def test_fingerprint_case_insensitive(spark, docs):
    # fingerprint lowercases: doc 6 only differs by case → same fp as 0
    fps = {
        r["doc_id"]: r["fp"]
        for r in docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp")).collect()
    }
    assert fps[0] == fps[5] == fps[6]


def test_shingles_and_jaccard(spark, docs):
    pairs = spark.createDataFrame([(0, 5), (0, 4)], "doc_a long, doc_b long")
    out = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in T.jaccard_pairs(docs, pairs, "text", k=3).collect()
    }
    assert out[(0, 5)] == 1.0  # identical docs
    assert out[(0, 4)] == 0.0  # disjoint docs


def test_minhash_lsh_finds_dups(spark, docs):
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in T.minhash_candidate_pairs(
            docs, "text", n_hashes=8, n_bands=4, k=3
        ).collect()
    }
    assert (0, 5) in pairs  # exact dup always collides
    assert (0, 6) in pairs  # case-only near-dup (identical after normalize)
    assert (0, 4) not in pairs  # disjoint never collides (8 md5 minima differ)


def test_simhash_near_dup_distance(spark, docs):
    sh = {
        r["doc_id"]: r["simhash"] for r in T.simhash64_flat(docs, "text").collect()
    }
    assert sh[0] == sh[5] == sh[6]  # identical token sets
    # the flat (scale) variant must equal the column-expr executable spec
    spec = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", T.simhash64_slow_colexpr(F.col("text")).alias("sh")
        ).collect()
    }
    assert sh == spec


def test_simhash_near_dup_pairs_banded(spark, docs):
    """Banded simhash pair generation: identical-fingerprint docs pair at
    hamming 0; the band join result equals a brute-force hamming filter
    (the pigeonhole guarantee holds exactly for max_hamming <= bands-1)."""
    import pytest as _pytest

    got = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in T.simhash_near_dup_pairs(docs, "text", max_hamming=3).collect()
    }
    assert got[(0, 5)] == 0 and got[(0, 6)] == 0 and got[(5, 6)] == 0
    # brute-force reference over all pairs
    sh = {r["doc_id"]: r["simhash"] for r in T.simhash64_flat(docs, "text").collect()}
    ids = sorted(sh)
    brute = {
        (a, b): bin(sh[a] ^ sh[b]).count("1")
        for i, a in enumerate(ids)
        for b in ids[i + 1:]
        if bin(sh[a] ^ sh[b]).count("1") <= 3
    }
    assert got == brute
    with _pytest.raises(ValueError):
        T.simhash_near_dup_pairs(docs, "text", max_hamming=4, n_bands=4)


def test_minhash_xxhash64_mode_matches_md5_pairs(spark, docs):
    """hash_fn='xxhash64' (scale mode) finds the same guaranteed collisions
    as the md5 oracle mode on exact/normalized dups."""
    pairs = {
        (r["doc_a"], r["doc_b"])
        for r in T.minhash_candidate_pairs(
            docs, "text", n_hashes=8, n_bands=4, k=3, hash_fn="xxhash64"
        ).collect()
    }
    assert (0, 5) in pairs
    assert (0, 6) in pairs
    assert (0, 4) not in pairs


def test_hamming(spark):
    df = spark.createDataFrame([(0b1011, 0b0010)], "a long, b long")
    assert df.select(T.hamming64(F.col("a"), F.col("b")).alias("h")).collect()[0][
        "h"
    ] == 2


def test_winnow_fingerprints_guarantee(spark):
    """Winnowing guarantee (Schleimer et al.): any shared token run of
    length >= w + k - 1 produces at least one shared fingerprint; disjoint
    texts share none."""
    import pandas as pd

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 >= 4+3-1
    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2],
            "text": [
                "one two three " + shared + " four five six",
                "seven eight " + shared + " nine ten eleven twelve",
                "completely different words everywhere nothing matches here at all",
            ],
        }
    )
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    fps = T.winnow_fingerprints(docs, "text", k=3, w=4)
    by_doc = {}
    for r in fps.collect():
        by_doc.setdefault(r["doc_id"], set()).add(r["fp"])
    assert by_doc[0] & by_doc[1], "shared run produced no shared fingerprint"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])
    # density: selected fingerprints are a strict subset of all shingles
    n_shingles = docs.selectExpr(
        "size(split(trim(regexp_replace(lower(text), '\\\\s+', ' ')), ' ')) AS n"
    ).collect()
    assert all(len(v) > 0 for v in by_doc.values())


def test_pack_plan_invariants(spark):
    """Concat-and-chunk packing: offsets stay < capacity, packs are dense
    per group, window spans match token counts."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1, 2, 3],
            "source": ["a", "a", "a", "b"],
            "text": ["one two three", "four five", "w " * 20, "solo"],
        }
    )
    docs = spark.createDataFrame(rows, schema="doc_id long, source string, text string")
    out = {r["doc_id"]: r for r in T.pack_plan(docs, capacity=8).collect()}
    assert out[0]["start_pack"] == 0 and out[0]["offset"] == 0
    assert out[1]["start_pack"] == 0 and out[1]["offset"] == 3
    # doc 2: 20 tokens starting at cum 5 -> spans windows 0..3
    assert out[2]["start_pack"] == 0 and out[2]["n_windows"] == 4
    # group b starts fresh
    assert out[3]["start_pack"] == 0 and out[3]["offset"] == 0
    assert all(r["offset"] < 8 for r in out.values())


def test_pack_plan_sharded_matches_single_window(spark):
    """The two-pass sharded cumsum must be bit-identical to a one-shard run
    (shard_size larger than every doc_id) — shard boundaries mid-group, a
    group entirely inside one shard, and sparse doc_ids all covered."""
    import pandas as pd

    rows = pd.DataFrame(
        {
            # sparse, shard boundary (size 4) splits group a at doc_id 4, 8
            "doc_id": [0, 1, 3, 4, 6, 9, 11, 100, 101],
            "source": ["a", "a", "a", "a", "a", "a", "b", "b", "a"],
            "text": [f"w " * (3 + i) for i in range(9)],
        }
    )
    docs = spark.createDataFrame(rows, schema="doc_id long, source string, text string")
    one = sorted(map(tuple, T.pack_plan(docs, capacity=7, shard_size=1 << 20).collect()))
    sharded = sorted(map(tuple, T.pack_plan(docs, capacity=7, shard_size=4).collect()))
    assert one == sharded
    # scale invariant: no window over a bare group partition — every Window
    # in the plan carries the _shard key except the tiny per-shard offset
    # pass, which windows over the AGGREGATED one-row-per-shard table.
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        T.pack_plan(docs, capacity=7, shard_size=4).explain()
    plan = buf.getvalue()
    data_windows = [
        ln for ln in plan.splitlines()
        if "Window [" in ln
        and "_shard" not in ln.split("], [")[1]  # partition spec
        and "_shard_tot" not in ln  # the tiny per-shard offset window
    ]
    assert not data_windows, f"unsharded data window in plan: {data_windows}"


def test_content_flags(spark):
    import pandas as pd

    rows = pd.DataFrame(
        {
            "doc_id": [0, 1],
            "text": [
                "reach me at a.b+spam@test-mail.org or +15551234567 "
                "and https://x.test/y?z=1 ok",
                "clean text with no signals",
            ],
        }
    )
    docs = spark.createDataFrame(rows, schema="doc_id long, text string")
    out = {
        r["doc_id"]: r["f"]
        for r in docs.select("doc_id", T.content_flags(F.col("text")).alias("f")).collect()
    }
    assert out[0]["n_emails"] == 1 and out[0]["n_urls"] == 1
    assert out[0]["n_phones"] == 1 and out[0]["has_pii"]
    assert out[1]["n_emails"] == 0 and not out[1]["has_pii"]


def test_repetition_score(spark):
    docs = spark.createDataFrame(
        [
            (0, "spam spam spam spam spam spam"),  # one distinct 3-gram
            (1, "all these words appear exactly once here"),
            (2, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["rep"]
        for r in docs.select(
            "doc_id", T.repetition_score(F.col("text"), k=3).alias("rep")
        ).collect()
    }
    assert out[0] == 0.75  # 4 shingles, 1 distinct
    assert out[1] == 0.0
    assert out[2] == 0.0


def test_content_flags_null_text(spark):
    """NULL text must yield concrete zeros, not NULLs — a NULL has_pii row
    would vanish from both has_pii and NOT has_pii filters."""
    docs = spark.createDataFrame([(0, None)], "doc_id long, text string")
    r = docs.select(T.content_flags(F.col("text")).alias("f")).collect()[0]["f"]
    assert r["n_emails"] == 0 and r["n_urls"] == 0 and r["n_phones"] == 0
    assert r["has_pii"] is False


def test_pack_plan_random_vs_reference(spark):
    """300 random docs across 5 sources vs a pure-Python cumsum reference
    of the concat-and-chunk layout."""
    import re

    import numpy as np
    import pandas as pd

    rng = np.random.default_rng(11)
    words = ["alpha", "beta", "x9", "no!", "gamma", "d-e", "f"]
    rows = []
    for i in range(300):
        text = " ".join(words[rng.integers(len(words))] for _ in range(int(rng.integers(0, 40))))
        rows.append({"doc_id": i, "source": f"s{int(rng.integers(5))}", "text": text})
    pdf = pd.DataFrame(rows)
    docs = spark.createDataFrame(pdf, schema="doc_id long, source string, text string")

    cap = 16
    tok = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")
    expect = {}
    for src, grp in pdf.groupby("source"):
        cum = 0
        for _, r in grp.sort_values("doc_id").iterrows():
            n = len(tok.findall(r["text"]))
            start = cum // cap
            off = cum % cap
            n_win = (cum + max(n - 1, 0)) // cap - start + 1
            expect[r["doc_id"]] = (r["source"], n, start, off, n_win)
            cum += n

    got = {
        r["doc_id"]: (r["source"], r["n_tokens"], r["start_pack"], r["offset"], r["n_windows"])
        for r in T.pack_plan(docs, capacity=cap).collect()
    }
    assert got == expect


def test_sample_mix_exact_quotas_and_determinism(spark):
    """Stratified mix sampler: exact per-group quotas, quota>group keeps the
    whole group, unlisted groups are dropped, the pick is stable under
    repartitioning, and the quota-literal window gets the map-side
    WindowGroupLimit pruning."""
    import io
    from contextlib import redirect_stdout

    from ant_spark.operators.textops import sample_mix

    rows = [(i, f"s{i % 3}", f"text {i}") for i in range(60)]
    docs = spark.createDataFrame(rows, "doc_id long, source string, text string")
    quotas = {"s0": 5, "s1": 100}
    out = sample_mix(docs, quotas, seed=7)
    got = out.groupBy("source").count().collect()
    counts = {r["source"]: r["count"] for r in got}
    assert counts == {"s0": 5, "s1": 20}  # s1 quota > size -> all; s2 dropped
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(
        r["doc_id"]
        for r in sample_mix(docs.repartition(7), quotas, seed=7).collect()
    )
    assert a == b  # partition-independent deterministic pick
    assert a != sorted(
        r["doc_id"] for r in sample_mix(docs, quotas, seed=8).collect()
    )  # seed changes the pick
    buf = io.StringIO()
    with redirect_stdout(buf):
        out.explain("formatted")
    assert buf.getvalue().count("WindowGroupLimit") // 2 >= 2


def test_decontaminate_ngram_overlap(spark):
    """Benchmark decontamination: a doc sharing a 13-gram with the
    benchmark is flagged; distinct grams count once; clean docs pass with
    n_contaminated=0; short docs exact-match via the degenerate shingle."""
    from ant_spark.operators.textops import decontaminate

    bench_sent = "the quick brown fox jumps over the lazy dog near the old barn"
    docs = spark.createDataFrame(
        [
            (0, f"intro text then {bench_sent} and some closing words"),
            (1, "a completely different document about spark engines"),
            (2, bench_sent),            # full containment
            (3, "tiny leak"),           # short doc, exact-matches bench row 2
        ],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, bench_sent), (101, "tiny leak")], "doc_id long, text string"
    )
    out = {r["doc_id"]: r for r in decontaminate(docs, bench, k=13).collect()}
    assert out[0]["contaminated"] and out[0]["n_contaminated"] >= 1
    assert not out[1]["contaminated"] and out[1]["n_contaminated"] == 0
    assert out[2]["contaminated"]
    assert out[3]["contaminated"]  # degenerate whole-text gram matched
    # threshold above the hit count clears doc 0's single-sentence leak
    hi = {r["doc_id"]: r for r in
          decontaminate(docs, bench, k=13, threshold=10).collect()}
    assert not hi[1]["contaminated"]
    assert hi[0]["contaminated"] == (hi[0]["n_contaminated"] >= 10)


def test_connected_components_chains_and_islands(spark):
    """Min-label propagation: a 4-doc chain collapses to one component
    labelled by its min id (the case pairwise doc_b-dropping over-deletes),
    an island pair keeps its own label, and converging takes O(diameter)
    rounds under max_iter."""
    from ant_spark.operators.textops import connected_components

    pairs = spark.createDataFrame(
        # chain 1-2, 2-3, 3-4 (diameter 3) + island 10-11 + triangle 20-21-22
        [(1, 2), (2, 3), (3, 4), (10, 11), (20, 21), (21, 22), (20, 22)],
        "doc_a long, doc_b long",
    )
    got = {r["doc_id"]: r["component"]
           for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}
    # keep-one-per-cluster: representatives = distinct components
    assert sorted(set(got.values())) == [1, 10, 20]


def test_unigram_logprob_signal(spark):
    """LM-quality proxy: English prose scores far above the OOV floor;
    gibberish sits at/near it; empty text takes the floor exactly. All
    integer centi-log arithmetic — repartition-independent."""
    from ant_spark.operators.textops import unigram_logprob

    docs = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and it was warm"),
            (1, "zzqx vbnm qqqq wxyz plok mnbv"),
            (2, ""),
            (3, "the the the the"),
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["lp"] for r in
           docs.select("doc_id", unigram_logprob(F.col("text")).alias("lp")).collect()}
    assert got[0] > -4.5          # real prose: mix of table hits + few OOV
    assert got[1] == -7.0         # all OOV -> exactly the floor
    assert got[2] == -7.0         # empty -> floor
    assert got[3] == -1.2         # all 'the' -> exactly its table value
    assert got[0] > got[1]


def test_duplicate_spans_and_incremental_new(spark):
    from ant_spark.operators.textops import (
        duplicate_spans,
        fingerprint,
        incremental_new,
    )
    from pyspark.sql import functions as F

    shared = "the quick brown fox jumps over the lazy dog near the old river bank"
    docs = spark.createDataFrame(
        [
            (1, shared + " alpha ending one two three four five six seven"),
            (2, shared + " totally different tail with other words here now"),
            (3, "no overlap at all in this completely separate document text"),
        ],
        "doc_id long, text string",
    )
    spans = duplicate_spans(docs, k=3, w=4, min_docs=2).collect()
    assert spans, "shared prefix must produce shared winnowed fingerprints"
    assert all(r["n_docs"] == 2 and r["first_doc"] == 1 for r in spans)

    prev = docs.filter(F.col("doc_id") == 1).select(
        fingerprint(F.col("text")).alias("fp")
    )
    new = spark.createDataFrame(
        [
            (10, shared + " alpha ending one two three four five six seven"),
            (11, "a genuinely new document that was never seen before today"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(r["doc_id"] for r in incremental_new(new, prev).collect())
    assert kept == [11]  # 10 is byte-identical content to snapshot doc 1


def test_top_idf_terms(spark):
    from ant_spark.operators.textops import top_idf_terms

    docs = spark.createDataFrame(
        [
            (1, "zebra zebra common words common everywhere always"),
            (2, "common words everywhere always nothing special here"),
            (3, "quokka appears once only common words everywhere always"),
        ],
        "doc_id long, text string",
    )
    out = top_idf_terms(docs, top_k=2, min_len=4).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: 'zebra' (tf=2, df=1) must beat any common term (df=3)
    assert by_doc[1][0]["term"] == "zebra"
    assert by_doc[1][0]["tf"] == 2 and by_doc[1][0]["df"] == 1
    assert by_doc[1][0]["score"] == 2 * ((3 * 1000) // 1)
    # doc 3: unique (df=1) terms outrank shared vocabulary; equal scores
    # tie-break alphabetically ('appears' < 'once' < 'only' < 'quokka')
    assert [r["term"] for r in by_doc[3]] == ["appears", "once"]
    assert all(r["df"] == 1 for r in by_doc[3])
    assert all(len(v) == 2 for v in by_doc.values())
