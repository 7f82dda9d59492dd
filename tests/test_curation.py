"""Composed curation pipeline (operators/curation.py).

The four independent bodies run CONCURRENTLY in one Spark session
(contract-suite pattern)."""

import pytest

from ant_spark.operators.curation import curate

DOCS = [
    (0, "The quick brown fox and the lazy dog of the north is to be seen "
        "running with the pack and the wind in the trees of the old field."),
    (1, "The quick brown fox and the lazy dog of the north is to be seen "
        "running with the pack and the wind in the trees of the old field."),  # exact dup
    (2, "The quick brown fox and the lazy dog of the north is to be seen "
        "running with the pack and the wind in the trees of the old meadow."),  # near dup
    (3, "Der Hund und die Katze, das ist nicht der Fall und die Regel hier."),  # de
    (4, "xy zz qq"),  # low quality / und
    (5, "The completely different document talks about the spark engines and "
        "the crawl of the web at scale with the politeness and the budget."),
]


def _w_stages(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    kept, stats = curate(
        docs, langs=("en",), min_quality=0.3, jaccard_threshold=0.5,
        n_hashes=8, n_bands=4, k=3,
    )
    kept_ids = sorted(r["doc_id"] for r in kept.collect())
    st = {r["stage"]: r["n"] for r in stats.collect()}
    assert st["input"] == 6
    assert st["lang_ok"] == 4  # de + und dropped
    assert st["exact_unique"] == 3  # doc 1 collapsed into 0
    assert kept_ids == [0, 5]  # doc 2 removed as near-dup of 0
    assert st["kept"] == 2


# Shared-sink shape where the two drop policies genuinely diverge: docs 10
# and 11 are each near-dups of the bridge 12, but not of each other.
# Pairwise drops doc_b of every confirmed pair → only {12} drops (kept
# 10 AND 11, two docs of one duplicate cluster); components clusters
# {10,11,12} and keeps exactly the min representative 10.
_BASE = ("the quick brown fox jumps over the lazy dog while the old man "
         "walks along the river bank at dawn").split()
_VAR_A = _BASE[:-4] + "near the quiet harbour".split()
_VAR_B = "a small grey cat sits".split() + _BASE[5:]
CHAIN_DOCS = [
    (10, " ".join(_VAR_A)),
    (11, " ".join(_VAR_B)),
    (12, " ".join(_BASE)),
    (13, "The completely separate report is about the budget of the state "
         "and the vote in the house on the day of the count."),
]


def _w_components(spark):
    from pyspark.sql import functions as F

    from ant_spark.operators import textops as T

    docs = spark.createDataFrame(CHAIN_DOCS, "doc_id long, text string")
    # precondition: the similarity structure really is a shared sink
    pairs = T.minhash_candidate_pairs(docs, "text", 8, 4, 3, "md5")
    jac = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in T.jaccard_pairs(docs, pairs, "text", 3).collect()
    }
    assert jac[(10, 12)] >= 0.5 and jac[(11, 12)] >= 0.5
    assert jac.get((10, 11), 0.0) < 0.5

    kw = dict(langs=("en",), min_quality=0.2, jaccard_threshold=0.5,
              n_hashes=8, n_bands=4, k=3)
    kept_pw, stats_pw = curate(docs, **kw)  # default pairwise
    kept_cc, stats_cc = curate(docs, near_dup="components", **kw)
    assert sorted(r["doc_id"] for r in kept_pw.collect()) == [10, 11, 13]
    assert sorted(r["doc_id"] for r in kept_cc.collect()) == [10, 13]
    assert {r["stage"]: r["n"] for r in stats_pw.collect()}["kept"] == 3
    assert {r["stage"]: r["n"] for r in stats_cc.collect()}["kept"] == 2


def _w_rejects(spark):
    import pytest

    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    with pytest.raises(ValueError, match="near_dup"):
        curate(docs, near_dup="clusters")


def _w_gopher(spark):
    """gopher_rules=True: a doc passing lang/quality floors but failing a
    Gopher rule (word count < 50) drops; a long compliant doc survives.
    The stage lineage still reconciles (kept = exact_unique - dropped)."""
    good = " ".join(
        ["the river boats carried the grain to the market town where the "
         "people of the valley traded the goods and the news of the harvest "
         "season with the merchants of the plains and the sailors"] * 2
    )
    shortish = ("the quick brown fox jumps over the lazy dog near the "
                "river bank today")  # decent quality, but < 50 words
    docs = spark.createDataFrame(
        [(1, good), (2, shortish)], "doc_id long, text string"
    )
    kept, stats = curate(docs, langs=("en",), min_quality=0.2,
                         gopher_rules=True)
    assert [r["doc_id"] for r in kept.collect()] == [1]
    st = {r["stage"]: r["n"] for r in stats.collect()}
    assert st["input"] == 2 and st["quality_ok"] == 1 and st["kept"] == 1

    # flag off: both survive (the rule set is opt-in)
    kept2, _ = curate(docs, langs=("en",), min_quality=0.2)
    assert sorted(r["doc_id"] for r in kept2.collect()) == [1, 2]


_WORKERS = {
    "stages": _w_stages,
    "components": _w_components,
    "rejects": _w_rejects,
    "gopher": _w_gopher,
}


@pytest.fixture(scope="module")
def cur_runs(spark):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_WORKERS)) as ex:
        futs = {n: ex.submit(fn, spark) for n, fn in _WORKERS.items()}
    return futs


def test_curate_stages(cur_runs):
    cur_runs["stages"].result()


def test_curate_components_vs_pairwise(cur_runs):
    cur_runs["components"].result()


def test_curate_rejects_bad_near_dup(cur_runs):
    cur_runs["rejects"].result()


def test_curate_gopher_rules(cur_runs):
    cur_runs["gopher"].result()
