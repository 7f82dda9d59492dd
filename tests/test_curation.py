"""Composed curation pipeline (operators/curation.py)."""

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


def test_curate_stages(spark):
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
