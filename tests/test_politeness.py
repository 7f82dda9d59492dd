"""Politeness budget windows (reference limiters.go → SURVEY §2.5 W1-W4)."""

from pyspark.sql import functions as F

from ant_spark.operators.politeness import (
    budget_per_host,
    global_limit,
    host_budget_expr,
    split_by_budget,
)


def _frontier(spark, rows):
    return spark.createDataFrame(
        rows, "url string, url_hash long, host string, seq long"
    )


ROWS = [
    (f"http://a.test/{i}", i * 7 + 1, "a.test", i) for i in range(10)
] + [(f"http://b.test/{i}", 1000 + i * 13, "b.test", 100 + i) for i in range(3)]


def test_budget_lowest_seq_first(spark):
    fr = _frontier(spark, ROWS)
    adm, defer = split_by_budget(fr, F.lit(2), ["seq"], salt=1)
    got = sorted((r["host"], r["seq"]) for r in adm.collect())
    assert got == [("a.test", 0), ("a.test", 1), ("b.test", 100), ("b.test", 101)]
    assert defer.count() == 13 - 4


def test_salted_budget_identical_result(spark):
    fr = _frontier(spark, ROWS)
    a1, d1 = split_by_budget(fr, F.lit(3), ["seq"], salt=1)
    a4, d4 = split_by_budget(fr, F.lit(3), ["seq"], salt=4)
    s1 = sorted(r["seq"] for r in a1.collect())
    s4 = sorted(r["seq"] for r in a4.collect())
    assert s1 == s4
    assert sorted(r["seq"] for r in d1.collect()) == sorted(
        r["seq"] for r in d4.collect()
    )


def test_budget_expr_crawl_delay_and_host_rate(spark):
    df = spark.createDataFrame(
        [("a.test", 0.5), ("b.test", None), ("c.test", 10.0)],
        "host string, crawl_delay double",
    )
    b = host_budget_expr(
        round_seconds=1.0,
        default_budget=100,
        crawl_delay_col=F.col("crawl_delay"),
        host_rates={"b.test": 5},
    )
    got = {r["host"]: r["b"] for r in df.withColumn("b", b).collect()}
    assert got["a.test"] == 2  # floor(1/0.5)
    assert got["b.test"] == 5  # LimitHostname(5)·1s
    assert got["c.test"] == 1  # delay > round ⇒ min budget 1 (progress)


def test_global_limit(spark):
    fr = _frontier(spark, ROWS)
    adm, defer = global_limit(fr, 5, ["seq"])
    assert sorted(r["seq"] for r in adm.collect()) == [0, 1, 2, 3, 4]
    assert defer.count() == 8


def test_budget_marks_only(spark):
    fr = _frontier(spark, ROWS)
    marked = budget_per_host(fr, F.lit(1), ["seq"], salt=1)
    inb = sorted(r["seq"] for r in marked.filter("in_budget").collect())
    assert inb == [0, 100]
