"""Typed struct scanning (reference Page.Scan / internal/scan) — the
quotes-style nested extraction golden (Readme.md:164-193, json_test.go:12-53):
spec {projects: [{name: css "h1"}] at css ".project"} over /about.html
yields {"projects":[{"name":"Ant"}]}."""

import json

from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from ant_spark.functions.parse import make_typed_scrape_udf
from ant_spark.sources.webgraph import _EXAMPLE_PAGES


def test_nested_struct_scan_quotes_golden(spark):
    schema = StructType(
        [
            StructField(
                "projects",
                ArrayType(StructType([StructField("name", StringType())])),
            )
        ]
    )
    udf = make_typed_scrape_udf(
        {"projects": {"css": ".project", "all": True,
                      "fields": {"name": {"css": "h1"}}}},
        schema,
    )
    df = spark.createDataFrame(
        [(_EXAMPLE_PAGES["/about.html"].encode(),)], "html binary"
    ).select(udf(F.col("html")).alias("s"))
    row = df.collect()[0]["s"]
    as_json = json.dumps({"projects": [{"name": p["name"]} for p in row["projects"]]},
                         separators=(",", ":"))
    assert as_json == '{"projects":[{"name":"Ant"}]}'  # json_test.go golden


def test_typed_fields_and_silent_zero(spark):
    """scan.go:100-101,121,142: numeric parse failures silently zero;
    missing selectors yield zero values; slices collect all matches."""
    html = b"""
    <html><body>
      <span class="n">42</span><span class="f">3.5</span>
      <span class="bad">not-a-number</span>
      <li>a</li><li>b</li>
      <a href="/x" class="lnk">x</a>
    </body></html>"""
    schema = StructType(
        [
            StructField("n", LongType()),
            StructField("f", DoubleType()),
            StructField("bad", LongType()),
            StructField("missing", StringType()),
            StructField("items", ArrayType(StringType())),
            StructField("href", StringType()),
        ]
    )
    udf = make_typed_scrape_udf(
        {
            "n": {"css": ".n", "type": "int"},
            "f": {"css": ".f", "type": "float"},
            "bad": {"css": ".bad", "type": "int"},
            "missing": {"css": ".nope"},
            "items": {"css": "li", "all": True},
            "href": {"css": "a.lnk@href"},
        },
        schema,
    )
    row = spark.createDataFrame([(html,)], "html binary").select(
        udf(F.col("html")).alias("s")
    ).collect()[0]["s"]
    assert row["n"] == 42
    assert row["f"] == 3.5
    assert row["bad"] == 0  # silent zero
    assert row["missing"] == ""
    assert row["items"] == ["a", "b"]
    assert row["href"] == "/x"
