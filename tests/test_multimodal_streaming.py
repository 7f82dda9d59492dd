"""Multimodal plumbing (stubbed decode) + streaming ingest + sinks."""

import pytest
from pyspark.sql import functions as F

from ant_spark.operators.multimodal import (
    MEDIA,
    extract_features,
    frame_sample_plan,
    synth_media,
)


def test_media_features_stub(spark):
    media = spark.createDataFrame(synth_media(30), schema=MEDIA)
    feats = extract_features(media, dim=4).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["n_bytes"] > 16
        assert len(r["feature"]) == 4
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def test_media_real_decoder_is_marked_stub(spark):
    media = spark.createDataFrame(synth_media(1), schema=MEDIA)
    with pytest.raises(NotImplementedError):
        extract_features(media, decoder="real")


def test_frame_sample_plan(spark):
    media = spark.createDataFrame(synth_media(9), schema=MEDIA)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
    vids = media.filter("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == vids


def test_streaming_extract_and_window(spark, tmp_path):
    from ant_spark import schemas
    from ant_spark.sources.webgraph import GraphConfig, generate
    from ant_spark.streaming.pipeline import stream_extract, stream_host_counts

    pages_pdf, _, _ = generate(GraphConfig(n_pages=60, n_hosts=3))
    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(pages_pdf, schema=schemas.PAGES).write.parquet(pages_dir)

    out = str(tmp_path / "out")
    q = stream_extract(spark, pages_dir, out, str(tmp_path / "ck1"))
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    assert got.count() == 60
    golden = {r.url: r.text for _, r in pages_pdf.iterrows()}
    for r in got.collect():
        assert r["text"] == golden[r["url"]]

    q2 = stream_host_counts(spark, pages_dir, str(tmp_path / "ck2"))
    q2.awaitTermination(300)
    counts = {
        r["host"]: r["n_pages"]
        for r in spark.sql("select * from host_counts").collect()
    }
    # warc_ts spans < 1h → one window per host, counts sum to page counts
    assert sum(counts.values()) == 60 and len(counts) == 3


def test_jsonl_sink(spark, tmp_path):
    from ant_spark.sinks import extracted_jsonl, write_jsonl

    ex = spark.createDataFrame(
        [("http://e.com/", 0, 0, {"name": "Ant"})],
        "url string, seq long, round int, data map<string,string>",
    )
    lines = extracted_jsonl(ex).collect()
    assert lines[0]["line"] == '{"url":"http://e.com/","data":{"name":"Ant"}}'
    write_jsonl(ex, str(tmp_path / "j"), single_file=True)
    import glob

    files = glob.glob(str(tmp_path / "j" / "*.json"))
    assert len(files) == 1
