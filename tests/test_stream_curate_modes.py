"""stream_curate round-6 knobs: main-text extraction + Gopher rules inside
the streaming curation path (per-row — the watermarked state shape is
unchanged)."""

import datetime as dt

from ant_spark.sources.warc import write_warc
from ant_spark.streaming.pipeline import stream_curate

_BASE = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

_BODY = ("the river boats carried the grain to the market town where the "
         "people of the valley traded the goods and the news of the harvest "
         "season with the merchants")


def _rec(url, html, ts=_BASE):
    return {"url": url, "warc_ts": ts, "status": 200, "html": html.encode()}


def test_stream_curate_main_text_and_gopher(spark, tmp_path):
    chrome = ('<body><nav><a href="/x">Home Blog About Contact</a></nav>'
              f"<article><p>{_BODY} of the plains and the coast who have "
              "been coming to the fair for many years to trade and to talk "
              "of the roads and the wells and the passes that lead to the "
              "market towns of the north</p></article>"
              "<footer><p>Copyright 2025 Example Corp. All rights reserved "
              "worldwide forever.</p></footer></body>")
    # short article: fine under default floors, fails Gopher's 50-word band
    shorty = "<body><article><p>the dog and the cat sat</p></article></body>"
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    write_warc(
        [_rec("http://s.test/long", chrome), _rec("http://s.test/short", shorty)],
        str(seg_dir / "seg-0.warc.gz"),
    )
    out = str(tmp_path / "out")
    q = stream_curate(
        spark, str(seg_dir), out, str(tmp_path / "ck"),
        langs=("en",), min_quality=0.2, watermark="2 hours",
        text_mode="main", gopher_rules=True,
    )
    q.awaitTermination(120)
    got = {r["doc_key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"http://s.test/long"}  # shorty fails the word band
    txt = got["http://s.test/long"]["text"]
    # curated text is the boilerplate-stripped body, not scan.Text
    assert "Copyright" not in txt and "Home Blog" not in txt
    assert "river boats" in txt
