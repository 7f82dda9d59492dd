"""Multimodal plumbing (stubbed decode) + streaming ingest + sinks.

All bodies are independent (distinct checkpoints, memory-sink names and
tmp dirs) and run CONCURRENTLY in one Spark session (contract-suite
pattern) — streaming availableNow drains interleave like any other jobs."""

import pytest
from pyspark.sql import functions as F

from ant_spark.operators.multimodal import (
    MEDIA,
    extract_features,
    frame_sample_plan,
    synth_media,
)


def _w_features_stub(spark, tmp_path):
    media = spark.createDataFrame(synth_media(30), schema=MEDIA)
    feats = extract_features(media, dim=4).collect()
    assert len(feats) == 30
    for r in feats:
        assert r["n_bytes"] > 16
        assert len(r["feature"]) == 4
        assert all(0.0 <= x <= 1.0 for x in r["feature"])


def _w_real_decoder(spark, tmp_path):
    """decoder='real' is EXECUTABLE on uncompressed formats via pure numpy:
    a binary PPM (P6) and a bottom-up 24-bit BMP with known pixels yield
    exact chunk-mean grayscale features through the full mapInPandas
    plumbing; compressed payloads (JPEG magic) still raise
    NotImplementedError naming pillow, or skip with on_unsupported."""
    import struct

    import numpy as np

    from ant_spark.operators.multimodal import _real_decode

    # P6 4x2: row0 = black,black,white,white; row1 = four mid-grays (128)
    px = bytes([0, 0, 0] * 2 + [255, 255, 255] * 2 + [128, 128, 128] * 4)
    ppm = b"P6\n# comment\n4 2\n255\n" + px
    # BMP 2x1 24-bit bottom-up: one blue-ish + one white pixel (BGR order),
    # row padded to 4-byte multiple (2*3=6 -> pad 2)
    bmp_px = bytes([255, 0, 0, 255, 255, 255]) + b"\x00\x00"
    bmp = (
        b"BM" + struct.pack("<IHHI", 54 + len(bmp_px), 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 24, 0, len(bmp_px), 0, 0, 0, 0)
        + bmp_px
    )
    # kernel goldens (grayscale chunk means)
    assert _real_decode(ppm, 2) == [
        pytest.approx(np.float32(255 + 255) / 4 / 255, abs=1e-6),  # [0,0,255,255]/4
        pytest.approx(128.0 / 255, abs=1e-6),
    ]
    assert _real_decode(bmp, 2) == [
        pytest.approx(255.0 / 3 / 255, abs=1e-6),  # mean(BGR 255,0,0)/255
        pytest.approx(1.0, abs=1e-6),
    ]
    # full Spark plumbing over the real kernel
    rows = [(0, "image", "image/x-portable-pixmap", 4, 2, None, ppm),
            (1, "image", "image/bmp", 2, 1, None, bmp)]
    media = spark.createDataFrame(rows, schema=MEDIA)
    feats = {r["media_id"]: r for r in
             extract_features(media, dim=2, decoder="real").collect()}
    assert feats[0]["feature"] == pytest.approx([0.5, 128.0 / 255], abs=1e-6)
    assert feats[1]["feature"] == pytest.approx([255.0 / 3 / 255, 1.0], abs=1e-6)
    # compressed magic: error by default (naming the dependency)...
    with pytest.raises(NotImplementedError, match="pillow"):
        _real_decode(b"\xff\xd8\xff\xe0fakejpeg", 2)
    # ...and skip mode yields empty features (the 100 TB-safe path)
    jpeg_media = spark.createDataFrame(
        [(2, "image", "image/jpeg", 1, 1, None, b"\xff\xd8\xff\xe0fakejpeg")],
        schema=MEDIA,
    )
    out = extract_features(
        jpeg_media, dim=2, decoder="real", on_unsupported="skip"
    ).collect()
    assert out[0]["feature"] == []


def _w_frame_plan(spark, tmp_path):
    media = spark.createDataFrame(synth_media(9), schema=MEDIA)
    plan = frame_sample_plan(media, every_ms=1000)
    rows = plan.collect()
    assert all(r["ts_ms"] == r["frame_idx"] * 1000 for r in rows)
    vids = media.filter("kind = 'video'").count()
    assert plan.select("media_id").distinct().count() == vids


def _w_extract_window(spark, tmp_path):
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


def _w_jsonl_sink(spark, tmp_path):
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


def _w_sessionize(spark, tmp_path):
    """applyInPandasWithState sessionizer: a host that goes quiet for longer
    than the gap gets its session emitted when the watermark passes the
    timeout; the still-open session stays in state (not emitted)."""
    import datetime as dt

    import pandas as pd

    from ant_spark import schemas
    from ant_spark.streaming.pipeline import stream_sessionize

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)

    def mkrows(host, ts_list):
        return [
            {
                "url": f"http://{host}/p{i}",
                "warc_ts": t,
                "html": b"<html></html>",
                "text": "",
                "lang": "en",
                "status": 200,
                "ok_after_attempt": None,
            }
            for i, t in enumerate(ts_list)
        ]

    pages_dir = str(tmp_path / "pages")
    # file 1: an early burst on a.test (3 pages within 5 min)
    early = mkrows("a.test", [base, base + dt.timedelta(minutes=2),
                              base + dt.timedelta(minutes=5)])
    # file 2: two hours later — a.test's early session must time out
    late = mkrows("a.test", [base + dt.timedelta(hours=2)])
    s1 = spark.createDataFrame(pd.DataFrame(early), schema=schemas.PAGES)
    s2 = spark.createDataFrame(pd.DataFrame(late), schema=schemas.PAGES)
    s1.coalesce(1).write.mode("overwrite").parquet(pages_dir)
    import time as _time

    _time.sleep(1.1)  # FileStreamSource orders unread files by mtime
    s2.coalesce(1).write.mode("append").parquet(pages_dir)

    q = stream_sessionize(
        spark, pages_dir, str(tmp_path / "ckpt"),
        gap_minutes=30, watermark="1 minutes", query_name="sess_t",
    )
    q.awaitTermination(120)
    out = {r["host"]: r for r in spark.sql("SELECT * FROM sess_t").collect()}
    assert "a.test" in out, "quiet host session not emitted"
    r = out["a.test"]
    assert r["n_pages"] == 3
    assert r["session_start"] == base.replace(tzinfo=None)
    assert r["session_end"] == (base + dt.timedelta(minutes=5)).replace(tzinfo=None)


def _w_sessionize_ooo(spark, tmp_path):
    """A later FILE can carry events far BEHIND the already-advanced
    watermark (out-of-order arrival). Setting a timeout at last+gap would
    then be rejected by the state store and kill the query — the sessionizer
    must close such a session immediately instead."""
    import datetime as dt

    import pandas as pd

    from ant_spark import schemas
    from ant_spark.streaming.pipeline import stream_sessionize

    base = dt.datetime(2025, 6, 1, tzinfo=dt.timezone.utc)

    def mkrows(host, ts_list):
        return [
            {
                "url": f"http://{host}/p{i}",
                "warc_ts": t,
                "html": b"<html></html>",
                "text": "",
                "lang": "en",
                "status": 200,
                "ok_after_attempt": None,
            }
            for i, t in enumerate(ts_list)
        ]

    pages_dir = str(tmp_path / "pages")
    # file 1: a.test far in the FUTURE → watermark advances way past base
    future = mkrows("a.test", [base + dt.timedelta(hours=5)])
    # file 2: b.test at base — 5h behind the watermark, > gap in the past
    past = mkrows("b.test", [base, base + dt.timedelta(minutes=3)])
    s1 = spark.createDataFrame(pd.DataFrame(future), schema=schemas.PAGES)
    s2 = spark.createDataFrame(pd.DataFrame(past), schema=schemas.PAGES)
    s1.coalesce(1).write.mode("overwrite").parquet(pages_dir)
    import time as _time

    _time.sleep(1.1)  # FileStreamSource orders unread files by mtime
    s2.coalesce(1).write.mode("append").parquet(pages_dir)

    q = stream_sessionize(
        spark, pages_dir, str(tmp_path / "ckpt"),
        gap_minutes=30, watermark="1 minutes", query_name="sess_ooo",
    )
    q.awaitTermination(120)  # would raise StreamingQueryException pre-fix
    out = {r["host"]: r for r in spark.sql("SELECT * FROM sess_ooo").collect()}
    assert "b.test" in out, "behind-watermark session not closed"
    assert out["b.test"]["n_pages"] == 2
    assert out["b.test"]["session_end"] == (
        base + dt.timedelta(minutes=3)
    ).replace(tzinfo=None)


def _w_resize(spark, tmp_path):
    """Resize stage: real mapInPandas plumbing, fake block-average kernel —
    output payloads re-wrap the synthetic header with the new dims."""
    import struct

    from ant_spark.operators.multimodal import MEDIA, resize_images, synth_media

    media = spark.createDataFrame(synth_media(30), schema=MEDIA)
    out = resize_images(media, out_w=4, out_h=2).collect()
    n_images = media.filter("kind = 'image'").count()
    assert len(out) == n_images and n_images > 0
    for r in out:
        assert r["kind"] == "image"
        assert (r["width"], r["height"]) == (4, 2)
        p = bytes(r["payload"])
        assert p[:4] == b"ASMK"
        w, h, _d = struct.unpack("<III", p[4:16])
        assert (w, h) == (4, 2)
        assert len(p) == 16 + 4 * 2  # header + out_h*out_w fake pixels
    # deterministic: same input -> same bytes
    again = resize_images(media, out_w=4, out_h=2).collect()
    assert {r["media_id"]: bytes(r["payload"]) for r in out} == {
        r["media_id"]: bytes(r["payload"]) for r in again
    }


def _w_url_dedupe(spark, tmp_path):
    """Streaming seen-set (dropDuplicatesWithinWatermark): duplicated URLs
    across micro-batches collapse to first occurrence; distinct URLs all
    survive; state is watermark-bounded."""
    import datetime as dt

    import pandas as pd

    from ant_spark import schemas
    from ant_spark.streaming.pipeline import stream_url_dedupe

    base = dt.datetime(2025, 1, 1)
    rows = []
    for i in range(20):
        # every url written twice (second copy 1 min later, well inside the
        # 2h watermark) — the dedupe must keep exactly one of each
        for rep in range(2):
            rows.append(
                {
                    "url": f"http://h{i % 4}.test/p{i}",
                    "warc_ts": base + dt.timedelta(minutes=i + rep),
                    "html": b"<html></html>",
                    "text": "",
                    "lang": "en",
                    "status": 200,
                    "ok_after_attempt": None,
                }
            )
    pages_dir = str(tmp_path / "pages")
    spark.createDataFrame(pd.DataFrame(rows), schema=schemas.PAGES).repartition(
        5
    ).write.parquet(pages_dir)

    out = str(tmp_path / "deduped")
    q = stream_url_dedupe(spark, pages_dir, out, str(tmp_path / "ck"))
    q.awaitTermination(300)
    got = [r["url"] for r in spark.read.parquet(out).collect()]
    assert sorted(got) == sorted({r["url"] for r in rows})  # exactly-once


def _w_curate_inc(spark, tmp_path):
    """Streaming curation over landing WARC segments: enrichment + lang/
    quality floor per micro-batch, exact-fingerprint dedupe across
    segments within the watermark (a re-crawled page curates once), and
    exactly-once per segment across availableNow restarts."""
    import datetime as dt

    from ant_spark.sources.warc import write_warc
    from ant_spark.streaming.pipeline import stream_curate

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    good_a = ("the river boats carried the grain to the market town where "
              "the people of the valley traded the goods and the news of "
              "the harvest season with the merchants")
    good_d = ("the observatory on the hill records the weather and the "
              "stars for the scholars of the city who publish the tables "
              "of the tides and the seasons for the sailors")
    bad_b = "zz qq xx vv"  # no English markers, low quality

    def rec(url, body_text, ts):
        return {
            "url": url,
            "warc_ts": ts,
            "status": 200,
            "html": f"<html><body>{body_text}</body></html>".encode(),
        }

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    write_warc(
        [rec("http://s.test/a", good_a, base),
         rec("http://s.test/b", bad_b, base)],
        str(seg_dir / "seg-0.warc.gz"),
    )
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    def drain():
        q = stream_curate(
            spark, str(seg_dir), out, ckpt,
            langs=("en",), min_quality=0.5, watermark="2 hours",
        )
        q.awaitTermination(120)
        return {r["doc_key"]: r for r in spark.read.parquet(out).collect()}

    got = drain()
    assert set(got) == {"http://s.test/a"}  # b filtered out
    assert got["http://s.test/a"]["lang_id"] == "en"
    assert got["http://s.test/a"]["n_tokens"] >= 20

    # second segment: a duplicate of A under a new URL + one new doc
    write_warc(
        [rec("http://s.test/a-mirror", good_a, base + dt.timedelta(minutes=30)),
         rec("http://s.test/d", good_d, base + dt.timedelta(minutes=31))],
        str(seg_dir / "seg-1.warc.gz"),
    )
    got = drain()
    assert set(got) == {"http://s.test/a", "http://s.test/d"}  # mirror deduped


def _w_curate_mtime(spark, tmp_path):
    """Round-5 ADVICE regression: a record whose WARC-Date failed to parse
    (NULL warc_ts from the lenient reader) must still be curated — its
    event time falls back to the segment file's mtime instead of the row
    being dropped by the watermarked stateful dedupe."""
    from ant_spark.sources.warc import _record_bytes
    from ant_spark.streaming.pipeline import stream_curate

    good_a = ("the river boats carried the grain to the market town where "
              "the people of the valley traded the goods and the news of "
              "the harvest season with the merchants")
    good_b = ("the observatory on the hill records the weather and the "
              "stars for the scholars of the city who publish the tables "
              "of the tides and the seasons for the sailors")
    recs = (
        _record_bytes(
            "http://m.test/ok", "2025-01-01T00:00:00Z", 200,
            f"<html><body>{good_a}</body></html>".encode(),
        )
        + _record_bytes(
            "http://m.test/bad-date", "not-a-date", 200,
            f"<html><body>{good_b}</body></html>".encode(),
        )
    )
    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    (seg_dir / "seg-0.warc").write_bytes(recs)
    out = str(tmp_path / "out")
    q = stream_curate(
        spark, str(seg_dir), out, str(tmp_path / "ck"),
        langs=("en",), min_quality=0.5, watermark="2 hours",
    )
    q.awaitTermination(120)
    got = {r["doc_key"]: r for r in spark.read.parquet(out).collect()}
    assert set(got) == {"http://m.test/ok", "http://m.test/bad-date"}
    assert got["http://m.test/bad-date"]["lang_id"] == "en"


def _w_lambda_split(spark, tmp_path):
    """The documented lambda split, end-to-end: the STREAM curates landed
    segments with watermark-bounded exact dedupe (state never outgrows the
    horizon); an exact re-crawl BEYOND the horizon lands again and is
    caught by the BATCH ``incremental_new`` anti-join against the prior
    snapshot's fingerprints; near-dups (which no stream can catch — banded
    self-joins need the candidate universe) fall to the batch
    ``curate(near_dup='components')`` sweep. Three streamed segments, one
    exact recurrence, one near-dup, one genuinely new doc."""
    import datetime as dt

    from ant_spark.operators.curation import curate
    from ant_spark.operators.textops import fingerprint, incremental_new
    from ant_spark.sources.warc import write_warc
    from ant_spark.streaming.pipeline import stream_curate
    from pyspark.sql import functions as F

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    doc_a = ("the river boats carried the grain to the market town where "
             "the people of the valley traded the goods and the news of "
             "the harvest season with the merchants of the plains")
    doc_b = ("the observatory on the hill records the weather and the "
             "stars for the scholars of the city who publish the tables "
             "of the tides and the seasons for the sailors of the coast")
    doc_c = ("the library of the old quarter keeps the maps and the "
             "letters of the traders who crossed the mountains with the "
             "caravans and wrote of the roads and the wells and the passes")
    near_b = doc_b.replace("the coast", "the gulf")  # 3-shingle delta
    doc_e = ("the mill by the bridge grinds the wheat of the northern "
             "farms and the miller keeps the ledger of the sacks and the "
             "tolls of the road for the council of the town each season")

    def rec(url, body, ts):
        return {"url": url, "warc_ts": ts, "status": 200,
                "html": f"<html><body>{body}</body></html>".encode()}

    seg_dir = tmp_path / "segs"
    seg_dir.mkdir()
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ck")

    def drain():
        q = stream_curate(spark, str(seg_dir), out, ckpt,
                          langs=("en",), min_quality=0.5, watermark="2 hours")
        q.awaitTermination(120)
        return spark.read.parquet(out)

    write_warc([rec("http://s.test/a", doc_a, base),
                rec("http://s.test/b", doc_b, base)],
               str(seg_dir / "seg-0.warc.gz"))
    drain()
    day2 = base + dt.timedelta(days=1)
    write_warc([rec("http://s.test/c", doc_c, day2)],
               str(seg_dir / "seg-1.warc.gz"))
    drain()  # advances the watermark past seg-0: a/b fp state evicted

    cur = drain()  # no new segment: prior snapshot as of seg-1
    prior = cur.select(F.col("doc_key").alias("doc_id"), "text")
    seen_fps = prior.select(fingerprint(F.col("text")).alias("fp"))

    write_warc([rec("http://s.test/a-again", doc_a, day2 + dt.timedelta(minutes=10)),
                rec("http://s.test/nearb", near_b, day2 + dt.timedelta(minutes=11)),
                rec("http://s.test/e", doc_e, day2 + dt.timedelta(minutes=12))],
               str(seg_dir / "seg-2.warc.gz"))
    all_rows = drain()
    seg2 = all_rows.filter(F.col("warc_ts") > day2 + dt.timedelta(minutes=5))
    # the exact recurrence is OUTSIDE the stream's watermark horizon, so
    # the stream (correctly, state-bounded) let it land again:
    assert "http://s.test/a-again" in {r["doc_key"] for r in seg2.collect()}

    # batch leg 1 — exact delta vs the prior snapshot's fingerprints:
    delta = incremental_new(
        seg2.select(F.col("doc_key").alias("doc_id"), "text"), seen_fps)
    assert {r["doc_id"] for r in delta.collect()} == {
        "http://s.test/nearb", "http://s.test/e"}

    # batch leg 2 — chain-correct near-dup sweep over prior ∪ delta:
    kept, stats = curate(prior.unionByName(delta), near_dup="components")
    assert {r["doc_id"] for r in kept.collect()} == {
        "http://s.test/a", "http://s.test/b", "http://s.test/c",
        "http://s.test/e"}  # nearb clustered with b, representative kept
    st = {r["stage"]: r["n"] for r in stats.collect()}
    assert st["exact_unique"] == 5 and st["kept"] == 4  # one near-dup dropped


_WORKERS = {
    "features_stub": _w_features_stub,
    "real_decoder": _w_real_decoder,
    "frame_plan": _w_frame_plan,
    "extract_window": _w_extract_window,
    "jsonl_sink": _w_jsonl_sink,
    "sessionize": _w_sessionize,
    "sessionize_ooo": _w_sessionize_ooo,
    "resize": _w_resize,
    "url_dedupe": _w_url_dedupe,
    "curate_inc": _w_curate_inc,
    "curate_mtime": _w_curate_mtime,
    "lambda_split": _w_lambda_split,
}


@pytest.fixture(scope="module")
def mm_runs(spark, tmp_path_factory):
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=len(_WORKERS)) as ex:
        futs = {
            n: ex.submit(fn, spark, tmp_path_factory.mktemp(f"mm_{n}"))
            for n, fn in _WORKERS.items()
        }
    return futs


def test_media_features_stub(mm_runs):
    mm_runs["features_stub"].result()


def test_media_real_decoder_uncompressed_golden(mm_runs):
    mm_runs["real_decoder"].result()


def test_frame_sample_plan(mm_runs):
    mm_runs["frame_plan"].result()


def test_streaming_extract_and_window(mm_runs):
    mm_runs["extract_window"].result()


def test_jsonl_sink(mm_runs):
    mm_runs["jsonl_sink"].result()


def test_stream_sessionize_stateful(mm_runs):
    mm_runs["sessionize"].result()


def test_stream_sessionize_out_of_order_file(mm_runs):
    mm_runs["sessionize_ooo"].result()


def test_resize_images_stub(mm_runs):
    mm_runs["resize"].result()


def test_stream_url_dedupe(mm_runs):
    mm_runs["url_dedupe"].result()


def test_stream_curate_incremental(mm_runs):
    mm_runs["curate_inc"].result()


def test_stream_curate_malformed_date_uses_segment_mtime(mm_runs):
    mm_runs["curate_mtime"].result()


def test_lambda_stream_delta_plus_batch_sweep(mm_runs):
    mm_runs["lambda_split"].result()
