"""Boilerplate removal (functions/readability.py): shallow-feature block
classification (Kohlschütter WSDM'10 family) — deterministic, stdlib-only.
The two Spark bodies run concurrently (contract-suite pattern)."""

import pytest

from ant_spark.functions.readability import main_text

_PAGE = """
<html><head><title>T</title><style>.x{color:red}</style></head><body>
<header class="site-header"><h1>Example Site</h1></header>
<nav><a href="/">Home</a> <a href="/blog">Blog</a> <a href="/about">About</a></nav>
<div class="sidebar"><p>Subscribe to our newsletter for updates and offers!</p></div>
<article>
 <h1>The Quiet Harbor</h1>
 <p>The harbor town kept its fishing fleet through three generations of
 change, and the boats still leave before dawn each morning in season.</p>
 <p>Tiny.</p>
 <p>Visitors who stay past the summer learn the rhythm of the tides and
 the market bell, which rings when the catch is landed and sorted.</p>
 <p><a href="/1">one</a> <a href="/2">two</a> <a href="/3">three</a></p>
</article>
<div id="comments"><p>First! Great post, thanks for sharing this with us.</p></div>
<footer><p>Copyright 2025 Example Corp. All rights reserved worldwide.</p></footer>
</body></html>
"""


def test_main_text_keeps_body_drops_chrome():
    out = main_text(_PAGE)
    paras = out.split("\n\n")
    assert paras[0] == "The Quiet Harbor"  # heading kept (lower floor)
    assert any("fishing fleet" in p for p in paras)
    assert any("market bell" in p for p in paras)
    # chrome out: nav/footer/header containers, sidebar/comments classes
    for noise in ("Home", "newsletter", "Copyright", "Great post",
                  "Example Site"):
        assert noise not in out, noise
    assert "Tiny." not in out  # below min_len
    assert "one" not in out  # link-dense block
    # style/script/title never contribute
    assert "color:red" not in out and out.count("T\n") == 0


def test_main_text_shallow_features():
    # link density boundary: 25% linked chars survives the 0.33 default,
    # majority-linked dies
    ok = "<p>abcdefghijklmnopqrstuvwxyzabcd<a href='/'>0123456789</a></p>"
    assert main_text(ok, min_len=10) != ""
    dense = "<p>abcde<a href='/'>0123456789012345</a></p>"
    assert main_text(dense, min_len=10) == ""
    # the threshold itself is inclusive
    third = "<p>abcdefghijklmnopqrst<a href='/'>0123456789</a></p>"
    assert main_text(third, min_len=10, max_link_density=1 / 3) != ""
    # whitespace folding inside a block
    assert main_text(
        "<p>alpha\n   beta\t gamma delta epsilon zeta</p>"
    ) == "alpha beta gamma delta epsilon zeta"
    # a wrapping div does not double-report consumed paragraph text
    wrapped = ("<div><p>The first paragraph carries enough characters to "
               "pass the floor.</p></div>")
    assert main_text(wrapped).count("first paragraph") == 1
    # none/empty-safe
    assert main_text(None) == "" and main_text(b"") == ""


def test_main_text_nested_chrome_inheritance():
    # content nested ANYWHERE under a chrome container stays out
    html = ("<nav><div><ul><li>A perfectly long navigation item that would "
            "otherwise pass every shallow feature check.</li></ul></div></nav>"
            "<p>Real content sentence long enough to clear the floor.</p>")
    out = main_text(html)
    assert "navigation item" not in out
    assert "Real content" in out


def _w_udf(spark):
    from ant_spark.functions.readability import with_main_text

    df = spark.createDataFrame(
        [("a", _PAGE.encode()), ("b", None)], "doc_id string, html binary"
    )
    rows = {r["doc_id"]: r["main_text"] for r in with_main_text(df).collect()}
    assert rows["a"] == main_text(_PAGE)  # UDF == pure-python kernel
    assert rows["b"] == ""


def _w_crawl_main(spark):
    """CrawlConfig.text_mode='main': fetched_log.text is boilerplate-
    stripped in the same fused parse pass; link discovery (nav links
    included!) is unchanged, so the crawl frontier is identical."""
    import datetime as dt

    import pandas as pd

    from ant_spark import schemas
    from ant_spark.engine import CrawlConfig, Engine

    base = dt.datetime(2025, 1, 1, tzinfo=dt.timezone.utc)
    rows = [
        {"url": "http://m.test/", "warc_ts": base,
         "html": (b"<body><nav><a href='/about'>About</a></nav>"
                  b"<article><p>The harbor town kept its fishing fleet "
                  b"through generations of change.</p></article></body>"),
         "text": "", "lang": "en", "status": 200, "ok_after_attempt": None},
        {"url": "http://m.test/about", "warc_ts": base,
         "html": b"<body><p>About page body text long enough to keep.</p></body>",
         "text": "", "lang": "en", "status": 200, "ok_after_attempt": None},
    ]
    pages = spark.createDataFrame(pd.DataFrame(rows), schema=schemas.PAGES)
    res = Engine(
        spark, pages, None, CrawlConfig(max_rounds=4, text_mode="main")
    ).run(["http://m.test/"])
    got = {r["url"]: r["text"] for r in res.fetched_log.collect()}
    # nav link still crawled (frontier untouched) but its text is stripped
    assert set(got) == {"http://m.test/", "http://m.test/about"}
    assert got["http://m.test/"] == (
        "The harbor town kept its fishing fleet through generations of change."
    )
    assert got["http://m.test/about"] == (
        "About page body text long enough to keep."
    )


@pytest.fixture(scope="module")
def rd_runs(spark):
    from concurrent.futures import ThreadPoolExecutor

    works = {"udf": _w_udf, "crawl_main": _w_crawl_main}
    with ThreadPoolExecutor(max_workers=len(works)) as ex:
        futs = {n: ex.submit(fn, spark) for n, fn in works.items()}
    return futs


def test_main_text_udf(rd_runs):
    rd_runs["udf"].result()


def test_crawl_text_mode_main(rd_runs):
    rd_runs["crawl_main"].result()
