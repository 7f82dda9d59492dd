"""WHATWG charset sniffing (functions/encoding.py): the decode step between
WARC bytes and the parse stage — BOM / transport / meta-prescan / UTF-8
trial / windows-1252, label table included."""

import pytest

from ant_spark.functions.encoding import (
    charset_from_content_type,
    decode_html,
    lookup_label,
    sniff_encoding,
)


def test_whatwg_label_table():
    # iso-8859-1 and friends are windows-1252 BY SPEC
    for label in ("ISO-8859-1", "latin1", "ascii", "us-ascii", "cp1252"):
        assert lookup_label(label) == "windows-1252", label
    assert lookup_label("UTF-8") == "utf-8"
    assert lookup_label("utf-16") == "utf-16-le"  # bare utf-16 = LE
    assert lookup_label("gb2312") == "gbk"  # spec folds gb2312 into gbk
    assert lookup_label("Shift_JIS") == "shift_jis"
    assert lookup_label("no-such-charset") is None
    assert lookup_label(None) is None


def test_content_type_param():
    assert charset_from_content_type("text/html; charset=ISO-8859-1") == \
        "windows-1252"
    assert charset_from_content_type('text/html; charset="utf-8"') == "utf-8"
    assert charset_from_content_type("text/html") is None
    assert charset_from_content_type(None) is None


def test_bom_beats_everything():
    # UTF-8 BOM wins over a lying meta AND a lying transport header
    data = "﻿<meta charset='shift_jis'><p>é</p>".encode("utf-8")
    assert sniff_encoding(data, transport="text/html; charset=koi8-r") == \
        "utf-8"
    assert "é" in decode_html(data)
    assert not decode_html(data).startswith("﻿")  # BOM stripped
    # UTF-16 BOMs
    assert sniff_encoding("﻿x".encode("utf-16-le")) == "utf-16-le"
    assert sniff_encoding("﻿x".encode("utf-16-be")) == "utf-16-be"
    assert decode_html("﻿hé".encode("utf-16-le")) == "hé"


def test_transport_beats_meta():
    data = "<meta charset='utf-8'><p>caf\xe9</p>".encode("windows-1252")
    assert sniff_encoding(data, "text/html; charset=windows-1252") == \
        "windows-1252"
    assert "café" in decode_html(data, "text/html; charset=windows-1252")


def test_meta_prescan_both_forms():
    d1 = b"<html><head><meta charset=windows-1251></head>"
    assert sniff_encoding(d1) == "windows-1251"
    d2 = (b'<meta http-equiv="Content-Type" '
          b'content="text/html; charset=Shift_JIS">')
    assert sniff_encoding(d2) == "shift_jis"
    # meta-declared UTF-16 is read as UTF-8 (spec rule)
    d3 = b"<meta charset=utf-16>"
    assert sniff_encoding(d3) == "utf-8"
    # prescan stops at 1024 bytes: a late meta does not bind
    late = b"<p>" + b"x" * 1100 + b"<meta charset=koi8-r>"
    assert sniff_encoding(late) == "utf-8"  # ascii passes the utf-8 trial
    # unknown label in meta falls through to the content trial
    assert sniff_encoding(b"<meta charset=klingon>\xe9") == "windows-1252"


def test_content_fallback_utf8_trial_then_cp1252():
    assert sniff_encoding("café 中文".encode("utf-8")) == "utf-8"
    # bare 0xE9 is invalid UTF-8 -> windows-1252 -> é (not U+FFFD)
    assert decode_html(b"caf\xe9") == "caf\xe9"
    # 0x80 in cp1252 is the euro sign, not a control char
    assert decode_html(b"price \x80 5") == "price € 5"


def test_decode_never_raises():
    assert decode_html(None) == ""
    assert decode_html("already str") == "already str"
    assert isinstance(decode_html(bytes(range(256))), str)
    # truncated utf-16 payload after a BOM still decodes (replacement ok)
    assert isinstance(decode_html(b"\xff\xfeab\xe9"), str)


def test_parse_and_stream_pick_up_declared_charset():
    from ant_spark.functions.htmldom import parse, stream_extract, text

    html = ("<html><head><meta charset=windows-1252></head>"
            "<body><a href='/caf\xe9.html'>caf\xe9</a></body>"
            ).encode("windows-1252")
    doc_text = text(parse(html))
    s_text, hrefs, _ = stream_extract(html)
    assert doc_text == s_text == "café"
    assert hrefs == ["/café.html"]
    # shift_jis page: 日本語 survives the DOM and stream paths identically
    sj = ("<meta http-equiv=content-type "
          "content='text/html; charset=shift_jis'>"
          "<p>日本語</p>").encode("shift_jis")
    assert text(parse(sj)) == stream_extract(sj)[0] == "日本語"


def test_parse_udf_decodes_cp1252_page(spark):
    """The Arrow-batched parse stage sniffs per row: a windows-1252 page
    and a utf-8 page in the same batch both extract correct text/links."""
    from ant_spark.functions.parse import with_parsed

    cp = ("<meta charset=iso-8859-1><body><a href='/f\xe9'>caf\xe9</a>"
          ).encode("windows-1252")
    u8 = "<body><a href='/u'>中文</a>".encode("utf-8")
    df = spark.createDataFrame(
        [("http://cp.test/", cp), ("http://u8.test/", u8)],
        "url string, html binary",
    )
    rows = {r["url"]: r["parsed"] for r in with_parsed(df).collect()}
    assert rows["http://cp.test/"]["text"] == "café"
    assert len(rows["http://cp.test/"]["links"]) == 1
    assert rows["http://cp.test/"]["links"][0].startswith("http://cp.test/f")
    assert rows["http://u8.test/"]["text"] == "中文"


def test_warc_source_surfaces_content_type(spark, tmp_path):
    """read_warc exposes the HTTP Content-Type header — the transport leg
    of the sniff — and the writer stamps text/html."""
    from ant_spark.sources.warc import _record_bytes, read_warc

    body = "<p>ol\xe1</p>".encode("windows-1252")
    rec = _record_bytes(
        "http://ct.test/", "2025-01-01T00:00:00Z", 200, body,
        content_type="text/html; charset=ISO-8859-1",
    )
    p = tmp_path / "ct.warc"
    p.write_bytes(rec)
    (row,) = read_warc(spark, str(p)).collect()
    assert row["content_type"] == "text/html; charset=ISO-8859-1"
    assert decode_html(bytes(row["html"]), row["content_type"]) == "<p>olá</p>"
