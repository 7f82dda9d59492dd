"""Character-encoding sniffing for real-web HTML bytes.

The reference hands ``resp.Body`` straight to ``html.Parse``
(``page.go:61-69``) after requesting ``Accept: text/html; charset=UTF-8``
(``fetcher.go:223``) — i.e. it assumes UTF-8 on the wire. A corpus built
from WARC archives can't: Common Crawl carries windows-1252, Shift_JIS,
GBK, UTF-16 … pages, so the decode step is part of the engine surface.

``sniff_encoding`` follows the WHATWG "determining the character encoding"
order (the same one golang.org/x/net/html/charset.DetermineEncoding
implements):

1. **BOM** — UTF-8 / UTF-16LE / UTF-16BE byte-order marks are certain.
2. **Transport** — a valid ``charset=`` parameter from the Content-Type
   header, mapped through the WHATWG label table.
3. **Meta prescan** — the first 1024 bytes are scanned for
   ``<meta charset=…>`` / ``<meta http-equiv=content-type content="…"``
   (ASCII-compatible superset scan, the spec's prescan subset). A meta
   that declares UTF-16 means the document was *authored* as UTF-16 but is
   being read as bytes — the spec says treat it as UTF-8.
4. **Content fallback** — strict-UTF-8 trial over the payload; on failure,
   windows-1252 (the spec's usual locale default, and what
   DetermineEncoding falls back to). The UTF-8 trial is the one deliberate
   refinement over DetermineEncoding's unconditional windows-1252: valid
   UTF-8 without a declaration is overwhelmingly actual UTF-8 on the
   modern web, and the trial is deterministic.

``decode_html`` applies the sniff and never raises: the chosen codec
decodes with ``errors="replace"`` so one mangled page can't kill an
executor task. All of this is pure-Python over the leading bytes — it runs
inside the Arrow-batched parse UDF, never on the driver.
"""

from __future__ import annotations

import codecs
import re

# WHATWG encoding label table (subset: the labels that appear in web
# corpora; keys lowercased). Notably iso-8859-1/latin1/ascii are
# windows-1252 BY SPEC, and bare "utf-16" means little-endian.
_WHATWG_LABELS: dict[str, str] = {
    "utf-8": "utf-8", "utf8": "utf-8", "unicode-1-1-utf-8": "utf-8",
    "iso-8859-1": "windows-1252", "latin1": "windows-1252",
    "latin-1": "windows-1252", "iso8859-1": "windows-1252",
    "iso_8859-1": "windows-1252", "l1": "windows-1252",
    "ascii": "windows-1252", "us-ascii": "windows-1252",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "x-cp1252": "windows-1252", "ansi_x3.4-1968": "windows-1252",
    "iso-8859-2": "iso8859-2", "latin2": "iso8859-2",
    "iso-8859-5": "iso8859-5",
    "iso-8859-7": "iso8859-7", "greek": "iso8859-7",
    "iso-8859-9": "windows-1254", "latin5": "windows-1254",
    "iso-8859-15": "iso8859-15", "latin9": "iso8859-15",
    "windows-1250": "windows-1250", "cp1250": "windows-1250",
    "windows-1251": "windows-1251", "cp1251": "windows-1251",
    "windows-1253": "windows-1253",
    "windows-1254": "windows-1254", "cp1254": "windows-1254",
    "windows-1255": "windows-1255", "windows-1256": "windows-1256",
    "windows-1257": "windows-1257", "windows-1258": "windows-1258",
    "koi8-r": "koi8-r", "koi8": "koi8-r", "koi8-u": "koi8-u",
    "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "x-sjis": "shift_jis", "ms_kanji": "shift_jis",
    "euc-jp": "euc-jp", "x-euc-jp": "euc-jp",
    "iso-2022-jp": "iso2022_jp",
    "gbk": "gbk", "gb2312": "gbk", "gb_2312": "gbk", "x-gbk": "gbk",
    "chinese": "gbk", "csgb2312": "gbk",
    "gb18030": "gb18030",
    "big5": "big5", "big5-hkscs": "big5hkscs", "cn-big5": "big5",
    "euc-kr": "euc-kr", "korean": "euc-kr", "ksc_5601": "euc-kr",
    "windows-949": "euc-kr",
    "utf-16": "utf-16-le", "utf-16le": "utf-16-le", "utf-16be": "utf-16-be",
    "tis-620": "cp874", "windows-874": "cp874", "iso-8859-11": "cp874",
    "macintosh": "mac-roman", "x-mac-roman": "mac-roman",
}

_UTF16_CODECS = frozenset(("utf-16-le", "utf-16-be"))

# prescan: <meta …> tags within the sniff window; charset attr or the
# http-equiv content-type form. bytes-level, ASCII-case-insensitive.
_META_RE = re.compile(rb"<meta\s[^>]*>", re.IGNORECASE | re.DOTALL)
_CHARSET_RE = re.compile(
    rb"""charset\s*=\s*["']?\s*([a-zA-Z0-9_\-:.]+)""", re.IGNORECASE
)
_SNIFF_WINDOW = 1024


def lookup_label(label: str | None) -> str | None:
    """WHATWG label → python codec name; None for unknown/absent labels."""
    if not label:
        return None
    enc = _WHATWG_LABELS.get(label.strip().strip("\"'").lower())
    if enc is None:
        return None
    try:
        codecs.lookup(enc)
    except LookupError:  # pragma: no cover - table entries all resolve
        return None
    return enc


def charset_from_content_type(content_type: str | None) -> str | None:
    """``text/html; charset=ISO-8859-1`` → ``windows-1252`` (labels mapped)."""
    if not content_type:
        return None
    m = _CHARSET_RE.search(content_type.encode("ascii", "ignore"))
    return lookup_label(m.group(1).decode("ascii")) if m else None


def _prescan_meta(head: bytes) -> str | None:
    for tag in _META_RE.finditer(head):
        m = _CHARSET_RE.search(tag.group(0))
        if m:
            enc = lookup_label(m.group(1).decode("ascii", "ignore"))
            if enc in _UTF16_CODECS:
                return "utf-8"  # spec: meta-declared UTF-16 is read as UTF-8
            if enc:
                return enc
    return None


def sniff_encoding(data: bytes, transport: str | None = None) -> str:
    """Codec for an HTML byte payload (see module docstring for the order)."""
    if data[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if data[:2] == b"\xff\xfe":
        return "utf-16-le"
    if data[:2] == b"\xfe\xff":
        return "utf-16-be"
    enc = charset_from_content_type(transport)
    if enc:
        return enc
    enc = _prescan_meta(data[:_SNIFF_WINDOW])
    if enc:
        return enc
    try:
        data.decode("utf-8", errors="strict")
        return "utf-8"
    except UnicodeDecodeError:
        return "windows-1252"


def decode_html(data: bytes | bytearray | memoryview | str | None,
                transport: str | None = None) -> str:
    """Sniff + decode; never raises (replacement chars over task kills).

    Hot-path shape: the overwhelmingly common case — no BOM, no transport
    charset, no meta declaration, valid UTF-8 — performs exactly ONE
    decode (the strict attempt IS the sniff's UTF-8 trial and its result
    is returned directly), so the sniff costs a 1 KB prescan, not a
    second pass over the payload."""
    if data is None:
        return ""
    if isinstance(data, str):
        return data
    raw = bytes(data)
    if raw[:3] == b"\xef\xbb\xbf":
        return raw[3:].decode("utf-8", errors="replace")
    if raw[:2] == b"\xff\xfe":
        return raw[2:].decode("utf-16-le", errors="replace")
    if raw[:2] == b"\xfe\xff":
        return raw[2:].decode("utf-16-be", errors="replace")
    enc = charset_from_content_type(transport) or _prescan_meta(
        raw[:_SNIFF_WINDOW]
    )
    if enc:
        return raw.decode(enc, errors="replace")
    try:
        return raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return raw.decode("windows-1252", errors="replace")
