"""Minimal WHATWG-flavoured HTML DOM + CSS selectors on the stdlib.

The reference extracts links/text through golang.org/x/net/html (a WHATWG
HTML5 tree-construction parser) with these exact semantics:

- ``scan.Text`` (reference ``internal/scan/nodes.go:27-48``): depth-first
  concatenation of text-node data; recurses into *element* nodes only
  (comments skipped); NO whitespace normalization; script/style text IS
  included (they are element nodes containing text nodes).
- ``scan.Attr`` (``nodes.go:12-24``): first attribute with the key.
- ``Page.URLs`` (``page.go:98-100,116-139``): all ``a[href]`` in document
  order; hrefs parsed, invalid skipped, relative resolved against the page
  URL, then only http/https kept.

No HTML library ships in this container, so this module builds a small DOM on
``html.parser.HTMLParser`` with the tree-construction subset that matters for
a crawl corpus: implied <html>/<head>/<body>, void elements, the full HTML5
raw-text element set (script/style/textarea/title/xmp/iframe/noembed/
noframes/noscript/plaintext — tags inside are text, never links), RCDATA
character-reference decoding (title/textarea), table foster parenting
(non-table content moves before the table, reordering text/links like
x/net/html does), CDATA sections as text in svg/math foreign content, and
implied-end-tag handling for ``p``/``li``/table structure. It is NOT a full
HTML5 parser — known residual gaps vs x/net/html, all rare on real pages:
the adoption agency algorithm re-parents misnested formatting elements
(text/link ORDER is unaffected, so extraction output matches), a stray
``</plaintext>`` resumes parsing where the spec stays in PLAINTEXT to EOF,
and implied tbody/tr synthesis inside tables is skipped (affects selector
paths, not extraction). The synthetic corpus generator
(ant_spark.sources.webgraph) emits HTML inside this subset; golden tests pin
the fixture pages' extracted text, and a tag-soup differential fuzz pins
stream/DOM agreement over the widened alphabet.

Used exclusively inside Arrow-batched pandas UDFs (functions/parse.py) —
driver code never touches per-row HTML.
"""

from __future__ import annotations

import re
from functools import lru_cache
from html import unescape as _unescape
from html.parser import HTMLParser

TEXT = 0
ELEMENT = 1
COMMENT = 2
DOCTYPE = 3
DOCUMENT = 4

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)
# Elements whose start tag implicitly ends an open <p> (WHATWG subset).
P_CLOSERS = frozenset(
    "address article aside blockquote div dl fieldset footer form h1 h2 h3 h4 "
    "h5 h6 header hr main nav ol p pre section table ul".split()
)
HEAD_ELEMENTS = frozenset("title meta link base style script noscript".split())
# Raw-text content models (HTML5 tokenizer RAWTEXT/RCDATA/PLAINTEXT states):
# everything up to the matching end tag is TEXT — tags inside contribute no
# elements and no links, exactly as x/net/html tokenizes them (scripting
# enabled, the reference's html.Parse default, makes noscript RAWTEXT too).
# Subset note: after a stray explicit </plaintext> we resume parsing where
# the spec would stay in PLAINTEXT to EOF — real pages don't close it.
RAWTEXT_ELEMENTS = frozenset(
    "script style textarea title xmp iframe noembed noframes noscript "
    "plaintext".split()
)
# RCDATA (title/textarea) decodes character references; RAWTEXT does not.
RCDATA_ELEMENTS = frozenset(("title", "textarea"))
# HTML5 "in table" foster parenting: a start tag outside this set (or
# non-whitespace text) appearing while the insertion point is a row/table
# element is inserted BEFORE the nearest open table — x/net/html reorders
# the tree (and thus scan.Text/Page.URLs order) accordingly.
TABLE_SCOPE = frozenset("table tbody thead tfoot tr".split())
TABLE_ALLOWED = frozenset(
    "caption colgroup col thead tbody tfoot tr td th script style template "
    "form".split()
)
_TABLE_STRUCTURAL = frozenset(
    "tr td th tbody thead tfoot caption colgroup col".split()
)
_TABLE_BOUNDARY = TABLE_SCOPE | frozenset(("td", "th", "caption"))


class Node:
    __slots__ = ("type", "tag", "attrs", "data", "children", "parent")

    def __init__(self, type_, tag="", attrs=None, data=""):
        self.type = type_
        self.tag = tag
        self.attrs = attrs or []  # list[(key, value)] — first occurrence wins
        self.data = data
        self.children: list[Node] = []
        self.parent: Node | None = None

    def append(self, child: "Node") -> None:
        child.parent = self
        self.children.append(child)

    def attr(self, key: str):
        """First attribute value by key (reference nodes.go:12-24)."""
        for k, v in self.attrs:
            if k == key:
                return v if v is not None else ""
        return None

    def __repr__(self):  # pragma: no cover - debug aid
        if self.type == ELEMENT:
            return f"<{self.tag} {self.attrs}>"
        return f"Node({self.type}, {self.data[:20]!r})"


def text(node: Node | None) -> str:
    """Inner text per reference internal/scan/nodes.go:27-48.

    Text node → its data verbatim. Otherwise concatenate, depth-first, the
    data of child text nodes and the text() of child *elements*; comments and
    doctypes contribute nothing; no trimming or whitespace folding.
    """
    if node is None:
        return ""
    if node.type == TEXT:
        return node.data
    out: list[str] = []
    _text_into(node, out)
    return "".join(out)


def _text_into(node: Node, out: list[str]) -> None:
    for c in node.children:
        if c.type == TEXT:
            out.append(c.data)
        elif c.type == ELEMENT:
            _text_into(c, out)


class _DomParser(HTMLParser):
    """Tree builder with implied html/head/body and void/implied-end tags."""

    # widen html.parser's script/style-only raw-text handling to the full
    # HTML5 RAWTEXT/RCDATA/PLAINTEXT element set (tags inside become text)
    CDATA_CONTENT_ELEMENTS = tuple(sorted(RAWTEXT_ELEMENTS))

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.document = Node(DOCUMENT)
        self._stack: list[Node] = []
        self._html: Node | None = None
        self._head: Node | None = None
        self._body: Node | None = None
        self._mode = "initial"  # initial → before_body → in_body

    # -- structure helpers -------------------------------------------------
    def _ensure_html(self) -> Node:
        if self._html is None:
            self._html = Node(ELEMENT, "html")
            self.document.append(self._html)
        return self._html

    def _ensure_head(self) -> Node:
        html = self._ensure_html()
        if self._head is None:
            self._head = Node(ELEMENT, "head")
            html.append(self._head)
        return self._head

    def _ensure_body(self) -> Node:
        html = self._ensure_html()
        self._ensure_head()
        if self._body is None:
            self._body = Node(ELEMENT, "body")
            html.append(self._body)
        self._mode = "in_body"
        return self._body

    def _current(self) -> Node:
        if self._stack:
            return self._stack[-1]
        if self._mode == "in_body" and self._body is not None:
            return self._body
        return self.document

    # -- HTMLParser callbacks ----------------------------------------------
    def handle_decl(self, decl):
        self.document.append(Node(DOCTYPE, data=decl))

    def handle_comment(self, data):
        self._current().append(Node(COMMENT, data=data))

    def handle_starttag(self, tag, attrs):
        if tag == "html":
            html = self._ensure_html()
            if not html.attrs:
                html.attrs = list(attrs)
            return
        if tag == "head":
            if self._body is not None or self._stack:
                return  # HTML5 "in body": a stray <head> start is ignored
            head = self._ensure_head()
            if not head.attrs:
                head.attrs = list(attrs)
            self._mode = "before_body"
            return
        if tag == "body":
            body = self._ensure_body()
            if not body.attrs:
                body.attrs = list(attrs)
            return

        if not self._stack:
            # Top-level element: route to head or body like WHATWG does.
            if self._body is None and tag in HEAD_ELEMENTS:
                parent = self._ensure_head()
            else:
                parent = self._ensure_body()
        else:
            parent = self._implied_end(tag)

        node = Node(ELEMENT, tag, list(attrs))
        if (
            parent.type == ELEMENT
            and parent.tag in TABLE_SCOPE
            and tag not in TABLE_ALLOWED
        ):
            self._foster_insert(node, parent)
        else:
            parent.append(node)
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)

    def _foster_insert(self, node: Node, fallback: Node) -> None:
        """HTML5 foster parenting: insert ``node`` immediately before the
        nearest open <table> (x/net/html does the same, so text/link order
        over fostered content matches the reference)."""
        for i in range(len(self._stack) - 1, -1, -1):
            t = self._stack[i]
            if t.tag == "table" and t.parent is not None:
                parent = t.parent
                node.parent = parent
                parent.children.insert(parent.children.index(t), node)
                return
        fallback.append(node)  # degenerate (tbody with no open table)

    def _implied_end(self, incoming: str) -> Node:
        """Pop elements whose end tag is implied by the incoming start tag."""
        self._table_pop(incoming)
        if not self._stack:
            return self._current()
        cur = self._stack[-1]
        if cur.tag == "p" and incoming in P_CLOSERS:
            self._stack.pop()
        elif cur.tag == "li" and incoming == "li":
            self._stack.pop()
        elif cur.tag in ("dt", "dd") and incoming in ("dt", "dd"):
            self._stack.pop()
        elif cur.tag in ("td", "th") and incoming in ("td", "th", "tr"):
            self._stack.pop()
            if self._stack and self._stack[-1].tag == "tr" and incoming == "tr":
                self._stack.pop()
        elif cur.tag == "tr" and incoming == "tr":
            self._stack.pop()
        elif cur.tag == "option" and incoming in ("option", "optgroup"):
            self._stack.pop()
        return self._current()

    def _table_pop(self, incoming: str) -> None:
        """An incoming table-structural tag generates implied end tags for
        open non-table elements (fostered wrappers, unclosed formatting)
        down to the nearest table-context boundary — so ``<table><div>x<tr>``
        puts the row in the table, not inside the fostered div."""
        if incoming not in _TABLE_STRUCTURAL:
            return
        if not any(n.tag == "table" for n in self._stack):
            return
        while self._stack and self._stack[-1].tag not in _TABLE_BOUNDARY:
            self._stack.pop()

    def handle_startendtag(self, tag, attrs):
        # <br/> style — treat like a start tag of a void-ish element.
        if tag in ("html", "head", "body"):
            self.handle_starttag(tag, attrs)
            return
        if not self._stack:
            if self._body is None and tag in HEAD_ELEMENTS:
                parent = self._ensure_head()
            else:
                parent = self._ensure_body()
        else:
            parent = self._current()
        node = Node(ELEMENT, tag, list(attrs))
        if (
            parent.type == ELEMENT
            and parent.tag in TABLE_SCOPE
            and tag not in TABLE_ALLOWED
        ):
            self._foster_insert(node, parent)
        else:
            parent.append(node)

    def handle_endtag(self, tag):
        if tag in ("html", "head", "body"):
            if tag == "head" and self._body is None and not self._stack:
                self._mode = "before_body"  # in body: stray </head> ignored
            return
        # Pop to the nearest matching open element (ignore stray end tags).
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if not data:
            return
        if self._stack:
            cur = self._stack[-1]
            if cur.tag in RCDATA_ELEMENTS:
                # RCDATA decodes character references (RAWTEXT keeps them
                # raw — html.parser's cdata mode skips convert_charrefs)
                data = _unescape(data)
            if cur.tag in TABLE_SCOPE and data.strip():
                # non-whitespace text in table context foster-parents
                node = Node(TEXT, data=data)
                self._foster_insert(node, cur)
            else:
                cur.append(Node(TEXT, data=data))
            return
        # Text at top level: whitespace before body is dropped (WHATWG
        # "before head"/"before body" modes); other text forces a body.
        if self._mode != "in_body" and data.strip() == "":
            return
        self._ensure_body().append(Node(TEXT, data=data))

    def unknown_decl(self, decl):
        # <![CDATA[...]]> is TEXT in foreign content (svg/math) and a bogus
        # comment everywhere else — x/net/html does the same.
        if decl.startswith("CDATA[") and any(
            n.tag in ("svg", "math") for n in self._stack
        ):
            self._current().append(Node(TEXT, data=decl[6:]))
        else:
            self._current().append(Node(COMMENT, data=decl))

    def flush_cdata_eof(self) -> None:
        """EOF inside a raw-text element (unclosed <plaintext>/<xmp>/…):
        html.parser leaves the tail buffered; HTML5 emits it as text."""
        if getattr(self, "cdata_elem", None) and self.rawdata:
            data, self.rawdata = self.rawdata, ""
            self.handle_data(data)


def parse(html: str | bytes) -> Node:
    """Parse HTML into a document node (reference page.go:61-69 analogue).

    Always succeeds on any input (like x/net/html, which is error-tolerant);
    bytes are decoded as UTF-8 with replacement.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _DomParser()
    p.feed(html)
    p.close()
    p.flush_cdata_eof()
    p._ensure_body()  # documents always end up with html/head/body
    return p.document


# --------------------------------------------------------------------------
# CSS selectors — the subset the reference's scrape specs exercise
# (reference internal/selectors caches compiled cascadia selectors,
# selectors.go:14-51; we cache compiled matchers with lru_cache).
# Grammar: group = sel ("," sel)* ; sel = simple ((" "|">") simple)* ;
# simple = [tag|*] ("#id" | ".class" | "[attr]" | "[attr=val]")*

_SIMPLE_RE = re.compile(
    r"(?P<tag>[a-zA-Z][\w-]*|\*)?"
    r"(?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)$"
)
_PART_RE = re.compile(r"[.#][\w-]+|\[[^\]]+\]")


class _Simple:
    __slots__ = ("tag", "id", "classes", "attrs")

    def __init__(self, tag, id_, classes, attrs):
        self.tag = tag
        self.id = id_
        self.classes = classes
        self.attrs = attrs  # list[(key, value-or-None)]

    def matches(self, node: Node) -> bool:
        if node.type != ELEMENT:
            return False
        if self.tag and self.tag != "*" and node.tag != self.tag:
            return False
        if self.id is not None and node.attr("id") != self.id:
            return False
        if self.classes:
            cls = (node.attr("class") or "").split()
            for c in self.classes:
                if c not in cls:
                    return False
        for k, v in self.attrs:
            got = node.attr(k)
            if got is None:
                return False
            if v is not None and got != v:
                return False
        return True


def _parse_simple(token: str) -> _Simple:
    m = _SIMPLE_RE.match(token)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise ValueError(f"unsupported selector: {token!r}")
    tag = m.group("tag")
    id_ = None
    classes: list[str] = []
    attrs: list[tuple[str, str | None]] = []
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("."):
            classes.append(part[1:])
        elif part.startswith("#"):
            id_ = part[1:]
        else:
            inner = part[1:-1]
            if "=" in inner:
                k, _, v = inner.partition("=")
                attrs.append((k.strip(), v.strip().strip("\"'")))
            else:
                attrs.append((inner.strip(), None))
    return _Simple(tag.lower() if tag else None, id_, classes, attrs)


class Selector:
    """A compiled selector group; match_all returns document-order nodes."""

    def __init__(self, source: str):
        self.source = source
        self._alts: list[list[tuple[str, _Simple]]] = []
        for alt in source.split(","):
            alt = alt.strip()
            if not alt:
                raise ValueError(f"empty selector in {source!r}")
            # tokenize on combinators, preserving '>'
            toks = re.split(r"\s*(>)\s*|\s+", alt)
            chain: list[tuple[str, _Simple]] = []
            comb = " "
            for t in toks:
                if t is None or t == "":
                    continue
                if t == ">":
                    comb = ">"
                    continue
                chain.append((comb, _parse_simple(t)))
                comb = " "
            if not chain:
                raise ValueError(f"unsupported selector: {source!r}")
            self._alts.append(chain)

    def _chain_matches(self, node: Node, chain) -> bool:
        comb, simple = chain[-1]
        if not simple.matches(node):
            return False
        rest = chain[:-1]
        if not rest:
            return True
        anc = node.parent
        if comb == ">":
            return anc is not None and self._chain_matches(anc, rest)
        while anc is not None:
            if self._chain_matches(anc, rest):
                return True
            anc = anc.parent
        return False

    def matches(self, node: Node) -> bool:
        return any(self._chain_matches(node, c) for c in self._alts)

    def match_all(self, root: Node) -> list[Node]:
        out: list[Node] = []
        stack = [root]
        order: list[Node] = []
        # iterative pre-order DFS = document order (cascadia MatchAll parity)
        while stack:
            n = stack.pop()
            order.append(n)
            stack.extend(reversed(n.children))
        for n in order:
            if n.type == ELEMENT and self.matches(n):
                out.append(n)
        return out

    def match_first(self, root: Node) -> Node | None:
        nodes = self.match_all(root)
        return nodes[0] if nodes else None


@lru_cache(maxsize=4096)
def compile_selector(source: str) -> Selector:
    """Compile-once cache, per executor process (reference selectors.go:39-51)."""
    return Selector(source)


class _StreamExtractor(HTMLParser):
    """DOM-less single-pass extractor for the parse-UDF hot path.

    Text-node concatenation order equals document order for every
    tree-construction rule EXCEPT table foster parenting (which moves
    content before the table, i.e. earlier than source order). So the
    extractor routes output through per-table SINKS: each open <table>
    buffers its internal text/hrefs and flushes them when it closes, while
    fostered content (and everything outside tables) emits to the enclosing
    sink immediately — reproducing the DOM's pre-order exactly. The
    _DomParser *inclusion* rule is mirrored too: a data chunk is kept iff
    the element stack is non-empty (html/head/body are never pushed there)
    OR the body has been implicitly/explicitly opened. Parity with the DOM
    path is pinned by tests over the full synthetic corpus + fixtures and
    the tag-soup differential fuzz.
    """

    CDATA_CONTENT_ELEMENTS = _DomParser.CDATA_CONTENT_ELEMENTS

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        self.hrefs: list[str] = []
        self.title: str | None = None
        self._base = (self.text_parts, self.hrefs)
        # mirrors _DomParser._stack: (tag, content_sink, table_outer_sink)
        self._stack: list[tuple] = []
        self._in_body = False  # mirrors _mode == "in_body"
        self._title_open = False
        self._title_parts: list[str] = []

    # -- sink plumbing ----------------------------------------------------
    def _current_sink(self) -> tuple:
        return self._stack[-1][1] if self._stack else self._base

    def _foster_sink(self) -> tuple:
        """Sink of the nearest open table's OUTER context (where fostered
        content lands — immediately before the table in DOM order)."""
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == "table":
                return self._stack[i][2]
        return self._current_sink()

    def _pop_one(self) -> tuple:
        tag, sink, outer = self._stack.pop()
        if tag == "table" and outer is not None:
            outer[0].extend(sink[0])  # table internals flush AFTER the
            outer[1].extend(sink[1])  # fostered/pre-table content
        return tag, sink, outer

    def _open(self, tag, attrs, push: bool):
        if tag == "html":
            return
        if tag == "head":
            if self._in_body or self._stack:
                return  # HTML5 "in body": a stray <head> start is ignored
            self._in_body = False  # _DomParser sets mode = "before_body"
            return
        if tag == "body":
            self._in_body = True
            return
        if not self._stack and not self._in_body and tag not in HEAD_ELEMENTS:
            self._in_body = True  # _ensure_body() trigger
        if tag == "title" and self.title is None and not self._title_open:
            self._title_open = True
            self._title_parts = []
        if push:
            self._implied_end(tag)  # void starts (e.g. <hr>) imply ends too
        # insertion sink AFTER implied-end pops, fostered out of table scope
        if (
            self._stack
            and self._stack[-1][0] in TABLE_SCOPE
            and tag not in TABLE_ALLOWED
        ):
            ins = self._foster_sink()
        else:
            ins = self._current_sink()
        if tag == "a":
            for k, v in attrs:
                if k == "href":
                    ins[1].append(v if v is not None else "")
                    break
        if push and tag not in VOID_ELEMENTS:
            if tag == "table":
                self._stack.append((tag, ([], []), ins))
            else:
                self._stack.append((tag, ins, None))

    def _implied_end(self, incoming: str) -> None:
        """Mirror _DomParser._implied_end stack pops (affects emptiness)."""
        self._table_pop(incoming)
        s = self._stack
        if not s:
            return
        cur = s[-1][0]
        if cur == "p" and incoming in P_CLOSERS:
            self._pop_one()
        elif cur == "li" and incoming == "li":
            self._pop_one()
        elif cur in ("dt", "dd") and incoming in ("dt", "dd"):
            self._pop_one()
        elif cur in ("td", "th") and incoming in ("td", "th", "tr"):
            self._pop_one()
            if s and s[-1][0] == "tr" and incoming == "tr":
                self._pop_one()
        elif cur == "tr" and incoming == "tr":
            self._pop_one()
        elif cur == "option" and incoming in ("option", "optgroup"):
            self._pop_one()

    def _table_pop(self, incoming: str) -> None:
        """Mirror _DomParser._table_pop (implied ends before structural
        table tags)."""
        if incoming not in _TABLE_STRUCTURAL:
            return
        if not any(e[0] == "table" for e in self._stack):
            return
        while self._stack and self._stack[-1][0] not in _TABLE_BOUNDARY:
            self._pop_one()

    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, push=True)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, push=False)
        # a self-closing <title/> ends the capture only when IT opened it —
        # with an outer <title> still on the stack (nested titles), the DOM
        # path keeps collecting text into the outer element
        if (
            tag == "title"
            and self._title_open
            and not any(e[0] == "title" for e in self._stack)
        ):
            self.title = ""
            self._title_open = False

    def handle_endtag(self, tag):
        if tag in ("html", "body"):
            return
        if tag == "head":
            if not self._in_body and not self._stack:
                self._in_body = False  # mirror _DomParser: only honored
                # before any body content (stray in-body </head> ignored)
            return
        # pop to nearest match, like _DomParser.handle_endtag; the capture
        # closes only when NO title element remains open afterwards — a
        # nested </title> (or a sweep that leaves an outer title) must keep
        # capturing, because the DOM's first-title text spans the outer node
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i][0] == tag:
                swept = [e[0] for e in self._stack[i:]]
                while len(self._stack) > i:  # innermost-first: nested
                    self._pop_one()  # tables flush into their outers
                if (
                    self._title_open
                    and "title" in swept
                    and not any(e[0] == "title" for e in self._stack)
                ):
                    self.title = "".join(self._title_parts)
                    self._title_open = False
                break

    def handle_data(self, data):
        if not data:
            return
        if not self._stack and not self._in_body and data.strip() == "":
            return  # dropped by _DomParser.handle_data's top-level rule
        if not self._stack and not self._in_body:
            self._in_body = True  # non-ws top-level text forces a body
        if self._stack:
            cur = self._stack[-1][0]
            if cur in RCDATA_ELEMENTS:
                data = _unescape(data)  # mirror _DomParser RCDATA decode
            if cur in TABLE_SCOPE and data.strip():
                sink = self._foster_sink()  # foster-parented text
            else:
                sink = self._stack[-1][1]
        else:
            sink = self._base
        sink[0].append(data)
        if self._title_open:
            self._title_parts.append(data)

    def unknown_decl(self, decl):
        # CDATA section: text in foreign content, ignored elsewhere
        # (mirror _DomParser.unknown_decl; comments contribute nothing)
        if decl.startswith("CDATA[") and any(
            e[0] in ("svg", "math") for e in self._stack
        ):
            self._current_sink()[0].append(decl[6:])

    flush_cdata_eof = _DomParser.flush_cdata_eof

    def finish(self) -> None:
        """EOF: flush unclosed cdata text and tables, settle title."""
        self.flush_cdata_eof()
        while self._stack:
            self._pop_one()
        if self.title is None and self._title_open:  # unclosed <title>
            self.title = "".join(self._title_parts)


def stream_extract(html: str | bytes) -> tuple[str, list[str], str]:
    """One streaming pass → (text, hrefs, title); no DOM allocated."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _StreamExtractor()
    p.feed(html)
    p.close()
    p.finish()
    return "".join(p.text_parts), p.hrefs, p.title or ""


def fast_extract(root: Node) -> tuple[str, list[str], str]:
    """One DFS pass → (text, hrefs-in-document-order, title).

    Equivalent to text(root) + match_all('a[href]') hrefs + first 'title'
    text, fused into a single traversal — the hot path of the parse UDF when
    no scrape spec / custom link selector is configured. Semantics identical
    to the general path (pinned by tests).
    """
    text_parts: list[str] = []
    hrefs: list[str] = []
    title: str | None = None
    # iterative pre-order DFS, matching document order
    stack = [root]
    while stack:
        n = stack.pop()
        t = n.type
        if t == TEXT:
            text_parts.append(n.data)
            continue
        if t == ELEMENT:
            tag = n.tag
            if tag == "a":
                href = n.attr("href")
                if href is not None:
                    hrefs.append(href)
            elif tag == "title" and title is None:
                title = text(n)
        elif t == COMMENT or t == DOCTYPE:
            continue
        c = n.children
        if c:
            stack.extend(reversed(c))
    return "".join(text_parts), hrefs, title or ""
