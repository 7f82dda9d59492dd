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
implied-end-tag handling for ``p``/``li``/table structure, the active
formatting elements list with full reconstruction + the adoption agency
algorithm (misnested ``<b><i></b></i>`` re-parents exactly as x/net/html
does, implicitly-closed formatting re-opens before later content — re-run
``<a href>`` clones re-emit their link), and implied tbody/tr synthesis
(``<table><td>`` yields the table>tbody>tr>td selector path), and
PLAINTEXT-to-EOF (a stray ``</plaintext>`` is character data — the HTML5
tokenizer has no exit from the PLAINTEXT state). It is NOT a full HTML5
parser, but no known divergence from x/net/html remains on the covered
construct set. The synthetic corpus generator
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
# HTML5 "formatting" category — tracked on the list of active formatting
# elements; misnested end tags run the adoption agency algorithm and
# implicitly-closed entries re-open (clone) before later content, exactly
# as x/net/html re-parents them.
FORMATTING_ELEMENTS = frozenset(
    "a b big code em font i nobr s small strike strong tt u".split()
)
# afe scope markers (spec also lists applet/object/marquee/template; the
# crawl subset needs the table-cell boundaries that stop formatting leaks)
_AFE_MARKER_TAGS = frozenset(("td", "th", "caption"))
_AFE_MARKER = object()  # sentinel entry in the active formatting list
# WHATWG "special" category (HTML namespace) — the furthest-block test in
# the adoption agency algorithm; ordinary phrasing elements (span, ruby,
# unknown tags) are NOT special and never act as a furthest block.
_SPECIAL_ELEMENTS = frozenset(
    "address applet area article aside base basefont bgsound blockquote "
    "body br button caption center col colgroup dd details dir div dl dt "
    "embed fieldset figcaption figure footer form frame frameset h1 h2 h3 "
    "h4 h5 h6 head header hgroup hr html iframe img input li link listing "
    "main marquee menu meta nav noembed noframes noscript object ol p "
    "param plaintext pre script section select source style summary table "
    "tbody td template textarea tfoot th thead title tr track ul wbr "
    "xmp".split()
)
# Start tags that do NOT reconstruct active formatting elements before
# insertion (the WHATWG in-body block/structural set; everything else —
# phrasing content, voids like <br>/<img>, unknown tags — reconstructs).
_NO_RECONSTRUCT = (
    P_CLOSERS
    | frozenset("li dd dt".split())
    | frozenset("caption col colgroup tbody td tfoot th thead tr".split())
    | (RAWTEXT_ELEMENTS - frozenset(("xmp",)))
    | HEAD_ELEMENTS
)
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
        # list of active formatting elements: Node refs + scope markers
        self._afe: list = []

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

    # -- active formatting elements (WHATWG list + adoption agency) --------
    def _afe_push(self, node: Node) -> None:
        """Push with the Noah's Ark clause: at most 3 entries with the same
        tag+attrs since the last marker (the EARLIEST such entry drops)."""
        same = []
        for e in reversed(self._afe):
            if e is _AFE_MARKER:
                break
            if e.tag == node.tag and e.attrs == node.attrs:
                same.append(e)
        if len(same) >= 3:
            self._afe.remove(same[-1])
        self._afe.append(node)

    def _afe_clear_to_marker(self) -> None:
        while self._afe:
            if self._afe.pop() is _AFE_MARKER:
                return

    def _afe_find(self, tag: str) -> Node | None:
        """Last afe entry with this tag, not crossing a scope marker."""
        for e in reversed(self._afe):
            if e is _AFE_MARKER:
                return None
            if e.tag == tag:
                return e
        return None

    def _insert_element(self, node: Node, parent: Node) -> None:
        """Insert honoring table foster parenting (the one rule that moves
        content) — shared by normal insertion, reconstruction and AAA."""
        if (
            parent.type == ELEMENT
            and parent.tag in TABLE_SCOPE
            and node.tag not in TABLE_ALLOWED
        ):
            self._foster_insert(node, parent)
        else:
            parent.append(node)

    def _reconstruct_afe(self) -> None:
        """Re-open (clone) formatting elements that were implicitly closed
        — WHATWG 'reconstruct the active formatting elements'."""
        afe = self._afe
        if not afe:
            return
        last = afe[-1]
        if last is _AFE_MARKER or last in self._stack:
            return
        i = len(afe) - 1
        while i > 0:
            e = afe[i - 1]
            if e is _AFE_MARKER or e in self._stack:
                break
            i -= 1
        for j in range(i, len(afe)):
            entry = afe[j]
            clone = Node(ELEMENT, entry.tag, list(entry.attrs))
            self._insert_element(clone, self._current())
            self._stack.append(clone)
            afe[j] = clone

    def _adoption(self, subject: str) -> None:
        """The adoption agency algorithm (WHATWG tree construction; the
        x/net/html behavior for misnested formatting end tags): re-parents
        <b><i></b></i> style misnesting and splits formatting around blocks
        (<b>x<div>y</b>z → b>x, div>(b>y, z))."""
        stack, afe = self._stack, self._afe
        for _ in range(8):  # outer loop
            if stack and stack[-1].tag == subject and stack[-1] not in afe:
                stack.pop()
                return
            fe = self._afe_find(subject)
            if fe is None:
                # any-other-end-tag: pop to the nearest matching element
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i].tag == subject:
                        del stack[i:]
                        return
                return
            if fe not in stack:
                afe.remove(fe)
                return
            fe_idx = stack.index(fe)
            fb = None  # furthest block: first special element below fe
            fb_idx = -1
            for i in range(fe_idx + 1, len(stack)):
                if stack[i].tag in _SPECIAL_ELEMENTS:
                    fb, fb_idx = stack[i], i
                    break
            if fb is None:
                del stack[fe_idx:]
                afe.remove(fe)
                return
            common = stack[fe_idx - 1] if fe_idx > 0 else self._ensure_body()
            bookmark = afe.index(fe)
            node = last_node = fb
            idx = fb_idx
            inner = 0
            while True:  # inner loop
                inner += 1
                idx -= 1
                node = stack[idx]
                if node is fe:
                    break
                if inner > 3 and node in afe:
                    afe.remove(node)
                if node not in afe:
                    del stack[idx]
                    continue
                clone = Node(ELEMENT, node.tag, list(node.attrs))
                afe[afe.index(node)] = clone
                stack[idx] = clone
                node = clone
                if last_node is fb:
                    bookmark = afe.index(clone) + 1
                if last_node.parent is not None:
                    last_node.parent.children.remove(last_node)
                node.append(last_node)
                last_node = node
            if last_node.parent is not None:
                last_node.parent.children.remove(last_node)
                last_node.parent = None
            self._insert_element(last_node, common)
            clone = Node(ELEMENT, fe.tag, list(fe.attrs))
            for c in fb.children:
                c.parent = clone
            clone.children = fb.children
            fb.children = []
            fb.append(clone)
            old = afe.index(fe)
            if old < bookmark:
                bookmark -= 1
            afe.remove(fe)
            afe.insert(bookmark, clone)
            stack.remove(fe)
            stack.insert(stack.index(fb) + 1, clone)

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

        in_head = parent is self._head
        if tag == "a" and self._afe_find("a") is not None:
            # WHATWG <a>-in-<a>: adoption agency closes the open one, any
            # survivor drops from both lists before the new <a> inserts.
            self._adoption("a")
            prev = self._afe_find("a")
            if prev is not None:
                self._afe.remove(prev)
                if prev in self._stack:
                    self._stack.remove(prev)
            parent = self._current()
        if not in_head and tag not in _NO_RECONSTRUCT:
            self._reconstruct_afe()
            parent = self._current()
        # implied tbody/tr synthesis ("in table"/"in table body" modes):
        # <table><tr> gets a tbody, <table><td> gets tbody+tr — x/net/html
        # selector paths (table > tbody > tr > td) hold on sloppy tables.
        if parent.type == ELEMENT:
            if tag == "tr" and parent.tag == "table":
                parent = self._synth_open(parent, "tbody")
            elif tag in ("td", "th"):
                if parent.tag == "table":
                    parent = self._synth_open(parent, "tbody")
                if parent.tag in ("tbody", "thead", "tfoot"):
                    parent = self._synth_open(parent, "tr")

        node = Node(ELEMENT, tag, list(attrs))
        self._insert_element(node, parent)
        if tag not in VOID_ELEMENTS:
            self._stack.append(node)
        if tag in FORMATTING_ELEMENTS:
            self._afe_push(node)
        elif tag in _AFE_MARKER_TAGS:
            self._afe.append(_AFE_MARKER)

    def _synth_open(self, parent: Node, tag: str) -> Node:
        """Synthesize an implied table-section element and open it."""
        n = Node(ELEMENT, tag)
        parent.append(n)
        self._stack.append(n)
        return n

    def _foster_insert(self, node: Node, fallback: Node) -> None:
        """HTML5 foster parenting: insert ``node`` immediately before the
        nearest open <table> (x/net/html does the same, so text/link order
        over fostered content matches the reference)."""
        for i in range(len(self._stack) - 1, -1, -1):
            t = self._stack[i]
            if t.tag == "table" and t.parent is not None:
                # degenerate-soup cycle guard: never insert a node before
                # a table inside the node's own subtree (AAA re-parenting
                # can foster a block whose descendants include the table)
                anc = t.parent
                while anc is not None and anc is not node:
                    anc = anc.parent
                if anc is node:
                    continue
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
            self._afe_clear_to_marker()
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
        if parent is not self._head and tag not in _NO_RECONSTRUCT:
            self._reconstruct_afe()
            parent = self._current()
        node = Node(ELEMENT, tag, list(attrs))
        self._insert_element(node, parent)

    def handle_endtag(self, tag):
        if tag in ("html", "head", "body"):
            if tag == "head" and self._body is None and not self._stack:
                self._mode = "before_body"  # in body: stray </head> ignored
            return
        if tag in FORMATTING_ELEMENTS:
            self._adoption(tag)
            return
        # Pop to the nearest matching open element (ignore stray end tags).
        # Implicitly-closed formatting elements stay in the afe and re-open
        # on the next insertion; closed cells clear the afe to their marker.
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                swept = self._stack[i:]
                del self._stack[i:]
                for n in swept:
                    if n.tag in _AFE_MARKER_TAGS:
                        self._afe_clear_to_marker()
                return

    def handle_data(self, data):
        if not data:
            return
        if self._stack:
            cur = self._stack[-1]
            if cur.tag in RAWTEXT_ELEMENTS:
                # raw-text content never reconstructs formatting; RCDATA
                # decodes character references (RAWTEXT keeps them raw —
                # html.parser's cdata mode skips convert_charrefs)
                if cur.tag in RCDATA_ELEMENTS:
                    data = _unescape(data)
                cur.append(Node(TEXT, data=data))
                return
            if not (cur.tag in TABLE_SCOPE and not data.strip()):
                # in-body character tokens reconstruct active formatting
                # (whitespace inside table context is the spec exception)
                self._reconstruct_afe()
                cur = self._stack[-1]
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
        body = self._ensure_body()
        self._reconstruct_afe()
        cur = self._stack[-1] if self._stack else body
        cur.append(Node(TEXT, data=data))

    def unknown_decl(self, decl):
        # <![CDATA[...]]> is TEXT in foreign content (svg/math) and a bogus
        # comment everywhere else — x/net/html does the same.
        if decl.startswith("CDATA[") and any(
            n.tag in ("svg", "math") for n in self._stack
        ):
            self._current().append(Node(TEXT, data=decl[6:]))
        else:
            self._current().append(Node(COMMENT, data=decl))

    def set_cdata_mode(self, elem):
        """PLAINTEXT runs to EOF: the HTML5 tokenizer has no way out of the
        PLAINTEXT state, so a stray ``</plaintext>`` is character data, not
        an end tag (x/net/html agrees). html.parser's cdata mode ends at the
        matching close tag — defuse its scan pattern for this one element."""
        HTMLParser.set_cdata_mode(self, elem)  # not super(): this method
        # is shared by _StreamExtractor via class-attribute assignment
        if elem.lower() == "plaintext":
            self.interesting = re.compile(r"(?!)")  # never matches

    def flush_cdata_eof(self) -> None:
        """EOF inside a raw-text element (unclosed <plaintext>/<xmp>/…):
        html.parser leaves the tail buffered; HTML5 emits it as text."""
        if getattr(self, "cdata_elem", None) and self.rawdata:
            data, self.rawdata = self.rawdata, ""
            self.handle_data(data)


def parse(html: str | bytes) -> Node:
    """Parse HTML into a document node (reference page.go:61-69 analogue).

    Always succeeds on any input (like x/net/html, which is error-tolerant);
    bytes go through WHATWG encoding sniffing (BOM / meta prescan /
    UTF-8-trial / windows-1252 — functions.encoding) and decode with
    replacement, so one mangled page never kills a task.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        from ant_spark.functions.encoding import decode_html

        html = decode_html(html)
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


class _SEntry:
    """Open-element entry for the stream extractor. Identity semantics (no
    __eq__) — the active-formatting bookkeeping must tell equal-looking
    clones apart, exactly like DOM Node identity."""

    __slots__ = ("tag", "sink", "outer", "attrs")

    def __init__(self, tag, sink, outer=None, attrs=()):
        self.tag = tag
        self.sink = sink  # (text_parts, hrefs) this element emits into
        self.outer = outer  # for <table>: enclosing sink to flush into
        self.attrs = attrs  # list[(k, v)] — clones re-emit a[href]


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
    OR the body has been implicitly/explicitly opened. The active
    formatting list + adoption agency are mirrored as bookkeeping: clones
    of re-opened <a> elements re-emit their href at the position the DOM
    clone occupies in pre-order. Parity with the DOM path is pinned by
    tests over the full synthetic corpus + fixtures and the tag-soup
    differential fuzz.
    """

    CDATA_CONTENT_ELEMENTS = _DomParser.CDATA_CONTENT_ELEMENTS

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.text_parts: list[str] = []
        self.hrefs: list[str] = []
        self.title: str | None = None
        self._base = (self.text_parts, self.hrefs)
        self._stack: list[_SEntry] = []
        self._afe: list = []  # _SEntry refs + _AFE_MARKER (mirrors DOM)
        self._in_body = False  # mirrors _mode == "in_body"
        self._title_open = False
        self._title_parts: list[str] = []

    # -- sink plumbing ------------------------------------------------
    def _current_sink(self):
        return self._stack[-1].sink if self._stack else self._base

    def _foster_sink(self):
        """Sink of the nearest open table's OUTER context (where fostered
        content lands — immediately before the table in DOM order)."""
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == "table":
                return self._stack[i].outer
        return self._current_sink()

    def _insert_sink(self, tag):
        """Insertion sink honoring foster parenting — the stream analogue
        of _DomParser._insert_element's parent choice."""
        if (
            self._stack
            and self._stack[-1].tag in TABLE_SCOPE
            and tag not in TABLE_ALLOWED
        ):
            return self._foster_sink()
        return self._current_sink()

    def _pop_one(self) -> "_SEntry":
        e = self._stack.pop()
        if e.tag == "table" and e.outer is not None:
            e.outer[0].extend(e.sink[0])  # table internals flush AFTER the
            e.outer[1].extend(e.sink[1])  # fostered/pre-table content
        return e

    def _emit_href(self, attrs, sink):
        for k, v in attrs:
            if k == "href":
                sink[1].append(v if v is not None else "")
                break

    # -- active formatting elements (mirrors _DomParser) ----------------
    def _on_stack(self, e) -> bool:
        return any(s is e for s in self._stack)

    def _stack_index(self, e) -> int:
        for i, s in enumerate(self._stack):
            if s is e:
                return i
        return -1

    def _afe_index(self, e) -> int:
        for i, s in enumerate(self._afe):
            if s is e:
                return i
        return -1

    def _afe_find(self, tag):
        for e in reversed(self._afe):
            if e is _AFE_MARKER:
                return None
            if e.tag == tag:
                return e
        return None

    def _afe_push(self, entry) -> None:
        same = []
        for e in reversed(self._afe):
            if e is _AFE_MARKER:
                break
            if e.tag == entry.tag and e.attrs == entry.attrs:
                same.append(e)
        if len(same) >= 3:  # Noah's Ark clause
            del self._afe[self._afe_index(same[-1])]
        self._afe.append(entry)

    def _afe_clear_to_marker(self) -> None:
        while self._afe:
            if self._afe.pop() is _AFE_MARKER:
                return

    def _reconstruct_afe(self) -> None:
        afe = self._afe
        if not afe:
            return
        last = afe[-1]
        if last is _AFE_MARKER or self._on_stack(last):
            return
        i = len(afe) - 1
        while i > 0:
            e = afe[i - 1]
            if e is _AFE_MARKER or self._on_stack(e):
                break
            i -= 1
        for j in range(i, len(afe)):
            entry = afe[j]
            ins = self._insert_sink(entry.tag)
            clone = _SEntry(entry.tag, ins, None, entry.attrs)
            if entry.tag == "a":
                self._emit_href(entry.attrs, ins)  # clone re-emits link
            self._stack.append(clone)
            afe[j] = clone

    def _adoption(self, subject: str) -> None:
        """Bookkeeping mirror of _DomParser._adoption: no tree exists, so
        re-parenting reduces to stack/afe fixups plus href re-emission for
        cloned <a> entries (chronological emission = DOM pre-order for the
        clone positions — pinned by the differential fuzz)."""
        stack, afe = self._stack, self._afe
        for _ in range(8):
            if (
                stack
                and stack[-1].tag == subject
                and self._afe_index(stack[-1]) == -1
            ):
                self._pop_one()
                return
            fe = self._afe_find(subject)
            if fe is None:
                for i in range(len(stack) - 1, -1, -1):
                    if stack[i].tag == subject:
                        while len(stack) > i:
                            self._pop_one()
                        return
                return
            fe_idx = self._stack_index(fe)
            if fe_idx < 0:
                del afe[self._afe_index(fe)]
                return
            fb = None  # furthest block
            fb_idx = -1
            for i in range(fe_idx + 1, len(stack)):
                if stack[i].tag in _SPECIAL_ELEMENTS:
                    fb, fb_idx = stack[i], i
                    break
            if fb is None:
                while len(stack) > fe_idx:
                    self._pop_one()
                del afe[self._afe_index(fe)]
                return
            # insertion sink for the re-parented chain (DOM: into common,
            # foster-aware). fb keeps its own sink — already-emitted text
            # never moves; only the new clones need one.
            if fe_idx > 0:
                ce = stack[fe_idx - 1]
                if ce.tag in TABLE_SCOPE and fb.tag not in TABLE_ALLOWED:
                    ins = self._foster_sink()
                else:
                    ins = ce.sink
            else:
                ins = self._base
            bookmark = self._afe_index(fe)
            last_node = fb
            idx = fb_idx
            inner = 0
            while True:  # inner loop
                inner += 1
                idx -= 1
                node = stack[idx]
                if node is fe:
                    break
                ai = self._afe_index(node)
                if inner > 3 and ai != -1:
                    del afe[ai]
                    ai = -1
                if ai == -1:
                    del stack[idx]  # between fe and fb: formatting only,
                    continue  # never a table — no flush needed
                clone = _SEntry(node.tag, ins, None, node.attrs)
                if node.tag == "a":
                    self._emit_href(node.attrs, ins)
                afe[ai] = clone
                stack[idx] = clone
                if last_node is fb:
                    bookmark = self._afe_index(clone) + 1
                last_node = clone
            clone = _SEntry(fe.tag, fb.sink, None, fe.attrs)
            if fe.tag == "a":
                self._emit_href(fe.attrs, fb.sink)  # step-k clone in fb
            old = self._afe_index(fe)
            if old < bookmark:
                bookmark -= 1
            del afe[old]
            afe.insert(bookmark, clone)
            del stack[self._stack_index(fe)]
            stack.insert(self._stack_index(fb) + 1, clone)

    # -- open/close --------------------------------------------------
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
            if tag == "a" and self._afe_find("a") is not None:
                # <a>-in-<a>: adoption closes the open one, survivor drops
                self._adoption("a")
                prev = self._afe_find("a")
                if prev is not None:
                    del self._afe[self._afe_index(prev)]
                    si = self._stack_index(prev)
                    if si != -1:
                        del self._stack[si]
        if tag not in _NO_RECONSTRUCT:
            self._reconstruct_afe()
        if push:
            # implied tbody/tr synthesis (mirrors the DOM start-tag path)
            top = self._stack[-1].tag if self._stack else None
            if tag == "tr" and top == "table":
                self._stack.append(_SEntry("tbody", self._current_sink()))
            elif tag in ("td", "th"):
                if top == "table":
                    self._stack.append(_SEntry("tbody", self._current_sink()))
                    top = "tbody"
                if top in ("tbody", "thead", "tfoot"):
                    self._stack.append(_SEntry("tr", self._current_sink()))
        # insertion sink AFTER implied-end/reconstruct/synthesis
        ins = self._insert_sink(tag)
        if tag == "a":
            self._emit_href(attrs, ins)
        if push and tag not in VOID_ELEMENTS:
            if tag == "table":
                entry = _SEntry(tag, ([], []), ins)
            else:
                entry = _SEntry(tag, ins, None, list(attrs))
            self._stack.append(entry)
            if tag in FORMATTING_ELEMENTS:
                self._afe_push(entry)
            elif tag in _AFE_MARKER_TAGS:
                self._afe.append(_AFE_MARKER)

    def _implied_end(self, incoming: str) -> None:
        """Mirror _DomParser._implied_end stack pops (affects emptiness)."""
        self._table_pop(incoming)
        s = self._stack
        if not s:
            return
        cur = s[-1].tag
        if cur == "p" and incoming in P_CLOSERS:
            self._pop_one()
        elif cur == "li" and incoming == "li":
            self._pop_one()
        elif cur in ("dt", "dd") and incoming in ("dt", "dd"):
            self._pop_one()
        elif cur in ("td", "th") and incoming in ("td", "th", "tr"):
            self._pop_one()
            self._afe_clear_to_marker()
            if s and s[-1].tag == "tr" and incoming == "tr":
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
        if not any(e.tag == "table" for e in self._stack):
            return
        while self._stack and self._stack[-1].tag not in _TABLE_BOUNDARY:
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
            and not any(e.tag == "title" for e in self._stack)
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
        if tag in FORMATTING_ELEMENTS:
            self._adoption(tag)
            return
        # pop to nearest match, like _DomParser.handle_endtag; the capture
        # closes only when NO title element remains open afterwards — a
        # nested </title> (or a sweep that leaves an outer title) must keep
        # capturing, because the DOM's first-title text spans the outer node
        for i in range(len(self._stack) - 1, -1, -1):
            if self._stack[i].tag == tag:
                swept = [e.tag for e in self._stack[i:]]
                while len(self._stack) > i:  # innermost-first: nested
                    self._pop_one()  # tables flush into their outers
                for t in swept:
                    if t in _AFE_MARKER_TAGS:
                        self._afe_clear_to_marker()
                if (
                    self._title_open
                    and "title" in swept
                    and not any(e.tag == "title" for e in self._stack)
                ):
                    self.title = "".join(self._title_parts)
                    self._title_open = False
                break

    def handle_data(self, data):
        if not data:
            return
        if not self._stack and not self._in_body:
            if data.strip() == "":
                return  # dropped by _DomParser.handle_data's top-level rule
            self._in_body = True  # non-ws top-level text forces a body
        if self._stack and self._stack[-1].tag in RAWTEXT_ELEMENTS:
            cur = self._stack[-1]
            if cur.tag in RCDATA_ELEMENTS:
                data = _unescape(data)  # mirror _DomParser RCDATA decode
            cur.sink[0].append(data)
            if self._title_open:
                self._title_parts.append(data)
            return
        cur_tag = self._stack[-1].tag if self._stack else None
        if not (cur_tag in TABLE_SCOPE and not data.strip()):
            # in-body character tokens reconstruct active formatting
            self._reconstruct_afe()
            cur_tag = self._stack[-1].tag if self._stack else None
        if cur_tag in TABLE_SCOPE and data.strip():
            sink = self._foster_sink()  # foster-parented text
        elif self._stack:
            sink = self._stack[-1].sink
        else:
            sink = self._base
        sink[0].append(data)
        if self._title_open:
            self._title_parts.append(data)

    def unknown_decl(self, decl):
        # CDATA section: text in foreign content, ignored elsewhere
        # (mirror _DomParser.unknown_decl; comments contribute nothing)
        if decl.startswith("CDATA[") and any(
            e.tag in ("svg", "math") for e in self._stack
        ):
            self._current_sink()[0].append(decl[6:])

    flush_cdata_eof = _DomParser.flush_cdata_eof
    set_cdata_mode = _DomParser.set_cdata_mode

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
        from ant_spark.functions.encoding import decode_html

        html = decode_html(html)
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
