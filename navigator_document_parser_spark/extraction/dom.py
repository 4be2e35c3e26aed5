"""Minimal HTML DOM built on stdlib html.parser.

From-scratch replacement for the lxml tree that readability-lxml and
news-please operate on (reference uses those libraries as black boxes at
src/html_parser/readability.py:82-84 and src/html_parser/newsplease.py:47-49).
We only need the operations the extraction heuristics use: tree structure,
per-node text accumulation, link-text ratio, and block-level rendering.
"""

from __future__ import annotations

from html.parser import HTMLParser as _StdHTMLParser

# Tags whose content never contributes to extracted text.
SKIP_TAGS = frozenset({"script", "style", "noscript", "template", "svg", "iframe"})

# Void elements (never have children).
VOID_TAGS = frozenset({
    "area", "base", "br", "col", "embed", "hr", "img", "input", "link",
    "meta", "param", "source", "track", "wbr",
})

# Block-level elements: rendering inserts a line break around them.
BLOCK_TAGS = frozenset({
    "address", "article", "aside", "blockquote", "body", "caption", "dd",
    "details", "div", "dl", "dt", "fieldset", "figcaption", "figure",
    "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr",
    "html", "li", "main", "nav", "ol", "p", "pre", "section", "summary",
    "table", "tbody", "td", "tfoot", "th", "thead", "tr", "ul",
})


class Node:
    """One element (or the synthetic root) of the parsed tree."""

    __slots__ = ("tag", "attrs", "children", "texts", "parent", "score")

    def __init__(self, tag: str, attrs: dict | None = None, parent: "Node | None" = None):
        self.tag = tag
        self.attrs = attrs or {}
        self.children: list[Node | str] = []  # str entries are text runs
        self.parent = parent
        self.score = 0.0

    # -- navigation ---------------------------------------------------------

    def iter(self):
        """Depth-first over element nodes, self first."""
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))

    def find_first(self, tag: str) -> "Node | None":
        for n in self.iter():
            if n.tag == tag:
                return n
        return None

    # -- text ---------------------------------------------------------------

    def text_content(self) -> str:
        """All descendant text, concatenated (lxml text_content analogue)."""
        out: list[str] = []
        stack: list[Node | str] = [self]
        while stack:
            c = stack.pop()
            if isinstance(c, str):
                out.append(c)
            else:
                stack.extend(reversed(c.children))
        return "".join(out)

    def link_text_len(self) -> int:
        """Total text length inside <a> descendants (link-density numerator)."""
        total = 0
        stack: list[tuple[Node, bool]] = [(self, self.tag == "a")]
        while stack:
            n, in_a = stack.pop()
            for c in n.children:
                if isinstance(c, str):
                    if in_a:
                        total += len(c.strip())
                else:
                    stack.append((c, in_a or c.tag == "a"))
        return total

    def link_density(self) -> float:
        text_len = len(self.text_content().strip())
        if text_len == 0:
            return 0.0
        return min(1.0, self.link_text_len() / text_len)

    def render_text(self) -> str:
        """Render descendant text with '\\n' at block boundaries and for <br>.

        This is the bleach.clean(tags=[], strip=True)-equivalent surface the
        reference splits on '\\n' (src/html_parser/readability.py:85-88): tag
        markup removed, text kept, block structure surviving as newlines.
        """
        out: list[str] = []
        # iterative DFS with explicit close markers (deep DOMs must not
        # hit the Python recursion limit)
        OPEN, CLOSE = 0, 1
        stack: list[tuple[int, Node | str]] = [(OPEN, self)]
        while stack:
            kind, item = stack.pop()
            if isinstance(item, str):
                out.append(item)
                continue
            if kind == CLOSE:
                out.append("\n")
                continue
            is_block = item.tag in BLOCK_TAGS
            if is_block:
                out.append("\n")
                stack.append((CLOSE, item))
            for c in reversed(item.children):
                if isinstance(c, str):
                    stack.append((OPEN, c))
                elif c.tag == "br":
                    stack.append((OPEN, "\n"))
                else:
                    stack.append((OPEN, c))
        return "".join(out)

    def class_id_string(self) -> str:
        return (self.attrs.get("class", "") + " " + self.attrs.get("id", "")).lower()


class _TreeBuilder(_StdHTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self.cur = self.root
        self._skip_depth = 0

    def handle_starttag(self, tag, attrs):
        if self._skip_depth:
            if tag in SKIP_TAGS:
                self._skip_depth += 1
            return
        if tag in SKIP_TAGS:
            self._skip_depth = 1
            return
        node = Node(tag, dict(attrs), self.cur)
        self.cur.children.append(node)
        if tag not in VOID_TAGS:
            self.cur = node

    def handle_startendtag(self, tag, attrs):
        if self._skip_depth:
            return
        if tag in SKIP_TAGS:
            return
        self.cur.children.append(Node(tag, dict(attrs), self.cur))

    def handle_endtag(self, tag):
        if self._skip_depth:
            if tag in SKIP_TAGS:
                self._skip_depth -= 1
            return
        # close nearest matching open ancestor (tolerates bad nesting)
        n = self.cur
        while n is not self.root:
            if n.tag == tag:
                self.cur = n.parent or self.root
                return
            n = n.parent or self.root

    def handle_data(self, data):
        if self._skip_depth or not data:
            return
        self.cur.children.append(data)


import re as _re
from html import unescape as _unescape

# the stdlib's own tolerant tag grammar, reused verbatim so slow-path
# tokenization is bit-identical to html.parser's
from html.parser import (  # type: ignore[attr-defined]
    attrfind_tolerant as _attrfind,
    commentclose as _commentclose,
    endtagfind as _endtagfind,
    locatestarttagend_tolerant as _locatestarttagend,
    tagfind_tolerant as _tagfind,
)

# fast paths for the overwhelmingly common tag shapes; anything else
# falls back to the tolerant stdlib regexes above
_SIMPLE_START = _re.compile(
    r'<([a-zA-Z][a-zA-Z0-9]*)'
    r'((?:\s+[a-zA-Z-]+="[^"&<]*")*)\s*(/?)>'
)
_SIMPLE_ATTR = _re.compile(r'([a-zA-Z-]+)="([^"]*)"')
_SIMPLE_END = _re.compile(r'</([a-zA-Z][a-zA-Z0-9]*)\s*>')
_CDATA_CLOSE = {
    elem: _re.compile(r"</\s*%s" % elem, _re.IGNORECASE)
    for elem in ("script", "style")
}
# markupbase.parse_marked_section grammar (html.parser delegates '<![')
_MS_NAME = _re.compile(r"[a-zA-Z][-_.a-zA-Z0-9]*\s*")
_MS_CLOSE = _re.compile(r"]\s*]\s*>")  # <![CDATA[ ... ]]>
_MS_MSCLOSE = _re.compile(r"]\s*>")  # <![if ...]> / <![endif]>
_MS_STD = frozenset({"temp", "cdata", "ignore", "include", "rcdata"})
_MS_MSO = frozenset({"if", "else", "endif"})
_ASCII_LETTERS = frozenset(
    "abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ"
)


def _feed_fast(rawdata: str, builder: "_TreeBuilder") -> None:
    """Single-pass regex tokenizer emitting the same handle_* event
    stream html.parser (convert_charrefs=True) produces for a complete
    document: lowercased tag/attr names, charref-unescaped data and
    attr values, CDATA mode for script/style, single '<' as data, and
    html.parser's bogus-markup fallbacks (junk start tags as raw data,
    unterminated constructs flushed to the next '>'/'<'/EOF). ~2.5x
    faster than html.parser's goahead loop (no incremental-buffer
    bookkeeping, no updatepos, direct method dispatch), which was ~40%
    of extraction's per-core cost. Byte-equivalence is pinned by the
    differential tests in tests/test_fast_tokenizer.py plus the golden
    corpus."""
    handle_start = builder.handle_starttag
    handle_startend = builder.handle_startendtag
    handle_end = builder.handle_endtag
    handle_data = builder.handle_data
    find = rawdata.find
    n = len(rawdata)
    i = 0
    cdata_elem = None

    def flush_bogus(start: int) -> int:
        """html.parser goahead(1) fallback for unparseable '<...':
        emit (unescaped) data up to just past the next '>', else up to
        the next '<', else one char."""
        k = find(">", start + 1)
        if k < 0:
            k = find("<", start + 1)
            if k < 0:
                k = start + 1
        else:
            k += 1
        handle_data(_unescape(rawdata[start:k]))
        return k

    while i < n:
        if cdata_elem is not None:
            m = _CDATA_CLOSE[cdata_elem].search(rawdata, i)
            if m is None:
                # html.parser discards unterminated cdata at EOF
                break
            if m.start() > i:
                handle_data(rawdata[i : m.start()])  # raw: no unescape
            i = m.start()
            gt = find(">", i + 1)
            if gt < 0:
                break
            em = _endtagfind.match(rawdata, i)
            if em is not None and em.group(1).lower() == cdata_elem:
                handle_end(cdata_elem)
                cdata_elem = None
                i = em.end()
            else:
                # '</script' prefix of a different/garbled tag: raw data
                handle_data(rawdata[i : gt + 1])
                i = gt + 1
            continue

        j = find("<", i)
        if j < 0:
            if i < n:
                text = rawdata[i:]
                handle_data(_unescape(text) if "&" in text else text)
            break
        if j > i:
            text = rawdata[i:j]
            handle_data(_unescape(text) if "&" in text else text)
        i = j
        c = rawdata[i + 1 : i + 2]

        if c in _ASCII_LETTERS:
            m = _SIMPLE_START.match(rawdata, i)
            if m is not None:
                tag = m.group(1).lower()
                raw_attrs = m.group(2)
                attrs = (
                    [
                        (k.lower(), v)
                        for k, v in _SIMPLE_ATTR.findall(raw_attrs)
                    ]
                    if raw_attrs
                    else []
                )
                if m.group(3):
                    handle_startend(tag, attrs)
                else:
                    handle_start(tag, attrs)
                    if tag in ("script", "style"):
                        cdata_elem = tag
                i = m.end()
                continue
            # tolerant path — stdlib grammar, stdlib semantics
            lm = _locatestarttagend.match(rawdata, i)
            endpos = -1
            if lm is not None:
                jj = lm.end()
                nxt = rawdata[jj : jj + 1]
                if nxt == ">":
                    endpos = jj + 1
                elif nxt == "/" and rawdata.startswith("/>", jj):
                    endpos = jj + 2
                elif nxt == "" or nxt in (
                    "abcdefghijklmnopqrstuvwxyz=/ABCDEFGHIJKLMNOPQRSTUVWXYZ"
                ):
                    endpos = -1  # incomplete at EOF
                elif jj > i:
                    endpos = jj
            if endpos < 0:
                i = flush_bogus(i)
                continue
            tm = _tagfind.match(rawdata, i + 1)
            k = tm.end()
            tag = tm.group(1).lower()
            attrs = []
            while k < endpos:
                am = _attrfind.match(rawdata, k)
                if am is None:
                    break
                attrname, rest, attrvalue = am.group(1, 2, 3)
                if not rest:
                    attrvalue = None
                elif (
                    attrvalue[:1] == "'" == attrvalue[-1:]
                    or attrvalue[:1] == '"' == attrvalue[-1:]
                ):
                    attrvalue = attrvalue[1:-1]
                if attrvalue:
                    attrvalue = _unescape(attrvalue)
                attrs.append((attrname.lower(), attrvalue))
                k = am.end()
            end = rawdata[k:endpos].strip()
            if end not in (">", "/>"):
                handle_data(rawdata[i:endpos])  # junk start tag: raw
                i = endpos
                continue
            if end.endswith("/>"):
                handle_startend(tag, attrs)
            else:
                handle_start(tag, attrs)
                if tag in ("script", "style"):
                    cdata_elem = tag
            i = endpos
            continue

        if c == "/":
            m = _SIMPLE_END.match(rawdata, i)
            if m is not None:
                handle_end(m.group(1).lower())
                i = m.end()
                continue
            gt = find(">", i + 1)
            if gt < 0:
                i = flush_bogus(i)
                continue
            em = _endtagfind.match(rawdata, i)
            if em is not None:
                handle_end(em.group(1).lower())
                i = em.end()
                continue
            nm = _tagfind.match(rawdata, i + 2)
            if nm is not None:
                # garbage between name and '>' is consumed and ignored
                handle_end(nm.group(1).lower())
                gt2 = find(">", nm.end())
                i = (gt2 + 1) if gt2 >= 0 else n
                continue
            if rawdata.startswith("</>", i):
                i += 3
                continue
            # bogus comment: </%garbage> skipped to the '>'
            i = gt + 1
            continue

        if rawdata.startswith("<!--", i):
            m = _commentclose.search(rawdata, i + 4)
            if m is None:
                i = flush_bogus(i)
                continue
            i = m.end()  # comments dropped (no handler)
            continue

        if c == "!" and rawdata.startswith("<![", i):
            # marked section — html.parser delegates to markupbase
            # parse_marked_section: CDATA-family sections close at ']]>',
            # MS-Office conditionals (<![if/else/endif ...) at ']>';
            # any other keyword makes html.parser raise out of feed()
            # (ParserBase.error), which our stdlib wrapper absorbs as a
            # tree-so-far — mirror that by raising into the fallback.
            nm = _MS_NAME.match(rawdata, i + 3)
            if nm is None or nm.end() == n:
                if nm is None and i + 3 < n:
                    raise ValueError("bad marked-section keyword")
                i = flush_bogus(i)  # name truncated at EOF: -1 path
                continue
            sect = nm.group().strip().lower()
            if sect in _MS_STD:
                m = _MS_CLOSE.search(rawdata, i + 3)
            elif sect in _MS_MSO:
                m = _MS_MSCLOSE.search(rawdata, i + 3)
            else:
                raise ValueError("unknown marked-section keyword")
            if m is None:
                i = flush_bogus(i)
                continue
            i = m.end()  # unknown_decl is a no-op
            continue

        if c == "?" or c == "!":
            # PI (parse_pi) and '<!doctype'/bogus declarations
            # (HTMLParser.parse_html_declaration) all skip to the next
            # '>' — html.parser does NOT do quote-aware declaration
            # parsing; only '<![' (handled above) differs
            gt = find(">", i + 1)
            if gt < 0:
                i = flush_bogus(i)
                continue
            i = gt + 1
            continue

        # stray '<' (incl. lone '<' at EOF, which close() flushes as data)
        handle_data("<")
        i += 1
        continue


def parse_html(html: str) -> Node:
    """Parse HTML into a Node tree. Never raises on malformed markup."""
    builder = _TreeBuilder()
    try:
        _feed_fast(html, builder)
    except Exception:
        # any residual tokenizer error falls back to the stdlib parser
        # rather than losing the page
        return parse_html_stdlib(html)
    return builder.root


def parse_html_stdlib(html: str) -> Node:
    """Reference tokenization via stdlib html.parser — the behavioral
    spec _feed_fast is differentially tested against."""
    builder = _TreeBuilder()
    try:
        builder.feed(html)
        builder.close()
    except Exception:
        # html.parser is nearly exception-free; any residual parse error
        # yields whatever tree was built so far (reference drops to the
        # empty-response path on parser exceptions, newsplease.py:50-59).
        pass
    return builder.root


def page_title(root: Node) -> str:
    """<title> text, whitespace-collapsed (readability Document.title())."""
    t = root.find_first("title")
    if t is None:
        return ""
    return " ".join(t.text_content().split())
