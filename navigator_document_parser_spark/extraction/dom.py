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


def parse_html(html: str) -> Node:
    """Parse HTML into a Node tree. Never raises on malformed markup."""
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
