"""Arc90/readability-style main-content scorer, from scratch.

Functional replacement for readability-lxml 0.8.4.1 as used by the
reference at src/html_parser/readability.py:82-85:

    doc = Document(html); title = doc.title(); summary = doc.summary()
    text = bleach.clean(summary, tags=[], strip=True)

Algorithm (classic Arc90, reimplemented — no reference code reused):
  1. candidates = <p>/<td>/<pre>/<blockquote> nodes with >= MIN_TEXT chars
  2. each candidate adds (1 + commas + min(len/100, 3)) points to its
     parent and half to its grandparent
  3. parents get a tag prior (+5 div, +3 pre/td/blockquote, -3 list/form,
     -5 headers) and a class/id hint (+25 article-ish, -25 nav/footer-ish)
  4. final score scaled by (1 - link_density)
  5. best-scoring node's subtree is the summary; its text renders with
     newlines at block boundaries (dom.Node.render_text)
"""

from __future__ import annotations

import re

from .dom import Node, parse_html, page_title

MIN_CANDIDATE_TEXT = 25

POSITIVE_HINT = re.compile(
    r"article|body|content|entry|hentry|main|page|pagination|post|text|blog|story"
)
NEGATIVE_HINT = re.compile(
    r"combx|comment|com-|contact|foot|footer|footnote|masthead|media|meta|outbrain"
    r"|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget"
    r"|nav|menu|banner|breadcrumb|social|share|advert"
)

TAG_PRIOR = {
    "div": 5,
    "article": 5,
    "section": 5,
    "main": 5,
    "pre": 3,
    "td": 3,
    "blockquote": 3,
    "address": -3,
    "ol": -3,
    "ul": -3,
    "dl": -3,
    "dd": -3,
    "dt": -3,
    "li": -3,
    "form": -3,
    "h1": -5,
    "h2": -5,
    "h3": -5,
    "h4": -5,
    "h5": -5,
    "h6": -5,
    "th": -5,
}

CANDIDATE_TAGS = frozenset({"p", "td", "pre", "blockquote"})


def _class_weight(node: Node) -> float:
    s = node.class_id_string()
    w = 0.0
    if s.strip():
        if NEGATIVE_HINT.search(s):
            w -= 25.0
        if POSITIVE_HINT.search(s):
            w += 25.0
    return w


def _init_score(node: Node) -> float:
    return TAG_PRIOR.get(node.tag, 0) + _class_weight(node)


def score_tree(root: Node) -> Node | None:
    """Score parents of text candidates; return the best-scoring node."""
    scored: dict[int, Node] = {}

    for cand in root.iter():
        if cand.tag not in CANDIDATE_TAGS:
            continue
        text = cand.text_content().strip()
        if len(text) < MIN_CANDIDATE_TEXT:
            continue
        points = 1.0 + text.count(",") + min(len(text) / 100.0, 3.0)

        parent = cand.parent
        if parent is not None and parent.tag != "#root":
            if id(parent) not in scored:
                parent.score = _init_score(parent)
                scored[id(parent)] = parent
            parent.score += points
            grand = parent.parent
            if grand is not None and grand.tag != "#root":
                if id(grand) not in scored:
                    grand.score = _init_score(grand)
                    scored[id(grand)] = grand
                grand.score += points / 2.0

    best: Node | None = None
    best_score = 0.0
    for node in scored.values():
        final = node.score * (1.0 - node.link_density())
        if best is None or final > best_score:
            best, best_score = node, final
    return best


def extract_from_root(root: Node) -> tuple[str, str]:
    """(title, text) from an already-parsed tree (shared-parse path)."""
    title = page_title(root)
    best = score_tree(root)
    if best is None:
        body = root.find_first("body") or root
        return title, body.render_text()
    return title, best.render_text()


def extract(html: str) -> tuple[str, str]:
    """(title, text) — text has '\\n' at block boundaries, markup stripped.

    Equivalent surface to readability Document.summary() piped through
    bleach.clean(tags=[], strip=True) (src/html_parser/readability.py:84-85).
    Falls back to whole-<body> text when no candidate scores (short pages),
    matching readability's own body fallback.
    """
    return extract_from_root(parse_html(html))
