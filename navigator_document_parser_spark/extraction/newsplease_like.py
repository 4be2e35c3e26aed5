"""news-please-style maintext heuristic, from scratch.

Functional replacement for NewsPlease.from_html(...).maintext as used at
src/html_parser/newsplease.py:47-49,114. news-please's extractor picks the
main article container and returns its paragraph texts joined with '\\n'
(whitespace-normalized per paragraph). We reimplement that behavior:

  1. collect every <p> (and <li> inside article-ish containers is ignored —
     news-please is paragraph-driven) with normalized text
  2. score each ancestor container (div/article/section/main/body) by the
     total length of its direct-or-nested paragraph text, penalized by link
     density and nav/footer class hints
  3. maintext = that container's paragraph texts joined with '\\n'
  4. empty/boilerplate-only pages -> None (caller emits the empty response,
     src/html_parser/newsplease.py:116-117)

The known behavioral quirk the combined policy depends on — news-please
merging what visually reads as several paragraphs into one long block —
shows up here too: paragraphs inside nested inline markup collapse into
their single <p> ancestor, so one giant <p> yields one giant block, which
trips the 500-word fallback (src/html_parser/combined.py:70-77).
"""

from __future__ import annotations

from .dom import Node, parse_html
from .readability import NEGATIVE_HINT

CONTAINER_TAGS = frozenset({"div", "article", "section", "main", "body", "td"})
MIN_PARAGRAPH_CHARS = 10


def _norm(text: str) -> str:
    return " ".join(text.split())


def _p_norm(node: Node, cache: dict | None) -> str:
    """Normalized text of a <p> node, memoized per tree walk.

    The same <p> is re-normalized once per ancestor container during
    scoring and again when the winning container is rendered — pure
    recomputation (text is immutable once parsed), measured ~20% of
    extraction after the tokenizer rewrite."""
    if cache is None:
        return _norm(node.text_content())
    k = id(node)
    v = cache.get(k)
    if v is None:
        v = _norm(node.text_content())
        cache[k] = v
    return v


def _paragraphs_under(node: Node, cache: dict | None = None) -> list[str]:
    """Normalized texts of descendant <p> nodes, document order."""
    out: list[str] = []
    # iterative DFS preserving document order
    stack: list[Node] = [node]
    order: list[Node] = []
    while stack:
        n = stack.pop()
        order.append(n)
        stack.extend(c for c in reversed(n.children) if isinstance(c, Node))
    for n in order:
        if n.tag == "p":
            t = _p_norm(n, cache)
            if len(t) >= MIN_PARAGRAPH_CHARS:
                out.append(t)
    return out


def maintext(html: str) -> str | None:
    """Main article text: paragraphs of the best container, '\\n'-joined."""
    return maintext_from_root(parse_html(html))


def maintext_from_root(root: Node) -> str | None:
    """maintext over an already-parsed tree (shared-parse path)."""
    cache: dict = {}  # per-walk <p> normalization memo (_p_norm)
    best: Node | None = None
    best_score = 0.0
    for node in root.iter():
        if node.tag not in CONTAINER_TAGS:
            continue
        paras = _direct_paragraph_len(node, cache)
        if paras == 0:
            continue
        score = paras * (1.0 - node.link_density())
        if NEGATIVE_HINT.search(node.class_id_string()):
            score *= 0.2
        if score > best_score:
            best, best_score = node, score

    if best is None:
        return None
    paragraphs = _paragraphs_under(best, cache)
    if not paragraphs:
        return None
    return "\n".join(paragraphs)


def _direct_paragraph_len(node: Node, cache: dict | None = None) -> int:
    """Sum of text length of <p> children one container level below.

    Using near-direct children (not the whole subtree) makes sibling
    containers compete instead of the root always winning.
    """
    total = 0
    for c in node.children:
        if isinstance(c, Node):
            if c.tag == "p":
                total += len(_p_norm(c, cache))
            elif c.tag not in CONTAINER_TAGS:
                # paragraphs wrapped in inline/span-ish markup still count
                for cc in c.iter():
                    if cc.tag == "p":
                        total += len(_p_norm(cc, cache))
    return total


def maintext_lines(text: str) -> list[str]:
    """newsplease split: '\\n' split with NO strip / NO drop-empty.

    Parity: src/html_parser/newsplease.py:119 — asymmetric with the
    readability path's split_lines on purpose.
    """
    return text.split("\n")
