"""Differential tests: the regex tokenizer (dom._feed_fast) must build
the SAME tree html.parser builds — pinned over the golden corpus, the
messy fixture, adversarial markup, and randomized HTML-ish noise.

The extracted-text byte-identity contract (tests/test_goldens.py) rides
on the tokenizer, so equivalence is checked at the TREE level (stricter
than extracted text): tag, attrs, and text runs, recursively.
"""

import pathlib

from hypothesis import given, settings
from hypothesis import strategies as st

from navigator_document_parser_spark.extraction import policy
from navigator_document_parser_spark.extraction.dom import (
    parse_html,
    parse_html_stdlib,
)
from navigator_document_parser_spark.sources.synth import make_html

FIXTURES = pathlib.Path(__file__).parent / "fixtures"


def canon(node):
    """Canonical tree form. Adjacent text runs are merged: html.parser
    may split a run at buffer/entity boundaries where the single-pass
    tokenizer emits one run — the DOM surface (text_content/render_text)
    concatenates them, so the split is unobservable."""
    out = [node.tag, sorted((node.attrs or {}).items(), key=str)]
    kids = []
    for c in node.children:
        if isinstance(c, str):
            if kids and isinstance(kids[-1], str):
                kids[-1] += c
            else:
                kids.append(c)
        else:
            kids.append(canon(c))
    out.append(kids)
    return out


def assert_same_tree(html: str):
    fast = canon(parse_html(html))
    std = canon(parse_html_stdlib(html))
    assert fast == std, f"tree mismatch for: {html[:300]!r}"


def test_synth_corpus_trees_identical():
    for i in range(0, 400):
        if i % 5 == 4:  # pdf rows
            continue
        assert_same_tree(make_html(i).decode("utf-8"))


def test_messy_fixture_tree_identical():
    html = (FIXTURES / "html" / "messy_article.html").read_text()
    assert_same_tree(html)
    # and the end-to-end extraction result is byte-identical
    fast = policy.extract_html(html)
    import navigator_document_parser_spark.extraction.policy as pol

    orig = pol.parse_html  # policy parses once and passes the root down
    pol.parse_html = parse_html_stdlib
    try:
        std = pol.extract_html(html)
    finally:
        pol.parse_html = orig
    assert fast.text == std.text
    assert fast.parser == std.parser
    assert [b.text for b in fast.text_blocks] == [
        b.text for b in std.text_blocks
    ]


ADVERSARIAL = [
    "",
    "plain text only, no tags at all",
    "a < b and c > d",
    "<",
    "x<",
    "<3 hearts <b>bold</b>",
    "<p>unclosed paragraph",
    "<p>one<p>two<p>three",
    "<div><p>bad nesting</div></p>",
    "<P CLASS='MiXeD'>case</P>",
    '<a href="/x?a=1&amp;b=2">amp in attr</a>',
    "<p>&lt;escaped&gt; &amp; entities &#65; &#x42; &notareal; &amp</p>",
    "<script>if (a < b && c > d) { x = '<p>not a tag</p>'; }</script>ok",
    "<script>var s = '</scr' + 'ipt>';</script>after",
    "<SCRIPT>UPPER</SCRIPT>tail",
    "<style>p > a { color: red }</style>body",
    "<script>never closed at eof",
    "<!-- comment with <p>tags</p> inside -->visible",
    "<!-- unterminated comment at eof",
    "<!DOCTYPE html><p>doc</p>",
    "<?php echo '>'; ?>text",
    "<?pi never closed",
    "<! bare declaration >rest",
    "<p>before <![CDATA[ x > y ]]> after</p>",
    "<p><![endif]-->tail</p>",
    "<![if !IE]>conditional<![endif]>done",
    "<![CDATA[never closed at eof",
    "<![cdata[lower ]]>x",
    "<![INCLUDE[ z ]]>w",
    "<![bogus keyword]>q",
    "<![3]>numeric",
    "<![",
    "<![CDATA",
    "<!doctype html PUBLIC \"quoted > gt\">after-doctype",
    "<p attr>novalue</p>",
    "<p a=1 b='2' c=\"3\">unquoted</p>",
    '<img src="x.png" alt="selfclose"/>',
    "<br/><hr />",
    "<input disabled>",
    "<p  spaced   =  'v' >odd spacing</p>",
    "<p/ >junky</p>",
    "<div class=\"a\"b='c'>squeezed attrs</div>",
    "</>empty endtag",
    "</ >space endtag",
    "</123>numeric endtag",
    "</p extra junk>trailing</p>",
    "<p>tag at eof<",
    "<p>truncated start <div cla",
    "<p>truncated attr <div class='x",
    "<td>cell</td> outside table",
    "<p>é unicode 中文 &eacute;</p>",
    "<p>null\x00byte</p>",
    "<a href='multi\nline'>nl in attr</a>",
    "<p title=\"gt > inside quoted\">quoted gt</p>",
    "<svg><circle r='1'/><text>svg text</text></svg>after svg",
    "<noscript><p>noscript body</p></noscript>after",
    "<template><li>tpl</li></template>after",
    "<iframe>frame fallback</iframe>after",
]


def test_adversarial_trees_identical():
    for html in ADVERSARIAL:
        assert_same_tree(html)


_tag_soup = st.text(
    alphabet=(
        "<>/&;=\"' abcdefgpqrstz0129!?-[]\n\t"
        "é中"
    ),
    min_size=0,
    max_size=160,
)

_structured = st.lists(
    st.sampled_from(
        [
            "<p>", "</p>", "<div class='a'>", "</div>", "<b>", "</b>",
            "<br>", "<img src='x'/>", "text ", "words & more ", "&amp;",
            "&#65;", "<script>", "</script>", "<!-- c -->", "<a href='u'>",
            "</a>", "< ", ">", "<!doctype h>", "</ x>", "<p a=1 b>",
        ]
    ),
    min_size=0,
    max_size=40,
).map("".join)


@settings(max_examples=300, deadline=None)
@given(_tag_soup)
def test_random_soup_trees_identical(html):
    assert_same_tree(html)


@settings(max_examples=300, deadline=None)
@given(_structured)
def test_random_structured_trees_identical(html):
    assert_same_tree(html)
