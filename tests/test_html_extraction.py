"""HTML extraction core tests: readability scorer, newsplease-like
maintext, combined policy (M1-M7)."""

from navigator_document_parser_spark.extraction import (
    newsplease_like,
    policy,
    readability,
)

ARTICLE_HTML = """
<html><head><title>Climate Policy &amp; Targets</title></head>
<body>
  <nav class="nav"><a href="/">Home</a> <a href="/a">Topics</a>
    <a href="/b">About</a> <a href="/c">Contact</a></nav>
  <div class="article-content">
    <p>The national emissions reduction framework was introduced in 2022,
       following extensive consultation with industry, states, and the
       public sector over two years.</p>
    <p>Under the framework, large facilities must reduce their baseline
       emissions by five percent each year, or purchase offset credits
       from accredited providers.</p>
    <p>Analysts say the policy is the most significant climate measure in
       a decade, though critics argue the offset market lacks integrity
       and transparency.</p>
    <p>The department will publish compliance data annually, beginning
       next year, covering all facilities above the threshold.</p>
    <p>Further consultation on safeguard mechanism reforms is expected
       before the legislation is finalised by parliament.</p>
    <p>International observers have noted the scheme as a potential model
       for other resource-exporting economies.</p>
  </div>
  <footer class="footer"><a href="/p">Privacy</a> <a href="/t">Terms</a>
    <a href="/s">Sitemap</a></footer>
</body></html>
"""

EMPTY_HTML = "<html><head><title>t</title></head><body></body></html>"

LINKFARM_HTML = """
<html><body><div class="content">
<p>Short intro sentence here, with a comma, to qualify as candidate.</p>
</div>
<div class="sidebar-nav">
<p><a href="1">link one text</a> <a href="2">link two text</a>
<a href="3">link three text</a> <a href="4">link four text text text</a></p>
</div></body></html>
"""


def test_readability_extracts_article_not_nav():
    title, text = readability.extract(ARTICLE_HTML)
    assert title == "Climate Policy & Targets"
    assert "emissions reduction framework" in text
    assert "Home" not in text
    assert "Privacy" not in text


def test_readability_link_density_penalty():
    _, text = readability.extract(LINKFARM_HTML)
    assert "Short intro sentence" in text
    assert "link one text" not in text


def test_newsplease_maintext_paragraphs_joined_by_newline():
    text = newsplease_like.maintext(ARTICLE_HTML)
    assert text is not None
    paras = text.split("\n")
    assert len(paras) == 6
    assert paras[0].startswith("The national emissions")
    # normalized whitespace within a paragraph
    assert "  " not in paras[0]


def test_newsplease_empty_body_returns_none():
    assert newsplease_like.maintext(EMPTY_HTML) is None


def test_combined_uses_newsplease_when_good():
    result = policy.extract_combined(ARTICLE_HTML)
    assert result.parser == policy.PARSER_NEWSPLEASE
    assert len(result.text_blocks) == 6
    assert result.has_valid_text is True
    assert [b.text_block_id for b in result.text_blocks] == [
        f"b{i}" for i in range(6)
    ]
    assert all(b.type == "Text" and b.type_confidence == 1.0
               for b in result.text_blocks)


def test_combined_falls_back_on_empty_newsplease():
    result = policy.extract_combined(EMPTY_HTML)
    # newsplease yields nothing -> readability path (which may also be
    # empty here, but the branch taken must be readability/empty)
    assert result.parser in (policy.PARSER_READABILITY, policy.PARSER_EMPTY)


def test_combined_falls_back_on_long_paragraph():
    words = " ".join(f"w{i}" for i in range(600))
    html = (
        "<html><head><title>T</title></head><body><div class='content'>"
        f"<p>{words}</p>"
        "<p>And a short trailing paragraph, for contrast, here.</p>"
        "</div></body></html>"
    )
    result = policy.extract_combined(html)
    assert result.parser == policy.PARSER_READABILITY


def test_extract_html_never_raises():
    result = policy.extract_html("\x00\x01<<<not html>>>")
    assert result.parser in (
        policy.PARSER_EMPTY, policy.PARSER_READABILITY, policy.PARSER_NEWSPLEASE
    )


def test_empty_response_shape():
    r = policy.empty_response()
    assert r.detected_title == ""
    assert r.has_valid_text is False
    assert r.text_blocks == []
    assert r.text == ""
