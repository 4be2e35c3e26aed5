"""Realistic-page goldens: handcrafted wikipedia-style and news-site
fixtures (deterministic, offline) with pinned byte-exact extraction —
complements the synthetic golden corpus with real-world page anatomy
(infobox/TOC/navbox/reference cruft, bylines, asides, comment sections,
ld+json scripts, typographic entities)."""

import pathlib

import pytest

from navigator_document_parser_spark.extraction import policy

HTML = pathlib.Path(__file__).parent / "fixtures" / "html"

CASES = ["wiki_style", "news_site"]


@pytest.mark.parametrize("name", CASES)
def test_extraction_matches_pinned_golden_bytes(name):
    html = (HTML / f"{name}.html").read_text()
    golden = (HTML / f"{name}.golden.txt").read_bytes()
    r = policy.extract_html(html)
    assert r.text.encode("utf-8") == golden
    assert r.has_valid_text


def test_wiki_boilerplate_excluded():
    r = policy.extract_html((HTML / "wiki_style.html").read_text())
    # main prose present
    assert "market-based policy instrument" in r.text
    assert "Finland introduced the first carbon tax" in r.text
    # chrome, infobox, TOC, navbox, references excluded
    for cruft in ("Main page", "Random", "Donate", "~23% of global",
                  "Contents", "1 History", "Pigovian tax",
                  "State and Trends", "Privacy policy"):
        assert cruft not in r.text, cruft


def test_news_boilerplate_and_comments_excluded():
    r = policy.extract_html((HTML / "news_site.html").read_text())
    assert "revised national emissions framework" in r.text
    # entity handling: &ldquo; &rsquo; &amp; decoded
    assert "“lacked enforceable milestones”" in r.text
    assert "manufacturers’ association" in r.text
    assert "A. Reporter & B. Correspondent" in r.text
    # nav, related-aside, comments, footer, scripts excluded
    for cruft in ("Subscribe", "Related stories", "142 comments",
                  "About time something had teeth", "loadComments",
                  "NewsArticle", "Cookies"):
        assert cruft not in r.text, cruft
