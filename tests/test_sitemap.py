"""Sitemap ingestion: realistic pretty-printed fixtures through the
file reader, protocol edge cases through parse_sitemap directly."""

import os

from navigator_document_parser_spark.sources.sitemap import (
    parse_sitemap,
    read_sitemaps,
)

_URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>https://example.com/</loc>
    <lastmod>2025-01-04</lastmod>
    <priority>1.0</priority>
  </url>
  <url>
    <loc>https://example.com/about</loc>
  </url>
  <url>
    <lastmod>2025-02-02</lastmod>
  </url>
</urlset>
"""

_INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap>
    <loc>https://example.com/sitemap-a.xml</loc>
    <lastmod>2025-03-01</lastmod>
  </sitemap>
  <sitemap>
    <loc>https://example.com/sitemap-b.xml</loc>
  </sitemap>
</sitemapindex>
"""


def test_read_sitemaps_urlset(spark, tmp_path):
    p = tmp_path / "sitemap1.xml"
    p.write_text(_URLSET)
    rows = sorted(
        read_sitemaps(spark, str(tmp_path / "*.xml")).collect(),
        key=lambda r: r.url,
    )
    # the loc-less third entry is dropped per the protocol
    assert [(r.kind, r.url, r.lastmod, r.priority) for r in rows] == [
        ("url", "https://example.com/", "2025-01-04", "1.0"),
        ("url", "https://example.com/about", None, None),
    ]
    assert all(os.path.basename(r.site) == "sitemap1.xml" for r in rows)


def test_read_sitemaps_index(spark, tmp_path):
    (tmp_path / "sitemap_index.xml").write_text(_INDEX)
    rows = sorted(
        read_sitemaps(spark, str(tmp_path / "*.xml")).collect(),
        key=lambda r: r.url,
    )
    assert [(r.kind, r.url, r.lastmod) for r in rows] == [
        ("sitemap", "https://example.com/sitemap-a.xml", "2025-03-01"),
        ("sitemap", "https://example.com/sitemap-b.xml", None),
    ]


def test_parse_sitemap_single_line_and_crlf(spark):
    # machine-generated single-line files and CRLF pretty-printing both
    # flatten to the same parse
    one_line = (
        "<urlset><url><loc>https://a/x</loc></url>"
        "<url><loc>https://a/y</loc><priority>0.5</priority></url>"
        "</urlset>"
    )
    crlf = one_line.replace("<url>", "\r\n  <url>")
    d = spark.createDataFrame(
        [("s1", one_line), ("s2", crlf)], ["site", "xml"]
    )
    out = parse_sitemap(d).collect()
    by_site = {}
    for r in out:
        by_site.setdefault(r.site, []).append((r.url, r.priority))
    assert sorted(by_site["s1"]) == sorted(by_site["s2"]) == [
        ("https://a/x", None),
        ("https://a/y", "0.5"),
    ]


def test_parse_sitemap_empty_and_junk(spark):
    d = spark.createDataFrame(
        [("s1", ""), ("s2", "not xml at all"), ("s3", "<urlset></urlset>")],
        ["site", "xml"],
    )
    assert parse_sitemap(d).count() == 0
