"""Realistic messy-page extraction: scripts/styles/comments/entities,
nav/sidebar/footer boilerplate, a data table inside the article."""

import pathlib

from pyspark.sql import functions as F

from navigator_document_parser_spark.extraction import policy

FIXTURE = (
    pathlib.Path(__file__).parent / "fixtures" / "html" / "messy_article.html"
)


def test_messy_article_extraction():
    html = FIXTURE.read_text()
    r = policy.extract_html(html)

    assert r.parser == "newsplease"
    text = r.text
    # main-content paragraphs present, entities decoded
    assert "reformed safeguard mechanism" in text
    assert "CO₂-e" in text
    assert "4.9 per cent" in text  # &nbsp; decoded to space
    assert "2026–27" in text       # &ndash; decoded
    # boilerplate and non-content excluded
    assert "Subscribe now" not in text
    assert "Ten things about carbon markets" not in text
    assert "Privacy" not in text
    assert "var tracking" not in text
    assert ".nav{color:red}" not in text
    assert r.has_valid_text is True
    assert len(r.text_blocks) == 6


def test_messy_article_through_spark_pipeline(spark):
    """The same page through the full pipeline, including a corrupt-PDF
    row: errors become rows, never exceptions (X1 isolation)."""
    import datetime

    from navigator_document_parser_spark.plans.job import run_extraction
    from navigator_document_parser_spark.schema import DOCUMENTS_SCHEMA

    html = FIXTURE.read_text().encode("utf-8")
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        ("https://ex.org/messy", ts, bytearray(html), "", "en"),
        # url routes to pdf but payload is garbage -> graceful empty
        ("https://ex.org/broken.pdf", ts, bytearray(b"\x00\x01notapdf"), "", "en"),
        # null blob -> 'none' route passthrough
        ("https://ex.org/empty", ts, None, "", "en"),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    out = {r["url"]: r for r in run_extraction(df, "messy").collect()}

    messy = out["https://ex.org/messy"]
    assert messy["parser"] == "newsplease"
    assert "reformed safeguard mechanism" in messy["text"]
    assert messy["languages"] == ["en"]

    broken = out["https://ex.org/broken.pdf"]
    assert broken["parser"] == "pdf"
    assert broken["text"] == ""
    assert broken["md5sum"] is not None  # md5 still computed (M9)

    none = out["https://ex.org/empty"]
    assert none["parser"] == "none"
    assert none["error"] is None
