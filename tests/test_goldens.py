"""Golden snapshot tests — the byte-identical extracted-text contract.

The north-rule invariant: extracted text per url is byte-identical to the
pinned goldens, through BOTH the pure-Python core and the full Spark
pipeline (any partitioning). Mirrors the reference's golden-fixture
strategy (cli/test/test_data/output/test_html.json, SURVEY §5).
"""

import json
import pathlib

import pytest

from navigator_document_parser_spark.extraction import policy
from navigator_document_parser_spark.extraction.pdf_blocks import extract_pdf
from navigator_document_parser_spark.sources.synth import make_html, make_pdf

GOLDEN = pathlib.Path(__file__).parent / "fixtures" / "golden"
MANIFEST = json.loads((GOLDEN / "manifest.json").read_text())
ALL_IDS = sorted(int(k) for k in MANIFEST)
N = 40  # contiguous range used by the Spark-pipeline golden run


def golden_text(i: int) -> bytes:
    return (GOLDEN / f"doc_{i}.txt").read_bytes()


@pytest.mark.parametrize("i", ALL_IDS)
def test_core_extraction_matches_golden_bytes(i):
    entry = MANIFEST[str(i)]
    if entry["route"] == "pdf":
        ext = extract_pdf(make_pdf(i))
        assert ext.content.encode("utf-8") == golden_text(i)
        assert ext.md5sum == entry["md5sum"]
        assert len(ext.blocks) == entry["n_blocks"]
        assert len(ext.pages) == entry["n_pages"]
    else:
        r = policy.extract_html(make_html(i).decode("utf-8"))
        assert r.text.encode("utf-8") == golden_text(i)
        assert r.parser == entry["parser"]
        assert r.detected_title == entry["detected_title"]
        assert r.has_valid_text == entry["has_valid_text"]
        assert len(r.text_blocks) == entry["n_blocks"]


def test_spark_pipeline_matches_golden_bytes(spark):
    """Full pipeline over a deliberately different partitioning."""
    from navigator_document_parser_spark.plans.job import run_extraction
    from navigator_document_parser_spark.sources.synth import synth_documents

    out = run_extraction(synth_documents(spark, N, partitions=3), "golden")
    rows = {
        r["url"]: r for r in out.select("url", "text", "parser").collect()
    }
    assert len(rows) == N
    for i in range(N):
        suffix = ".pdf" if i % 5 == 4 else ""
        url = f"https://site{i % 17}.example.org/page/{i}{suffix}"
        assert rows[url]["text"].encode("utf-8") == golden_text(i), f"doc {i}"
        expected_parser = MANIFEST[str(i)]["parser"]
        assert rows[url]["parser"] == expected_parser


def test_goldens_cover_all_three_parsers():
    parsers = {e["parser"] for e in MANIFEST.values()}
    assert {"newsplease", "readability", "pdf"} <= parsers
