"""End-to-end curation job: dedup -> quality gate -> decontamination ->
PII scrub, through the spark-submit CLI surface (jobs/curate.py)."""

import os
import shutil
import tempfile

import jobs.curate as C


def _doc(tag: str, n: int = 60) -> str:
    """>=50 words, 2+ Gopher stopwords, and a per-tag unique filler
    every other word so DISTINCT tags share no 3-grams (decontamination
    only fires on true copies)."""
    base = (
        "the policy framework and the annual report that ministries have "
        "published with measurable targets to be reviewed"
    ).split()
    words = []
    k = 0
    while len(words) < n:
        words.append(base[k % len(base)])
        words.append(f"{tag}tok{k}")
        k += 1
    return " ".join(words[:n])


def test_curate_pipeline_stages(spark):
    rows = [
        (1, _doc("alpha")),                    # survives everything
        (2, _doc("alpha")),                    # exact dup of 1 -> dropped
        (3, "too short"),                      # fails quality gate
        (4, _doc("contaminated marker")),      # overlaps holdout -> dropped
        (5, _doc("pii row") + " mail me at a.b@example.com or +44 555 1234"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    holdout = spark.createDataFrame(
        [(100, _doc("contaminated marker"))], "doc_id long, text string"
    )

    curated, counts = C.curate(
        spark, docs, holdout=holdout, min_hits=1, scrub_pii=True
    )
    out = {r["doc_id"]: r["text"] for r in curated.collect()}

    assert counts["input"] == 5
    assert counts["after_exact_dedup"] == 4          # doc 2 gone
    assert counts["after_quality_gate"] == 3         # doc 3 gone
    assert counts["after_decontamination"] == 2      # doc 4 gone
    assert 4 not in out
    assert 1 in out and 5 in out
    assert "<EMAIL>" in out[5] and "<PHONE>" in out[5]
    assert "a.b@example.com" not in out[5]


def test_curate_cli_end_to_end(spark):
    base = tempfile.mkdtemp(prefix="ndps-curate-")
    try:
        docs = spark.createDataFrame(
            [(i, _doc(f"doc{i}")) for i in range(10)] + [(99, "dup"), (100, "dup")],
            "doc_id long, text string",
        )
        docs.write.parquet(base + "/in")
        C.main([
            "--input", base + "/in",
            "--output", base + "/out",
            "--scrub-pii",
        ])
        out = spark.read.parquet(base + "/out")
        assert out.count() == 10  # both 'dup' docs fail the quality gate
        assert set(out.columns) == {"doc_id", "text"}
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_curate_with_snapshot_dedup_stage(spark):
    """--dedup-against drops docs the committed snapshot already holds
    (exact or near-verbatim) before the usual stages run."""
    committed = spark.createDataFrame(
        [(900, _doc("alpha")), (901, _doc("beta"))],
        "doc_id long, text string",
    )
    rows = [
        (1, _doc("alpha")),            # exact re-crawl -> dropped
        (2, _doc("beta") + " x"),      # near-verbatim -> dropped
        (3, _doc("gamma")),            # fresh -> survives
        (4, _doc("gamma")),            # exact dup of 3 -> exact-dedup stage
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    curated, counts = C.curate(
        spark, docs, dedup_against=committed
    )
    ids = sorted(r["doc_id"] for r in curated.collect())
    assert counts["input"] == 4
    assert counts["after_snapshot_dedup"] == 2      # docs 1, 2 gone
    assert counts["after_exact_dedup"] == 1         # doc 4 gone
    assert ids == [3]
    curated.unpersist()
