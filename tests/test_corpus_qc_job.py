"""End-to-end pytest for the corpus-QC CLI job (jobs/corpus_qc.py):
the composed report must agree with the contract-pinned operators it
is built from, and the summary must be internally consistent."""

import json
import subprocess
import sys
import tempfile

from pyspark.sql import functions as F


def test_corpus_qc_build(spark):
    from jobs.corpus_qc import build_qc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    try:
        _run_build_assertions(spark, docs)
    finally:
        # build_qc persists the documents scan (process-lifetime in the
        # CLI); in the SHARED pytest session a lingering cache entry
        # gets CacheManager-substituted into LATER tests' plans as
        # InMemoryTableScan and breaks their ReusedExchange pins
        spark.catalog.clearCache()


def test_release_qc_drops_cache_entries(spark):
    from jobs.corpus_qc import build_qc, release_qc

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    flags, _, _ = build_qc(spark, docs)
    assert flags.storageLevel.useMemory
    release_qc(docs, flags)
    assert not flags.storageLevel.useMemory
    assert not docs.storageLevel.useMemory


def _run_build_assertions(spark, docs):
    from jobs.corpus_qc import build_qc

    flags, host_report, summary = build_qc(spark, docs)

    assert summary["docs"] == docs.count()
    assert summary["hosts"] == docs.select("source").distinct().count()
    # flag table covers every doc exactly once
    assert flags.count() == summary["docs"]
    assert flags.select("doc_id").distinct().count() == summary["docs"]

    # summary counts equal recounts of the flag table
    n_pass = flags.filter(F.col("passes")).count()
    assert summary["quality_pass"] == n_pass
    assert summary["code_docs"] == flags.filter(F.col("is_code")).count()

    # host_report per-host flag counts sum back to the corpus totals
    tot = host_report.agg(
        F.sum("n_pass").alias("p"), F.sum("n_code").alias("c")
    ).collect()[0]
    assert int(tot["p"]) == n_pass
    assert int(tot["c"]) == summary["code_docs"]
    # reputation columns present and flags boolean
    assert {"dup_ratio4", "top_lang_share4", "reputable"} <= set(
        host_report.columns
    )


def test_corpus_qc_cli_writes_report(tmp_path):
    out = tmp_path / "qc"
    r = subprocess.run(
        [
            sys.executable,
            "jobs/corpus_qc.py",
            "--input",
            "/root/testdata/sf0.001/documents.parquet",
            "--output",
            str(out),
            "--master",
            "local[4]",
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    summary = json.loads(r.stdout.strip().splitlines()[-1])
    assert summary["docs"] == 500
    assert (out / "doc_flags").exists()
    assert (out / "host_report").exists()
