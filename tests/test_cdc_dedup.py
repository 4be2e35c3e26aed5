"""Content-defined chunking dedup (operators/dedup.py cdc_dedup)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from navigator_document_parser_spark.operators.dedup import cdc_dedup


BODY = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa "
    "lam mu nu xi omicron pi rho sigma tau upsilon phi chi psi "
    "omega one two three four five six seven eight nine ten "
    "eleven twelve thirteen fourteen fifteen sixteen"
)


def _run(spark, rows, avg_chunk=4):
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    return {r["doc_id"]: r for r in cdc_dedup(df, avg_chunk=avg_chunk).collect()}


def test_exact_duplicate_fully_flagged(spark):
    out = _run(spark, [(1, BODY), (2, BODY)])
    assert out[1]["n_dup_chunks"] == 0          # first occurrence owns all
    assert out[2]["n_dup_chunks"] == out[2]["n_chunks"]
    assert out[2]["dup_token_frac"] == 1.0


def test_boundaries_resync_after_prefix_insertion(spark):
    # shift doc 2 by one novel token: content-defined boundaries
    # re-synchronize, so most chunks are still recognized as duplicates
    out = _run(spark, [(1, BODY), (2, "NOVELPREFIX " + BODY)])
    frac = out[2]["dup_token_frac"]
    assert frac > 0.5, frac
    # sanity: the shifted doc has at least one non-dup chunk (the one
    # containing the inserted token)
    assert out[2]["n_dup_chunks"] < out[2]["n_chunks"]


def test_within_doc_repeats_count(spark):
    # the same long run repeated inside ONE doc: later chunks are dups
    text = BODY + " " + BODY
    out = _run(spark, [(7, text)])
    assert out[7]["n_dup_chunks"] > 0


def test_counts_consistent(spark):
    out = _run(spark, [(1, BODY), (2, "totally different words here")])
    for r in out.values():
        assert r["n_tokens"] >= r["n_chunks"] >= 1
        assert 0 <= r["n_dup_chunks"] <= r["n_chunks"]
        assert 0.0 <= r["dup_token_frac"] <= 1.0


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        cdc_dedup(df, avg_chunk=0)
