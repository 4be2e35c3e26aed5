"""Bloom-prefiltered snapshot dedup (operators/dedup.py).

The load-bearing property is NO FALSE NEGATIVES: every new doc whose
content hash exists in the committed set must be bloom_hit, so the
exact verify join restricted to hits is bit-identical to a full join.
A deliberately tiny filter (m_bits=64) forces heavy collisions to
exercise the false_positive path.
"""

import pytest
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.dedup import (
    bloom_snapshot_filter,
    bloom_words,
)


def _corpus(spark, n=60):
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("committed document body "), F.col("id")).alias(
            "text"
        ),
    )


def test_bloom_no_false_negatives_even_tiny_filter(spark):
    old = _corpus(spark)
    # half re-crawled identical, half fresh
    new = _corpus(spark).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0, F.col("text")
        ).otherwise(F.concat(F.lit("fresh page "), F.col("doc_id"))),
    )
    out = bloom_snapshot_filter(new, old, m_bits=64, num_hashes=2).collect()
    assert len(out) == 60
    for r in out:
        if r["doc_id"] % 2 == 0:
            # committed content MUST be flagged: no false negatives
            assert r["bloom_hit"] and r["exact_dup"] and not r["keep"]
            assert not r["false_positive"]
        else:
            assert not r["exact_dup"] and r["keep"]
            assert r["false_positive"] == r["bloom_hit"]
    # a 64-bit filter over 60 hashes is saturated -> fresh docs collide
    assert any(r["false_positive"] for r in out if r["doc_id"] % 2 == 1)


def test_bloom_exact_dup_matches_plain_join(spark):
    """exact_dup from the prefiltered path == a full anti-join answer."""
    old = _corpus(spark, 40)
    new = _corpus(spark, 40).withColumn(
        "text",
        F.when(F.col("doc_id") < 10, F.col("text")).otherwise(
            F.concat(F.lit("novel "), F.col("doc_id"))
        ),
    )
    out = {
        r["doc_id"]: r["exact_dup"]
        for r in bloom_snapshot_filter(
            new, old, m_bits=256, num_hashes=3
        ).collect()
    }
    truth = {
        r["doc_id"]: r["dup"]
        for r in new.join(
            old.select(F.md5("text").alias("h")).distinct().withColumn(
                "dup", F.lit(True)
            ),
            F.md5(new["text"]) == F.col("h"),
            "left",
        )
        .select("doc_id", F.coalesce("dup", F.lit(False)).alias("dup"))
        .collect()
    }
    assert out == truth


def test_bloom_words_packing_bounds(spark):
    words = bloom_words(
        _corpus(spark, 50), m_bits=1 << 10, num_hashes=4
    ).collect()
    assert 0 < len(words) <= (1 << 10) // 32
    for r in words:
        assert 0 <= r["word_idx"] < (1 << 10) // 32
        # 32-bit packing never touches the sign bit of the BIGINT word
        assert 0 < r["word"] < (1 << 32)


def test_bloom_words_rejects_bad_params(spark):
    with pytest.raises(ValueError):
        bloom_words(_corpus(spark, 5), m_bits=0)
    with pytest.raises(ValueError):
        bloom_words(_corpus(spark, 5), num_hashes=0)


def test_duplicate_doc_ids_keep_their_own_verdicts(spark):
    # one doc_id crawled twice in a batch: one content committed, one
    # fresh — each row must pair its own bloom_hit with its own verify
    old = _corpus(spark, 10)
    new = spark.createDataFrame(
        [(3, "committed document body 3"), (3, "a brand new page")],
        "doc_id bigint, text string",
    )
    rows = bloom_snapshot_filter(new, old, m_bits=4096, num_hashes=3)
    out = sorted(
        (r["exact_dup"], r["keep"]) for r in rows.collect()
    )
    assert len(out) == 2
    assert out == [(False, True), (True, False)]
