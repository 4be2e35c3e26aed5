"""Sharded delta-encoded inverted-index export
(operators/search.py index_export)."""

import pytest

from navigator_document_parser_spark.operators.search import index_export


def test_delta_encoding_and_blocks(spark):
    rows = [
        (1, "apple banana"),
        (5, "apple"),
        (9, "apple cherry"),
        (12, "apple"),   # new block with block_size=10
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {
        (r["term"], r["block_id"]): r
        for r in index_export(df, n_shards=4, block_size=10).collect()
    }
    a0 = out[("apple", 0)]
    # docs 1,5,9 -> gaps [1,4,4]
    assert a0["postings"] == [1, 4, 4] and a0["block_df"] == 3
    a1 = out[("apple", 1)]
    assert a1["postings"] == [12] and a1["block_df"] == 1
    assert out[("banana", 0)]["postings"] == [1]
    assert out[("cherry", 0)]["postings"] == [9]
    # same term always lands on the same shard regardless of block
    assert a0["shard"] == a1["shard"] and 0 <= a0["shard"] < 4


def test_repeated_term_in_doc_counts_once(spark):
    df = spark.createDataFrame(
        [(3, "dup dup dup")], "doc_id bigint, text string"
    )
    rows = index_export(df, n_shards=2, block_size=100).collect()
    assert len(rows) == 1
    assert rows[0]["block_df"] == 1 and rows[0]["postings"] == [3]


def test_rejects_bad_params(spark):
    df = spark.createDataFrame([(1, "x")], "doc_id bigint, text string")
    with pytest.raises(ValueError):
        index_export(df, n_shards=0)
    with pytest.raises(ValueError):
        index_export(df, block_size=0)
