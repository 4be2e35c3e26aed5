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


def test_index_merge_equals_from_scratch(spark):
    from navigator_document_parser_spark.operators.search import (
        index_export,
        index_merge,
    )

    rows = [
        (i, f"alpha beta w{i % 7} w{i % 3} shared")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    old = df.filter("doc_id % 4 != 1")
    delta = df.filter("doc_id % 4 = 1")
    merged = index_merge(
        index_export(old, n_shards=4, block_size=10),
        delta,
        n_shards=4,
        block_size=10,
    )
    scratch = index_export(df, n_shards=4, block_size=10)
    m = {
        (r["term"], r["block_id"]): (r["shard"], r["block_df"],
                                     r["postings"])
        for r in merged.collect()
    }
    s = {
        (r["term"], r["block_id"]): (r["shard"], r["block_df"],
                                     r["postings"])
        for r in scratch.collect()
    }
    assert m == s


def test_index_merge_leaves_untouched_blocks_alone(spark):
    from navigator_document_parser_spark.operators.search import (
        index_export,
        index_merge,
    )

    old = spark.createDataFrame(
        [(1, "onlyold terms here"), (25, "other block words")],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame(
        [(26, "other block words")], "doc_id bigint, text string"
    )
    idx = index_export(old, n_shards=2, block_size=10)
    merged = {
        (r["term"], r["block_id"]): r["postings"]
        for r in index_merge(idx, delta, n_shards=2,
                             block_size=10).collect()
    }
    # block 0 terms untouched; 'other'/'block'/'words' block 2 rebuilt
    assert merged[("onlyold", 0)] == [1]
    assert merged[("other", 2)] == [25, 1]  # delta-encoded [25, 26]


def test_index_merge_recrawl_changed_and_emptied_docs(spark):
    """The new crawl is authoritative: changed text drops stale
    postings, an emptied doc vanishes from the index entirely."""
    from navigator_document_parser_spark.operators.search import (
        index_export,
        index_merge,
    )

    old = spark.createDataFrame(
        [(1, "apple pie"), (2, "apple cake"), (3, "cherry")],
        "doc_id bigint, text string",
    )
    delta = spark.createDataFrame(
        [(1, "banana pie"), (3, "")],  # doc 1 changed, doc 3 emptied
        "doc_id bigint, text string",
    )
    merged = {
        (r["term"], r["block_id"]): (r["block_df"], r["postings"])
        for r in index_merge(
            index_export(old, n_shards=2, block_size=10),
            delta, n_shards=2, block_size=10,
        ).collect()
    }
    full = spark.createDataFrame(
        [(1, "banana pie"), (2, "apple cake"), (3, "")],
        "doc_id bigint, text string",
    )
    scratch = {
        (r["term"], r["block_id"]): (r["block_df"], r["postings"])
        for r in index_export(full, n_shards=2, block_size=10).collect()
    }
    assert merged == scratch
    assert ("apple", 0) in merged and merged[("apple", 0)][1] == [2]
    assert ("cherry", 0) not in merged  # emptied doc fully purged
    assert merged[("banana", 0)][1] == [1]


def test_index_lookup_serves_conjunctive_queries(spark):
    from navigator_document_parser_spark.operators.search import (
        index_export,
        index_lookup,
    )
    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, "apple banana cherry"),
            (2, "apple banana"),
            (3, "apple"),
            (15, "banana apple banana"),  # second block, repeated term
        ],
        "doc_id bigint, text string",
    )
    idx = index_export(docs, n_shards=4, block_size=10)
    got = {
        r["doc_id"]: r["n_terms"]
        for r in index_lookup(idx, ["apple", "banana"]).collect()
    }
    assert got == {1: 2, 2: 2, 15: 2}
    # duplicate query terms collapse; single-term works across blocks
    one = {r["doc_id"] for r in
           index_lookup(idx, ["banana", "banana"]).collect()}
    assert one == {1, 2, 15}
    assert index_lookup(idx, ["absent"]).collect() == []
    with _pytest.raises(ValueError):
        index_lookup(idx, [])
