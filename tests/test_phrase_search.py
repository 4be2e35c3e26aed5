"""Positional-index phrase search (operators/search.py phrase_search).

Pins the tricky anchor-vote semantics: overlapping matches count every
anchor, repeated-term phrases need distinct i votes at one anchor, and
tokenization (lower/trim/empty-filter) matches the oracle's list scan.
"""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from navigator_document_parser_spark.operators.search import phrase_search


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _run(spark, rows, phrases):
    out = phrase_search(_df(spark, rows), phrases).collect()
    return {
        (r["phrase_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in out
    }


def test_overlapping_anchors_all_count(spark):
    got = _run(spark, [(1, "a a a a")], [(0, ["a", "a"])])
    # anchors 0,1,2 all match — overlapping occurrences are distinct
    assert got == {(0, 1): (3, 0)}


def test_repeated_term_needs_both_positions(spark):
    rows = [(1, "x the y the the z"), (2, "the y the z the")]
    got = _run(spark, rows, [(0, ["the", "the"])])
    # doc 1 has consecutive "the the" at anchor 3; doc 2 never does
    assert got == {(0, 1): (1, 3)}


def test_case_whitespace_and_empty_docs(spark):
    rows = [
        (1, "  Fast   TABLE  scan "),
        (2, ""),
        (3, "fast"),
        (4, "table fast"),
    ]
    got = _run(spark, rows, [(0, ["fast", "table"])])
    # positions are over the empty-token-filtered stream: doc 1 matches
    # at 0 despite leading/multiple whitespace; reversed order does not
    assert got == {(0, 1): (1, 0)}


def test_phrase_longer_than_doc_and_miss(spark):
    rows = [(1, "one two")]
    got = _run(
        spark, rows, [(0, ["one", "two", "three"]), (1, ["two", "one"])]
    )
    assert got == {}


def test_multiple_phrases_one_pass(spark):
    rows = [(1, "join hash join hash join")]
    got = _run(
        spark,
        rows,
        [(0, ["join", "hash"]), (1, ["hash", "join"]), (2, ["join"])],
    )
    assert got == {
        (0, 1): (2, 0),
        (1, 1): (2, 1),
        (2, 1): (3, 0),
    }


def test_empty_phrase_rejected(spark):
    with pytest.raises(ValueError):
        phrase_search(_df(spark, [(1, "x")]), [(0, [])])
