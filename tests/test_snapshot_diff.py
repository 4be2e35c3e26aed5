"""Snapshot diff audit (operators/dedup.py snapshot_diff)."""

from pyspark.sql import functions as F  # noqa: F401

from navigator_document_parser_spark.operators.dedup import snapshot_diff


def test_all_four_statuses(spark):
    old = spark.createDataFrame(
        [
            (1, "same text", "a.org"),
            (2, "will change", "a.org"),
            (3, "will be removed", "b.org"),
            (4, "also same", "b.org"),
        ],
        "doc_id bigint, text string, source string",
    )
    new = spark.createDataFrame(
        [
            (1, "same text", "a.org"),
            (2, "changed text", "a.org"),
            (4, "also same", "b.org"),
            (5, "brand new", "b.org"),
        ],
        "doc_id bigint, text string, source string",
    )
    out = {r["grp"]: r for r in snapshot_diff(new, old).collect()}
    a, b = out["a.org"], out["b.org"]
    assert (a["n_added"], a["n_removed"], a["n_changed"],
            a["n_unchanged"]) == (0, 0, 1, 1)
    assert (b["n_added"], b["n_removed"], b["n_changed"],
            b["n_unchanged"]) == (1, 1, 0, 1)


def test_counts_partition_the_union_of_ids(spark):
    old = spark.createDataFrame(
        [(i, f"t{i}", "s") for i in range(20)],
        "doc_id bigint, text string, source string",
    )
    new = spark.createDataFrame(
        [(i, f"t{i}" if i % 2 else f"e{i}", "s") for i in range(5, 25)],
        "doc_id bigint, text string, source string",
    )
    r = snapshot_diff(new, old).collect()[0]
    total = (r["n_added"] + r["n_removed"] + r["n_changed"]
             + r["n_unchanged"])
    assert total == 25  # |ids(old) U ids(new)|
    assert r["n_added"] == 5 and r["n_removed"] == 5


def test_ungrouped_mode(spark):
    old = spark.createDataFrame(
        [(1, "x", "s")], "doc_id bigint, text string, source string"
    )
    new = spark.createDataFrame(
        [(1, "x", "s")], "doc_id bigint, text string, source string"
    )
    rows = snapshot_diff(new, old, group_col=None).collect()
    assert len(rows) == 1 and rows[0]["grp"] == "all"
    assert rows[0]["n_unchanged"] == 1


def test_null_text_classified_by_presence_not_hash(spark):
    """md5(NULL) is NULL; classification must come from id presence
    (review finding). A null-text doc present in both crawls is
    'changed' (vs text) or 'unchanged' (vs null), never added/removed."""
    old = spark.createDataFrame(
        [(1, None, "s"), (2, None, "s"), (3, "x", "s")],
        "doc_id bigint, text string, source string",
    )
    new = spark.createDataFrame(
        [(1, "now has text", "s"), (2, None, "s"), (3, None, "s")],
        "doc_id bigint, text string, source string",
    )
    r = snapshot_diff(new, old).collect()[0]
    assert (r["n_added"], r["n_removed"]) == (0, 0)
    assert r["n_changed"] == 2      # null->text and text->null
    assert r["n_unchanged"] == 1    # null->null is null-safe equal
