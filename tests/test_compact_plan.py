"""compact_plan — small-file rewrite grouping (Iceberg rewrite analog)."""

from __future__ import annotations

import pytest

from navigator_document_parser_spark.operators.layout import compact_plan


def _plan(spark, rows, **kw):
    df = spark.createDataFrame(rows, "part bigint, path string, bytes bigint")
    return compact_plan(df, **kw).collect()


def test_next_fit_groups_and_exclusions(spark):
    rows = [
        (0, "a", 300), (0, "b", 300), (0, "c", 300),  # grp 0 (900 > 512)
        (0, "d", 300), (0, "e", 300),                 # grp 1
        (0, "big", 600),                              # >= target: untouched
        (1, "x", 100), (1, "y", 100),                 # other partition
    ]
    got = _plan(spark, rows, target_bytes=512, min_input_files=2)
    by_path = {r.path: r for r in got}
    assert "big" not in by_path
    # path order: a, b, c, d, e — offsets 0,300,600,900,1200 -> grps 0,0,1,1,2
    assert (by_path["a"].grp, by_path["b"].grp) == (0, 0)
    assert (by_path["c"].grp, by_path["d"].grp) == (1, 1)
    # 'e' lands alone in grp 2 -> dropped by min_input_files
    assert "e" not in by_path
    assert by_path["a"].grp_files == 2 and by_path["a"].grp_bytes == 600
    # partitions never mix
    assert {r.part for r in got if r.path in ("x", "y")} == {1}
    assert by_path["x"].grp == by_path["y"].grp == 0


def test_group_bytes_bounded_by_next_fit(spark):
    """Every group's total is < target + max member size (the next-fit
    bound): the group id is the starting offset div target."""
    rows = [(0, f"f{i:03d}", 97 + (i * 31) % 400) for i in range(60)]
    got = _plan(spark, rows, target_bytes=1000, min_input_files=2)
    groups = {}
    for r in got:
        groups.setdefault(r.grp, []).append(r.bytes)
        assert r.grp_bytes < 1000 + max(b for _, _, b in rows)
    for grp, sizes in groups.items():
        assert sum(sizes) == [r.grp_bytes for r in got if r.grp == grp][0]


def test_validates_params(spark):
    rows = [(0, "a", 1)]
    with pytest.raises(ValueError):
        _plan(spark, rows, target_bytes=0)
    with pytest.raises(ValueError):
        _plan(spark, rows, min_input_files=1)


# ---------------------------------------------------------------------------
# table_stats — ANALYZE-style one-scan column statistics
# ---------------------------------------------------------------------------

from navigator_document_parser_spark.operators.layout import table_stats


def test_table_stats_values_and_nulls(spark):
    rows = [(1, "a"), (2, "b"), (2, None), (None, "a"), (5, "c")]
    df = spark.createDataFrame(rows, "k bigint, s string")
    got = {r.col: r for r in table_stats(df, ["k", "s"]).collect()}
    assert set(got) == {"k", "s"}
    k = got["k"]
    assert (k.n_rows, k.n_null, k.n_distinct) == (5, 1, 3)
    assert (k.min_val, k.max_val) == ("1", "5")
    s = got["s"]
    assert (s.n_rows, s.n_null, s.n_distinct) == (5, 1, 3)
    assert (s.min_val, s.max_val) == ("a", "c")


def test_table_stats_all_null_and_empty_and_validation(spark):
    df = spark.createDataFrame([(None,), (None,)], "x string")
    r = table_stats(df, ["x"]).collect()[0]
    assert (r.n_rows, r.n_null, r.n_distinct) == (2, 2, 0)
    assert r.min_val is None and r.max_val is None
    empty = spark.createDataFrame([], "x string")
    r = table_stats(empty, ["x"]).collect()[0]
    assert (r.n_rows, r.n_null, r.n_distinct) == (0, 0, 0)
    with pytest.raises(ValueError):
        table_stats(df, [])


def test_table_stats_single_scan_plan(spark):
    """All per-column aggregates must fold into one pass — the plan
    scans the source once (no union of per-column scans)."""
    df = spark.createDataFrame([(1, "a")], "k bigint, s string")
    plan = (
        table_stats(df, ["k", "s"])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Scan ExistingRDD") == 1
    assert "Union" not in plan


# ---------------------------------------------------------------------------
# kn_bigram_counts — Kneser-Ney count export
# ---------------------------------------------------------------------------

from navigator_document_parser_spark.operators.text import kn_bigram_counts


def test_kn_counts_hand_computed(spark):
    docs = spark.createDataFrame(
        [(0, "a b a b c"), (1, "a b"), (2, "x"), (3, "")],
        "doc_id long, text string",
    )
    got = {(r.w1, r.w2): r for r in kn_bigram_counts(docs).collect()}
    # bigrams: (a,b)x3, (b,a)x1, (b,c)x1 — docs 2/3 contribute none
    assert set(got) == {("a", "b"), ("b", "a"), ("b", "c")}
    ab = got[("a", "b")]
    assert (ab.c, ab.c_w1, ab.n1p_w1) == (3, 3, 1)   # 'a' only ever -> b
    assert ab.cont_w2 == 1                            # b follows only a
    assert ab.n1p_total == 3
    ba = got[("b", "a")]
    assert (ba.c, ba.c_w1, ba.n1p_w1) == (1, 2, 2)   # b -> {a, c}
    assert ba.cont_w2 == 1                            # a follows only b


def test_kn_counts_pruning_keeps_full_context_totals(spark):
    """min_count prunes OUTPUT rows only — the exported context totals
    must still reflect the uncut corpus (the KenLM pruning caveat)."""
    docs = spark.createDataFrame(
        [(0, "a b a b a c")], "doc_id long, text string"
    )
    got = {(r.w1, r.w2): r
           for r in kn_bigram_counts(docs, min_count=2).collect()}
    assert set(got) == {("a", "b"), ("b", "a")}
    ab = got[("a", "b")]
    # c(a .) counts the pruned (a,c) instance too; fan-out sees it too
    assert (ab.c, ab.c_w1, ab.n1p_w1) == (2, 3, 2)
    assert ab.n1p_total == 3  # distinct bigrams pre-prune


def test_kn_counts_identities(spark):
    """Internal consistency over a larger corpus: per-w1 totals equal
    the sum of member counts, and n1p_total is the distinct count."""
    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .select("doc_id", "text").limit(200)
    )
    rows = kn_bigram_counts(docs).collect()
    by_w1 = {}
    for r in rows:
        by_w1.setdefault(r.w1, []).append(r)
    for w1, rs in by_w1.items():
        assert {x.c_w1 for x in rs} == {sum(x.c for x in rs)}
        assert {x.n1p_w1 for x in rs} == {len(rs)}
    assert {r.n1p_total for r in rows} == {len(rows)}
