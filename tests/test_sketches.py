"""Cardinality sketches (operators/sketches.py)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from navigator_document_parser_spark.operators.sketches import (
    hll_distinct,
    kmv_distinct,
)


def _values(spark, n_distinct, copies=3, grp="g"):
    rows = [
        (grp, f"value-{i}") for i in range(n_distinct) for _ in range(copies)
    ]
    return spark.createDataFrame(rows, "lang string, text string")


def test_hll_estimate_within_error_bound(spark):
    # p=8 -> m=256, standard error ~1.04/sqrt(m) ≈ 6.5%; allow 4 sigma
    for n in (100, 1000, 5000):
        df = _values(spark, n)
        est = hll_distinct(df, p=8).collect()[0]["estimate"]
        assert abs(est - n) / n < 0.26, (n, est)


def test_hll_duplicates_do_not_change_estimate(spark):
    a = hll_distinct(_values(spark, 500, copies=1), p=8).collect()[0]
    b = hll_distinct(_values(spark, 500, copies=7), p=8).collect()[0]
    assert a["estimate"] == b["estimate"]
    assert a["v_zero"] == b["v_zero"]


def test_kmv_exact_below_k_and_estimate_above(spark):
    small = kmv_distinct(_values(spark, 10), k=32).collect()[0]
    assert small["estimate"] == 10.0 and small["n_kept"] == 10
    big = kmv_distinct(_values(spark, 2000), k=64).collect()[0]
    assert big["n_kept"] == 64
    # KMV relative error ~1/sqrt(k-1) ≈ 12.6%; allow 4 sigma
    assert abs(big["estimate"] - 2000) / 2000 < 0.5, big["estimate"]


def test_multi_group_independence(spark):
    rows = [("a", f"x{i}") for i in range(50)] + [
        ("b", f"y{i}") for i in range(500)
    ]
    df = spark.createDataFrame(rows, "lang string, text string")
    out = {r["grp"]: r["estimate"] for r in kmv_distinct(df, k=16).collect()}
    assert out["a"] > 25 and out["b"] > out["a"]


def test_rejects_bad_params(spark):
    df = _values(spark, 3)
    with pytest.raises(ValueError):
        hll_distinct(df, p=2)
    with pytest.raises(ValueError):
        kmv_distinct(df, k=1)


def test_cms_overestimates_never_under(spark):
    from navigator_document_parser_spark.operators.sketches import (
        cms_counts,
    )

    rows = (
        [("g", "hot")] * 500
        + [("g", f"tail{i}") for i in range(300)]
        + [("g", "warm")] * 40
    )
    df = spark.createDataFrame(rows, "lang string, tok string").select(
        F.col("tok")
    )
    out = {
        r["term"]: r["est_count"]
        for r in cms_counts(
            df, ["hot", "warm", "absent"], depth=4, width=128
        ).collect()
    }
    # CMS estimates are always >= truth; with d=4/w=128 over 840 items
    # the inflation stays below the eps*N bound (~2.7*840/128 ≈ 18)
    assert 500 <= out["hot"] <= 540
    assert 40 <= out["warm"] <= 80
    assert 0 <= out["absent"] <= 40


def test_cms_rejects_bad_params(spark):
    from navigator_document_parser_spark.operators.sketches import (
        cms_counts,
    )

    df = spark.createDataFrame([("x",)], "tok string")
    with pytest.raises(ValueError):
        cms_counts(df, ["x"], depth=0)
    with pytest.raises(ValueError):
        cms_counts(df, ["x"], width=1)
