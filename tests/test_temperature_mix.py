"""Temperature-scaled language mixing
(operators/selection.py temperature_mix)."""

import pytest
from pyspark.sql import functions as F  # noqa: F401

from navigator_document_parser_spark.operators.selection import (
    temperature_mix,
)


def _df(spark, sizes):
    rows = []
    i = 0
    for lang, n in sizes.items():
        for _ in range(n):
            rows.append((i, lang))
            i += 1
    return spark.createDataFrame(rows, "doc_id bigint, lang string")


def test_alpha_upsamples_low_resource(spark):
    df = _df(spark, {"en": 400, "sw": 20})
    rows = temperature_mix(df, alpha=0.3, budget_frac=0.5).collect()
    w = {r["grp"]: r["weight"] for r in rows}
    # natural share of sw is 20/420 ≈ 0.048; alpha=0.3 lifts it
    assert w["sw"] > 20 / 420
    assert w["en"] + w["sw"] == pytest.approx(1.0, abs=1e-6)
    # low-resource group keeps (nearly) everything under the boost
    kept_sw = sum(1 for r in rows if r["grp"] == "sw" and r["keep"])
    kept_en = sum(1 for r in rows if r["grp"] == "en" and r["keep"])
    assert kept_sw / 20 > kept_en / 400


def test_alpha_one_is_natural_distribution(spark):
    df = _df(spark, {"a": 300, "b": 100})
    rows = temperature_mix(df, alpha=1.0, budget_frac=0.5).collect()
    w = {r["grp"]: r["weight"] for r in rows}
    assert w["a"] == pytest.approx(0.75, abs=1e-8)
    assert w["b"] == pytest.approx(0.25, abs=1e-8)


def test_keep_deterministic_and_budget_scaled(spark):
    df = _df(spark, {"a": 200, "b": 200})
    a = {(r["id"], r["keep"]) for r in
         temperature_mix(df, budget_frac=0.5).collect()}
    b = {(r["id"], r["keep"]) for r in
         temperature_mix(df, budget_frac=0.5).collect()}
    assert a == b  # replayable
    kept_half = sum(1 for _, k in a if k)
    full = temperature_mix(df, budget_frac=1.0).collect()
    kept_full = sum(1 for r in full if r["keep"])
    assert kept_full > kept_half
    assert abs(kept_half - 200) < 60  # ~budget_frac * N, Bernoulli noise


def test_rejects_bad_budget(spark):
    df = _df(spark, {"a": 5})
    with pytest.raises(ValueError):
        temperature_mix(df, budget_frac=0.0)
    with pytest.raises(ValueError):
        temperature_mix(df, budget_frac=1.5)
