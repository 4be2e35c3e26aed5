"""Skew defusal: explicit rebalance spreads giant-blob hotspots."""

from pyspark.sql import functions as F

from navigator_document_parser_spark.plans.job import (
    rebalance_for_skew,
    with_route,
)
from navigator_document_parser_spark.sources.synth import synth_documents


def _partition_bytes(df):
    rows = (
        df.select(
            F.spark_partition_id().alias("p"),
            F.length("html").alias("b"),
        )
        .groupBy("p")
        .agg(F.sum("b").alias("bytes"))
        .collect()
    )
    return {r["p"]: r["bytes"] for r in rows}


def test_rebalance_spreads_pathological_input(spark):
    # pathological layout: partition BY size class -> all heavy-tail
    # blobs land together (what a size-ordered crawl dump looks like).
    # AQE off for the measurement: at test scale it coalesces this tiny
    # shuffle to one partition, hiding the layout under test.
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        docs = synth_documents(spark, 400, partitions=8)
        skewed = docs.repartitionByRange(4, F.length("html"))

        before = _partition_bytes(skewed)
        after = _partition_bytes(rebalance_for_skew(with_route(skewed), 16))
        max_blob = docs.agg(F.max(F.length("html"))).collect()[0][0]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", "true")

    total = sum(before.values())
    # the size-ordered layout concentrates bytes badly
    assert max(before.values()) > 2 * (total / len(before)), before
    # after round-robin rebalance the hotspot is gone: max partition is
    # bounded by single-blob granularity (you cannot split one document),
    # i.e. mean + one max blob — the honest contract for a blob corpus
    # (round-robin is row-wise, so byte balance is expectation-level: a
    # few heavy blobs may still share a partition — allow a small number
    # of blob-granularity collisions)
    mean_after = total / len(after)
    assert max(after.values()) <= mean_after + 3 * max_blob, (after, max_blob)
    assert max(after.values()) < max(before.values()) / 2
    assert len(after) == 16
