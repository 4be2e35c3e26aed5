"""Streaming trending terms: append-mode windowed counts equal the batch
aggregation restricted to watermark-closed windows; the still-open tail
window is withheld (append-mode semantics, pinned on purpose)."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from navigator_document_parser_spark.sources.synth import synth_documents
from navigator_document_parser_spark.streaming.trending import (
    start_trending_terms_stream,
    term_counts_query,
    trending_topk,
)

WINDOW = "6 hours"
WATERMARK = "1 hour"


def test_stream_counts_match_batch_on_closed_windows(spark):
    base = tempfile.mkdtemp(prefix="ndps-trend-")
    in_dir, out_dir = os.path.join(base, "in"), os.path.join(base, "out")
    try:
        # synth text is empty pre-extraction; trending runs on the
        # extracted-text surface, so fill it deterministically
        docs = (
            synth_documents(spark, 60, partitions=3)
            .withColumn(
                "text",
                F.concat_ws(
                    " ", F.lit("breaking"), F.col("lang"),
                    F.concat(F.lit("w"),
                             (F.dayofyear("warc_ts") % 3).cast("string")),
                ),
            )
            .cache()
        )
        docs.write.parquet(in_dir)

        q = start_trending_terms_stream(
            spark, in_dir, out_dir, os.path.join(base, "ckpt"),
            window=WINDOW, watermark=WATERMARK,
        )
        q.awaitTermination(120)

        got = spark.read.parquet(out_dir)

        # batch oracle: same shared aggregation, restricted to windows
        # the final watermark (max event time - delay) has closed
        batch_all = term_counts_query(
            spark.read.parquet(in_dir), WINDOW, WATERMARK
        )
        cutoff = docs.agg(
            (F.max("warc_ts") - F.expr("INTERVAL 1 HOUR")).alias("wm")
        ).collect()[0].wm
        batch_closed = batch_all.filter(F.col("win_end") <= F.lit(cutoff))

        g = {(r.win_start, r.term): r.cnt for r in got.collect()}
        b = {(r.win_start, r.term): r.cnt for r in batch_closed.collect()}
        assert g == b and len(g) > 0

        # the tail window (still open under the watermark) is withheld
        open_rows = batch_all.filter(F.col("win_end") > F.lit(cutoff))
        assert open_rows.count() > 0
        assert got.filter(F.col("win_end") > F.lit(cutoff)).count() == 0
    finally:
        shutil.rmtree(base, ignore_errors=True)


def test_trending_topk_ranks_within_each_window(spark):
    rows = [
        ("2024-01-01 00:00:00", "2024-01-01 06:00:00", "alpha", 10),
        ("2024-01-01 00:00:00", "2024-01-01 06:00:00", "beta", 10),
        ("2024-01-01 00:00:00", "2024-01-01 06:00:00", "gamma", 3),
        ("2024-01-01 06:00:00", "2024-01-01 12:00:00", "delta", 7),
    ]
    df = spark.createDataFrame(
        rows, ["win_start", "win_end", "term", "cnt"]
    ).select(
        F.to_timestamp("win_start").alias("win_start"),
        F.to_timestamp("win_end").alias("win_end"),
        "term", "cnt",
    )
    out = {(str(r.win_start), r.rank): r.term
           for r in trending_topk(df, k=2).collect()}
    # tie on cnt breaks term-ascending; k=2 drops gamma
    assert out[("2024-01-01 00:00:00", 1)] == "alpha"
    assert out[("2024-01-01 00:00:00", 2)] == "beta"
    assert ("2024-01-01 00:00:00", 3) not in out
    assert out[("2024-01-01 06:00:00", 1)] == "delta"
