"""Streaming trending terms: watermarked tumbling-window term counts.

The batch corpus audit (operators/text.top_ngrams) answers "what is in
my data"; a live crawl wants the same signal per time window — a term
surging inside one window is a breaking-news topic or a spam campaign
hitting the frontier. Shape:

  readStream -> explode tokens -> withWatermark(event time)
             -> groupBy(window(ts), term).count() -> append parquet

Append mode emits a (window, term) row ONCE, when the watermark passes
the window end — so the output is finalized history, and state per
window is dropped right after emission (bounded by tokens/window, not
stream length). The window still open at end-of-input is deliberately
withheld: that is append-mode semantics, and the parity pytest pins it
(the batch oracle filters to windows closed under the same watermark).

Top-k ranking is NOT part of the stream: a rank-per-window needs a
window function over the finished aggregate, which streaming cannot do
incrementally — the finisher (``trending_topk``) is a cheap batch pass
over the emitted counts, exactly how a production job serves "top
terms per hour" from the continuously-appended counts table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..schema import DOCUMENTS_SCHEMA


def term_counts_query(stream: DataFrame, window: str, watermark: str):
    """The shared streaming/batch aggregation: tokenized terms counted
    per (tumbling event-time window, term). One definition so the
    parity test compares the same logical plan in both modes."""
    terms = stream.select(
        F.col("warc_ts"),
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("term"),
    )
    return (
        terms.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window), "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("window.start").alias("win_start"),
            F.col("window.end").alias("win_end"),
            "term",
            "cnt",
        )
    )


def start_trending_terms_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "1 hour",
    available_now: bool = True,
):
    """readStream(documents dir) -> windowed term counts -> parquet."""
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    counts = term_counts_query(stream, window, watermark)
    writer = (
        counts.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def trending_topk(counts: DataFrame, k: int = 5) -> DataFrame:
    """Batch finisher over the emitted counts table: top-``k`` terms per
    closed window, ties by term ascending. Returns
    (win_start, win_end, term, cnt, rank)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("win_start", "win_end").orderBy(
        F.col("cnt").desc(), F.col("term").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("win_start", "win_end", "term",
                F.col("cnt").cast("bigint").alias("cnt"), "rank")
    )
