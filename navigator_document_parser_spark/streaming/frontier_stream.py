"""Streaming crawler-trap detection over a discovered-URL stream.

The batch operator (operators/urls.py trap_detect) reads a finished
snapshot; a live crawler wants the SAME per-host trap signals updated
as discovery flows in, so the frontier scheduler can demote a host
before the trap eats the fetch budget. Per-URL signal extraction
(segment split, adjacent-dup, date-shape) is the identical expression
set as batch; the per-host rollup is an update-mode streaming
aggregation — counters only, so state is one small row per host, the
bounded shape (hosts, not URLs, and a production deployment caps the
host cardinality per crawl anyway).

Output mode is UPDATE: each micro-batch re-emits the hosts it touched
with their new running totals; the latest row per host is the current
verdict (the parity pytest takes exactly that view and must equal the
batch operator on the same inputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _url_signals(urls: DataFrame) -> DataFrame:
    """The batch trap_detect per-URL signal projection, shared
    expression-for-expression (operators/urls.py trap_detect)."""
    base = urls.select(
        "host",
        "path",
        F.expr("filter(split(path, '/'), s -> s <> '')").alias("segs"),
    )
    num = "'^[0-9]+$'"
    return base.select(
        "host",
        "path",
        F.expr("size(segs)").alias("depth"),
        F.expr(
            "CASE WHEN size(segs) >= 2 THEN "
            "size(filter(sequence(2, size(segs)), "
            "i -> element_at(segs, i) = element_at(segs, i - 1))) > 0 "
            "ELSE false END"
        ).alias("adj_dup"),
        F.expr(
            "CASE WHEN size(segs) >= 3 THEN "
            f"element_at(segs, size(segs)) rlike {num} AND "
            f"element_at(segs, size(segs) - 1) rlike {num} AND "
            f"element_at(segs, size(segs) - 2) rlike {num} "
            "ELSE false END"
        ).alias("date_shape"),
    )


def start_trap_stream(
    spark: SparkSession,
    input_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    max_depth: int = 6,
    min_repeat: int = 2,
    min_calendar: int = 3,
    available_now: bool = True,
):
    """readStream(url parquet dir: host, path) -> running per-host trap
    verdicts -> parquet (update rows appended; latest per host wins).

    NOTE on countDistinct: streaming aggregations cannot hold a
    distinct-set per host without unbounded state, so the streaming
    variant reports n_urls and the trap signals but NOT n_paths — the
    one column whose exact form genuinely requires snapshot semantics
    (an HLL register set, sketches.hll_distinct, is the approximate
    upgrade path). The parity pytest compares the shared columns.
    """
    schema = "host string, path string"
    urls = (
        spark.readStream.schema(schema).parquet(input_dir)
    )
    sig = _url_signals(urls)
    agg = sig.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_urls"),
        F.max("depth").cast("bigint").alias("max_depth"),
        F.sum(F.col("adj_dup").cast("bigint")).cast("bigint").alias(
            "n_repeat"
        ),
        F.sum(F.col("date_shape").cast("bigint")).cast("bigint").alias(
            "n_datey"
        ),
    ).select(
        "host",
        "n_urls",
        "max_depth",
        "n_repeat",
        "n_datey",
        (
            (F.col("n_repeat") >= min_repeat)
            | (F.col("max_depth") >= max_depth)
            | (F.col("n_datey") >= min_calendar)
        ).alias("is_trap"),
    )

    def write_batch(batch_df, batch_id):
        # update-mode sink to parquet: append this batch's touched
        # hosts stamped with the batch id; readers take the latest
        (
            batch_df.withColumn("batch_id", F.lit(batch_id))
            .write.mode("append")
            .parquet(out_dir)
        )

    writer = (
        agg.writeStream.outputMode("update")
        .foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
