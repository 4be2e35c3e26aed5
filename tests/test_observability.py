"""X4 parity: run-level counters via observe() + streaming watermarks."""

import shutil
import tempfile

from pyspark.sql import functions as F

from navigator_document_parser_spark.plans.job import run_extraction
from navigator_document_parser_spark.plans.sink import ParquetMergeSink
from navigator_document_parser_spark.sources.synth import synth_documents


def test_observe_metrics_collected(spark):
    from pyspark.sql import Observation

    # Observation object variant of the same named metrics contract
    docs = synth_documents(spark, 30, 2)
    obs = Observation("runstats")
    out = run_extraction(docs, run_id="obs").observe(
        obs,
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
            "failures"
        ),
    )
    out.write.format("noop").mode("overwrite").save()
    got = obs.get
    assert got["docs"] == 30
    assert got["failures"] == 0


def test_iceberg_merge_sql_renders():
    sink = ParquetMergeSink("/tmp/x")
    sql = sink.iceberg_merge_sql("warehouse.documents_extracted", "batch_v")
    assert "MERGE INTO warehouse.documents_extracted t" in sql
    assert "t.url <=> s.url" in sql
    assert "t.warc_ts <=> s.warc_ts" in sql
    assert "t.translated_to <=> s.translated_to" in sql
    assert "WHEN NOT MATCHED THEN INSERT *" in sql


def test_streaming_watermarked_window_agg(spark):
    """Event-time tumbling window with a watermark: drained availableNow
    output matches the batch aggregation (no late data in a static dir)."""
    base = tempfile.mkdtemp(prefix="ndps-wm-")
    try:
        events = spark.read.parquet(
            "/root/testdata/sf0.001/events.parquet"
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        events.write.parquet(base + "/in")

        stream = (
            spark.readStream.schema(events.schema).parquet(base + "/in")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), F.col("event_type"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(
                F.col("window.start").alias("hour"), "event_type", "n"
            )
        )
        q = (
            stream.writeStream.format("parquet")
            .option("path", base + "/out")
            .option("checkpointLocation", base + "/ckpt")
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

        got = {
            (r["hour"], r["event_type"]): r["n"]
            for r in spark.read.parquet(base + "/out").collect()
        }
        batch = {
            (r["hour"], r["event_type"]): r["n"]
            for r in events.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        }
        # append-mode watermark holds back the final (still-open) window;
        # everything emitted must match batch, and coverage must be
        # nearly complete
        assert got
        for k, v in got.items():
            assert batch[k] == v, k
        assert len(got) >= len(batch) - 2
    finally:
        shutil.rmtree(base, ignore_errors=True)
