"""Stateful-streaming sessionization vs the oracle-checked batch query."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F


def test_stream_sessionize_matches_batch(spark):
    import __spark_entry__ as E
    from navigator_document_parser_spark.streaming.sessionize import (
        start_sessionize_stream,
    )

    sf = "/root/testdata/sf0.001"
    base = tempfile.mkdtemp(prefix="ndps-sess-")
    try:
        events = spark.read.parquet(f"{sf}/events.parquet")
        events.write.parquet(base + "/in")

        q = start_sessionize_stream(
            spark,
            base + "/in",
            base + "/out",
            base + "/ckpt",
            events_schema=events.schema,
        )
        q.awaitTermination(180)

        got = spark.read.parquet(base + "/out")
        # one availableNow pass: keep the final ('open') state per session
        # plus closed rows -> latest per (user_id, session_idx)
        final = got.groupBy("user_id", "session_idx").agg(
            F.max("n_events").alias("n_events"),
            F.min("session_start").alias("session_start"),
            F.max("session_end").alias("session_end"),
            F.max("sum_value").alias("sum_value"),
        )

        batch = E.queries()["events_sessionize"](spark, sf)
        g = {
            (r["user_id"], r["session_idx"]): (
                r["n_events"],
                r["session_start"],
                r["session_end"],
                round(r["sum_value"], 4),
            )
            for r in final.collect()
        }
        b = {
            (r["user_id"], r["session_idx"]): (
                r["n_events"],
                r["session_start"],
                r["session_end"],
                round(r["sum_value"], 4),
            )
            for r in batch.collect()
        }
        assert g == b
    finally:
        shutil.rmtree(base, ignore_errors=True)
