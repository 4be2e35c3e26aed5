"""Streaming trap detection vs the oracle-checked batch operator:
latest update-mode row per host must equal batch trap_detect on the
same URLs (minus n_paths, documented as snapshot-only)."""

import tempfile

from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_trap_stream_matches_batch(spark):
    from navigator_document_parser_spark.operators.urls import trap_detect
    from navigator_document_parser_spark.streaming.frontier_stream import (
        start_trap_stream,
    )

    urls = [
        ("h1", "/page/page/x1"),
        ("h1", "/page/page/page/x2"),
        ("h2", "/cal/2024/5/17"),
        ("h2", "/cal/2024/5/18"),
        ("h2", "/cal/2024/6/1"),
        ("h3", "/a/b/c/d/e/f/g"),
        ("h4", "/doc1"),
        ("h4", "/doc2"),
    ]
    df = spark.createDataFrame(urls, "host string, path string")
    base = tempfile.mkdtemp(prefix="ndps-trap-")
    # two input files so the stream sees >= 1 batch with mixed hosts
    df.filter(F.col("host") <= "h2").write.parquet(base + "/in/p1")
    df.filter(F.col("host") > "h2").write.parquet(base + "/in/p2")

    q = start_trap_stream(
        spark, base + "/in/p*", base + "/out", base + "/ckpt"
    )
    q.awaitTermination(180)

    got = spark.read.parquet(base + "/out")
    latest = (
        got.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("host").orderBy(
                    F.col("batch_id").desc(), F.col("n_urls").desc()
                )
            ),
        )
        .filter(F.col("rn") == 1)
        .drop("rn", "batch_id")
    )
    batch = trap_detect(df).drop("n_paths")

    g = {r.host: (r.n_urls, r.max_depth, r.n_repeat, r.n_datey, r.is_trap)
         for r in latest.collect()}
    b = {r.host: (r.n_urls, r.max_depth, r.n_repeat, r.n_datey, r.is_trap)
         for r in batch.collect()}
    assert g == b
