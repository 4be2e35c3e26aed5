"""spark-submit entrypoint for corpus quality control: a documents
table in, a QC report out — the pre-training go/no-go dashboard a
data-engineering team reads before spending GPU-hours on a snapshot.

Composes the profiling operator stack end-to-end:

    documents ──> doc_flags   (gopher_quality + code_detect +
                               script_stats: per-doc routing/risk bits)
              ──> host_report (host_reputation joined with per-host
                               flag rates from doc_flags)
              ──> summary     (corpus-level counts: docs, hosts, kept,
                               code/suspect/unreputable rates)

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/corpus_qc.py \
        --input  s3a://bucket/warehouse/documents \
        --output s3a://bucket/reports/2026-08-qc \
        --host-col source

Every stage is the same operator the contract queries pin
(quality_filters / code_detect / script_stats / host_reputation), so
the CLI adds composition, not new semantics. Shapes: three map-only
per-doc profilers fused over ONE corpus scan (they share the persisted
input), then two host-grain aggregates — nothing wider than (host)
ever shuffles.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_qc(spark, docs, host_col: str = "source"):
    """Returns (doc_flags, host_report, summary_dict).

    ``doc_flags`` (and the caller's ``docs``) are returned PERSISTED so
    the caller's writes reuse the scan the summary counts already paid
    for — callers must release them when done (``release_qc``; library
    callers that skip this inherit process-lifetime cache entries,
    ADVICE r4)."""
    from navigator_document_parser_spark.operators.selection import (
        host_reputation,
    )
    from navigator_document_parser_spark.operators.text import (
        code_detect,
        gopher_quality,
        script_stats,
    )

    docs = docs.persist()

    flags = (
        gopher_quality(docs)
        .select("doc_id", "passes")
        .join(code_detect(docs).select("doc_id", "is_code"), "doc_id")
        .join(
            script_stats(docs).select("doc_id", "is_suspect"), "doc_id"
        )
        .join(
            docs.select(
                "doc_id", F.col(host_col).alias("host")
            ),
            "doc_id",
        )
        .persist()
    )

    per_host_flags = flags.groupBy("host").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("passes").cast("int")).cast("bigint").alias("n_pass"),
        F.sum(F.col("is_code").cast("int")).cast("bigint").alias("n_code"),
        F.sum(F.col("is_suspect").cast("int"))
        .cast("bigint")
        .alias("n_suspect"),
    )
    host_report = host_reputation(docs, host_col=host_col).join(
        per_host_flags.drop("n_docs"), "host"
    )

    total = flags.count()
    agg = flags.agg(
        F.sum(F.col("passes").cast("int")).alias("p"),
        F.sum(F.col("is_code").cast("int")).alias("c"),
        F.sum(F.col("is_suspect").cast("int")).alias("s"),
    ).collect()[0]
    n_hosts = host_report.count()
    n_reputable = host_report.filter(F.col("reputable")).count()
    summary = {
        "docs": total,
        "hosts": n_hosts,
        "quality_pass": int(agg["p"] or 0),
        "code_docs": int(agg["c"] or 0),
        "suspect_docs": int(agg["s"] or 0),
        "reputable_hosts": n_reputable,
    }
    return flags, host_report, summary


def release_qc(docs, flags) -> None:
    """Drop the cache entries build_qc created (docs was persisted
    in-place, so the caller's handle is the persisted one)."""
    flags.unpersist()
    docs.unpersist()


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--host-col", default="source")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from navigator_document_parser_spark.config import build_spark

    spark = build_spark("corpus-qc", master=args.master)
    docs = spark.read.parquet(args.input)
    flags, host_report, summary = build_qc(
        spark, docs, host_col=args.host_col
    )
    flags.write.mode("overwrite").parquet(args.output + "/doc_flags")
    host_report.write.mode("overwrite").parquet(
        args.output + "/host_report"
    )
    release_qc(docs, flags)
    print(json.dumps(summary))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
