"""spark-submit entrypoint for the STREAMING extraction pipeline.

Continuous-ingestion twin of jobs/extract.py: tails a documents
directory, drops in-flight content duplicates with bounded state, runs
the same extraction plan, and commits through the same idempotent keyed
sink — so a crawl can land parquet files continuously and the output
table stays exactly-once per (url, warc_ts, translated_to).

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/extract_stream.py \
        --input  s3a://bucket/landing/documents \
        --output s3a://bucket/warehouse/documents_extracted \
        --checkpoint s3a://bucket/checkpoints/extract_stream \
        --watermark "24 hours" --tail

Without --tail the stream drains what is currently in the directory and
stops (availableNow backfill mode).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--watermark", default="24 hours",
                   help="content-dedup state horizon (event time = warc_ts)")
    p.add_argument("--run-prefix", default="stream")
    p.add_argument("--tail", action="store_true",
                   help="keep tailing the directory; default drains and stops")
    p.add_argument("--timeout", type=int, default=0,
                   help="awaitTermination bound in seconds (0 = forever)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from navigator_document_parser_spark.config import build_spark
    from navigator_document_parser_spark.streaming.stream_job import (
        start_dedup_extraction_stream,
    )

    spark = build_spark("extract-stream-job", master=args.master)
    q = start_dedup_extraction_stream(
        spark,
        args.input,
        args.output,
        args.checkpoint,
        watermark=args.watermark,
        run_prefix=args.run_prefix,
        available_now=not args.tail,
    )
    q.awaitTermination(args.timeout or None)


if __name__ == "__main__":
    main()
