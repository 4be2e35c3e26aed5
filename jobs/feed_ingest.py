"""spark-submit entrypoint: poll fetched RSS/Atom feeds into the frontier.

The freshness loop next to jobs/crawl_plan.py (bulk discovery): the
fetcher lands (feed, xml) parquet batches continuously; this job tails
the directory and appends never-seen entry urls to the frontier table,
exactly once per url, stamped with the discovering micro-batch
(streaming/feed_stream.py). Without --tail it drains the backlog and
stops (availableNow).

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/feed_ingest.py \
        --input  s3a://bucket/landing/feeds \
        --output s3a://bucket/warehouse/feed_frontier \
        --checkpoint s3a://bucket/checkpoints/feed_ingest --tail
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
    p.add_argument("--tail", action="store_true",
                   help="keep tailing; default drains and stops")
    p.add_argument("--timeout", type=int, default=0,
                   help="awaitTermination bound in seconds (0 = forever)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from navigator_document_parser_spark.config import build_spark
    from navigator_document_parser_spark.streaming.feed_stream import (
        start_feed_frontier_stream,
    )

    spark = build_spark("feed-ingest", master=args.master)
    q = start_feed_frontier_stream(
        spark, args.input, args.output, args.checkpoint,
        available_now=not args.tail,
    )
    q.awaitTermination(args.timeout or None)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
