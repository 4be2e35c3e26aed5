"""spark-submit entrypoint: keep the committed search index current.

Streaming twin of jobs/search_index.py (batch build): tails a
documents directory and folds each micro-batch into the committed
sharded posting-block index via index_merge, writing file-incremental
generations with manifest inheritance (streaming/index_stream.py).
``--vacuum`` expires everything the live manifest no longer references
after the drain (the Iceberg expire-snapshots analogue).

The index directory must be a local/POSIX path (atomic-rename
manifest commit — the module rejects URIs loudly; see the
index_stream docstring for the object-store seam).

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/index_maintain.py \
        --input  /data/landing/documents \
        --index  /data/warehouse/search_index \
        --checkpoint /data/checkpoints/index_maintain --tail
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--index", required=True)
    p.add_argument("--checkpoint", required=True)
    p.add_argument("--n-shards", type=int, default=8)
    p.add_argument("--block-size", type=int, default=128)
    p.add_argument("--blocks-per-bucket", type=int, default=16)
    p.add_argument("--vacuum", action="store_true",
                   help="expire unreferenced generations after draining")
    p.add_argument("--tail", action="store_true",
                   help="keep tailing; default drains and stops")
    p.add_argument("--timeout", type=int, default=0)
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from navigator_document_parser_spark.config import build_spark
    from navigator_document_parser_spark.streaming.index_stream import (
        start_index_maintenance_stream,
        vacuum_generations,
    )

    if args.vacuum and args.tail:
        p.error("--vacuum requires drain mode (omit --tail): expiring "
                "while batches are in flight deletes not-yet-committed "
                "generation buckets")

    spark = build_spark("index-maintain", master=args.master)
    q = start_index_maintenance_stream(
        spark, args.input, args.index, args.checkpoint,
        n_shards=args.n_shards, block_size=args.block_size,
        blocks_per_bucket=args.blocks_per_bucket,
        available_now=not args.tail,
    )
    if args.timeout:
        drained = q.awaitTermination(args.timeout)
    else:
        q.awaitTermination()
        drained = True
    if args.vacuum:
        if not drained:
            # a live batch may have written buckets its manifest has
            # not committed yet — vacuuming now would delete them
            print("vacuum skipped: stream still running at --timeout")
        else:
            deleted = vacuum_generations(args.index)
            print(f"vacuumed: {len(deleted)} paths")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
