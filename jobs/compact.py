"""spark-submit entrypoint: small-file compaction (rewrite_data_files).

Plans next-fit rewrite groups over the input dataset's file listing
(operators/layout.py compact_plan — files below --target-bytes, per
partition subdirectory, path order) and executes the rewrite: every
planned group is read back and written as ONE file under
--output/_compact_part=<part>/_compact_grp=<g>/. Files at/over target
and groups below --min-input-files are NOT rewritten — as in Iceberg,
the un-planned files remain authoritative in the input; the output
holds only the compacted replacements, and swapping them in is the
caller's (table-format's) commit.

Local/POSIX paths only (the listing walks the filesystem; on an object
store the listing must come from the FS API or the table format's
manifest — same loud-rejection seam as the streaming index).

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/compact.py \
        --input /data/warehouse/events --output /data/warehouse/_rewrite \
        --target-bytes 536870912
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def list_parquet_files(input_dir: str) -> list[tuple[str, str, int]]:
    """(part, abs_path, bytes) for every parquet data file under
    ``input_dir``; part = the relative subdirectory ('' at root)."""
    rows = []
    for dirpath, _dirs, files in os.walk(input_dir):
        part = os.path.relpath(dirpath, input_dir)
        part = "" if part == "." else part
        for name in sorted(files):
            if not name.endswith(".parquet"):
                continue
            path = os.path.join(dirpath, name)
            rows.append((part, path, os.path.getsize(path)))
    return rows


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--target-bytes", type=int, default=512 * 1024 * 1024)
    p.add_argument("--min-input-files", type=int, default=2)
    p.add_argument("--dry-run", action="store_true",
                   help="print the plan, rewrite nothing")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    for d in (args.input, args.output):
        if "://" in d:
            p.error("local/POSIX paths only: the listing walks the "
                    "filesystem (see module docstring for the "
                    "object-store seam)")

    from pyspark.sql import functions as F

    from navigator_document_parser_spark.config import build_spark
    from navigator_document_parser_spark.operators.layout import (
        compact_plan,
    )

    spark = build_spark("compact", master=args.master)
    listing = list_parquet_files(args.input)
    if not listing:
        print("plan: 0 files, 0 groups")
        return 0
    files = spark.createDataFrame(
        listing, "part string, path string, bytes bigint"
    )
    plan = compact_plan(
        files, target_bytes=args.target_bytes,
        min_input_files=args.min_input_files,
    ).persist()
    n_files = plan.count()
    groups = plan.select("part", "grp").distinct().count()
    in_bytes = (plan.agg(F.sum("bytes")).collect()[0][0] or 0)
    print(f"plan: {n_files} files -> {groups} groups "
          f"({in_bytes} bytes)")
    if args.dry_run or n_files == 0:
        plan.unpersist()
        return 0

    paths = [r.path for r in plan.select("path").collect()]
    # one distributed read of every planned file; membership joins back
    # by the file each row physically came from (local paths per the
    # URI guard, so 'file:' stripping is exact)
    data = spark.read.parquet(*paths).withColumn(
        "_compact_path",
        F.regexp_replace(F.input_file_name(), "^file:/+", "/"),
    )
    membership = plan.select(
        F.col("path").alias("_compact_path"),
        F.col("part").alias("_compact_part"),
        F.col("grp").alias("_compact_grp"),
    )
    (
        data.join(F.broadcast(membership), "_compact_path")
        .drop("_compact_path")
        # colocate each rewrite group in one task -> one output file
        # per (_compact_part, _compact_grp) directory
        .repartition("_compact_part", "_compact_grp")
        .write.mode("error")
        .partitionBy("_compact_part", "_compact_grp")
        .parquet(args.output)
    )
    plan.unpersist()
    print(f"rewrote {n_files} files into {groups} groups at "
          f"{args.output}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
