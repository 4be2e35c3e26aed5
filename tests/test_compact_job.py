"""jobs/compact.py end-to-end: plan + rewrite on a real small-file mess."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from jobs.compact import list_parquet_files, main


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="ndps-compact-")
    yield (base + "/in", base + "/out")
    shutil.rmtree(base, ignore_errors=True)


def _mess(spark, in_dir):
    """Two partitions of many tiny files + one 'big' file."""
    for part, lo, hi, chunks in (("d=1", 0, 60, 6), ("d=2", 60, 90, 3)):
        (
            spark.range(lo, hi)
            .withColumn("v", F.col("id") * 2)
            .repartition(chunks)
            .write.mode("append")
            .parquet(os.path.join(in_dir, part))
        )


def test_compact_job_end_to_end(spark, dirs):
    in_dir, out_dir = dirs
    _mess(spark, in_dir)
    listing = list_parquet_files(in_dir)
    assert {p for p, _, _ in listing} == {"d=1", "d=2"}
    sizes = [b for _, _, b in listing]
    target = max(sizes) + sum(sizes) // len(sizes)  # groups of ~2+

    rc = main(["--input", in_dir, "--output", out_dir,
               "--target-bytes", str(target)])
    assert rc == 0

    out = spark.read.parquet(out_dir)
    planned_paths = set()
    from navigator_document_parser_spark.operators.layout import (
        compact_plan,
    )
    files = spark.createDataFrame(
        listing, "part string, path string, bytes bigint"
    )
    plan = compact_plan(files, target_bytes=target).collect()
    planned_paths = {r.path for r in plan}
    expect = spark.read.parquet(*sorted(planned_paths))
    # rewrite preserves rows exactly (ignoring the group columns)
    got = sorted((r.id, r.v) for r in out.select("id", "v").collect())
    want = sorted((r.id, r.v) for r in expect.collect())
    assert got == want
    # one data file per rewrite group directory
    for dirpath, _dirs, names in os.walk(out_dir):
        data = [n for n in names if n.endswith(".parquet")]
        if data and "_compact_grp=" in dirpath:
            assert len(data) == 1, (dirpath, data)
    # partition columns round-trip as directories
    parts = {r._compact_part for r in out.select("_compact_part")
             .distinct().collect()}
    assert parts <= {"d=1", "d=2"}


def test_compact_job_dry_run_writes_nothing(spark, dirs):
    in_dir, out_dir = dirs
    _mess(spark, in_dir)
    rc = main(["--input", in_dir, "--output", out_dir,
               "--target-bytes", str(1 << 30), "--dry-run"])
    assert rc == 0
    assert not os.path.exists(out_dir)
