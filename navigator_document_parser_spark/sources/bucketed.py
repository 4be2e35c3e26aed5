"""Bucketed-table support: co-located joins with no shuffle.

For repeatedly-joined corpus tables (e.g. documents_extracted joined to
a per-url feature table on every downstream query), pre-bucketing both
sides on the join key removes the per-query Exchange entirely — the
bucket layout IS the partitioning, paid once at write time. This is the
parquet/warehouse analog of Iceberg's bucket partition transform.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Save as a bucketed (optionally sorted) managed table.

    Joins between tables bucketed identically on the join key need no
    Exchange (verified by plan assertion in tests/test_bucketed.py).
    """
    writer = (
        df.write.mode("overwrite")
        .bucketBy(n_buckets, *bucket_cols)
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def cowrite_for_join(
    spark: SparkSession,
    left: DataFrame,
    right: DataFrame,
    key: list[str],
    left_name: str,
    right_name: str,
    n_buckets: int = 32,
) -> tuple[DataFrame, DataFrame]:
    """Bucket both sides identically and return the re-read tables."""
    write_bucketed(left, left_name, key, n_buckets)
    write_bucketed(right, right_name, key, n_buckets)
    return spark.table(left_name), spark.table(right_name)
