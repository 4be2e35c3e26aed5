"""Input readers (S1/S2 parity).

The reference scans a directory of per-document JSON task files,
pydantic-validates each, and drops invalid ones with a log
(cli/run_parser.py:157-174); local-vs-S3 is handled by cloudpathlib
(cli/run_parser.py:110-155). In Spark both collapse to schema-pinned
reads — s3a:// vs file:// is uniform — and validation failure becomes a
PERMISSIVE-mode corrupt-record column instead of an exception.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import StringType, StructField, StructType

from ..schema import DOCUMENTS_SCHEMA


def read_documents(spark: SparkSession, path: str) -> DataFrame:
    """documents table from parquet (or an Iceberg table path), schema
    pinned — never inferred."""
    return spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)


# ParserInput-shaped JSON task records (README.md:46-58): we accept the
# table-model subset; unknown fields are ignored by the pinned schema.
PARSER_INPUT_JSON_SCHEMA = StructType(
    list(DOCUMENTS_SCHEMA.fields) + [StructField("_corrupt_record", StringType(), True)]
)


def read_parser_inputs_json(
    spark: SparkSession, path: str
) -> tuple[DataFrame, DataFrame]:
    """JSON task ingestion with reference drop-invalid semantics.

    Returns (valid, invalid): invalid rows carry the raw record for the
    error channel instead of failing the run (cli/run_parser.py:161-174
    logs and skips). PERMISSIVE mode routes unparseable lines to
    _corrupt_record; rows missing the key fields are also invalid.
    """
    raw = (
        spark.read.schema(PARSER_INPUT_JSON_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    is_valid = (
        F.col("_corrupt_record").isNull()
        & F.col("url").isNotNull()
        & F.col("warc_ts").isNotNull()
    )
    valid = raw.filter(is_valid).drop("_corrupt_record")
    invalid = raw.filter(~is_valid).select(
        F.coalesce(F.col("_corrupt_record"), F.to_json(F.struct("*"))).alias(
            "raw_record"
        )
    )
    return valid, invalid
