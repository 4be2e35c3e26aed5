"""Explicit Spark schemas — no inference anywhere (SURVEY §1.3).

The documents input table shape is the authoritative input_hint from
BASELINE.json: (url string, warc_ts timestamp, html binary, text string,
lang string), keyed (url, warc_ts).
"""

from __future__ import annotations

from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    BooleanType,
    DoubleType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# --- input --------------------------------------------------------------

DOCUMENTS_SCHEMA = StructType([
    StructField("url", StringType(), False),
    StructField("warc_ts", TimestampType(), False),
    StructField("html", BinaryType(), True),
    StructField("text", StringType(), True),
    StructField("lang", StringType(), True),
])

# --- extraction result struct (returned by the extract pandas UDF) -------

HTML_TEXT_BLOCK = StructType([
    StructField("text_block_id", StringType(), False),
    StructField("text", ArrayType(StringType()), False),
    StructField("language", StringType(), True),
    StructField("type", StringType(), False),
    StructField("type_confidence", FloatType(), False),
])

PDF_BLOCK = StructType([
    StructField("page", IntegerType(), False),
    StructField("text", StringType(), False),
    StructField("language", StringType(), True),
    StructField("x0", DoubleType(), False),
    StructField("y0", DoubleType(), False),
    StructField("x1", DoubleType(), False),
    StructField("y1", DoubleType(), False),
    StructField("offset", LongType(), False),
    StructField("length", LongType(), False),
])

PDF_TABLE_CELL = StructType([
    StructField("row", IntegerType(), False),
    StructField("col", IntegerType(), False),
    StructField("text", StringType(), False),
    StructField("x0", DoubleType(), False),
    StructField("y0", DoubleType(), False),
    StructField("x1", DoubleType(), False),
    StructField("y1", DoubleType(), False),
    StructField("offset", LongType(), False),
    StructField("length", LongType(), False),
])

PDF_TABLE = StructType([
    StructField("page", IntegerType(), False),
    StructField("row_count", IntegerType(), False),
    StructField("column_count", IntegerType(), False),
    StructField("cells", ArrayType(PDF_TABLE_CELL), False),
])

PAGE_META = StructType([
    StructField("page_number", IntegerType(), False),
    StructField("width", DoubleType(), False),
    StructField("height", DoubleType(), False),
    StructField("unit", StringType(), False),
])

EXTRACTION_RESULT = StructType([
    StructField("text", StringType(), True),
    StructField("detected_title", StringType(), True),
    # ParserOutput schema parity: reference HTMLData carries detected_date
    # (src/base.py:56, src/html_parser/readability.py:115) but every code
    # path sets it None today — a nullable always-null column keeps the
    # output contract byte-compatible for consumers that select it.
    StructField("detected_date", TimestampType(), True),
    StructField("has_valid_text", BooleanType(), True),
    StructField("text_blocks", ArrayType(HTML_TEXT_BLOCK), True),
    StructField("pdf_blocks", ArrayType(PDF_BLOCK), True),
    StructField("pdf_tables", ArrayType(PDF_TABLE), True),
    StructField("page_metadata", ArrayType(PAGE_META), True),
    StructField("md5sum", StringType(), True),
    StructField("languages", ArrayType(StringType()), True),
    StructField("parser", StringType(), False),
    StructField("error", StringType(), True),
])

# --- output table (documents_extracted, FIXTURES §2) ---------------------

EXTRACTED_SCHEMA = StructType(
    [
        StructField("url", StringType(), False),
        StructField("warc_ts", TimestampType(), False),
    ]
    + EXTRACTION_RESULT.fields
    + [
        StructField("translated", BooleanType(), False),
        StructField("run_id", StringType(), True),
    ]
)

LINEAGE_SCHEMA = StructType([
    StructField("run_id", StringType(), False),
    StructField("partition_id", IntegerType(), False),
    StructField("n_rows", LongType(), False),
    StructField("n_failures", LongType(), False),
    StructField("bytes_text_out", LongType(), False),
])
