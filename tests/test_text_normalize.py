"""Unicode/whitespace normalization (operators/text.py normalize_text)."""

from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.text import (
    normalize_text,
    with_normalized_text,
)


def _norm(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [
        r["n"]
        for r in df.select(normalize_text(F.col("text")).alias("n")).collect()
    ]


def test_normalize_cases(spark):
    cases = {
        "a\r\nb\rc": "a\nb\nc",                      # CRLF + lone CR
        "x\x00y\x1fz\x7fw": "xyzw",                  # control chars
        "a​b‌‍c﻿d": "abcd",      # zero-widths + BOM
        "“q” ‘s’": '"q" \'s\'',  # curly quotes
        "a–b—c": "a-b-c",                  # en/em dash
        "a b": "a b",                           # NBSP
        "a \t  b\t\tc": "a b c",                     # ws collapse
        "  line \n  next  \n": "line\nnext",         # hug + trim
        "": "",
        "already clean": "already clean",
    }
    got = _norm(spark, list(cases))
    assert got == list(cases.values()), list(zip(cases, got))


def test_normalize_idempotent(spark):
    messy = ["“A—B”\r\n  x  y ​ "]
    once = _norm(spark, messy)
    twice = _norm(spark, once)
    assert once == twice


def test_with_normalized_text_columns(spark):
    df = spark.createDataFrame(
        [(1, "ok"), (2, "two  spaces"), (3, None)],
        "doc_id bigint, text string",
    )
    rows = {r["doc_id"]: r for r in with_normalized_text(df).collect()}
    assert rows[1]["text_norm"] == "ok" and rows[1]["changed"] is False
    assert rows[2]["text_norm"] == "two spaces" and rows[2]["changed"] is True
    assert rows[2]["n_chars_norm"] == 10
    # null text null-propagates, never throws
    assert rows[3]["text_norm"] is None and rows[3]["changed"] is None
