"""Session-8 operators: per-host boilerplate line stripping (and the
rest of this session's batch as it lands).

Behavioral pins against hand-computed references; the DuckDB hash
oracles in __spark_entry__ cover the engine-parity axis."""

from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.text import (
    boilerplate_strip,
)


# ---- boilerplate_strip ------------------------------------------------------

def _rows(df):
    return {r.doc_id: r for r in df.collect()}


def test_boilerplate_strip_drops_frequent_lines(spark):
    docs = [
        (1, "h1", "nav | menu\nunique body one\nfooter (c) h1"),
        (2, "h1", "nav | menu\nunique body two\nfooter (c) h1"),
        (3, "h1", "nav | menu\nunique body three"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    # nav: 3/3 docs -> dropped; footer: 2/3 (66%) >= 60% -> dropped
    assert out[1].text_clean == "unique body one"
    assert out[1].n_kept == 1 and out[1].n_dropped == 2
    assert out[3].text_clean == "unique body three"
    assert out[3].n_kept == 1 and out[3].n_dropped == 1


def test_boilerplate_strip_min_docs_protects_tiny_hosts(spark):
    # a single-doc host hits 100% frequency on every line; min_docs=2
    # must keep everything
    df = spark.createDataFrame(
        [(1, "solo", "only line\nsecond line")], ["doc_id", "host", "text"]
    )
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=50))
    assert out[1].n_dropped == 0
    assert out[1].text_clean == "only line\nsecond line"


def test_boilerplate_strip_is_per_host(spark):
    # the same line is boilerplate on h1 but unique on h2
    docs = [
        (1, "h1", "promo line\nbody a"),
        (2, "h1", "promo line\nbody b"),
        (3, "h2", "promo line\nbody c"),
        (4, "h2", "other\nbody d"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    assert out[1].text_clean == "body a"
    assert out[3].text_clean == "promo line\nbody c"


def test_boilerplate_strip_trims_and_drops_blank_lines(spark):
    # ' nav ' and 'nav' are the same line after trim; blank lines count
    # for neither kept nor dropped
    docs = [
        (1, "h1", "  nav  \n\nbody one\n"),
        (2, "h1", "nav\nbody two"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    assert out[1].n_kept == 1 and out[1].n_dropped == 1
    assert out[1].text_clean == "body one"


def test_boilerplate_strip_order_preserved(spark):
    docs = [
        (1, "h1", "z last\nbp\na first"),
        (2, "h1", "bp\nmiddle"),
        (3, "h1", "bp\nend"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    # original position order, NOT lexicographic
    assert out[1].text_clean == "z last\na first"
