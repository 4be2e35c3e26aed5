"""The extraction job: route -> (skew rebalance) -> extract -> output shape.

Spark lifecycle equivalent of cli/run_parser.py's imperative dataflow
(SURVEY §3.1): the whole pipeline is one declarative plan — scan ->
route column (P1) -> optional explicit repartition (skew) -> one
ArrowEvalPython stage (extract_udf: M1-M12 + M8) -> column flatten.
Catalyst prunes the blob column after the UDF; only the result struct
survives downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.udfs import (
    extract_udf,
    make_translate_blocks_udf,
    make_translate_pdf_blocks_udf,
)
from ..extraction.translate import stub_translate  # noqa: F401 (public surface)

OUTPUT_COLUMNS = [
    "url", "warc_ts", "text", "detected_title", "has_valid_text",
    "text_blocks", "pdf_blocks", "page_metadata", "md5sum", "languages",
    "parser", "error", "translated", "translated_to", "run_id",
]


def with_route(df: DataFrame) -> DataFrame:
    """P1 content router, single pass (cli/run_parser.py:176-192).

    The reference keys PDF routing off the cdn-object '.pdf' suffix; in
    the table model the url carries that suffix. Rows with no usable blob
    route to 'none' (the no-content-type branch).
    """
    return df.withColumn(
        "route",
        F.when(F.lower(F.col("url")).endswith(".pdf"), F.lit("pdf"))
        .when(
            F.col("html").isNotNull() & (F.length(F.col("html")) > F.lit(0)),
            F.lit("html"),
        )
        .otherwise(F.lit("none")),
    )


def rebalance_for_skew(df: DataFrame, partitions: int) -> DataFrame:
    """Explicit skew defusal (SURVEY §4.1 'skew' row).

    A handful of 100x-median blobs can stall one Arrow batch/task. A
    round-robin repartition spreads rows uniformly regardless of input
    file layout. This IS a full shuffle of the blob bytes — worth it when
    input files are few/skewed, skippable when the scan already produces
    balanced splits (spark.sql.files.maxPartitionBytes handles that for
    parquet). AQE cannot help a map-only stage, hence the explicit knob.
    """
    return df.repartition(partitions)


def run_extraction(
    docs: DataFrame,
    run_id: str = "run-0",
    rebalance_partitions: int | None = None,
) -> DataFrame:
    """documents(url, warc_ts, html, text, lang) -> documents_extracted.

    Single ArrowEvalPython stage; keys and passthroughs stay JVM-side —
    only (html, route) cross into Python, only the result struct comes
    back.
    """
    routed = with_route(docs)
    if rebalance_partitions:
        routed = rebalance_for_skew(routed, rebalance_partitions)

    extracted = routed.withColumn(
        "x", extract_udf(F.col("html"), F.col("route"))
    )

    out = extracted.select(
        "url",
        "warc_ts",
        F.col("x.text").alias("text"),
        F.col("x.detected_title").alias("detected_title"),
        F.col("x.has_valid_text").alias("has_valid_text"),
        F.col("x.text_blocks").alias("text_blocks"),
        F.col("x.pdf_blocks").alias("pdf_blocks"),
        F.col("x.page_metadata").alias("page_metadata"),
        F.col("x.md5sum").alias("md5sum"),
        F.col("x.languages").alias("languages"),
        F.col("x.parser").alias("parser"),
        F.col("x.error").alias("error"),
        F.lit(False).alias("translated"),
        F.lit(None).cast("string").alias("translated_to"),
        F.lit(run_id).alias("run_id"),
    )
    # run-level counters (X4): visible via QueryExecutionListener / UI
    return out.observe(
        f"extraction_{run_id}",
        F.count(F.lit(1)).alias("docs"),
        F.sum(F.when(F.col("error").isNotNull(), 1).otherwise(0)).alias(
            "failures"
        ),
        F.sum(F.length(F.col("text"))).alias("bytes_text_out"),
    )


def run_translation(
    extracted: DataFrame, target_languages: list[str]
) -> DataFrame:
    """Translation stage (P6-P8 + M14) over extracted outputs.

    Gating is pure Catalyst:
      P6 filter  (cli/translate_outputs.py:17-26)
      P7 array_except under the single-language guard
         (cli/translate_outputs.py:29-47)
    then one explode per remaining target and one Arrow pass translating
    block texts (stub translator — deterministic reference-mock format).
    Emits ONLY the translated rows (reference writes them as additional
    *_translated_{lang}.json outputs alongside the originals).
    """
    targets = F.array(*[F.lit(t) for t in target_languages])

    candidates = extracted.filter(
        (~F.col("translated")) & F.col("url").isNotNull()
    ).withColumn(
        "to_langs",
        F.when(
            F.size(F.col("languages")) == 1,
            F.array_except(targets, F.col("languages")),
        ).otherwise(targets),
    )

    exploded = candidates.select(
        "*", F.explode(F.col("to_langs")).alias("target_language")
    ).drop("to_langs")

    translate_blocks = make_translate_blocks_udf()
    translate_pdf_blocks = make_translate_pdf_blocks_udf()
    translated = exploded.withColumn(
        "text_blocks",
        translate_blocks(F.col("text_blocks"), F.col("target_language")),
    ).withColumn(
        "pdf_blocks",
        translate_pdf_blocks(F.col("pdf_blocks"), F.col("target_language")),
    )

    # rebuild text from translated block lines (html: flattened block
    # lines; pdf: block texts), set language metadata
    return (
        translated
        .withColumn(
            "text",
            F.when(
                F.size(F.col("text_blocks")) > 0,
                F.array_join(F.flatten(F.col("text_blocks.text")), "\n"),
            )
            .when(
                F.col("pdf_blocks").isNotNull()
                & (F.size(F.col("pdf_blocks")) > 0),
                F.array_join(F.col("pdf_blocks.text"), "\n"),
            )
            .otherwise(F.col("text")),
        )
        .withColumn("languages", F.array(F.col("target_language")))
        .withColumn("translated", F.lit(True))
        .withColumn("translated_to", F.col("target_language"))
        .drop("target_language")
        .select(*OUTPUT_COLUMNS)
    )
