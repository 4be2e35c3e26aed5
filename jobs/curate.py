"""spark-submit entrypoint for training-corpus curation.

Composes the training-data operators into the standard curation
pipeline a 100 TB corpus goes through between crawl and tokenization:

    exact dedup (keep min-id copy per distinct text)
      -> Gopher quality-rule gate
      -> optional holdout decontamination (drop overlapping docs)
      -> optional PII scrubbing (emails/phones redacted in place)

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/curate.py \
        --input  s3a://bucket/warehouse/documents \
        --output s3a://bucket/warehouse/documents_curated \
        --holdout s3a://bucket/warehouse/benchmark_docs \
        --scrub-pii --min-hits 1

Every stage is shuffle-minimal: one hash-agg for dedup keepers, pure
codegen projections for quality/PII, a broadcast semi-join for
decontamination. Stage-by-stage counts print from one observe pass.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def curate(spark, docs, holdout=None, min_hits: int = 1,
           scrub_pii: bool = False, ngram: int = 3,
           with_counts: bool = True, dedup_against=None):
    """documents(doc_id, text, ...) -> curated documents + stage counts.

    ``with_counts=True`` reports per-stage survivor counts; to keep that
    from re-executing the whole upstream chain once per stage, each
    counted intermediate is persisted (MEMORY_AND_DISK) for the duration
    of the build and unpersisted before returning — one pass per stage,
    not one pass per (stage x downstream stages). with_counts=False
    builds a single lazy plan with ZERO extra actions (the production
    default when only the output matters).

    NOTE on ownership: with with_counts=True the RETURNED DataFrame is
    persisted (the intermediates are released before returning, the
    output is not — releasing it here would re-execute the whole chain
    on the caller's first action). The caller owns the unpersist: call
    ``result.unpersist()`` after consuming it, as main() does after the
    write."""
    from pyspark.sql import functions as F

    from navigator_document_parser_spark.operators.text import (
        decontaminate,
        gopher_quality,
        pii_scrub,
    )

    counts: dict[str, int] = {}
    pinned = []

    def stage(df, name):
        if with_counts:
            df = df.persist()
            pinned.append(df)
            counts[name] = df.count()
        return df

    docs = stage(docs, "input")

    if dedup_against is not None:
        # incremental snapshot stage: drop docs the previously committed
        # corpus already holds, exactly or near-verbatim (the monthly
        # Common-Crawl shape — see operators/dedup.py snapshot_dedup)
        from navigator_document_parser_spark.operators.dedup import (
            snapshot_dedup,
        )

        kept = (
            snapshot_dedup(docs, dedup_against,
                           id_col="doc_id", text_col="text")
            .filter("keep")
            .select("doc_id")
        )
        docs = stage(docs.join(kept, "doc_id"), "after_snapshot_dedup")

    keepers = (
        docs.groupBy(F.md5(F.col("text")).alias("_fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    deduped = stage(docs.join(keepers, "doc_id"), "after_exact_dedup")

    passing = gopher_quality(deduped).filter("passes").select("doc_id")
    gated = stage(deduped.join(passing, "doc_id"), "after_quality_gate")

    if holdout is not None:
        contaminated = (
            decontaminate(gated, holdout, ngram=ngram, threshold=min_hits)
            .filter("contaminated")
            .select("doc_id")
        )
        gated = stage(
            gated.join(F.broadcast(contaminated), "doc_id", "left_anti"),
            "after_decontamination",
        )

    if scrub_pii:
        scrubbed = pii_scrub(gated).select(
            "doc_id", F.col("scrubbed").alias("text")
        )
        gated = gated.drop("text").join(scrubbed, "doc_id")

    if with_counts:
        # materialize the final plan before releasing the pinned inputs
        gated = gated.persist()
        gated.count()
        for df in pinned:
            df.unpersist()
    return gated, counts


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--format", default="parquet",
                   choices=("parquet", "wet"),
                   help="parquet documents table, or Common-Crawl "
                        "*.warc.wet(.gz) extracted-text shards")
    p.add_argument("--output", required=True)
    p.add_argument("--holdout", default=None,
                   help="optional benchmark/holdout docs parquet dir")
    p.add_argument("--dedup-against", default=None,
                   help="optional committed-snapshot parquet dir: drop "
                        "docs it already holds (exact or MinHash-LSH "
                        "near-verbatim) before curation")
    p.add_argument("--min-hits", type=int, default=1)
    p.add_argument("--ngram", type=int, default=3)
    p.add_argument("--scrub-pii", action="store_true")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from pyspark.sql import functions as F

    from navigator_document_parser_spark.config import build_spark

    spark = build_spark("curate-job", master=args.master)
    if args.format == "wet":
        # WET shards carry extracted text already — exactly what the
        # curation stages operate on; doc_id derives deterministically
        # from the record identity
        from navigator_document_parser_spark.sources.warc import read_wet

        docs = read_wet(spark, args.input).select(
            F.xxhash64("url", "warc_ts").alias("doc_id"), "text"
        )
    else:
        docs = spark.read.parquet(args.input)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None
    against = (
        spark.read.parquet(args.dedup_against)
        if args.dedup_against else None
    )

    curated, counts = curate(
        spark, docs, holdout=holdout, min_hits=args.min_hits,
        scrub_pii=args.scrub_pii, ngram=args.ngram,
        dedup_against=against,
    )
    curated.write.mode("overwrite").parquet(args.output)
    curated.unpersist()  # caller-owned persist (see curate() docstring)
    print(f"curation counts: {counts}")


if __name__ == "__main__":
    main()
