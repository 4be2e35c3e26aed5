"""spark-submit entrypoint for the retrieval stack: build a sharded
inverted index from a documents table, then answer keyword / BM25 /
phrase queries against the same corpus.

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    # build the index (delta-encoded posting blocks, md5-stable shards)
    spark-submit --py-files ndps.zip jobs/search_index.py build \
        --input  s3a://bucket/warehouse/documents \
        --output s3a://bucket/warehouse/doc_index \
        --shards 64 --block-size 4096

    # query (conjunctive keyword, BM25-ranked, or exact phrase)
    spark-submit --py-files ndps.zip jobs/search_index.py query \
        --input s3a://bucket/warehouse/documents \
        --mode bm25 --terms climate adaptation --k 10

The build writes partitioned by shard so a serving layer can mmap one
shard per worker; queries run against the raw corpus with the same
vocabulary-filtered single-scan plans the contract queries pin
(operators/search.py docstrings carry the 100 TB shape notes).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(spark, input_path: str, output_path: str, shards: int,
          block_size: int) -> dict:
    from navigator_document_parser_spark.operators.search import (
        index_export,
    )

    docs = spark.read.parquet(input_path)
    idx = index_export(
        docs, n_shards=shards, block_size=block_size
    )
    (
        idx.repartition("shard")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(output_path)
    )
    out = spark.read.parquet(output_path)
    return {
        "postings_blocks": out.count(),
        "shards": out.select("shard").distinct().count(),
    }


def query(spark, input_path: str, mode: str, terms: list[str], k: int):
    from navigator_document_parser_spark.operators.search import (
        bm25_search,
        keyword_search,
        phrase_search,
    )

    docs = spark.read.parquet(input_path)
    # the operators index lower(text) tokens; fold query terms to match
    # or a capitalized term silently matches nothing
    terms = [t.lower() for t in terms]
    if mode == "keyword":
        return keyword_search(docs, [(0, terms)], k=k)
    if mode == "bm25":
        return bm25_search(docs, [(0, terms)], k=k)
    if mode == "phrase":
        return phrase_search(docs, [(0, terms)])
    raise ValueError(f"unknown mode {mode!r}")


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--output", required=True)
    b.add_argument("--shards", type=int, default=8)
    b.add_argument("--block-size", type=int, default=128)
    q = sub.add_parser("query")
    q.add_argument("--input", required=True)
    q.add_argument("--mode", choices=["keyword", "bm25", "phrase"],
                   default="bm25")
    q.add_argument("--terms", nargs="+", required=True)
    q.add_argument("--k", type=int, default=10)
    args = p.parse_args(argv)

    from navigator_document_parser_spark.config import build_spark

    spark = build_spark("search-index")
    try:
        if args.cmd == "build":
            stats = build(spark, args.input, args.output, args.shards,
                          args.block_size)
            print(stats)
        else:
            rows = query(
                spark, args.input, args.mode, args.terms, args.k
            )
            rows.show(50, truncate=False)
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
