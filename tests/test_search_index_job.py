"""End-to-end test for the jobs/search_index.py CLI surface."""

import os
import sys

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from jobs.search_index import build, query  # noqa: E402


def test_build_and_query_roundtrip(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            (1, "climate adaptation policy report"),
            (2, "climate change mitigation"),
            (3, "unrelated document about fishing"),
        ],
        "doc_id bigint, text string",
    )
    src = str(tmp_path / "docs")
    docs.write.parquet(src)

    out = str(tmp_path / "idx")
    stats = build(spark, src, out, shards=4, block_size=10)
    assert stats["postings_blocks"] > 0
    assert 1 <= stats["shards"] <= 4
    idx = spark.read.parquet(out)
    assert set(idx.columns) >= {"term", "block_id", "block_df",
                                "postings", "shard"}

    kw = query(spark, src, "keyword", ["climate"], k=5).collect()
    assert {r["doc_id"] for r in kw} == {1, 2}
    bm = sorted(
        query(spark, src, "bm25", ["climate", "policy"], k=5).collect(),
        key=lambda r: r["rank"],
    )
    assert bm[0]["doc_id"] == 1  # policy only in doc 1 -> ranks first
    ph = query(
        spark, src, "phrase", ["climate", "adaptation"], k=5
    ).collect()
    assert [r["doc_id"] for r in ph] == [1]
