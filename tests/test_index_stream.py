"""Streaming index maintenance == batch full rebuild (stream parity).

Drains a file stream in per-file micro-batches through
streaming/index_stream.py and compares the committed generation
against index_export over the union — including a second run whose
delta RE-CRAWLS existing ids (changed text must replace old postings,
the index_merge invariant, here pinned end-to-end through the stream).
"""

import os
import shutil
import tempfile

import pytest

from navigator_document_parser_spark.operators.search import index_export
from navigator_document_parser_spark.streaming.index_stream import (
    read_current_index,
    start_index_maintenance_stream,
)


def _canon(df):
    return sorted(
        (r.shard, r.term, r.block_id, r.block_df, list(r.postings))
        for r in df.collect()
    )


def _write_docs(spark, path, rows):
    spark.createDataFrame(rows, "doc_id long, text string").coalesce(
        1
    ).write.mode("append").parquet(path)


@pytest.fixture()
def dirs():
    base = tempfile.mkdtemp(prefix="ndps-idxstream-")
    yield (base + "/in", base + "/index", base + "/ckpt")
    shutil.rmtree(base, ignore_errors=True)


def _drain(spark, in_dir, index_dir, ckpt):
    q = start_index_maintenance_stream(
        spark, in_dir, index_dir, ckpt,
        n_shards=4, block_size=8, max_files_per_trigger=1,
    )
    q.awaitTermination(120)


def test_index_stream_matches_batch_rebuild(spark, dirs):
    in_dir, index_dir, ckpt = dirs
    batches = [
        [(i, f"alpha beta doc{i} common") for i in range(0, 10)],
        [(i, f"gamma delta doc{i} common") for i in range(10, 20)],
        [(i, f"epsilon doc{i} common") for i in range(20, 30)],
    ]
    for rows in batches:
        _write_docs(spark, in_dir, rows)
    _drain(spark, in_dir, index_dir, ckpt)

    committed = read_current_index(spark, index_dir)
    assert committed is not None
    all_docs = spark.createDataFrame(
        [r for rows in batches for r in rows], "doc_id long, text string"
    )
    want = index_export(all_docs, n_shards=4, block_size=8)
    assert _canon(committed) == _canon(want)


def test_index_stream_recrawl_replaces_postings(spark, dirs):
    in_dir, index_dir, ckpt = dirs
    first = [(i, f"original text doc{i}") for i in range(12)]
    _write_docs(spark, in_dir, first)
    _drain(spark, in_dir, index_dir, ckpt)

    # second run: the stream resumes from its checkpoint and only the
    # delta is processed; ids 3..8 are re-crawled with CHANGED text
    recrawl = [(i, f"revised words doc{i}") for i in range(3, 9)]
    _write_docs(spark, in_dir, recrawl)
    _drain(spark, in_dir, index_dir, ckpt)

    committed = read_current_index(spark, index_dir)
    final_docs = {i: t for i, t in first}
    final_docs.update({i: t for i, t in recrawl})
    want = index_export(
        spark.createDataFrame(
            sorted(final_docs.items()), "doc_id long, text string"
        ),
        n_shards=4, block_size=8,
    )
    assert _canon(committed) == _canon(want)
    # 'original' must be fully purged from the re-crawled doc range
    purged = committed.filter(
        "term = 'original' and block_id = 0"
    ).collect()
    # block 0 covers ids 0..7; originals remain only for 0,1,2
    assert [list(r.postings) for r in purged] == [[0, 1, 1]]


def test_index_stream_empty_input_never_commits(spark, dirs):
    in_dir, index_dir, ckpt = dirs
    os.makedirs(in_dir, exist_ok=True)
    q = start_index_maintenance_stream(
        spark, in_dir, index_dir, ckpt, n_shards=4, block_size=8,
    )
    q.awaitTermination(60)
    assert read_current_index(spark, index_dir) is None
