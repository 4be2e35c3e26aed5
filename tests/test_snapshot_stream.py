"""Streaming incremental snapshot dedup: each micro-batch of newly
crawled pages is flagged against the static committed snapshot via
stream-static joins; the stream result must equal the batch
snapshot_dedup oracle on the same files."""

import os
import shutil
import tempfile

from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.dedup import snapshot_dedup
from navigator_document_parser_spark.streaming.snapshot_stream import (
    start_snapshot_dedup_stream,
)


def _new_crawl(docs):
    """1/3 exact re-crawls, 1/3 light edits, 1/3 fresh — same recipe as
    the dedup_incremental contract query."""
    return docs.withColumn(
        "text",
        F.when(F.col("url").endswith("0"), F.col("text"))
        .when(
            F.col("url").endswith("1"),
            F.concat(F.col("text"), F.lit(" x")),
        )
        .otherwise(
            F.concat(
                F.lit("fresh page "),
                F.col("url"),
                F.lit(" with entirely new never seen content tokens"),
            )
        ),
    )


def test_snapshot_flagging_reuses_committed_banding(spark):
    """Plan shape: all per-band joins must share ONE committed
    (band-prefixed key) subtree via ReusedExchange — re-deriving the
    committed shingle+banding per band is the r3 ADVICE finding. The
    band index is folded into the key string; a separate band_idx
    equi-column constant-folds into per-branch filters and defeats
    reuse."""
    from navigator_document_parser_spark.streaming.snapshot_stream import (
        flag_against_snapshot,
    )

    bands = 4
    old = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .filter(F.col("doc_id") < 60)
        .select(
            F.concat(F.lit("u"), F.col("doc_id")).alias("url"), "text"
        )
    )
    new = old.withColumn("text", F.concat(F.col("text"), F.lit(" y")))
    out = flag_against_snapshot(
        new, old, id_col="url", num_hashes=8, bands=bands
    )
    out.collect()  # finalize the adaptive plan ON THIS DataFrame
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("ReusedExchange") >= bands - 1, plan[:2000]


def test_snapshot_stream_matches_batch(spark):
    base = tempfile.mkdtemp(prefix="ndps-snapstream-")
    old = new = None
    in_dir = os.path.join(base, "in")
    out_dir = os.path.join(base, "out")
    committed_dir = os.path.join(base, "committed")
    try:
        # driver testdata docs (real text bodies — synth pipeline pages
        # carry their content in `html`, which would leave the shingle
        # stage with nothing to hash)
        old = (
            spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
            .filter(F.col("doc_id") < 60)
            .select(
                F.concat(F.lit("u"), F.col("doc_id")).alias("url"),
                F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
                F.lit(None).cast("binary").alias("html"),
                "text",
                "lang",
            )
            .cache()
        )
        old.write.parquet(committed_dir)
        new = _new_crawl(old).cache()

        # two waves: the stream must flag each micro-batch independently
        w1 = new.filter(F.col("url").endswith("0") | F.col("url").endswith("1"))
        w2 = new.subtract(w1)
        w1.write.parquet(in_dir)
        q = start_snapshot_dedup_stream(
            spark, in_dir, committed_dir, out_dir,
            os.path.join(base, "ckpt"), num_hashes=8, bands=4,
        )
        q.awaitTermination(120)
        w2.write.mode("append").parquet(in_dir)
        q2 = start_snapshot_dedup_stream(
            spark, in_dir, committed_dir, out_dir,
            os.path.join(base, "ckpt"), num_hashes=8, bands=4,
        )
        q2.awaitTermination(120)

        got = (
            spark.read.parquet(out_dir)
            .toPandas().sort_values("url").reset_index(drop=True)
        )
        want = (
            snapshot_dedup(new, old, id_col="url", text_col="text",
                           num_hashes=8, bands=4)
            .toPandas().sort_values("url").reset_index(drop=True)
        )
        assert len(got) == len(want) == 60
        for col in ("exact_dup", "near_dup", "keep"):
            assert list(got[col]) == list(want[col]), col
        # sanity: all three outcomes actually occur in the fixture
        assert got.exact_dup.any() and got.keep.any()
        assert (got.near_dup & ~got.exact_dup).any()
    finally:
        shutil.rmtree(base, ignore_errors=True)
        if old is not None:
            old.unpersist()
        if new is not None:
            new.unpersist()


def test_bloom_flagging_matches_batch_operator(spark):
    """flag_with_bloom (stream-static shape, runs identically on batch
    DataFrames) must agree with bloom_snapshot_filter row-for-row,
    including at a saturated tiny filter where false positives abound."""
    from navigator_document_parser_spark.operators.dedup import (
        bloom_snapshot_filter,
    )
    from navigator_document_parser_spark.streaming.snapshot_stream import (
        flag_with_bloom,
    )

    committed = spark.createDataFrame(
        [(f"u{i}", f"committed page {i} body") for i in range(40)],
        "url string, text string",
    )
    new = _new_crawl(committed)
    for m_bits in (64, 1 << 12):
        got = {
            r["url"]: (r["bloom_hit"], r["exact_dup"],
                       r["false_positive"], r["keep"])
            for r in flag_with_bloom(
                new, committed, m_bits=m_bits, num_hashes=3
            ).collect()
        }
        want = {
            r["url"]: (r["bloom_hit"], r["exact_dup"],
                       r["false_positive"], r["keep"])
            for r in bloom_snapshot_filter(
                new, committed, id_col="url",
                m_bits=m_bits, num_hashes=3,
            ).collect()
        }
        assert got == want, m_bits


def test_bloom_flagging_runs_as_a_real_stream(spark):
    """availableNow file stream through flag_with_bloom == batch run."""
    from navigator_document_parser_spark.streaming.snapshot_stream import (
        flag_with_bloom,
    )

    base = tempfile.mkdtemp(prefix="bloomstream-")
    try:
        in_dir = os.path.join(base, "in")
        out_dir = os.path.join(base, "out")
        ck_dir = os.path.join(base, "ck")
        committed = spark.createDataFrame(
            [(f"u{i}", f"snapshot body {i}") for i in range(30)],
            "url string, text string",
        )
        new = _new_crawl(committed)
        new.write.parquet(in_dir)
        stream = spark.readStream.schema(
            "url string, text string"
        ).parquet(in_dir)
        q = (
            flag_with_bloom(stream, committed, m_bits=4096, num_hashes=3)
            .writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ck_dir)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["url"]: (r["exact_dup"], r["keep"])
            for r in spark.read.parquet(out_dir).collect()
        }
        want = {
            r["url"]: (r["exact_dup"], r["keep"])
            for r in flag_with_bloom(
                new, committed, m_bits=4096, num_hashes=3
            ).collect()
        }
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)


# ---------------------------------------------------------------------------
# perceptual (image) streaming admission control
# ---------------------------------------------------------------------------

import hashlib

from navigator_document_parser_spark.streaming.snapshot_stream import (
    flag_against_image_snapshot,
)

W, H = 9, 8


def _grid(seed):
    return [hashlib.md5(f"{seed}:{j}".encode()).digest()[0]
            for j in range(W * H)]


def _image_fixture(spark):
    base = [_grid(f"c:{i}") for i in range(6)]
    committed = spark.createDataFrame(
        [(100 + i, px) for i, px in enumerate(base)],
        "media_id long, pixels array<int>",
    )
    near = list(base[0])
    near[13] = (near[13] + 128) % 256
    stream_rows = [
        (0, list(base[1])),          # exact re-crawl
        (1, near),                   # near-dup of a committed image
        (2, _grid("fresh:2")),       # fresh
        (3, base[2][:7]),            # malformed: short grid
    ]
    new = spark.createDataFrame(
        stream_rows, "media_id long, pixels array<int>")
    return committed, new


def test_image_flagging_semantics_batch(spark):
    committed, new = _image_fixture(spark)
    got = {r.media_id: (r.exact_dup, r.near_candidate, r.keep)
           for r in flag_against_image_snapshot(new, committed).collect()}
    assert got[0] == (True, True, False)       # exact implies band share
    assert got[1][0] is False and got[1][1] is True  # near flagged
    assert got[3] == (False, False, True)      # malformed -> keep (verify downstream)
    # fresh: near_candidate may rarely collide on one 16-bit band, but
    # exact must be False; with these md5 grids there is no collision
    assert got[2] == (False, False, True)


def test_image_flagging_stream_matches_batch(spark):
    import os
    import shutil
    import tempfile

    committed, new = _image_fixture(spark)
    base = tempfile.mkdtemp(prefix="ndps-imgstream-")
    in_dir, out_dir, ckpt = (os.path.join(base, d)
                             for d in ("in", "out", "ckpt"))
    try:
        # two micro-batches (one file each)
        for half in (new.filter("media_id < 2"),
                     new.filter("media_id >= 2")):
            half.coalesce(1).write.mode("append").parquet(in_dir)
        stream = (
            spark.readStream.schema("media_id long, pixels array<int>")
            .option("maxFilesPerTrigger", "1").parquet(in_dir)
        )
        flagged = flag_against_image_snapshot(stream, committed)
        q = (
            flagged.writeStream.format("parquet")
            .option("path", out_dir)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = sorted(
            (r.media_id, r.exact_dup, r.near_candidate, r.keep)
            for r in spark.read.parquet(out_dir).collect()
        )
        want = sorted(
            (r.media_id, r.exact_dup, r.near_candidate, r.keep)
            for r in flag_against_image_snapshot(new, committed).collect()
        )
        assert got == want
    finally:
        shutil.rmtree(base, ignore_errors=True)
