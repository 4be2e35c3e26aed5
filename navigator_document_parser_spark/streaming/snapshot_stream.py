"""Streaming incremental snapshot dedup (stream-static joins).

Batch `operators.dedup.snapshot_dedup` answers "which docs of this new
snapshot are already in the committed corpus". When the new crawl
arrives as a STREAM, the same question becomes a stream-static join:
the committed snapshot is a static DataFrame (re-planned per
micro-batch, so a snapshot refresh between batches is picked up), and
each micro-batch of crawled pages is flagged statelessly — no watermark
or state store needed, because all the "memory" lives in the committed
side.

Join shapes (all stateless, all supported stream-static forms):
  - exact:  stream LEFT OUTER equi-join on md5(text) against the
    committed distinct content hashes; matched rows flag exact_dup.
  - near:   one LEFT OUTER equi-join PER LSH BAND on (band_idx, key)
    against a SINGLE committed (band_idx, key) projection. Stream-side
    band keys are computed column-wise (band_keys_from_shingles — the
    exact batch/oracle construction), NOT via posexplode: exploding the
    stream side would need a stateful per-doc re-aggregation to get
    back to one row per page; per-band column joins stay
    1-row-in/1-row-out. The committed side IS posexploded — once — so
    all band branches share one byte-identical subtree and
    ReuseExchange evaluates the committed shingle+banding work once per
    micro-batch, not once per band.

100 TB shape: the committed side is the big side; each per-band join is
a plain equi-join the planner shuffles or broadcasts per micro-batch as
its statistics dictate. Empty-shingle pages (too short) skip the near
stage entirely (guard on size(sh) > 0 — md5('') hot-bucket rule,
operators/dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import band_keys_from_shingles, word_shingles
from ..schema import DOCUMENTS_SCHEMA


def flag_against_snapshot(
    stream_df: DataFrame,
    committed: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    num_hashes: int = 4,
    bands: int = 2,
) -> DataFrame:
    """Attach (exact_dup, near_dup, keep) to each stream row by joining
    against the committed static snapshot. Works identically on batch
    DataFrames (used by the parity test)."""
    old_p = committed.select(
        F.md5(F.col(text_col)).alias("h"),
        word_shingles(F.col(text_col)).alias("sh"),
    )
    old_h = old_p.select("h").dropDuplicates(["h"]).withColumn(
        "_e", F.lit(True)
    )
    # ONE committed-side projection for ALL bands: posexplode the band
    # keys and fold the band index INTO the key string ("b:md5..."), so
    # every per-band join below hits this SAME band-agnostic subtree —
    # only the stream-side probe expression differs. A separate
    # band_idx equi-column does NOT work: the literal band index
    # constant-folds into a per-branch `band_idx = b` filter pushed
    # below the exchange, recreating one full shingle+banding subtree
    # per band. With the prefixed key the exchanges are byte-identical
    # and ReuseExchange evaluates the committed banding work once per
    # micro-batch (plan-shape pinned in tests/test_snapshot_stream.py).
    old_keys = (
        old_p.filter(F.size("sh") > 0)
        .select(
            F.posexplode(
                band_keys_from_shingles(F.col("sh"), num_hashes, bands)
            ).alias("band_idx", "k")
        )
        .select(
            # underscore-prefixed name: a bare 'k' would capture/collide
            # with a caller column of the same name (review finding)
            F.concat_ws(":", F.col("band_idx"), F.col("k")).alias(
                "_committed_bk"
            )
        )
        .dropDuplicates(["_committed_bk"])
    )

    s = stream_df.withColumn("_h", F.md5(F.col(text_col))).withColumn(
        "_sh", word_shingles(F.col(text_col))
    )
    s = s.withColumn(
        "_bk", band_keys_from_shingles(F.col("_sh"), num_hashes, bands)
    )
    s = s.join(old_h.withColumnRenamed("h", "_h"), "_h", "left")

    near = F.lit(False)
    for b in range(bands):
        s = (
            s.join(
                old_keys,
                F.concat_ws(":", F.lit(b), F.col("_bk")[b])
                == F.col("_committed_bk"),
                "left",
            )
            .withColumn(f"_m{b}", F.col("_committed_bk").isNotNull())
            .drop("_committed_bk")
        )
        near = near | F.col(f"_m{b}")

    exact = F.coalesce(F.col("_e"), F.lit(False))
    near = (F.size("_sh") > 0) & near
    out = s.select(
        F.col(id_col),
        exact.alias("exact_dup"),
        near.alias("near_dup"),
        (~exact & ~near).alias("keep"),
    )
    return out


def start_snapshot_dedup_stream(
    spark: SparkSession,
    input_dir: str,
    committed_path: str,
    out_dir: str,
    checkpoint_dir: str,
    num_hashes: int = 4,
    bands: int = 2,
    available_now: bool = True,
):
    """readStream(new-crawl pages dir) -> flag vs committed snapshot ->
    parquet (url, exact_dup, near_dup, keep)."""
    committed = spark.read.parquet(committed_path)
    stream = spark.readStream.schema(DOCUMENTS_SCHEMA).parquet(input_dir)
    flagged = flag_against_snapshot(
        stream, committed, num_hashes=num_hashes, bands=bands
    )
    writer = (
        flagged.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def flag_with_bloom(
    stream_df: DataFrame,
    committed: DataFrame,
    id_col: str = "url",
    text_col: str = "text",
    m_bits: int = 1 << 16,
    num_hashes: int = 4,
) -> DataFrame:
    """Bloom-prefiltered streaming variant of flag_against_snapshot's
    exact stage (batch twin: operators.dedup.bloom_snapshot_filter).

    The committed corpus is represented by its m_bits/32-row bitmap
    (bloom_words) — per micro-batch that's a broadcast of a few KB
    instead of a join against every committed hash. Stream rows stay
    1-row-in/1-row-out: the k probe positions are computed COLUMN-WISE
    (k word-index/mask column pairs, one broadcast join each), never by
    explode + re-aggregate, which would need a state store. The exact
    verify join condition carries the stream-side bloom_hit predicate,
    so only "maybe committed" rows probe the committed hash set — and
    because Bloom filters have no false negatives, exact_dup is
    bit-identical to the unfiltered join.

    Returns (id, bloom_hit, exact_dup, false_positive, keep).
    """
    from ..operators.dedup import _bloom_pos_sql, bloom_words

    # the static side feeds 1 (verify) + num_hashes (bitmap) join
    # branches and is re-planned per micro-batch; materialize it ONCE
    # like the batch twin's checkpoint (review finding: without the
    # barrier each differently-aliased broadcast branch can re-run the
    # committed scan + md5 + dedup per micro-batch)
    old_h = (
        committed.select(F.md5(F.col(text_col)).alias("h"))
        .dropDuplicates(["h"])
        .localCheckpoint(eager=True)
    )
    words = bloom_words(
        old_h, m_bits=m_bits, num_hashes=num_hashes,
        hash_col="h", assume_distinct=True,
    ).localCheckpoint(eager=True)

    s = stream_df.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_h")
    )
    hit = F.lit(True)
    for j in range(num_hashes):
        pos = _bloom_pos_sql(j, "_h", m_bits)
        wj = words.select(
            F.col("word_idx").alias(f"_wi{j}"),
            F.col("word").alias(f"_w{j}"),
        )
        s = (
            s.withColumn(f"_m{j}",
                         F.expr(f"shiftleft(1L, cast(({pos}) % 32 as int))"))
            .join(
                F.broadcast(wj),
                F.expr(f"({pos}) div 32") == F.col(f"_wi{j}"),
                "left",
            )
            .drop(f"_wi{j}")
        )
        hit = hit & (
            (F.coalesce(F.col(f"_w{j}"), F.lit(0)).bitwiseAND(
                F.col(f"_m{j}")
            ))
            == F.col(f"_m{j}")
        )
    s = s.withColumn("_bloom", hit)
    verified = s.join(
        old_h.withColumn("_e", F.lit(True)),
        (s["_h"] == old_h["h"]) & s["_bloom"],
        "left",
    )
    exact = F.coalesce(F.col("_e"), F.lit(False))
    return verified.select(
        F.col("_id").alias(id_col),
        F.col("_bloom").alias("bloom_hit"),
        exact.alias("exact_dup"),
        (F.col("_bloom") & ~exact).alias("false_positive"),
        (~exact).alias("keep"),
    )


def flag_against_image_snapshot(
    stream_df: DataFrame,
    committed: DataFrame,
    id_col: str = "media_id",
    pixels_col: str = "pixels",
    width: int = 9,
    height: int = 8,
) -> DataFrame:
    """Streaming admission control for IMAGES against the committed
    image corpus — the perceptual face of flag_against_snapshot:
    exact_dup = identical pixel grid (md5 of the canonical int-csv),
    near_candidate = shares >= 1 of the 4 dHash bands with ANY
    committed image (the dedup_phash pigeonhole: every true near-dup
    within Hamming <= 3 is flagged; a 16-bit band share has false
    positives, so this is the PREFILTER — the exact verify is the batch
    twin phash_snapshot_dedup over the flagged rows).

    Stream rows stay 1-row-in/1-row-out: the four stream-side band ints
    are computed column-wise and each probes the committed folded-key
    projection with its own LEFT join; the committed side is ONE
    band-agnostic subtree (literal band-id explode folded into an INT
    key, checkpointed eagerly so micro-batches never re-run the
    committed banding — the flag_with_bloom discipline).

    Returns (id, exact_dup, near_candidate, keep).
    """
    from ..operators.dedup import _dhash_band_terms

    grid = width * height

    def canon(col: str):
        return F.md5(F.concat_ws(",", F.col(col).cast("array<string>")))

    def elem(i: int) -> str:
        return f"element_at(p, {i})"

    old = (
        committed.select(
            F.col(pixels_col).cast("array<int>").alias("p")
        )
        .filter(F.size("p") == grid)
        .localCheckpoint(eager=True)
    )
    old_exact = (
        old.select(canon("p").alias("_oh"))
        .dropDuplicates(["_oh"])
        .withColumn("_e", F.lit(True))
        .localCheckpoint(eager=True)
    )
    obands = old.select(
        *[
            F.expr(_dhash_band_terms(t, width, height, elem))
            .cast("int").alias(f"b{t}")
            for t in range(4)
        ]
    )
    old_keys = (
        obands.withColumn(
            "bi", F.explode(F.array(*[F.lit(t) for t in range(4)]))
        )
        .select(
            F.expr(
                "CASE bi WHEN 0 THEN b0 WHEN 1 THEN b1 "
                "WHEN 2 THEN b2 ELSE b3 END + bi * 65536"
            ).alias("_committed_bk")
        )
        .dropDuplicates(["_committed_bk"])
        .localCheckpoint(eager=True)
    )

    s = stream_df.select(
        F.col(id_col).alias("_id"),
        F.col(pixels_col).cast("array<int>").alias("p"),
    ).withColumn("_valid", F.size("p") == grid)

    def selem(i: int) -> str:
        return f"element_at(p, {i})"

    for t in range(4):
        s = s.withColumn(
            f"_b{t}",
            F.when(
                F.col("_valid"),
                F.expr(
                    _dhash_band_terms(t, width, height, selem)
                ).cast("int"),
            ),
        )
    s = s.withColumn(
        "_h", F.when(F.col("_valid"), canon("p"))
    ).join(old_exact.withColumnRenamed("_oh", "_h"), "_h", "left")

    near = F.lit(False)
    for t in range(4):
        s = (
            s.join(
                old_keys,
                (F.col(f"_b{t}") + F.lit(t * 65536))
                == F.col("_committed_bk"),
                "left",
            )
            .withColumn(f"_m{t}", F.col("_committed_bk").isNotNull())
            .drop("_committed_bk")
        )
        near = near | F.col(f"_m{t}")

    exact = F.coalesce(F.col("_e"), F.lit(False))
    near = F.col("_valid") & near
    return s.select(
        F.col("_id").alias(id_col),
        exact.alias("exact_dup"),
        near.alias("near_candidate"),
        (~exact & ~near).alias("keep"),
    )
