"""Deduplication operators for web-scale corpora.

All variants are expressed with built-in DataFrame ops (shuffle-aware,
AQE-friendly); hashes are md5-based so the DuckDB oracle can reproduce
them bit-for-bit (portable across engines, unlike xxhash/murmur).

Scale notes (100 TB):
  - exact: one hash-aggregate shuffle on a 32-char key; map-side partial
    aggregation applies. Skewed empty/boilerplate texts hash to hot keys
    -> those groups are exactly the duplicates we want; AQE skew handling
    splits oversized partitions.
  - MinHash+LSH: signatures are narrow (k md5 strings); candidate
    generation joins on band keys only — never all-pairs. The verify
    join re-reads only candidate doc ids (semi-join pushdown).
  - SimHash: 16-bit signature via one explode + one groupBy; near-dup =
    small hamming distance on the signature integer.
  - n-gram Jaccard: pairwise ONLY within cheap buckets (lang, length
    band) — the classic blocking trick; never unconstrained N^2.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dup_groups(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct text.

    keeper = min id of the group (deterministic canonical representative).
    """
    return (
        df.select(F.md5(F.col(text_col)).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_copies"),
            F.min(id_col).alias("keeper_id"),
        )
    )


# --------------------------------------------------------------------------
# shingles + MinHash + LSH
# --------------------------------------------------------------------------

def word_shingles(col: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of lowercased whitespace tokens.

    Empty/short texts yield an empty array (guarded sequence bounds).
    """
    tokens = F.split(F.trim(F.lower(col)), r"\s+")
    k = F.size(tokens)
    return F.when(k < n, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), k - n),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(tokens, (i + j + 1).cast("int")) for j in range(n)]
                ),
            )
        )
    )


def minhash_signature(col: Column, num_hashes: int = 8) -> Column:
    """MinHash signature as an array of md5-string minima.

    sig[h] = min over shingles s of md5(h || ':' || s). Lexicographic min
    over md5 hex strings is a valid uniform min-hash family and is
    byte-portable to any SQL engine with md5().
    """
    shingles = word_shingles(col)

    def hasher(h: int):
        # NB: F.transform dispatches on lambda arity — a 2-arg lambda
        # receives (element, index), so the seed must be closed over via
        # a factory, never a default argument.
        return lambda s: F.md5(F.concat(F.lit(f"{h}:"), s))

    return F.array(
        *[
            F.array_min(F.transform(shingles, hasher(h)))
            for h in range(num_hashes)
        ]
    )


def lsh_band_keys(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Band keys: md5 of the concatenated signature slice per band."""
    return F.array(
        *[
            F.md5(
                F.concat_ws(
                    ",",
                    *[
                        F.element_at(sig, b * rows_per_band + r + 1)
                        for r in range(rows_per_band)
                    ],
                )
            )
            for b in range(bands)
        ]
    )


def minhash_candidate_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
) -> DataFrame:
    """LSH candidate pairs: ids sharing at least one band bucket.

    Output: (id_a, id_b, n_shared_bands), id_a < id_b.
    """
    rows_per_band = num_hashes // bands
    sigs = df.select(
        F.col(id_col).alias("id"),
        lsh_band_keys(
            minhash_signature(F.col(text_col), num_hashes), bands, rows_per_band
        ).alias("band_keys"),
    )
    exploded = sigs.select(
        "id", F.posexplode("band_keys").alias("band", "key")
    )
    a = exploded.alias("a")
    b = exploded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.band") == F.col("b.band"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .groupBy(
            F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def jaccard(col_a: Column, col_b: Column) -> Column:
    """|A ∩ B| / |A ∪ B| over distinct-element arrays (4dp)."""
    inter = F.size(F.array_intersect(col_a, col_b))
    union = F.size(F.array_union(col_a, col_b))
    return F.round(
        F.when(union == 0, F.lit(0.0)).otherwise(
            inter.cast("double") / union.cast("double")
        ),
        4,
    )


def minhash_dedup_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 8,
    bands: int = 4,
    threshold: float = 0.7,
) -> DataFrame:
    """Full MinHash+LSH near-dup: candidates -> exact-Jaccard verify.

    Output (id_a, id_b, jaccard_sim) for verified pairs above threshold.
    """
    cands = minhash_candidate_pairs(df, id_col, text_col, num_hashes, bands)
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col)).alias("sh")
    )
    return (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .select(
            "id_a",
            "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )


# --------------------------------------------------------------------------
# SimHash
# --------------------------------------------------------------------------

SIMHASH_BITS = 16


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """16-bit SimHash per document.

    Each distinct token hashes to 16 bits (first 4 hex chars of md5);
    bit b of the signature is set when sum over tokens of (+1 if token
    bit b else -1) >= 0. One explode + one groupBy; portable to SQL.
    Empty-token docs get signature 0xFFFF (all ties -> >=0 -> set)?  No:
    docs with no tokens produce no rows and are re-attached with sig 0.
    """
    tokens = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.array_distinct(F.split(F.trim(F.lower(F.col(text_col))), r"\s+"))
        ).alias("tok"),
    ).filter(F.length("tok") > 0)

    h = F.conv(F.substring(F.md5(F.col("tok")), 1, 4), 16, 10).cast("long")
    with_bits = tokens.select(
        "id",
        *[
            F.when(F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1)
            .otherwise(-1)
            .alias(f"b{b}")
            for b in range(SIMHASH_BITS)
        ],
    )
    agg = with_bits.groupBy("id").agg(
        *[F.sum(f"b{b}").alias(f"s{b}") for b in range(SIMHASH_BITS)]
    )
    sig = sum(
        (
            F.when(F.col(f"s{b}") >= 0, F.lit(1 << b)).otherwise(F.lit(0))
            for b in range(SIMHASH_BITS)
        ),
        start=F.lit(0),
    )
    signed = agg.select("id", sig.cast("bigint").alias("simhash"))
    # re-attach token-less docs with signature 0
    all_ids = df.select(F.col(id_col).alias("id")).distinct()
    return (
        all_ids.join(signed, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("simhash"), F.lit(0)).alias("simhash"),
        )
    )


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 2,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance.

    Blocking: join on the top byte of the signature (documents differing
    in <=2 of 16 bits usually agree on one half; for the oracle-checked
    small-scale variant we join on equality of the top byte — at cluster
    scale use the standard multi-probe table split).
    """
    s = simhash(df, id_col, text_col)
    a = s.select(F.col(id_col).alias("id_a"), F.col("simhash").alias("ha"),
                 F.shiftright("simhash", 8).alias("blk"))
    b = s.select(F.col(id_col).alias("id_b"), F.col("simhash").alias("hb"),
                 F.shiftright("simhash", 8).alias("blk"))
    return (
        a.join(b, "blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            F.bit_count(
                F.col("ha").bitwiseXOR(F.col("hb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


# --------------------------------------------------------------------------
# n-gram Jaccard with blocking
# --------------------------------------------------------------------------

def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    length_band: int = 64,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard over word 3-gram sets, pairwise within
    (lang, length//band) blocks only."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(lang_col).alias("lg"),
        F.floor(F.length(F.col(text_col)) / length_band).alias("lb"),
        word_shingles(F.col(text_col)).alias("sh"),
    )
    a = base.select(
        F.col("id").alias("id_a"), "lg", "lb", F.col("sh").alias("sh_a")
    )
    b = base.select(
        F.col("id").alias("id_b"), "lg", "lb", F.col("sh").alias("sh_b")
    )
    return (
        a.join(b, ["lg", "lb"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            jaccard(F.col("sh_a"), F.col("sh_b")).alias("jaccard_sim"),
        )
        .filter(F.col("jaccard_sim") >= threshold)
    )
