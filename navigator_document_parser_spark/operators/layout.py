"""Data-layout optimization: Z-order clustering for multi-dimensional
scan pruning (the Delta/Iceberg OPTIMIZE ZORDER analog).

A 100 TB table queried by BOTH host/source and time/size benefits from
neither a sort on one key nor the other; interleaving the bits of the
two dimensions (the Z-order / Morton curve) gives every range of the
curve locality in BOTH dimensions, so min/max file statistics prune
scans for either predicate. This module computes the curve position and
the range bucket a writer would repartitionByRange on.

Everything is INTEGER math — min/max scaling is divide-first by a
bucket width (never a float ratio, never a range-sized multiply), and
the interleave is a sum of shifted bit tests — so the DuckDB oracle
reproduces every value bit-for-bit and a re-layout of the same data is
byte-stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _scale_sql(col: str, mn: str, mx: str, bits: int) -> str:
    """Integer scale of ``col`` into [0, 2^bits) by bucket width
    ``((max-min) div 2^bits) + 1``: divide-first, so no intermediate
    ever exceeds the data's own range — the multiply-first form
    (col-mn)*(2^bits-1) overflows INT64 for wide dimensions (epoch
    microseconds over a few years already exceed 2^63/65535; DuckDB
    errors, non-ANSI Spark silently wraps). Exact in both engines;
    degenerate range (max == min) needs no special case (width 1,
    everything maps to 0)."""
    m = 1 << bits
    return (
        f"(({col} - {mn}) div ((({mx} - {mn}) div {m}) + 1))"
    )


def _interleave_sql(za: str, zb: str, bits: int, dialect: str) -> str:
    """Morton interleave: bit i of za -> bit 2i, bit i of zb -> bit
    2i+1. Rendered as ONE flat sum (2*bits terms) per CLAUDE.md lesson
    13 — py4j node-by-node construction of wide expressions costs more
    driver time than execution. ``dialect`` picks shift spelling:
    'spark' uses shiftright/shiftleft functions, 'duckdb' uses >>/<<
    operators."""
    terms = []
    for i in range(bits):
        if dialect == "spark":
            a = f"shiftleft(shiftright({za}, {i}) & 1, {2 * i})"
            b = f"shiftleft(shiftright({zb}, {i}) & 1, {2 * i + 1})"
        else:
            a = f"((({za} >> {i}) & 1) << {2 * i})"
            b = f"((({zb} >> {i}) & 1) << {2 * i + 1})"
        terms.append(a)
        terms.append(b)
    return " + ".join(terms)


def zorder_layout(
    df: DataFrame,
    dim_a: str,
    dim_b: str,
    id_col: str = "doc_id",
    bits: int = 16,
    n_buckets: int = 32,
    repartition: bool = False,
) -> DataFrame:
    """Z-order curve position + range bucket for a two-dimensional
    layout key. Returns (id, za, zb, zvalue, bucket).

    100 TB shape: one 1-row min/max aggregate per run (broadcast back
    via crossJoin), then a map-only projection computing the scaled
    coordinates and the interleaved curve position. A production writer
    follows with repartitionByRange(n_buckets, zvalue) + write — pass
    ``repartition=True`` to include that exchange here; the default
    leaves the plan shuffle-free so the operator composes under other
    layouts. Buckets are equal-width slices of the curve (bucket =
    zvalue * n_buckets div 2^(2*bits)); range-partitioning on zvalue at
    write time balances row counts even when the curve is occupied
    unevenly.
    """
    if bits <= 0 or bits > 31:
        raise ValueError("bits must be in [1, 31]")
    if n_buckets <= 0:
        raise ValueError("n_buckets must be positive")
    if n_buckets > (1 << 62) >> (2 * bits):
        # zvalue < 2^(2*bits); the bucket multiply must stay in INT64
        raise ValueError("n_buckets too large for 2*bits curve width")
    stats = df.agg(
        F.min(dim_a).cast("bigint").alias("mna"),
        F.max(dim_a).cast("bigint").alias("mxa"),
        F.min(dim_b).cast("bigint").alias("mnb"),
        F.max(dim_b).cast("bigint").alias("mxb"),
    )
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(dim_a).cast("bigint").alias("a"),
        F.col(dim_b).cast("bigint").alias("b"),
    ).crossJoin(F.broadcast(stats))
    za = _scale_sql("a", "mna", "mxa", bits)
    zb = _scale_sql("b", "mnb", "mxb", bits)
    scaled = base.select(
        "id",
        F.expr(za).cast("bigint").alias("za"),
        F.expr(zb).cast("bigint").alias("zb"),
    )
    z = _interleave_sql("za", "zb", bits, "spark")
    out = scaled.select(
        "id",
        "za",
        "zb",
        F.expr(z).cast("bigint").alias("zvalue"),
    ).withColumn(
        "bucket",
        F.expr(f"zvalue * {n_buckets} div {1 << (2 * bits)}").cast(
            "bigint"
        ),
    )
    if repartition:
        out = out.repartitionByRange(n_buckets, "zvalue")
    return out


def oracle_zorder_layout(
    dim_a: str,
    dim_b: str,
    id_col: str = "doc_id",
    table: str = "documents",
    bits: int = 16,
    n_buckets: int = 32,
) -> str:
    """DuckDB SQL computing exactly zorder_layout()."""
    za = _scale_sql("a", "mna", "mxa", bits).replace(" div ", " // ")
    zb = _scale_sql("b", "mnb", "mxb", bits).replace(" div ", " // ")
    z = _interleave_sql("za", "zb", bits, "duckdb")
    return f"""
        WITH stats AS (
          SELECT CAST(min({dim_a}) AS BIGINT) AS mna,
                 CAST(max({dim_a}) AS BIGINT) AS mxa,
                 CAST(min({dim_b}) AS BIGINT) AS mnb,
                 CAST(max({dim_b}) AS BIGINT) AS mxb
          FROM {table}
        ), base AS (
          SELECT {id_col} AS id, CAST({dim_a} AS BIGINT) AS a,
                 CAST({dim_b} AS BIGINT) AS b, s.*
          FROM {table} CROSS JOIN stats s
        ), scaled AS (
          SELECT id, CAST({za} AS BIGINT) AS za,
                 CAST({zb} AS BIGINT) AS zb
          FROM base
        )
        SELECT id, za, zb,
               CAST({z} AS BIGINT) AS zvalue,
               CAST(({z}) * {n_buckets} // {1 << (2 * bits)} AS BIGINT)
                 AS bucket
        FROM scaled
    """
