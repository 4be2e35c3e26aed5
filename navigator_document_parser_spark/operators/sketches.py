"""Cardinality sketches: HyperLogLog and KMV distinct-count estimation.

A 100 TB corpus job asks "how many distinct tokens / urls / hosts per
group" constantly; exact count_distinct shuffles every distinct value.
These sketches bound the state at m registers (HLL) or k minima (KMV)
per group — the aggregate state a production pipeline merges across
snapshots instead of recounting.

Engine parity is exact by construction, not by tolerance:
  - hashes are the repo's portable md5 32-bit primitive;
  - register selection and the rank rho use INTEGER paths only — rho
    comes from the length of the binary string of the hash remainder
    (conv(r,10,2) / bin(r)), never floor(log2(r)) whose libm boundary
    behavior differs;
  - the HLL harmonic sum adds 2^-rho terms: dyadic rationals whose
    partial sums stay below 53 significand bits at m=256, so every
    partial sum is EXACT and the float sum is order-independent —
    safe under any shuffle order;
  - alpha_m is computed once in Python and injected into both engines
    as the same repr literal;
  - only the final estimate (one ln() in the linear-counting branch,
    one division) is rounded (4dp) before comparison.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators import md5_u32_sql


def _u32_sql(col: str, dialect: str) -> str:
    cast = "string" if dialect == "spark" else "VARCHAR"
    return md5_u32_sql(f"cast({col} as {cast})", dialect)


def _alpha(m: int) -> float:
    if m >= 128:
        return 0.7213 / (1.0 + 1.079 / m)
    return {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))


def hll_distinct(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "text",
    p: int = 8,
) -> DataFrame:
    """HyperLogLog distinct-count estimate per group (Flajolet 2007).

    register = top p hash bits, rho = leading-zero rank of the
    remaining B = 32-p bits (via binary-string length — integer-exact).
    Small-range (linear counting) correction applies below 2.5m, the
    regime register-zero counts make reliable.

    100 TB shape: ONE hash aggregate keyed (group, register) with
    map-side combine — state is at most m rows per group however many
    distinct values stream through — then an m-bounded per-group
    reduction. This is the mergeable-state layout: union of snapshots =
    max of registers.

    Returns (grp, v_zero, estimate) with estimate rounded to 4dp.
    """
    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    m = 1 << p
    b = 32 - p
    alpha = _alpha(m)
    u = _u32_sql(value_col, "spark")
    regs = (
        df.select(
            F.col(group_col).alias("grp"),
            F.expr(f"({u}) div {1 << b}").alias("reg"),
            F.expr(f"({u}) % {1 << b}").alias("r"),
        )
        .withColumn(
            "rho",
            F.when(F.col("r") == 0, F.lit(b + 1)).otherwise(
                F.lit(b + 1) - F.length(F.expr("conv(r, 10, 2)"))
            ),
        )
        .groupBy("grp", "reg")
        .agg(F.max("rho").alias("mx"))
    )
    per_grp = regs.groupBy("grp").agg(
        F.count(F.lit(1)).alias("used"),
        F.sum(F.expr("pow(2.0, -mx)")).alias("ssum"),
    )
    est_raw = F.lit(alpha * m * m) / (
        F.col("ssum") + (F.lit(m) - F.col("used"))
    )
    v_zero = (F.lit(m) - F.col("used")).cast("bigint")
    linear = F.lit(float(m)) * F.log(F.lit(float(m)) / v_zero)
    return per_grp.select(
        "grp",
        v_zero.alias("v_zero"),
        F.round(
            F.when(
                (est_raw <= 2.5 * m) & (v_zero > 0), linear
            ).otherwise(est_raw),
            4,
        ).alias("estimate"),
    )


def oracle_hll_distinct(
    group_col: str = "lang",
    value_col: str = "text",
    table: str = "documents",
    p: int = 8,
) -> str:
    """DuckDB SQL computing exactly hll_distinct()."""
    m = 1 << p
    b = 32 - p
    alpha = _alpha(m)
    u = _u32_sql(value_col, "duckdb")
    return f"""
        WITH h AS (
          SELECT {group_col} AS grp,
                 ({u}) // {1 << b} AS reg,
                 ({u}) % {1 << b} AS r
          FROM {table}
        ), rho AS (
          SELECT grp, reg,
                 CASE WHEN r = 0 THEN {b + 1}
                      ELSE {b + 1} - length(bin(r)) END AS rho
          FROM h
        ), regs AS (
          SELECT grp, reg, max(rho) AS mx FROM rho GROUP BY grp, reg
        ), per_grp AS (
          SELECT grp, count(*) AS used,
                 SUM(pow(2.0, -mx)) AS ssum
          FROM regs GROUP BY grp
        )
        SELECT grp,
               CAST({m} - used AS BIGINT) AS v_zero,
               round(
                 CASE WHEN ({alpha * m * m!r} / (ssum + ({m} - used)))
                        <= {2.5 * m!r}
                       AND ({m} - used) > 0
                      THEN {float(m)!r} * ln({float(m)!r} / ({m} - used))
                      ELSE {alpha * m * m!r} / (ssum + ({m} - used))
                 END, 4) AS estimate
        FROM per_grp
    """


def kmv_distinct(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "text",
    k: int = 32,
) -> DataFrame:
    """KMV (k minimum values) distinct estimate per group: keep the k
    smallest distinct hash fractions u in (0,1]; the k-th smallest
    estimates density, n ≈ (k-1)/u_k (Bar-Yossef 2002). Groups with
    fewer than k distinct hashes report their exact distinct count
    (the sketch IS the value set there).

    100 TB shape: distinct-hash dedup is one (grp, u) aggregate; the
    k-th minimum is a per-group window over at most the distinct
    hashes — production keeps only k minima per partition first (a
    map-side top-k) so the exchange is k rows per group per mapper.

    Returns (grp, n_kept, estimate 4dp).
    """
    if k < 2:
        raise ValueError("k must be >= 2")
    u32 = _u32_sql(value_col, "spark")
    hashes = (
        df.select(
            F.col(group_col).alias("grp"),
            # (u32 + 1) / 2^32: strictly positive so (k-1)/u_k is finite
            ((F.expr(u32) + 1) / F.lit(4294967296.0)).alias("u"),
        )
        .dropDuplicates(["grp", "u"])
    )
    w = Window.partitionBy("grp").orderBy(F.col("u").asc())
    ranked = hashes.withColumn("rk", F.row_number().over(w))
    per_grp = ranked.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_distinct"),
        F.max(F.when(F.col("rk") == k, F.col("u"))).alias("uk"),
    )
    return per_grp.select(
        "grp",
        F.least(F.col("n_distinct"), F.lit(k))
        .cast("bigint")
        .alias("n_kept"),
        F.round(
            F.when(
                F.col("n_distinct") < k,
                F.col("n_distinct").cast("double"),
            ).otherwise(F.lit(float(k - 1)) / F.col("uk")),
            4,
        ).alias("estimate"),
    )


def oracle_kmv_distinct(
    group_col: str = "lang",
    value_col: str = "text",
    table: str = "documents",
    k: int = 32,
) -> str:
    """DuckDB SQL computing exactly kmv_distinct()."""
    u32 = _u32_sql(value_col, "duckdb")
    return f"""
        WITH h AS (
          SELECT DISTINCT {group_col} AS grp,
                 (({u32}) + 1) / 4294967296.0 AS u
          FROM {table}
        ), ranked AS (
          SELECT grp, u,
                 row_number() OVER (PARTITION BY grp ORDER BY u ASC)
                   AS rk
          FROM h
        ), per_grp AS (
          SELECT grp, count(*) AS n_distinct,
                 max(CASE WHEN rk = {k} THEN u END) AS uk
          FROM ranked GROUP BY grp
        )
        SELECT grp,
               CAST(least(n_distinct, {k}) AS BIGINT) AS n_kept,
               round(CASE WHEN n_distinct < {k}
                          THEN CAST(n_distinct AS DOUBLE)
                          ELSE {float(k - 1)!r} / uk END, 4) AS estimate
        FROM per_grp
    """


def cms_counts(
    df: DataFrame,
    terms: list[str],
    value_col: str = "tok",
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-min sketch (Cormode & Muthukrishnan 2005) point estimates
    for ``terms``: d x w counters built in ONE hash aggregate (state
    bounded at d*w rows regardless of stream size — the mergeable
    sum-of-counters layout), then each queried term reads its d cells
    and takes the min. Estimates always >= the true count; collisions
    only ever inflate.

    Row hashes are the portable md5 primitive seeded per row
    (md5('<row>:' || value)), so the DuckDB oracle builds the
    bit-identical counter table.

    Returns (term, est_count).
    """
    if depth < 1 or width < 2:
        raise ValueError("depth must be >= 1 and width >= 2")
    spark = df.sparkSession

    def cell_sql(row: int, col: str, dialect: str) -> str:
        cast = "string" if dialect == "spark" else "VARCHAR"
        inner = f"'{row}:' || cast({col} as {cast})"
        return f"{md5_u32_sql(inner, dialect)} % {width}"

    counters = (
        df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).alias("row"),
                            F.expr(cell_sql(r, value_col, "spark")).alias(
                                "cell"
                            ),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("rc")
        )
        .groupBy("rc.row", "rc.cell")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    qrows = []
    for t in sorted(set(terms)):
        qrows.append((t,))
    qdf = spark.createDataFrame(qrows, "term string")
    lookups = qdf.select(
        "term",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).alias("row"),
                        F.expr(cell_sql(r, "term", "spark")).alias("cell"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("rc"),
    ).select("term", "rc.row", "rc.cell")
    return (
        lookups.join(F.broadcast(counters), ["row", "cell"], "left")
        .groupBy("term")
        .agg(
            F.min(F.coalesce("cnt", F.lit(0)))
            .cast("bigint")
            .alias("est_count")
        )
    )


def oracle_cms_counts(
    terms: list[str],
    value_col: str = "tok",
    table: str = "documents",
    depth: int = 4,
    width: int = 256,
) -> str:
    """DuckDB SQL computing exactly cms_counts()."""
    from navigator_document_parser_spark.operators import sql_quote

    def cell(row: int, col: str) -> str:
        inner = f"'{row}:' || CAST({col} AS VARCHAR)"
        return f"{md5_u32_sql(inner, 'duckdb')} % {width}"

    stream_arms = "\n          UNION ALL\n          ".join(
        f"SELECT {r} AS row, {cell(r, value_col)} AS cell FROM {table}"
        for r in range(depth)
    )
    qvals = ", ".join(f"({sql_quote(t)})" for t in sorted(set(terms)))
    lookup_arms = "\n          UNION ALL\n          ".join(
        f"SELECT term, {r} AS row, {cell(r, 'term')} AS cell FROM q"
        for r in range(depth)
    )
    return f"""
        WITH stream AS (
          {stream_arms}
        ), counters AS (
          SELECT row, cell, count(*) AS cnt FROM stream
          GROUP BY row, cell
        ), q(term) AS (VALUES {qvals}),
        lookups AS (
          {lookup_arms}
        )
        SELECT l.term,
               CAST(min(COALESCE(c.cnt, 0)) AS BIGINT) AS est_count
        FROM lookups l LEFT JOIN counters c
          ON c.row = l.row AND c.cell = l.cell
        GROUP BY l.term
    """


# --------------------------------------------------------------------------
# histogram quantile sketch (log2 buckets)
# --------------------------------------------------------------------------

def quantile_hist(
    df: DataFrame,
    group_col: str = "lang",
    value_col: str = "n_chars",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Mergeable histogram quantiles over dyadic (log2) buckets, with
    the exact order statistic alongside for error accounting.

    bucket(v) = floor(log2(v)) computed as length(bin(v)) - 1 — the
    INTEGER path (bin string length), never floor(log2()) whose libm
    boundary behavior differs across engines (same rationale as the
    HLL rho). Sketch state per group is <= 63 (bucket, count) rows: at
    100 TB this is the quantile you can afford — one hash aggregate
    with map-side combine, counters that MERGE across
    snapshots/partitions by addition, and a per-group cumulative walk
    over <= 63 rows. The ``exact`` column is the true k-th order
    statistic (k = ceil(q*n)) via a per-group sort — the expensive
    path the sketch replaces, kept here as the built-in error audit
    (pytest pins est <= exact < 2*est).

    Engine-exact: counts/targets integer; the only float op is
    ceil(q * n), an identical IEEE double multiply in both engines.

    Returns (grp, q, est, exact, n).
    """
    b_expr = (
        f"length(bin(greatest(cast({value_col} as bigint), 1L))) - 1"
    )
    base = df.select(
        F.col(group_col).alias("grp"),
        F.greatest(F.col(value_col).cast("bigint"), F.lit(1).cast("bigint"))
        .alias("v"),
        F.expr(b_expr).cast("int").alias("bucket"),
    )
    hist = base.groupBy("grp", "bucket").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    wcum = (
        Window.partitionBy("grp")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("grp")
    hist = hist.withColumn("cum", F.sum("cnt").over(wcum)).withColumn(
        "n", F.sum("cnt").over(wall)
    )
    spark = df.sparkSession
    qdf = spark.createDataFrame(
        [(float(q),) for q in quantiles], "q double"
    )
    targets = (
        hist.crossJoin(F.broadcast(qdf))
        .withColumn(
            "target", F.ceil(F.col("q") * F.col("n")).cast("bigint")
        )
        .filter(F.col("cum") >= F.col("target"))
        .groupBy("grp", "q")
        .agg(
            F.min("bucket").alias("b"),
            F.max("n").alias("n"),
            F.max("target").alias("target"),
        )
    )
    wrank = Window.partitionBy("grp").orderBy("v")
    # explicit aliases: targets and ranked share base's lineage, and
    # attribute-reference equality across a self-derived pair resolves
    # to a trivially-true predicate (Spark warns, then cross-matches)
    ranked = base.select(
        F.col("grp").alias("rgrp"), "v",
        F.row_number().over(wrank).alias("rn"),
    )
    return (
        targets.join(
            ranked,
            (F.col("grp") == F.col("rgrp"))
            & (F.col("target") == F.col("rn")),
        )
        .select(
            "grp",
            "q",
            F.expr("shiftleft(cast(1 as bigint), b)").alias("est"),
            F.col("v").alias("exact"),
            F.col("n").cast("bigint").alias("n"),
        )
    )


def oracle_quantile_hist(
    group_col: str = "lang",
    value_col: str = "n_chars",
    table: str = "documents",
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    """DuckDB SQL computing exactly quantile_hist() — same bin-length
    bucket, same integer cumulative walk, same ceil(q*n) target."""
    qvals = ", ".join(f"({float(q)!r})" for q in quantiles)
    return f"""
        WITH base AS (
          SELECT {group_col} AS grp,
                 greatest(CAST({value_col} AS BIGINT), 1) AS v,
                 CAST(length(bin(greatest(CAST({value_col} AS BIGINT), 1)))
                      - 1 AS INT) AS bucket
          FROM {table}
        ), hist AS (
          SELECT grp, bucket, count(*) AS cnt
          FROM base GROUP BY grp, bucket
        ), cum AS (
          SELECT grp, bucket, cnt,
                 sum(cnt) OVER (PARTITION BY grp ORDER BY bucket
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS cum,
                 sum(cnt) OVER (PARTITION BY grp) AS n
          FROM hist
        ), q(q) AS (VALUES {qvals}),
        targets AS (
          SELECT grp, q, min(bucket) AS b, max(n) AS n,
                 max(target) AS target
          FROM (
            SELECT c.*, q.q,
                   CAST(ceil(q.q * c.n) AS BIGINT) AS target
            FROM cum c CROSS JOIN q
          )
          WHERE cum >= target
          GROUP BY grp, q
        ), ranked AS (
          SELECT grp, v,
                 row_number() OVER (PARTITION BY grp ORDER BY v) AS rn
          FROM base
        )
        SELECT t.grp, t.q,
               (CAST(1 AS BIGINT) << t.b) AS est,
               r.v AS exact,
               CAST(t.n AS BIGINT) AS n
        FROM targets t
        JOIN ranked r ON r.grp = t.grp AND r.rn = t.target
    """


def kmv_slice_jaccard(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    k: int = 64,
    shingle_n: int = 3,
) -> DataFrame:
    """KMV-sketch Jaccard similarity between corpus slices (Beyer 2007):
    per slice keep the k smallest distinct shingle hashes (the slice's
    KMV sketch); for every slice pair take the k smallest of the sketch
    UNION and estimate J = |in both| / |kept|. The corpus-overlap
    dashboard a multi-source pipeline runs before mixing (how much of
    news is already in wiki? how much of this crawl is last month's?) —
    computed from per-slice sketches ONLY, i.e. the mergeable state a
    production job persists per snapshot instead of re-shuffling both
    corpora.

    Engine parity is exact: hashes are the portable md5 u32 primitive,
    selection is integer ranking, and the one ratio is ratio4 — no
    floats until the final 4dp division.

    100 TB shape: ONE distinct-(slice, hash) aggregate over exploded
    shingles (map-side combinable), a per-slice k-bounded window, and
    everything after operates on <= k rows per slice — pair fan-out
    cost is sketches x pairs, never corpus x corpus. Production keeps
    per-partition top-k minima before the exchange (same note as
    kmv_distinct).

    Returns (lang_a, lang_b, n_kept, n_both, jaccard4).
    """
    from pyspark.sql import functions as F

    from navigator_document_parser_spark.operators import (
        md5_u32_sql,
        ratio4,
    )
    from navigator_document_parser_spark.operators.dedup import (
        word_shingles,
    )

    if k < 2:
        raise ValueError("k must be >= 2")
    # checkpoint the bare (lang, shingles) projection BEFORE the
    # explode: InferFiltersFromGenerate would otherwise re-evaluate the
    # interpreted shingle HOF in a scan-side filter (lessons 3/20)
    shingled = df.select(
        F.col(group_col).alias("lang"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).localCheckpoint(eager=True)
    uh = (
        shingled.select("lang", F.explode("sh").alias("tok"))
        .select("lang", F.expr(md5_u32_sql("tok", "spark")).alias("u"))
        .dropDuplicates(["lang", "u"])
    )
    w = Window.partitionBy("lang").orderBy(F.col("u").asc())
    # checkpoint the sketch: langs/pairs AND the membership join all
    # read these <= k rows per slice — without the barrier the
    # broadcast side would re-run the whole explode+hash+window plan
    # a second time just to enumerate the languages
    sk = (
        uh.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= k)
        .select("lang", "u")
        .localCheckpoint(eager=True)
    )
    langs = sk.select("lang").distinct()
    pairs = (
        langs.alias("a")
        .join(langs.alias("b"), F.col("a.lang") < F.col("b.lang"))
        .select(F.col("a.lang").alias("la"), F.col("b.lang").alias("lb"))
    )
    # one equi-join on the unpivoted (pair, member-lang) roles — never
    # an OR-of-equalities predicate (lesson 12: that plans as a
    # BroadcastNestedLoopJoin)
    pairs_long = pairs.selectExpr(
        "la", "lb", "la AS lang", "'a' AS role"
    ).union(pairs.selectExpr("la", "lb", "lb AS lang", "'b' AS role"))
    mem = (
        sk.join(F.broadcast(pairs_long), "lang")
        .groupBy("la", "lb", "u")
        .agg(
            F.max(F.when(F.col("role") == "a", 1).otherwise(0)).alias(
                "in_a"
            ),
            F.max(F.when(F.col("role") == "b", 1).otherwise(0)).alias(
                "in_b"
            ),
        )
    )
    wu = Window.partitionBy("la", "lb").orderBy(F.col("u").asc())
    ranked = mem.withColumn("rk", F.row_number().over(wu)).filter(
        F.col("rk") <= k
    )
    both = F.sum(F.col("in_a") * F.col("in_b")).cast("bigint")
    n_kept = F.count(F.lit(1)).cast("bigint")
    return (
        ranked.groupBy("la", "lb")
        .agg(n_kept.alias("n_kept"), both.alias("n_both"))
        .select(
            F.col("la").alias("lang_a"),
            F.col("lb").alias("lang_b"),
            "n_kept",
            "n_both",
            ratio4(F.col("n_both"), F.col("n_kept")).alias("jaccard4"),
        )
    )


def oracle_kmv_slice_jaccard(
    shingle_cte: str,
    k: int = 64,
) -> str:
    """DuckDB replica of kmv_slice_jaccard. ``shingle_cte`` must be a
    complete leading WITH body ending in a relation ``sh`` with
    (lang, s list-of-shingles) — pass the shared _SHINGLE_CTE so both
    engines read the one shingle definition."""
    from navigator_document_parser_spark.operators import (
        md5_u32_sql,
        ratio4_sql,
    )

    u = md5_u32_sql("tok", "duckdb")
    j4 = ratio4_sql("sum(in_a * in_b)", "count(*)")
    return f"""
        {shingle_cte}
        , sktoks AS (
          SELECT lang, unnest(s) AS tok FROM sh
        ), uh AS (
          SELECT DISTINCT lang, {u} AS u FROM sktoks
        ), skt AS (
          SELECT lang, u FROM (
            SELECT lang, u,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY u ASC) AS rk
            FROM uh
          ) WHERE rk <= {k}
        ), langs AS (
          SELECT DISTINCT lang FROM skt
        ), pairs AS (
          SELECT a.lang AS la, b.lang AS lb
          FROM langs a JOIN langs b ON a.lang < b.lang
        ), mem AS (
          SELECT p.la, p.lb, s.u,
                 max(CASE WHEN s.lang = p.la THEN 1 ELSE 0 END) AS in_a,
                 max(CASE WHEN s.lang = p.lb THEN 1 ELSE 0 END) AS in_b
          FROM skt s JOIN pairs p ON s.lang = p.la OR s.lang = p.lb
          GROUP BY p.la, p.lb, s.u
        ), ranked AS (
          SELECT *, row_number() OVER (PARTITION BY la, lb
                                       ORDER BY u ASC) AS rk
          FROM mem
        )
        SELECT la AS lang_a, lb AS lang_b,
               CAST(count(*) AS BIGINT) AS n_kept,
               CAST(sum(in_a * in_b) AS BIGINT) AS n_both,
               {j4} AS jaccard4
        FROM ranked WHERE rk <= {k}
        GROUP BY la, lb
    """
