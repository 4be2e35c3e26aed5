"""Corpus selection / data-mixing operators.

Training-data pipelines rarely train on everything they crawl: after
cleaning and dedup, a *mix* is constructed — so many tokens per
language/domain, best documents first, distribution rebalanced toward a
target. These operators express the two standard moves as portable
DataFrame plans (all hashes/scores are the md5/round-4dp primitives the
DuckDB oracles reproduce bit-for-bit):

  - budget_select: per-group token budget filled greedily by descending
    quality (the "take the best N billion tokens per language" step).
  - mix_rebalance: deterministic hash downsampling to a target group
    distribution (the "uniform language mix" / domain-reweighting step).

Scale notes (100 TB):
  - budget_select is one hash(group) exchange + a running sum window.
    A single group's documents land in one window partition — correct
    for language-sized groups (dozens of partitions, each streamed by
    the window operator in sort order, never materialized whole). For
    budgets over a *single* giant group, pre-aggregate per (group,
    quality-bucket) histograms to find the cut score first; documented,
    not needed for language/domain mixes.
  - mix_rebalance's per-group rates live on a groupBy(group) aggregate
    (map-side combine -> #groups rows), joined back by broadcast; the
    corpus side is a shuffle-free codegen'd filter, exactly like
    hash_sample.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators import ratio4, ratio4_sql

from navigator_document_parser_spark.operators.text import (
    bpe_token_count,
    oracle_bpe_token_count,
    oracle_quality,
    quality_score,
)


def uniform_u(id_col: Column, salt: str) -> Column:
    """Deterministic uniform [0,1) draw from a row id: the first 32 bits
    of md5('<salt>:' || id) / 2^32 — the single replayable-Bernoulli
    primitive shared by mix_rebalance, temperature_mix and the text.py
    hash_sample oracle family. One definition so a salt-format change
    can never skew one sampler against another."""
    return (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )

def budget_select(
    df: DataFrame,
    token_budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Greedy per-group token-budget selection: order each group's
    documents by quality_score desc (id asc as the deterministic
    tie-break) and keep documents while the budget has room.

    Semantics match pack_sequences' greedy rule: a document is kept iff
    the tokens accumulated BEFORE it are under the budget, so the last
    kept document may overrun by less than one document — the standard
    "fill to ~B tokens" contract (never an empty selection when the
    group is non-empty and the budget positive).

    Returns (id, group, quality, n_tokens, cum_tokens) for kept rows,
    cum_tokens inclusive of the row itself.
    """
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(group_col).alias("grp"),
        quality_score(F.col(text_col)).alias("quality"),
        bpe_token_count(F.col(text_col)).alias("n_tokens"),
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("quality").desc(), F.col("id").asc()
    )
    before = F.coalesce(
        F.sum("n_tokens").over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0).cast("bigint"),
    )
    return (
        base.withColumn("cum_before", before)
        .filter(F.col("cum_before") < int(token_budget))
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            "quality",
            "n_tokens",
            (F.col("cum_before") + F.col("n_tokens"))
            .cast("bigint")
            .alias("cum_tokens"),
        )
    )


def oracle_budget_select(
    token_budget: int,
    group_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
) -> str:
    q = oracle_quality(text_col)
    t = oracle_bpe_token_count(text_col)
    return f"""
        WITH base AS (
          SELECT {id_col}, {group_col}, {q} AS quality, {t} AS n_tokens
          FROM {table}
        ), cum AS (
          SELECT *,
                 COALESCE(SUM(n_tokens) OVER (
                   PARTITION BY {group_col}
                   ORDER BY quality DESC, {id_col} ASC
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                 ), 0) AS cum_before
          FROM base
        )
        SELECT {id_col}, {group_col}, quality, n_tokens,
               CAST(cum_before + n_tokens AS BIGINT) AS cum_tokens
        FROM cum WHERE cum_before < {int(token_budget)}
    """


def mix_rebalance(
    df: DataFrame,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
) -> DataFrame:
    """Rebalance the corpus to a uniform group distribution by
    deterministic hash downsampling: every group is thinned to (about)
    the size of the smallest group, keep decisions replayable from the
    document id alone (same md5-threshold rule as hash_sample, so
    growing the corpus re-selects a superset per group).

    keep(row) <=> u(id) < min_group_count / count(group(row))

    Returns kept rows as (id, group, keep_rate). Expected kept size per
    group = min_group_count; exact counts vary by hash placement (it is
    a per-row Bernoulli rule, the property that makes it embarrassingly
    parallel — no per-group top-k shuffle).
    """
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    mn = counts.agg(F.min("cnt").alias("mn"))
    rates = counts.crossJoin(F.broadcast(mn)).select(
        "grp",
        (F.col("mn").cast("double") / F.col("cnt").cast("double")).alias(
            "keep_rate"
        ),
    )
    u = uniform_u(F.col("id"), salt)
    return (
        df.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
        .join(F.broadcast(rates), "grp")
        .filter(u < F.col("keep_rate"))
        .select(
            F.col("id").alias(id_col),
            F.col("grp").alias(group_col),
            F.round("keep_rate", 6).alias("keep_rate"),
        )
    )


def oracle_mix_rebalance(
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "mix",
    table: str = "documents",
) -> str:
    u = (
        f"(CAST('0x' || substring(md5('{salt}:' || "
        f"CAST({id_col} AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0)"
    )
    return f"""
        WITH counts AS (
          SELECT {group_col} AS grp, COUNT(*) AS cnt
          FROM {table} GROUP BY {group_col}
        ), rates AS (
          SELECT grp,
                 (SELECT MIN(cnt) FROM counts) * 1.0 / cnt AS keep_rate
          FROM counts
        )
        SELECT d.{id_col}, d.{group_col},
               round(r.keep_rate, 6) AS keep_rate
        FROM {table} d JOIN rates r ON d.{group_col} = r.grp
        WHERE {u} < r.keep_rate
    """


# ---- DSIR-style distribution-matching selection ---------------------------

def importance_select(
    df: DataFrame,
    target_pred: Column,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.0,
) -> DataFrame:
    """Distribution-matching data selection, DSIR-shaped (Xie et al.
    2023): score each doc by how much its token mass leans toward a
    TARGET distribution (rows where ``target_pred`` holds) versus the
    full SOURCE corpus, and select docs above a threshold.

    Production DSIR sums per-feature log-likelihood ratios — a float
    whose last ulp differs across engines. Here each token leans target
    iff target_count * source_total > source_count * target_total
    (cross-multiplied counts — the same comparison as the ratio test,
    exactly), and the doc score is (lean_target_mass - lean_source_mass)
    / n_tokens: integers until one final rounded division, so the DuckDB
    oracle hash-matches. The sign-aggregate ranks the same tail as the
    log-ratio sum when per-token ratios are of comparable magnitude.

    Cross-products are computed in DECIMAL(38,0): bigint*bigint
    overflows once both factors pass ~3e9, which a 100 TB corpus's token
    totals do.

    100 TB shape: one scan -> (doc, term) tf aggregate (map-side
    combine, checkpointed — it feeds both the vocabulary aggregate and
    the per-doc join, CLAUDE.md lesson 3); the vocabulary table comes
    back on a plain term equi-join (AQE broadcasts it when small); one
    final groupBy(doc_id).

    Returns (doc_id, n_tokens, lean_target, lean_source, score,
    selected).
    """
    words = df.select(
        F.col(id_col).alias("doc_id"),
        target_pred.alias("tgt"),
        F.explode(
            F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
        ).alias("term"),
    ).filter(F.length("term") > 0)
    tf = (
        words.groupBy("doc_id", "tgt", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )
    counts = tf.groupBy("term").agg(
        F.sum(F.when(F.col("tgt"), F.col("tf")).otherwise(0)).alias("t_cnt"),
        F.sum("tf").alias("s_cnt"),
    )
    totals = counts.agg(
        F.sum("t_cnt").alias("t_tot"), F.sum("s_cnt").alias("s_tot")
    )
    lean = counts.crossJoin(F.broadcast(totals)).select(
        "term",
        (
            F.col("t_cnt").cast("decimal(38,0)") * F.col("s_tot")
            > F.col("s_cnt").cast("decimal(38,0)") * F.col("t_tot")
        ).alias("lt"),
        (
            F.col("t_cnt").cast("decimal(38,0)") * F.col("s_tot")
            < F.col("s_cnt").cast("decimal(38,0)") * F.col("t_tot")
        ).alias("ls"),
    )
    per = (
        tf.join(lean, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(F.when(F.col("lt"), F.col("tf")).otherwise(0)).alias("nt"),
            F.sum(F.when(F.col("ls"), F.col("tf")).otherwise(0)).alias("ns"),
        )
    )
    diff = F.col("nt") - F.col("ns")
    mag = ratio4(F.abs(diff), F.col("n_tokens"))
    score = F.when(diff < 0, -mag).otherwise(mag)
    return per.select(
        "doc_id",
        F.col("n_tokens").cast("bigint").alias("n_tokens"),
        F.col("nt").cast("bigint").alias("lean_target"),
        F.col("ns").cast("bigint").alias("lean_source"),
        score.alias("score"),
        (score >= F.lit(threshold)).alias("selected"),
    )


def oracle_importance_select(
    target_pred_sql: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    table: str = "documents",
    threshold: float = 0.0,
) -> str:
    return f"""
        WITH w AS (
          SELECT {id_col} AS doc_id, ({target_pred_sql}) AS tgt,
                 unnest(string_split_regex(
                   trim(lower({text_col})), '\\s+')) AS term
          FROM {table}
        ), tf AS (
          SELECT doc_id, tgt, term, count(*) AS tf
          FROM w WHERE length(term) > 0 GROUP BY doc_id, tgt, term
        ), cnt AS (
          SELECT term,
                 sum(CASE WHEN tgt THEN tf ELSE 0 END) AS t_cnt,
                 sum(tf) AS s_cnt
          FROM tf GROUP BY term
        ), tot AS (
          SELECT sum(t_cnt) AS t_tot, sum(s_cnt) AS s_tot FROM cnt
        ), lean AS (
          SELECT term,
                 CAST(t_cnt AS HUGEINT) * s_tot
                   > CAST(s_cnt AS HUGEINT) * t_tot AS lt,
                 CAST(t_cnt AS HUGEINT) * s_tot
                   < CAST(s_cnt AS HUGEINT) * t_tot AS ls
          FROM cnt CROSS JOIN tot
        ), per AS (
          SELECT doc_id, sum(tf) AS n_tokens,
                 sum(CASE WHEN lt THEN tf ELSE 0 END) AS nt,
                 sum(CASE WHEN ls THEN tf ELSE 0 END) AS ns
          FROM tf JOIN lean USING (term) GROUP BY doc_id
        )
        SELECT doc_id,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(nt AS BIGINT) AS lean_target,
               CAST(ns AS BIGINT) AS lean_source,
               (CASE WHEN (nt - ns) < 0 THEN -((floor((((abs(nt - ns))) * 20000.0 + ((n_tokens))) / (2.0 * ((n_tokens)))) / 10000.0)) ELSE (floor((((nt - ns)) * 20000.0 + ((n_tokens))) / (2.0 * ((n_tokens)))) / 10000.0) END) AS score,
               (CASE WHEN (nt - ns) < 0 THEN -((floor((((abs(nt - ns))) * 20000.0 + ((n_tokens))) / (2.0 * ((n_tokens)))) / 10000.0)) ELSE (floor((((nt - ns)) * 20000.0 + ((n_tokens))) / (2.0 * ((n_tokens)))) / 10000.0) END) >= {threshold}
                 AS selected
        FROM per
    """


def temperature_mix(
    df: DataFrame,
    alpha: float = 0.3,
    budget_frac: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "tmix",
) -> DataFrame:
    """Temperature-scaled multilingual sampling (the mT5/XLM-R mixing
    rule): group g is drawn with probability p_g ∝ (n_g/N)^alpha, so
    alpha<1 upsamples low-resource languages relative to their natural
    share while keeping the head dominant. The corpus is thinned to
    ~budget_frac*N rows matching that mix, with the same replayable
    md5-threshold Bernoulli rule as mix_rebalance/hash_sample.

    keep(row) <=> u(id) < rate_g,
    rate_g = min(1, round(p_g * budget / n_g, 8))

    The 8dp rounding happens on BOTH engines before the comparison, so
    a last-ulp pow() difference can never flip a keep decision.

    100 TB shape: group counts are one hash aggregate; everything else
    is a broadcast of the per-group rate table onto a shuffle-free
    corpus projection — no per-group top-k, no global sort.

    Returns (id, grp, weight, keep) where weight = round(p_g, 8).
    """
    if not 0 < budget_frac <= 1:
        raise ValueError("budget_frac must be in (0, 1]")
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    tot = counts.agg(F.sum("cnt").alias("n"))
    w = counts.crossJoin(F.broadcast(tot)).select(
        "grp",
        "cnt",
        "n",
        F.pow(
            F.col("cnt").cast("double") / F.col("n").cast("double"),
            F.lit(float(alpha)),
        ).alias("wraw"),
    )
    norm = w.agg(F.sum("wraw").alias("z"))
    rates = w.crossJoin(F.broadcast(norm)).select(
        "grp",
        F.round(F.col("wraw") / F.col("z"), 8).alias("weight"),
        F.least(
            F.lit(1.0),
            F.round(
                (F.col("wraw") / F.col("z"))
                * F.lit(float(budget_frac))
                * F.col("n").cast("double")
                / F.col("cnt").cast("double"),
                8,
            ),
        ).alias("rate"),
    )
    u = uniform_u(F.col("id"), salt)
    return (
        df.select(F.col(id_col).alias("id"), F.col(group_col).alias("grp"))
        .join(F.broadcast(rates), "grp")
        .select(
            "id",
            "grp",
            "weight",
            (u < F.col("rate")).alias("keep"),
        )
    )


def oracle_temperature_mix(
    alpha: float = 0.3,
    budget_frac: float = 0.5,
    group_col: str = "lang",
    id_col: str = "doc_id",
    table: str = "documents",
    salt: str = "tmix",
) -> str:
    """DuckDB SQL computing exactly temperature_mix()."""
    a = repr(float(alpha))
    b = repr(float(budget_frac))
    return f"""
        WITH counts AS (
          SELECT {group_col} AS grp, count(*) AS cnt FROM {table}
          GROUP BY 1
        ), tot AS (SELECT SUM(cnt) AS n FROM counts),
        w AS (
          SELECT grp, cnt, tot.n,
                 pow(CAST(cnt AS DOUBLE) / CAST(tot.n AS DOUBLE), {a})
                   AS wraw
          FROM counts CROSS JOIN tot
        ), norm AS (SELECT SUM(wraw) AS z FROM w),
        rates AS (
          SELECT grp,
                 round(wraw / norm.z, 8) AS weight,
                 least(1.0, round((wraw / norm.z) * {b}
                       * CAST(n AS DOUBLE) / CAST(cnt AS DOUBLE), 8))
                   AS rate
          FROM w CROSS JOIN norm
        )
        SELECT d.{id_col} AS id, d.{group_col} AS grp, r.weight,
               (CAST('0x' || substring(
                  md5('{salt}:' || CAST(d.{id_col} AS VARCHAR)), 1, 8)
                  AS BIGINT) / 4294967296.0 < r.rate) AS keep
        FROM {table} d JOIN rates r ON d.{group_col} = r.grp
    """


def host_split(
    df: DataFrame,
    host_col: str = "source",
    id_col: str = "doc_id",
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe train/val/test split: the draw hashes the HOST, not
    the document, so every page of a site lands in the same split —
    near-duplicates and boilerplate within a site can never straddle
    the train/eval boundary (the standard web-data eval-contamination
    guard; doc-level splits leak via same-site near-dups even after
    dedup). Same replayable md5 Bernoulli as every sampler here
    (uniform_u): re-running any shard reproduces the split exactly,
    and changing fractions moves whole hosts monotonically
    (test grows into val, val into train — never a reshuffle).

    u < test_frac -> test; u < test_frac + val_frac -> val; else train.

    100 TB shape: a pure codegen'd projection — no shuffle, no state,
    no host table to build or broadcast. Returns (doc_id, host, split).
    """
    u = uniform_u(F.col(host_col), salt)
    split = (
        F.when(u < F.lit(float(test_frac)), F.lit("test"))
        .when(u < F.lit(float(test_frac) + float(val_frac)), F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.select(
        F.col(id_col).alias("doc_id"),
        F.col(host_col).alias("host"),
        split.alias("split"),
    )


def oracle_host_split(
    host_col: str = "source",
    id_col: str = "doc_id",
    val_frac: float = 0.05,
    test_frac: float = 0.05,
    salt: str = "split",
    table: str = "documents",
) -> str:
    u = (
        f"(CAST('0x' || substring(md5('{salt}:' || "
        f"CAST({host_col} AS VARCHAR)), 1, 8) AS BIGINT) / 4294967296.0)"
    )
    t, v = float(test_frac), float(val_frac)
    return f"""
        SELECT {id_col} AS doc_id, {host_col} AS host,
               CASE WHEN {u} < {t!r} THEN 'test'
                    WHEN {u} < {t + v!r} THEN 'val'
                    ELSE 'train' END AS split
        FROM {table}
    """


# ---- weighted sampling without replacement (Efraimidis-Spirakis) -----------

def weighted_sample(
    df: DataFrame,
    k: int = 10,
    weight_col: str = "n_chars",
    group_col: str = "lang",
    id_col: str = "doc_id",
    salt: str = "ws",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, k per group — the A-ES
    scheme (Efraimidis & Spirakis 2006): key_i = u_i^(1/w_i) with
    u_i the replayable uniform_u draw; the top-k keys per group are a
    weighted sample without replacement, exactly (their Thm 2). The
    corpus use: pick k quality-weighted exemplar docs per language
    (eval panels, annotation batches, few-shot pools) reproducibly.

    Engine determinism: ranking raw pow() doubles would let a last-ulp
    libm difference flip an order, so the key is ROUNDED to 8dp before
    ranking with doc_id as tiebreak (temperature_mix's pow discipline;
    an 8dp collision needs two keys within 5e-9 — and then the id
    tiebreak is shared). Zero-or-negative weights are excluded (their
    key is 0 = never sampled, per the scheme's w > 0 domain).

    100 TB shape: one map projection + ONE per-group top-k window
    shuffle. If k·|groups| rows is still huge, the streaming variant
    keeps a per-partition k-heap and merges (A-ES is mergeable by
    construction: max-k of unions = max-k of max-k's) — same keys,
    same result.

    Returns (grp, rank, doc_id, weight, key8).
    """
    if k <= 0:
        raise ValueError("k must be positive")
    from pyspark.sql.window import Window

    w = F.col(weight_col).cast("double")
    key = F.round(
        F.pow(uniform_u(F.col(id_col), salt), F.lit(1.0) / w), 8
    )
    base = (
        df.filter(F.col(weight_col) > 0)
        .select(
            F.col(group_col).alias("grp"),
            F.col(id_col).alias("doc_id"),
            F.col(weight_col).cast("bigint").alias("weight"),
            key.alias("key8"),
        )
    )
    win = Window.partitionBy("grp").orderBy(
        F.col("key8").desc(), F.col("doc_id").asc()
    )
    return (
        base.withColumn("rank", F.row_number().over(win).cast("bigint"))
        .filter(F.col("rank") <= k)
        .select("grp", "rank", "doc_id", "weight", "key8")
    )


def oracle_weighted_sample(
    k: int = 10,
    weight_col: str = "n_chars",
    group_col: str = "lang",
    id_col: str = "doc_id",
    table: str = "documents",
    salt: str = "ws",
) -> str:
    """DuckDB replica of weighted_sample — same md5 uniform, same
    rounded exponential key, same rank/tiebreak."""
    from navigator_document_parser_spark.operators import md5_u32_sql

    inner = f"'{salt}:' || CAST({id_col} AS VARCHAR)"
    u = f"(({md5_u32_sql(inner, 'duckdb')}) / 4294967296.0)"
    key = (
        f"round(pow({u}, 1.0 / CAST({weight_col} AS DOUBLE)), 8)"
    )
    return f"""
        WITH base AS (
          SELECT {group_col} AS grp, {id_col} AS doc_id,
                 CAST({weight_col} AS BIGINT) AS weight,
                 {key} AS key8
          FROM {table}
          WHERE {weight_col} > 0
        )
        SELECT grp, CAST(rank AS BIGINT) AS rank, doc_id, weight, key8
        FROM (
          SELECT *, row_number() OVER (PARTITION BY grp
                     ORDER BY key8 DESC, doc_id ASC) AS rank
          FROM base
        )
        WHERE rank <= {int(k)}
    """


def host_reputation(
    df: DataFrame,
    host_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    dup_num: int = 1,
    dup_den: int = 5,
    lang_num: int = 9,
    lang_den: int = 20,
) -> DataFrame:
    """Per-host reputation rollup — the ranking/selection signal a
    corpus pipeline joins back onto documents before budget decisions
    (hosts that mass-duplicate content or mix languages incoherently
    are the classic SEO-farm profile; cf. the host-level priors in
    TrustRank-style spam demotion).

    Signals per host:
      n_docs, n_unique (distinct md5(text)),
      dup_ratio4       = ratio4(n_docs - n_unique, n_docs),
      top_lang_share4  = ratio4(max per-language count, n_docs),
      avg_chars4       = ratio4(sum(length(text)), n_docs),
      reputable        — integer cross-multiplied thresholds (never a
                         float compare): (n_docs - n_unique) * dup_den
                         <= n_docs * dup_num  AND  top_lang * lang_den
                         >= n_docs * lang_num.

    100 TB shape: two host-grain hash aggregates (one per grain:
    (host), (host, lang)), both map-side combinable, joined at host
    cardinality. countDistinct shuffles (host, md5) — bounded by
    unique TEXTS per host, the quantity being measured.

    Returns (host, n_docs, n_unique, dup_ratio4, top_lang_share4,
    avg_chars4, reputable).
    """
    from navigator_document_parser_spark.operators import ratio4

    a = df.groupBy(F.col(host_col).alias("host")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct(F.md5(F.col(text_col)))
        .cast("bigint")
        .alias("n_unique"),
        F.sum(F.length(F.col(text_col))).cast("bigint").alias("s_chars"),
    )
    b = (
        df.groupBy(
            F.col(host_col).alias("host"), F.col(lang_col).alias("lang")
        )
        .agg(F.count(F.lit(1)).alias("lc"))
        .groupBy("host")
        .agg(F.max("lc").cast("bigint").alias("top_lang"))
    )
    j = a.join(b, "host")
    dup_ok = (F.col("n_docs") - F.col("n_unique")) * dup_den <= F.col(
        "n_docs"
    ) * dup_num
    lang_ok = F.col("top_lang") * lang_den >= F.col("n_docs") * lang_num
    return j.select(
        "host",
        "n_docs",
        "n_unique",
        ratio4(F.col("n_docs") - F.col("n_unique"), F.col("n_docs"))
        .alias("dup_ratio4"),
        ratio4(F.col("top_lang"), F.col("n_docs"))
        .alias("top_lang_share4"),
        ratio4(F.col("s_chars"), F.col("n_docs")).alias("avg_chars4"),
        (dup_ok & lang_ok).alias("reputable"),
    )


def oracle_host_reputation(
    docs_sql: str,
    host_col: str = "source",
    text_col: str = "text",
    lang_col: str = "lang",
    dup_num: int = 1,
    dup_den: int = 5,
    lang_num: int = 9,
    lang_den: int = 20,
) -> str:
    """DuckDB replica of host_reputation over ``docs_sql`` yielding at
    least (host_col, text_col, lang_col)."""
    from navigator_document_parser_spark.operators import ratio4_sql

    dup4 = ratio4_sql("(n_docs - n_unique)", "n_docs")
    top4 = ratio4_sql("top_lang", "n_docs")
    avg4 = ratio4_sql("s_chars", "n_docs")
    return f"""
        WITH d AS ({docs_sql}),
        a AS (
          SELECT {host_col} AS host,
                 CAST(count(*) AS BIGINT) AS n_docs,
                 CAST(count(DISTINCT md5({text_col})) AS BIGINT)
                   AS n_unique,
                 CAST(SUM(length({text_col})) AS BIGINT) AS s_chars
          FROM d GROUP BY 1
        ), b AS (
          SELECT host, CAST(max(lc) AS BIGINT) AS top_lang FROM (
            SELECT {host_col} AS host, {lang_col} AS lang,
                   count(*) AS lc
            FROM d GROUP BY 1, 2
          ) GROUP BY host
        )
        SELECT a.host, n_docs, n_unique,
               {dup4} AS dup_ratio4,
               {top4} AS top_lang_share4,
               {avg4} AS avg_chars4,
               ((n_docs - n_unique) * {dup_den} <= n_docs * {dup_num}
                AND top_lang * {lang_den} >= n_docs * {lang_num})
                 AS reputable
        FROM a JOIN b ON a.host = b.host
    """


def curriculum_order(
    df: DataFrame,
    n_phases: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Curriculum phase assignment: documents bucketed into
    ``n_phases`` difficulty quantiles — phase 0 is the easiest quarter
    of the corpus, trained first; later phases are appended as training
    progresses (the classic length/complexity curriculum).

    Difficulty = 4dp mean word length (ratio4 of non-whitespace chars
    over words — integer half-up, engine-portable). Quantiles are
    computed WITHOUT a global sort: one groupBy(difficulty) histogram
    (the 4dp quantization bounds its cardinality), a running-count
    window over that small table, then
    phase = (docs_with_smaller_difficulty * n_phases) div N —
    pure integer arithmetic, so ties share a phase deterministically
    (a phase boundary never splits equal-difficulty documents; under
    heavy ties phases are uneven by exactly the tie mass).

    100 TB shape: one map-side-combine aggregate, one tiny-table
    window, one broadcast join back onto a shuffle-free projection.
    The corpus itself is never globally sorted or windowed.

    Returns (doc_id, difficulty, phase), phase in [0, n_phases).
    """
    if n_phases <= 0:
        raise ValueError("n_phases must be positive")
    from navigator_document_parser_spark.operators import ratio4
    from navigator_document_parser_spark.operators.text import token_count

    c = F.col(text_col)
    chars = F.length(F.regexp_replace(c, r"\s", ""))
    words = token_count(c)
    base = df.select(
        F.col(id_col).alias("doc_id"),
        ratio4(chars, F.greatest(words, F.lit(1))).alias("difficulty"),
    )
    hist = base.groupBy("difficulty").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )
    w = Window.orderBy("difficulty").rowsBetween(
        Window.unboundedPreceding, -1
    )
    cum = hist.select(
        "difficulty",
        F.coalesce(F.sum("cnt").over(w), F.lit(0).cast("bigint")).alias(
            "cum_before"
        ),
    )
    tot = hist.agg(F.sum("cnt").cast("bigint").alias("n"))
    phases = cum.crossJoin(F.broadcast(tot)).select(
        "difficulty",
        F.expr(f"(cum_before * {int(n_phases)}) div n")
        .cast("bigint")
        .alias("phase"),
    )
    return base.join(F.broadcast(phases), on="difficulty").select(
        "doc_id", "difficulty", "phase"
    )


def oracle_curriculum_order(
    n_phases: int = 4, table: str = "documents"
) -> str:
    """DuckDB replica of curriculum_order over ``table`` (doc_id, text)."""
    from navigator_document_parser_spark.operators import ratio4_sql
    from navigator_document_parser_spark.operators.text import (
        oracle_token_count,
    )

    diff = ratio4_sql(
        "length(regexp_replace(text, '\\s', '', 'g'))",
        f"greatest({oracle_token_count('text')}, 1)",
    )
    return f"""
        WITH base AS (
          SELECT doc_id, {diff} AS difficulty FROM {table}
        ), hist AS (
          SELECT difficulty, CAST(count(*) AS BIGINT) AS cnt
          FROM base GROUP BY difficulty
        ), cum AS (
          SELECT difficulty,
                 CAST(COALESCE(SUM(cnt) OVER (ORDER BY difficulty
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS BIGINT) AS cum_before
          FROM hist
        ), tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS n FROM hist
        )
        SELECT b.doc_id, b.difficulty,
               CAST((c.cum_before * {int(n_phases)}) // t.n AS BIGINT)
                 AS phase
        FROM base b JOIN cum c USING (difficulty) CROSS JOIN tot t
    """
