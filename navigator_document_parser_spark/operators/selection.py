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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.text import (
    bpe_token_count,
    oracle_bpe_token_count,
    oracle_quality,
    quality_score,
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
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(F.lit(f"{salt}:"), F.col("id").cast("string"))
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("double")
        / F.lit(4294967296.0)
    )
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
