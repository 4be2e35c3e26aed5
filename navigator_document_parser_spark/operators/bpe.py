"""Distributed BPE vocabulary training (Sennrich et al. 2016).

Learns merge rules from a corpus the way subword tokenizers are built:
count adjacent symbol pairs weighted by word frequency, merge the most
frequent pair everywhere, repeat. Complements bpe_tokenize_stats in
operators/text.py (which APPLIES a fixed merge table).

Engine-portable state encoding: a word's symbol sequence is one string
with each symbol bracketed — "hash" -> "(h)(a)(s)(h)". Applying merge
(x, y) is then replace(enc, "(x)(y)", "(xy)"), and both Spark's and
DuckDB's replace() scan left-to-right over non-overlapping occurrences,
which IS BPE's greedy merge-application semantics ("(a)(a)(a)(a)" ->
"(aa)(aa)"). Symbols come from [a-z]+ words so the bracket characters
can never occur inside a symbol.

100 TB shape: the corpus-sized work is ONE pass (word counting); every
training round then runs on the vocabulary-sized (word, count) table —
the classic BPE trainer trick. Per round: one narrow (pair -> count)
shuffle with map-side combine, a LIMIT-1 top-pair selection whose
single-row collect is the same synchronization a kmeans iteration pays,
and a map-only replace. The encoded table is eagerly checkpointed per
round (lineage barrier, CLAUDE.md lessons 3/7) so round r+1 never
re-derives round r's strings.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_WORD_PATTERN = "[a-z]+"


def _word_counts(df: DataFrame, text_col: str) -> DataFrame:
    return (
        df.select(
            F.explode(
                F.expr(
                    f"regexp_extract_all(lower({text_col}), "
                    f"'{_WORD_PATTERN}', 0)"
                )
            ).alias("word")
        )
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def _pair_counts(enc: DataFrame) -> DataFrame:
    syms = enc.select(
        F.split(F.btrim(F.col("enc"), F.lit("()")), r"\)\(").alias("s"),
        "cnt",
    ).filter(F.size("s") >= 2)
    return (
        syms.select(
            "cnt",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s)-1), "
                    "i -> struct(s[i-1] AS lsym, s[i] AS rsym))"
                )
            ).alias("p"),
        )
        .groupBy("p.lsym", "p.rsym")
        .agg(F.sum("cnt").alias("c"))
    )


def bpe_train(
    df: DataFrame,
    num_merges: int = 8,
    text_col: str = "text",
) -> DataFrame:
    """Learn ``num_merges`` BPE merge rules from the corpus.

    Returns (merge_round, lsym, rsym, merged, pair_count) — one row per
    learned rule in training order. Ties on pair count break by
    (lsym, rsym) ascending, fully deterministic across engines (ASCII
    byte order; the trainer restricts words to [a-z]+).
    """
    if num_merges <= 0:
        raise ValueError("num_merges must be positive")
    spark = df.sparkSession
    # ONE barrier after the corpus-sized pass: every round reads this.
    # Rounds themselves stack plain replace() projections on top of it
    # instead of checkpointing — the vocabulary table is small relative
    # to the corpus and a depth-num_merges string-replace chain is a
    # shallow map-only expression, so re-deriving round r's encoding
    # costs r replaces over vocab rows (cheap) while a per-round eager
    # checkpoint costs a full extra Spark job per round (measured 2x
    # slower at 8 merges).
    enc = (
        _word_counts(df, text_col)
        .select(
            F.regexp_replace("word", "(.)", "($1)").alias("enc"), "cnt"
        )
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[int, str, str, str, int]] = []
    for r in range(num_merges):
        top = (
            _pair_counts(enc)
            .orderBy(F.col("c").desc(), "lsym", "rsym")
            .limit(1)
            .collect()
        )
        if not top:
            break
        lsym, rsym, c = top[0]["lsym"], top[0]["rsym"], int(top[0]["c"])
        merges.append((r, lsym, rsym, lsym + rsym, c))
        enc = enc.select(
            F.replace(
                F.col("enc"),
                F.lit(f"({lsym})({rsym})"),
                F.lit(f"({lsym}{rsym})"),
            ).alias("enc"),
            "cnt",
        )
    return spark.createDataFrame(
        merges,
        "merge_round bigint, lsym string, rsym string, "
        "merged string, pair_count bigint",
    )


def oracle_bpe_train(
    num_merges: int = 8,
    text_col: str = "text",
    table: str = "documents",
) -> str:
    """DuckDB SQL computing exactly bpe_train(): the round-over-round
    dependency is unrolled into a chained CTE per merge (same style as
    the pagerank_hosts oracle), each round re-deriving pair counts from
    the previous round's re-encoded vocabulary."""

    def pairs(enc_cte: str, p: str, t: str) -> str:
        return f"""
        {p} AS (
          SELECT q.ts[q.i] AS lsym, q.ts[q.i+1] AS rsym,
                 CAST(sum(q.cnt) AS BIGINT) AS c
          FROM (
            SELECT cnt, ts, unnest(generate_series(1, len(ts)-1)) AS i
            FROM (SELECT cnt, string_split(trim(enc, '()'), ')(') AS ts
                  FROM {enc_cte})
          ) q
          GROUP BY 1, 2
        ), {t} AS (
          SELECT lsym, rsym, c FROM {p}
          ORDER BY c DESC, lsym, rsym LIMIT 1
        )"""

    ctes = [
        f"""src AS (
          SELECT unnest(regexp_extract_all(lower({text_col}),
                 '{_WORD_PATTERN}')) AS word
          FROM {table}
        ), words AS (
          SELECT word, count(*) AS cnt FROM src GROUP BY word
        ), enc0 AS (
          SELECT regexp_replace(word, '(.)', '(\\1)', 'g') AS enc, cnt
          FROM words
        )"""
    ]
    selects = []
    for r in range(num_merges):
        ctes.append(pairs(f"enc{r}", f"p{r}", f"t{r}"))
        if r + 1 < num_merges:
            ctes.append(
                f"""enc{r + 1} AS (
              SELECT replace(e.enc,
                       '(' || t.lsym || ')(' || t.rsym || ')',
                       '(' || t.lsym || t.rsym || ')') AS enc, e.cnt
              FROM enc{r} e CROSS JOIN t{r} t
            )"""
            )
        selects.append(
            f"SELECT CAST({r} AS BIGINT) AS merge_round, lsym, rsym, "
            f"lsym || rsym AS merged, c AS pair_count FROM t{r}"
        )
    body = "\n        UNION ALL\n        ".join(selects)
    return "WITH " + ",\n        ".join(ctes) + "\n        " + body
