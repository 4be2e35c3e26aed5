"""Unigram-LM (SentencePiece-style) subword tokenization — Viterbi
segmentation against a scored piece vocabulary.

Completes the tokenizer family next to bpe.py (merge-rule TRAINING)
and text.bpe_tokenize_stats (merge-rule APPLY): the other production
tokenizer applies a unigram vocabulary by picking, per word, the
segmentation with the highest total piece score (Kudo 2018, Viterbi
over word positions). Scores here are INTEGERS (a real model's log
probs quantized by the caller), so the DP is exact arithmetic and the
whole operator is oracle-checkable — the DuckDB twin unrolls the DP
one CTE level per word position (the bpe_train unrolled-rounds
discipline), never a recursive aggregate.

Tie policy (total order, both engines): maximize total score, then
minimize piece count. Beyond that, ties can differ in PATH but not in
the (score, n_pieces) pair — the operator deliberately emits the pair,
not the path, so its output is deterministic without a third rule.

100 TB shape: the DP runs once per DISTINCT clipped word (an
Arrow-batched pandas stage over a vocabulary-sized table — the
robots_rules posture, ~10^7 rows for the whole web), joined back to
word occurrences; per-document results are integer sums, order-
independent under any shuffle. Words are clipped to ``max_word_len``
chars for scoring (the documented scale cap; both engines clip
identically).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators import ratio4, ratio4_sql

_CHARS = "abcdefghijklmnopqrstuvwxyz0123456789"

# score = 3*(len-1) for multi-char pieces, 1 for single chars: using a
# piece always beats spelling it out, and longer pieces beat chains of
# shorter ones exactly when they cover more (the Kudo-model shape)
DEFAULT_UNIGRAM_VOCAB: tuple = tuple(
    [(c, 1) for c in _CHARS]
    + [(p, 3) for p in (
        "th he in er an re on at en nd ti es or te of ed is it al ar "
        "st to nt ng se ha as ou io le ve co me de hi ri ro ic ne ea "
        "ra ce li ch ll be ma si om ur"
    ).split()]
    + [(p, 6) for p in (
        "the ing and ion ent for tio ati ter ate ers res con"
    ).split()]
    + [(p, 10) for p in ("tion atio ment able".split())]
)

_MAX_PIECE = 4


def _vocab_dict(vocab: tuple) -> dict:
    v = dict(vocab)
    if len(v) != len(vocab):
        # duplicates would resolve differently per engine (dict keeps
        # the LAST score, the oracle's VALUES + score-DESC rank keeps
        # the MAX) — reject instead of diverging (review finding)
        raise ValueError("vocab contains duplicate pieces")
    missing = [c for c in _CHARS if c not in v]
    if missing:
        raise ValueError(
            f"vocab must cover every [a-z0-9] single char (closed "
            f"vocabulary => every word segmentable); missing {missing}"
        )
    if any(len(p) > _MAX_PIECE for p in v):
        raise ValueError(f"pieces longer than {_MAX_PIECE} unsupported")
    return v


def _viterbi(word: str, v: dict) -> tuple:
    """(best_score, n_pieces): max total score, tie -> fewest pieces."""
    # best[k] = (score, -n_pieces) for the prefix of length k
    best = [(0, 0)] + [None] * len(word)
    for k in range(1, len(word) + 1):
        cand = None
        for j in range(1, min(_MAX_PIECE, k) + 1):
            s = v.get(word[k - j:k])
            if s is None or best[k - j] is None:
                continue
            c = (best[k - j][0] + s, best[k - j][1] - 1)
            if cand is None or c > cand:
                cand = c
        best[k] = cand
    sc, neg_np = best[len(word)]
    return sc, -neg_np


def unigram_tokenize_stats(
    df: DataFrame,
    vocab: tuple = DEFAULT_UNIGRAM_VOCAB,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_word_len: int = 16,
) -> DataFrame:
    """Per-document unigram segmentation diagnostics:
    (doc_id, n_words, uni_score, n_pieces, pieces_per_word4) — the
    compression/naturalness signal a tokenizer-aware curation pass
    filters on, exactly like bpe_tokenize_stats but under the unigram
    model (low pieces/word = in-vocabulary natural text)."""
    v = _vocab_dict(vocab)
    clip = int(max_word_len)
    # One zero-shuffle pass (r7): the old explode -> distinct ->
    # mapInPandas -> join-back -> groupBy pipeline paid 3 Exchanges
    # and shipped one boundary row per word occurrence; per-doc sums
    # are already final inside a task, so compute them there. The DP
    # still runs once per distinct word per task (memo) — same
    # _viterbi, same integer sums, ratio4 stays in Spark.
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        # extract-all == split-on-complement with empties dropped
        # (identical stream; negated-class split is 13x slower — r7)
        F.expr(
            f"regexp_extract_all(lower({text_col}), '[a-z0-9]+', 0)"
        ).alias("ws"),
    )
    id_type = toks.schema["doc_id"].dataType.simpleString()

    def dp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        memo: dict = {}
        for pdf in batches:
            ids, nw, sc, np_ = [], [], [], []
            for doc_id, ws in zip(pdf["doc_id"], pdf["ws"]):
                if ws is None or len(ws) == 0:
                    continue  # wordless doc: no row (as before)
                s = p = 0
                for w0 in ws:
                    w = w0[:clip]  # == substring(w0, 1, clip): ASCII
                    r = memo.get(w)
                    if r is None:
                        r = _viterbi(w, v)
                        memo[w] = r
                    s += r[0]
                    p += r[1]
                ids.append(doc_id)
                nw.append(len(ws))
                sc.append(s)
                np_.append(p)
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "n_words": pd.Series(nw, dtype="int64"),
                    "uni_score": pd.Series(sc, dtype="int64"),
                    "n_pieces": pd.Series(np_, dtype="int64"),
                }
            )

    return toks.mapInPandas(
        dp,
        schema=(
            f"doc_id {id_type}, n_words bigint, "
            "uni_score bigint, n_pieces bigint"
        ),
    ).select(
        "doc_id", "n_words", "uni_score", "n_pieces",
        ratio4(F.col("n_pieces"), F.col("n_words")).alias(
            "pieces_per_word4"
        ),
    )


def oracle_unigram_tokenize_stats(
    vocab: tuple = DEFAULT_UNIGRAM_VOCAB,
    max_word_len: int = 16,
    table: str = "documents",
) -> str:
    """DuckDB replica: the Viterbi DP unrolled one CTE level per word
    position (d1..d<max_word_len>), candidates per level = one join per
    piece length, winner by (score DESC, n_pieces ASC) — the exact tie
    order the Spark-side DP uses. Every level is MATERIALIZED: DuckDB
    inlines plain CTEs, and a 16-level DP whose every level references
    up to 4 earlier ones expands ~4^16 scans without it (the DuckDB
    face of CLAUDE.md lesson 16)."""
    from navigator_document_parser_spark.operators import sql_quote

    _vocab_dict(vocab)  # same validation, same failure surface
    vals = ", ".join(
        f"({sql_quote(p)}, {int(s)})" for p, s in vocab
    )
    levels = []
    for k in range(1, max_word_len + 1):
        cands = []
        for j in range(1, min(_MAX_PIECE, k) + 1):
            prev = "d0" if k - j == 0 else f"d{k - j}"
            cands.append(f"""
              SELECT p.w, p.score + v.score AS score,
                     p.np + 1 AS np
              FROM {prev} p JOIN v
                ON substring(p.w, {k - j + 1}, {j}) = v.piece
              WHERE length(p.w) >= {k}""")
        union = " UNION ALL ".join(cands)
        levels.append(f"""
        d{k} AS MATERIALIZED (
          SELECT w, score, np FROM (
            SELECT w, score, np, row_number() OVER (PARTITION BY w
                     ORDER BY score DESC, np ASC) AS rn
            FROM ({union})
          ) WHERE rn = 1
        )""")
        # d<k> holds the best prefix-of-length-k value per word
    finals = " UNION ALL ".join(
        f"SELECT w, score AS w_score, np AS w_pieces FROM d{k} "
        f"WHERE length(w) = {k}"
        for k in range(1, max_word_len + 1)
    )
    ppw = ratio4_sql("SUM(w_pieces)", "count(*)")
    return f"""
        WITH v(piece, score) AS (VALUES {vals}),
        words AS MATERIALIZED (
          SELECT doc_id,
                 substring(unnest(list_filter(string_split_regex(
                   lower(text), '[^a-z0-9]+'), x -> x <> '')),
                   1, {int(max_word_len)}) AS w
          FROM {table}
        ),
        d0 AS MATERIALIZED (
          SELECT DISTINCT w, 0 AS score, 0 AS np FROM words
        ),
        {", ".join(levels)},
        scored AS ({finals})
        SELECT doc_id,
               CAST(count(*) AS BIGINT) AS n_words,
               CAST(SUM(w_score) AS BIGINT) AS uni_score,
               CAST(SUM(w_pieces) AS BIGINT) AS n_pieces,
               {ppw} AS pieces_per_word4
        FROM words JOIN scored USING (w)
        GROUP BY doc_id
    """
