"""Edit-distance operators: SymSpell deletion-neighborhood blocking.

Web corpora are full of strings that differ by one keystroke — titles
re-typed by mirrors, URLs with a dropped character, query-log typos.
Finding all pairs within Levenshtein distance d is quadratic if done
naively; the SymSpell observation (Garbe's symspell, public) makes it
a pure equi-join: if lev(a, b) <= d then some string is reachable from
BOTH a and b by at most d character deletions, so blocking on the
"delete-neighborhood" (the string itself plus every <=d-deletion
variant) has 100% recall and the exact ``levenshtein`` verify runs
only inside shared blocks.

Engine parity is exact: deletion variants are substring concatenation
(identical in Spark and DuckDB — probed), and both engines implement
classic unit-cost Levenshtein, so distances are integers with no
rounding surface. ASCII input is the contract (the repo-wide lesson-17
discipline: Spark strings are codepoint-indexed, DuckDB's levenshtein
is byte-oriented on multi-byte text).

Reference behavior anchor: the reference pipeline has no fuzzy string
matching at all (its dedup key is the exact (url, warc_ts) pair,
cli/parse_htmls.py); this family is part of the beyond-reference
training-data toolkit alongside dedup_minhash / dedup_simhash.

100 TB shape: one corpus scan, ~(len+1) variant rows per string at
d=1 (one staged explode more at d=2), one equi-join on the variant,
one pair-dedup aggregate. No all-pairs path; block sizes are bounded
by true near-duplicate group sizes (a pathological mega-cluster —
thousands of docs sharing one title — is quadratic in ITS size only,
the same bound every pair-enumerating dedup here documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _variants1_sql(col: str) -> str:
    """Spark SQL: the <=1-deletion neighborhood of ``col`` (the string
    itself first, then each single-character deletion), distinct.

    Spark sequence(1, 0) REVERSES instead of returning empty (the
    trap_detect lesson), so the empty string is guarded explicitly.
    """
    return (
        f"CASE WHEN length({col}) < 1 THEN array({col}) "
        f"ELSE array_distinct(concat(array({col}), "
        f"transform(sequence(1, length({col})), "
        f"p -> concat(substring({col}, 1, p-1), "
        f"substring({col}, p+1, 1000000))))) END"
    )


def _duck_variants1(col: str) -> str:
    """DuckDB: same <=1-deletion neighborhood (range(1,1) is empty, so
    no guard is needed, but keep the CASE for shape parity)."""
    return (
        f"CASE WHEN length({col}) < 1 THEN [{col}] "
        f"ELSE list_distinct(list_concat([{col}], "
        f"list_transform(range(1, length({col})+1), "
        f"p -> substr({col}, 1, p-1) || substr({col}, p+1, 1000000)))) END"
    )


def _delete_neighborhood(
    df: DataFrame, id_col: str, str_col: str, max_dist: int
) -> DataFrame:
    """(id, v) rows: every <=max_dist-deletion variant v of s.

    NARROW on purpose (VERDICT r5 #6): the variant rows feed the
    operator's only big shuffle, and carrying the source string s
    alongside each variant scales shuffle bytes as ~L^2 per string at
    d=1 (L^3 at d=2). Verify strings are fetched back BY ID after the
    candidate set is formed — candidates are bounded by true
    near-duplicate block sizes, the variant explode is not.

    d=2 is a STAGED second explode over the d=1 rows (never a nested
    HOF over a computed array — lesson 9), deduped per (id, v).

    Emitted ``v`` is xxhash64 of the variant, not the string (r7): the
    join only needs EQUALITY of variants, and a 64-bit collision can
    only ADD candidate pairs — which the callers' exact levenshtein
    verify removes — so recall and results are unchanged while the
    operator's largest shuffle carries 8-byte longs instead of
    variant strings (~L bytes each, L^2..L^3 rows per string).
    """
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    lvl1 = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.expr(_variants1_sql(str_col))).alias("v"),
    )
    if max_dist == 1:
        # already (id, v)-distinct: _variants1_sql wraps the per-row
        # array in array_distinct and each id contributes one row — a
        # dropDuplicates here would shuffle the operator's largest
        # intermediate for nothing (review finding). A same-id hash
        # collision merely duplicates a candidate row; the pair-level
        # dropDuplicates downstream absorbs it.
        return lvl1.select("id", F.xxhash64("v").alias("v"))
    # variants1(v) contains v itself, so lvl2 is a superset of lvl1
    lvl2 = lvl1.select(
        "id", F.explode(F.expr(_variants1_sql("v"))).alias("v")
    )
    return lvl2.select("id", F.xxhash64("v").alias("v")).dropDuplicates(
        ["id", "v"]
    )


def dedup_editdist(
    df: DataFrame,
    id_col: str = "doc_id",
    str_col: str = "title",
    max_dist: int = 1,
) -> DataFrame:
    """All pairs within Levenshtein distance ``max_dist`` — EXACT
    (the deletion-neighborhood block has 100% recall; ``levenshtein``
    verifies inside blocks), pinned against brute force in pytest.

    Returns (id_a, id_b, dist) with id_a < id_b, dist in [0, max_dist].
    """
    base = df.select(F.col(id_col).alias("id"), F.col(str_col).alias("s"))
    vs = _delete_neighborhood(df, id_col, str_col, max_dist)
    # feeds both sides of the self-join: materialize once (lessons 3/20)
    vs = vs.localCheckpoint(eager=True)
    a = vs.select(F.col("id").alias("id_a"), "v")
    b = vs.select(F.col("id").alias("id_b"), "v")
    # candidate pairs are NARROW (ids only) through the variant join;
    # strings join back by id for the bounded verify set (VERDICT r5 #6)
    cand = (
        a.join(b, on="v")
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    pairs = (
        cand.join(base.select(F.col("id").alias("id_a"),
                              F.col("s").alias("s_a")), "id_a")
        .join(base.select(F.col("id").alias("id_b"),
                          F.col("s").alias("s_b")), "id_b")
        .withColumn("dist", F.levenshtein("s_a", "s_b").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
    )
    return pairs.select("id_a", "id_b", "dist")


def oracle_dedup_editdist(titles_sql: str, max_dist: int = 1) -> str:
    """DuckDB replica of dedup_editdist; ``titles_sql`` yields
    (id, s). Same staged neighborhood, same join, same verify."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")
    lvl1 = f"""
        SELECT id, s, unnest({_duck_variants1('s')}) AS v
        FROM t
    """
    if max_dist == 1:
        nbhd = f"SELECT DISTINCT id, s, v FROM ({lvl1})"
    else:
        nbhd = f"""
            SELECT DISTINCT id, s, v FROM (
              SELECT id, s, unnest({_duck_variants1('v')}) AS v
              FROM ({lvl1})
            )
        """
    return f"""
        WITH t AS ({titles_sql}),
        nb AS ({nbhd}),
        pairs AS (
          SELECT DISTINCT a.id AS id_a, a.s AS s_a,
                          b.id AS id_b, b.s AS s_b
          FROM nb a JOIN nb b ON a.v = b.v AND a.id < b.id
        )
        SELECT id_a, id_b,
               CAST(levenshtein(s_a, s_b) AS BIGINT) AS dist
        FROM pairs
        WHERE levenshtein(s_a, s_b) <= {int(max_dist)}
    """


def spell_correct(
    queries: DataFrame,
    vocab: DataFrame,
    max_dist: int = 1,
    qid_col: str = "qid",
    q_col: str = "q",
    term_col: str = "term",
    count_col: str = "cnt",
) -> DataFrame:
    """SymSpell spelling correction: for each query term, the best
    vocabulary term within ``max_dist`` edits — best = (smallest
    distance, then highest corpus count, then lexicographically
    smallest term), the classic query-log / OCR-cleanup ranking.
    Queries with no candidate in range produce no row (the caller's
    left-join decides whether "no suggestion" means keep-as-is).

    Both sides explode their deletion neighborhoods; candidates are
    ONE equi-join on the variant; everything after is integer/string,
    so the operator is oracle-exact.

    100 TB shape: vocab is corpus-derived (heavy tail cut by the
    caller's min-count), queries are the small side; the variant join
    is the only shuffle and the vocab neighborhood can be re-used
    across query batches (it is a pure function of the vocab).

    Returns (qid, q, suggestion, dist, cnt).
    """
    qbase = queries.select(
        F.col(qid_col).alias("id"), F.col(q_col).alias("s")
    )
    qv = _delete_neighborhood(queries, qid_col, q_col, max_dist)
    vbase = vocab.select(
        F.col(term_col).alias("term"),
        F.col(count_col).cast("bigint").alias("cnt"),
    )
    vn = _delete_neighborhood(vbase, "term", "term", max_dist).select(
        F.col("id").alias("term"), "v"
    )
    # the variant join is ids-only on both sides; the query string and
    # the vocab count join back on the bounded candidate set
    cand = (
        qv.join(vn, on="v")
        .select("id", "term")
        .dropDuplicates(["id", "term"])
        .join(vbase, on="term")
        .join(qbase, on="id")
        .withColumn("dist", F.levenshtein("s", "term").cast("bigint"))
        .filter(F.col("dist") <= max_dist)
    )
    w = Window.partitionBy("id").orderBy(
        F.col("dist").asc(), F.col("cnt").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            F.col("id").alias("qid"),
            F.col("s").alias("q"),
            F.col("term").alias("suggestion"),
            "dist",
            F.col("cnt").cast("bigint").alias("cnt"),
        )
    )


def oracle_spell_correct(
    queries_sql: str, vocab_sql: str, max_dist: int = 1
) -> str:
    """DuckDB replica of spell_correct; ``queries_sql`` yields
    (qid, q), ``vocab_sql`` yields (term, cnt)."""
    if max_dist not in (1, 2):
        raise ValueError("max_dist must be 1 or 2")

    def nbhd(src: str, idc: str, sc: str) -> str:
        lvl1 = f"""
            SELECT {idc} AS id, {sc} AS s,
                   unnest({_duck_variants1(sc)}) AS v
            FROM {src}
        """
        if max_dist == 1:
            return f"SELECT DISTINCT id, s, v FROM ({lvl1})"
        return f"""
            SELECT DISTINCT id, s, v FROM (
              SELECT id, s, unnest({_duck_variants1('v')}) AS v
              FROM ({lvl1})
            )
        """
    return f"""
        WITH qs AS ({queries_sql}), vc AS ({vocab_sql}),
        qn AS ({nbhd('qs', 'qid', 'q')}),
        vn AS ({nbhd('vc', 'term', 'term')}),
        cand AS (
          SELECT DISTINCT qn.id AS qid, qn.s AS q,
                          vn.id AS term
          FROM qn JOIN vn ON qn.v = vn.v
        ), scored AS (
          SELECT c.qid, c.q, c.term,
                 CAST(levenshtein(c.q, c.term) AS BIGINT) AS dist,
                 CAST(vc.cnt AS BIGINT) AS cnt
          FROM cand c JOIN vc ON c.term = vc.term
          WHERE levenshtein(c.q, c.term) <= {int(max_dist)}
        )
        SELECT qid, q, term AS suggestion, dist, cnt
        FROM (
          SELECT *, row_number() OVER (PARTITION BY qid
                   ORDER BY dist ASC, cnt DESC, term ASC) AS rn
          FROM scored
        )
        WHERE rn = 1
    """
