"""BM25 ranked retrieval (operators/search.py bm25_search).

Cross-checks the Spark plan against an independent pure-Python BM25
(the DuckDB oracle is the engine gate; this is the third opinion), and
pins the ranking invariants the 4dp rounding is there to protect.
"""

import math

from pyspark.sql import functions as F  # noqa: F401

from navigator_document_parser_spark.operators.search import bm25_search

K1, B = 1.2, 0.75


def _py_bm25(docs, queries, k1=K1, b=B):
    toks = {d: t.lower().split() for d, t in docs}
    n = len(docs)
    sum_dl = sum(len(t) for t in toks.values())
    out = {}
    for qid, terms in queries:
        scores = {}
        for term in sorted(set(terms)):
            dfq = sum(1 for t in toks.values() if term in t)
            if not dfq:
                continue
            idf = math.log(1.0 + (n - dfq + 0.5) / (dfq + 0.5))
            for d, t in toks.items():
                tf = t.count(term)
                if not tf:
                    continue
                dl = len(t)
                avgdl = sum_dl / n
                tfn = (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * dl / avgdl)
                )
                scores[d] = scores.get(d, 0.0) + idf * tfn
        ranked = sorted(
            ((round(s, 4), d) for d, s in scores.items()),
            key=lambda x: (-x[0], x[1]),
        )
        out[qid] = [(r + 1, d, s) for r, (s, d) in enumerate(ranked)]
    return out


def test_bm25_matches_pure_python(spark):
    docs = [
        (1, "join hash join join scan"),
        (2, "join scan scan filter window"),
        (3, "hash hash hash hash hash hash hash hash"),
        (4, "window agg"),
        (5, "totally unrelated words only"),
    ]
    queries = [(0, ["join", "hash"]), (1, ["window"]), (2, ["absent"])]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        qid: sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in rows
        )
        for qid, rows in __import__("itertools").groupby(
            sorted(
                bm25_search(df, queries).collect(),
                key=lambda r: (r["query_id"], r["rank"]),
            ),
            key=lambda r: r["query_id"],
        )
    }
    want = _py_bm25(docs, queries)
    for qid, rows in want.items():
        assert got.get(qid, []) == sorted(rows), (qid, got.get(qid), rows)
    assert 2 not in got  # no doc contains "absent"


def test_bm25_length_normalization_and_tf(spark):
    docs = [
        (1, "term filler filler filler filler filler filler filler"),
        (2, "term filler"),
        (3, "term term filler filler"),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = bm25_search(df, [(0, ["term"])]).collect()
    order = [r["doc_id"] for r in sorted(rows, key=lambda r: r["rank"])]
    # doc 3: highest tf; doc 2: same tf as 1 but much shorter
    assert order == [3, 2, 1]


def test_bm25_top_k_and_ties(spark):
    docs = [(i, "same text") for i in range(1, 8)]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    rows = bm25_search(df, [(0, ["same"])], k=3).collect()
    # identical scores -> ties broken by ascending doc_id, k enforced
    assert [(r["rank"], r["doc_id"]) for r in
            sorted(rows, key=lambda r: r["rank"])] == [(1, 1), (2, 2), (3, 3)]
