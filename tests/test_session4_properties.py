"""Property-style invariants for the round-4 session-2 operators.

Spark-side properties run BATCHED (one DataFrame of many generated
cases per assertion); the pure-Python comparisons (phrase scan, Morton
interleave, BM25) get deterministic pseudo-random corpora instead of
per-example Spark actions.
"""

import random
import re
import string

from pyspark.sql import functions as F  # noqa: F401

VOCAB = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "the", "a"]


def _rand_docs(seed, n_docs, max_len=30):
    rng = random.Random(seed)
    return [
        (i, " ".join(rng.choice(VOCAB) for _ in range(rng.randint(0, max_len))))
        for i in range(n_docs)
    ]


def test_phrase_search_matches_naive_scan_on_random_corpus(spark):
    from navigator_document_parser_spark.operators.search import (
        phrase_search,
    )

    docs = _rand_docs(42, 60)
    phrases = [
        (0, ["the", "a"]),
        (1, ["alpha", "alpha"]),
        (2, ["beta", "gamma", "delta"]),
        (3, ["zeta"]),
    ]
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    got = {
        (r["phrase_id"], r["doc_id"]): (r["n_matches"], r["first_pos"])
        for r in phrase_search(df, phrases).collect()
    }
    want = {}
    for pid, toks in phrases:
        for did, text in docs:
            words = text.split()
            hits = [
                i
                for i in range(len(words) - len(toks) + 1)
                if words[i : i + len(toks)] == toks
            ]
            if hits:
                want[(pid, did)] = (len(hits), hits[0])
    assert got == want


def test_normalize_output_has_no_dirty_chars(spark):
    from navigator_document_parser_spark.operators.text import (
        normalize_text,
    )

    rng = random.Random(7)
    dirty_pool = (
        list(string.ascii_letters)
        + [" ", "\t", "\r", "\n", "\x00", "\x1f", "​", "﻿",
           " ", "‘", "“", "–", "—"]
    )
    rows = [
        ("".join(rng.choice(dirty_pool) for _ in range(rng.randint(0, 60))),)
        for _ in range(200)
    ]
    df = spark.createDataFrame(rows, "text string")
    out = [
        r["n"]
        for r in df.select(
            normalize_text(F.col("text")).alias("n")
        ).collect()
    ]
    bad = re.compile(
        "[\x00-\x08\x0b\x0c\x0e-\x1f\x7f​-‍﻿"
        " ‘’“”–—\r\t]"
    )
    for n in out:
        assert not bad.search(n), repr(n)
        assert not re.search("  ", n), repr(n)       # no space runs
        assert n == n.strip(" \n"), repr(n)          # trimmed
        assert not re.search(r" \n| $", n) or n == "", repr(n)


def test_cdc_chunk_token_accounting_random(spark):
    from navigator_document_parser_spark.operators.dedup import cdc_dedup

    docs = _rand_docs(13, 80, max_len=40)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in cdc_dedup(df, avg_chunk=4).collect()}
    for did, text in docs:
        n_tokens = len(text.split())
        if n_tokens == 0:
            assert did not in out
        else:
            assert out[did]["n_tokens"] == n_tokens


def test_fetch_schedule_total_and_ownership_random(spark):
    from navigator_document_parser_spark.operators.urls import (
        fetch_schedule,
    )

    rng = random.Random(99)
    rows = [
        (f"https://h{rng.randint(0, 30)}.org/p{i}",
         f"h{i % 31}.org")
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, "url string, host string")
    out = fetch_schedule(df, n_workers=7).collect()
    assert len(out) == 300
    owners = {}
    for r in out:
        owners.setdefault(r["host"], set()).add(r["worker"])
    assert all(len(v) == 1 for v in owners.values())


def test_bloom_membership_superset_of_exact(spark):
    """At ANY filter size the bloom-hit set contains every true dup —
    the no-false-negative property under random corpora and tiny m."""
    from navigator_document_parser_spark.operators.dedup import (
        bloom_snapshot_filter,
    )

    docs = _rand_docs(5, 50, max_len=10)
    old = spark.createDataFrame(docs, "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(i + 1000, t) for i, t in docs[:25]]
        + [(i + 2000, t + " novel tail") for i, t in docs[25:]],
        "doc_id bigint, text string",
    )
    for m_bits in (32, 256, 1 << 14):
        rows = bloom_snapshot_filter(
            new, old, m_bits=m_bits, num_hashes=3
        ).collect()
        for r in rows:
            if r["exact_dup"]:
                assert r["bloom_hit"], (m_bits, r)
