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


def test_bloom_bitmaps_or_merge(spark):
    """Mergeability claim: bit_or of two snapshots' bitmaps equals the
    bitmap of the union — the property that lets a production store
    maintain the filter incrementally."""
    from pyspark.sql import functions as F2
    from navigator_document_parser_spark.operators.dedup import (
        bloom_words,
    )

    a = spark.createDataFrame(
        [(f"doc a {i}",) for i in range(40)], "text string"
    )
    b = spark.createDataFrame(
        [(f"doc b {i}",) for i in range(40)], "text string"
    )
    both = a.unionByName(b)
    wa = bloom_words(a, m_bits=2048, num_hashes=3)
    wb = bloom_words(b, m_bits=2048, num_hashes=3)
    merged = {
        r["word_idx"]: r["w"]
        for r in wa.unionByName(wb)
        .groupBy("word_idx")
        .agg(F2.expr("bit_or(word)").alias("w"))
        .collect()
    }
    direct = {
        r["word_idx"]: r["word"]
        for r in bloom_words(both, m_bits=2048, num_hashes=3).collect()
    }
    assert merged == direct


def test_hll_registers_max_merge(spark):
    """Union-of-snapshots = max-of-registers: merging two register
    tables by max gives the same estimate as sketching the union."""
    from navigator_document_parser_spark.operators.sketches import (
        hll_distinct,
    )

    a = spark.createDataFrame(
        [("g", f"x{i}") for i in range(300)], "lang string, text string"
    )
    b = spark.createDataFrame(
        [("g", f"y{i}") for i in range(300)]
        + [("g", f"x{i}") for i in range(100)],  # overlap
        "lang string, text string",
    )
    # the operator's register table isn't exposed; the observable
    # mergeability consequence: estimate(union) is NOT the sum of the
    # parts (overlap collapses) and equals the direct union sketch
    direct = hll_distinct(a.unionByName(b), p=8).collect()[0]["estimate"]
    again = hll_distinct(b.unionByName(a), p=8).collect()[0]["estimate"]
    assert direct == again  # order/duplication invariant
    ea = hll_distinct(a, p=8).collect()[0]["estimate"]
    eb = hll_distinct(b, p=8).collect()[0]["estimate"]
    assert direct < ea + eb  # overlap collapsed


def test_index_merge_random_splits(spark):
    from navigator_document_parser_spark.operators.search import (
        index_export,
        index_merge,
    )

    docs = _rand_docs(21, 60, max_len=15)
    df = spark.createDataFrame(docs, "doc_id bigint, text string")
    for frac_mod in (2, 3, 5):
        old = df.filter(f"doc_id % {frac_mod} != 0")
        delta = df.filter(f"doc_id % {frac_mod} = 0")
        merged = {
            (r["term"], r["block_id"]): (r["block_df"], r["postings"])
            for r in index_merge(
                index_export(old, n_shards=4, block_size=16),
                delta, n_shards=4, block_size=16,
            ).collect()
        }
        scratch = {
            (r["term"], r["block_id"]): (r["block_df"], r["postings"])
            for r in index_export(
                df, n_shards=4, block_size=16
            ).collect()
        }
        assert merged == scratch, frac_mod
