"""Connected components + canonical dedup tests (union-find oracle)."""

import random

from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.dedup import (
    connected_components,
    dedup_corpus,
)


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # canonical min representative
    comp = {}
    for n in list(parent):
        r = find(n)
        comp[n] = r
    # min-id per root
    roots = {}
    for n, r in comp.items():
        roots.setdefault(r, []).append(n)
    out = {}
    for r, members in roots.items():
        m = min(members)
        for n in members:
            out[n] = m
    return out


def test_components_match_union_find_random(spark):
    rng = random.Random(42)
    pairs = sorted({
        tuple(sorted(rng.sample(range(60), 2))) for _ in range(70)
    })
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    expected = _union_find(pairs)
    # r7: both the bounded driver fast path (default) and the
    # distributed label rounds (forced via max_driver_edges=0) must
    # produce the identical min-label table
    for mde in (2_000_000, 0):
        got = {
            r["node"]: r["comp"]
            for r in connected_components(
                df, max_driver_edges=mde
            ).collect()
        }
        assert got == expected, f"max_driver_edges={mde}"


def test_components_long_chain(spark):
    # path graph 0-1-2-...-25: diameter stresses the iteration count
    pairs = [(i, i + 1) for i in range(25)]
    df = spark.createDataFrame(pairs, "id_a long, id_b long")
    for mde in (2_000_000, 0):
        got = {
            r["node"]: r["comp"]
            for r in connected_components(
                df, max_driver_edges=mde
            ).collect()
        }
        assert got == {i: 0 for i in range(26)}, f"max_driver_edges={mde}"


def test_graph_driver_fast_paths_match_distributed(spark):
    # r7: label_propagation / bfs_depth / k_core grew the same bounded
    # driver fast path as connected_components. Pin fast == distributed
    # (max_driver_edges=0 forces the join-round shape) on a random
    # directed multigraph with self-loops and asymmetric edges.
    from navigator_document_parser_spark.operators.graph import (
        bfs_depth,
        k_core,
        label_propagation,
    )

    rng = random.Random(7)
    edges = [
        (f"h{rng.randrange(30)}", f"h{rng.randrange(30)}")
        for _ in range(80)
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")

    def rows(d):
        return sorted(tuple(r) for r in d.collect())

    assert rows(label_propagation(df, iterations=3)) == rows(
        label_propagation(df, iterations=3, max_driver_edges=0)
    )
    seeds = ["h0", "h13"]
    assert rows(bfs_depth(df, seeds, rounds=3)) == rows(
        bfs_depth(df, seeds, rounds=3, max_driver_edges=0)
    )
    assert rows(k_core(df, k=2, rounds=3)) == rows(
        k_core(df, k=2, rounds=3, max_driver_edges=0)
    )


def test_dedup_corpus_keeps_one_per_cluster(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}") for i in range(10)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 3), (3, 7), (4, 5)], "id_a long, id_b long"
    )
    kept = sorted(r["doc_id"] for r in dedup_corpus(docs, pairs).collect())
    # cluster {1,3,7} -> keep 1; {4,5} -> keep 4; others untouched
    assert kept == [0, 1, 2, 4, 6, 8, 9]


def test_end_to_end_minhash_to_canonical(spark):
    from navigator_document_parser_spark.operators.dedup import (
        minhash_dedup_pairs,
    )

    rows = []
    for i in range(20):
        rows.append((i, f"unique document number {i} with its own words "
                        f"about topic {i} and nothing else shared"))
    # plant a duplicate cluster: 20, 21, 22 identical
    dup = "the same exact duplicated text repeated across three documents here"
    rows += [(20, dup), (21, dup), (22, dup)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dedup_pairs(docs, threshold=0.8)
    kept = {r["doc_id"] for r in dedup_corpus(docs, pairs).collect()}
    assert 20 in kept and 21 not in kept and 22 not in kept
    assert all(i in kept for i in range(20))
