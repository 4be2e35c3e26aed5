"""Session-6 operators: shingle containment, histogram quantile sketch,
multi-source BFS crawl depth, feature-hash embeddings, RRF hybrid search.

Behavioral pins against hand-computed references; the DuckDB hash
oracles in __spark_entry__ cover the engine-parity axis."""

from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.dedup import (
    containment_pairs,
)
from navigator_document_parser_spark.operators.graph import bfs_depth
from navigator_document_parser_spark.operators.search import (
    hybrid_search_rrf,
)
from navigator_document_parser_spark.operators.similarity import (
    _fh_token,
    feature_hash_embed,
)
from navigator_document_parser_spark.operators.sketches import quantile_hist


# ---- containment_pairs -----------------------------------------------------

def test_containment_snippet_inside_page(spark):
    snippet = "alpha beta gamma delta epsilon zeta"
    page = snippet + " " + " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, snippet, "en"),
        (1, page, "en"),
        (2, "totally different words here entirely now", "en"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text", "lang"])
    out = containment_pairs(d, threshold=0.9).collect()
    assert len(out) == 1
    r = out[0]
    # every one of the snippet's 4 shingles occurs in the page
    assert (r.id_a, r.id_b) == (0, 1)
    assert r.cont_a == 1.0
    assert r.cont_b < 0.2  # asymmetry: page is barely covered by snippet
    # Jaccard for this pair is inter/(na+nb-inter) = 4/43 — a jaccard
    # threshold that still catches it would drown in noise; that gap is
    # the operator's reason to exist
    assert r.inter == 4


def test_containment_respects_lang_blocking(spark):
    t = "one two three four five six"
    d = spark.createDataFrame(
        [(0, t, "en"), (1, t, "fr")], ["doc_id", "text", "lang"]
    )
    assert containment_pairs(d, threshold=0.1).count() == 0


# ---- quantile_hist ---------------------------------------------------------

def test_quantile_hist_bracket_invariant(spark):
    # est = 2^floor(log2(exact)) must bracket the exact order statistic
    rows = [(i, "en" if i % 2 == 0 else "de", (i * 37) % 1000 + 1)
            for i in range(200)]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    out = quantile_hist(d, group_col="lang", value_col="n_chars").collect()
    assert len(out) == 6  # 2 langs x 3 quantiles
    for r in out:
        assert r.est <= r.exact < 2 * r.est
        assert r.est & (r.est - 1) == 0  # power of two
        assert r.n == 100


def test_quantile_hist_merge_equals_whole(spark):
    # the sketch is mergeable: bucket counts over two halves sum to the
    # whole, so the estimate from the union equals the estimate from
    # running over all rows at once (counts are the only state)
    rows = [(i, "en", (i * 53) % 500 + 1) for i in range(300)]
    d = spark.createDataFrame(rows, ["doc_id", "lang", "n_chars"])
    whole = {
        (r.grp, r.q): (r.est, r.n)
        for r in quantile_hist(d).collect()
    }
    unioned = d.filter("doc_id % 2 = 0").union(d.filter("doc_id % 2 = 1"))
    again = {
        (r.grp, r.q): (r.est, r.n)
        for r in quantile_hist(unioned).collect()
    }
    assert whole == again


# ---- bfs_depth -------------------------------------------------------------

def test_bfs_depth_chain(spark):
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("c", "d"), ("d", "e"), ("x", "y")],
        ["src_host", "dst_host"],
    )
    out = {r.host: r.depth
           for r in bfs_depth(edges, seeds=["a"], rounds=3).collect()}
    # e is 4 hops away -> outside 3 rounds; x/y unreachable from a
    assert out == {"a": 0, "b": 1, "c": 2, "d": 3}


def test_bfs_depth_multi_seed_min(spark):
    edges = spark.createDataFrame(
        [("a", "m"), ("b", "m"), ("m", "z")], ["src_host", "dst_host"]
    )
    out = {r.host: r.depth
           for r in bfs_depth(edges, seeds=["a", "b"], rounds=2).collect()}
    assert out == {"a": 0, "b": 0, "m": 1, "z": 2}


def test_bfs_depth_directed(spark):
    # edges are directed: seed at the sink reaches nothing
    edges = spark.createDataFrame([("a", "b")], ["src_host", "dst_host"])
    out = {r.host: r.depth
           for r in bfs_depth(edges, seeds=["b"], rounds=3).collect()}
    assert out == {"b": 0}


# ---- feature_hash_embed ----------------------------------------------------

def test_feature_hash_matches_python_mirror(spark):
    text = "apple banana apple cherry durian"
    d = spark.createDataFrame([(7, text)], ["doc_id", "text"])
    row = feature_hash_embed(d, dim=16).collect()[0]
    expect = [0] * 16
    for tok in text.split():
        b, s = _fh_token(tok, 16)
        expect[b] += s
    got = [row[f"v{j}"] for j in range(16)]
    assert got == expect
    assert row.norm_sq == sum(x * x for x in expect)


def test_feature_hash_sign_not_bucket_parity(spark):
    # regression guard for the h%2 sign trap: across a vocabulary the
    # sign within even and odd buckets must both mix
    toks = [f"tok{i}" for i in range(200)]
    seen = set()
    for t in toks:
        b, s = _fh_token(t, 16)
        seen.add((b % 2, s))
    assert len(seen) == 4  # (even,+1) (even,-1) (odd,+1) (odd,-1)


# ---- hybrid_search_rrf -----------------------------------------------------

def test_hybrid_rrf_hand_case(spark):
    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple apple"),
        (2, "durian fig grape"),
        (3, "banana banana apple"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    out = hybrid_search_rrf(
        d, [(0, ["apple", "banana"])], k=4, k_cand=4
    ).collect()
    assert [r.rank for r in out] == [1, 2, 3, 4]
    # every doc containing a query term outranks the one that doesn't
    ranks = {r.doc_id: r.rank for r in out}
    assert ranks[2] == 4
    # rrf is bounded by 2/(60+1) (up to the 6dp output rounding) and
    # positive for any ranked doc
    for r in out:
        assert 0 < r.rrf <= 2.0 / 61.0 + 1e-6


def test_hybrid_rrf_fusion_arithmetic(spark):
    # a doc ranked r_s sparse and r_d dense must carry exactly
    # 1/(60+r_s) + 1/(60+r_d) (computed from the component rankings)
    from navigator_document_parser_spark.operators.search import bm25_search

    rows = [
        (0, "apple banana cherry"),
        (1, "apple apple apple"),
        (3, "banana banana apple"),
    ]
    d = spark.createDataFrame(rows, ["doc_id", "text"])
    q = [(0, ["apple", "banana"])]
    sparse = {r.doc_id: r.rank for r in bm25_search(d, q, k=3).collect()}
    out = {r.doc_id: r.rrf
           for r in hybrid_search_rrf(d, q, k=3, k_cand=3).collect()}
    # doc 1: recompute the dense rank from the embedding mirror
    # (all three docs are dense candidates with k_cand=3)
    assert set(out) == {0, 1, 3}
    for doc in out:
        s = sparse.get(doc)
        # dense ranks are a permutation of 1..3; reconstruct by checking
        # out[doc] == round(1/(60+r_s) + 1/(60+r_d), 6) for some r_d
        # (the operator rounds rrf to 6dp, so compare rounded sums, not
        # raw residuals)
        sparse_part = 1.0 / (60 + s) if s else 0.0
        assert any(
            abs(out[doc] - round(sparse_part + 1.0 / (60 + rd), 6)) < 1e-9
            for rd in (1, 2, 3)
        ), (doc, out[doc], sparse_part)
