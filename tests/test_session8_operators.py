"""Session-8 operators: per-host boilerplate line stripping (and the
rest of this session's batch as it lands).

Behavioral pins against hand-computed references; the DuckDB hash
oracles in __spark_entry__ cover the engine-parity axis."""

from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.text import (
    boilerplate_strip,
)


# ---- boilerplate_strip ------------------------------------------------------

def _rows(df):
    return {r.doc_id: r for r in df.collect()}


def test_boilerplate_strip_drops_frequent_lines(spark):
    docs = [
        (1, "h1", "nav | menu\nunique body one\nfooter (c) h1"),
        (2, "h1", "nav | menu\nunique body two\nfooter (c) h1"),
        (3, "h1", "nav | menu\nunique body three"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    # nav: 3/3 docs -> dropped; footer: 2/3 (66%) >= 60% -> dropped
    assert out[1].text_clean == "unique body one"
    assert out[1].n_kept == 1 and out[1].n_dropped == 2
    assert out[3].text_clean == "unique body three"
    assert out[3].n_kept == 1 and out[3].n_dropped == 1


def test_boilerplate_strip_min_docs_protects_tiny_hosts(spark):
    # a single-doc host hits 100% frequency on every line; min_docs=2
    # must keep everything
    df = spark.createDataFrame(
        [(1, "solo", "only line\nsecond line")], ["doc_id", "host", "text"]
    )
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=50))
    assert out[1].n_dropped == 0
    assert out[1].text_clean == "only line\nsecond line"


def test_boilerplate_strip_is_per_host(spark):
    # the same line is boilerplate on h1 but unique on h2
    docs = [
        (1, "h1", "promo line\nbody a"),
        (2, "h1", "promo line\nbody b"),
        (3, "h2", "promo line\nbody c"),
        (4, "h2", "other\nbody d"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    assert out[1].text_clean == "body a"
    assert out[3].text_clean == "promo line\nbody c"


def test_boilerplate_strip_trims_and_drops_blank_lines(spark):
    # ' nav ' and 'nav' are the same line after trim; blank lines count
    # for neither kept nor dropped
    docs = [
        (1, "h1", "  nav  \n\nbody one\n"),
        (2, "h1", "nav\nbody two"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    assert out[1].n_kept == 1 and out[1].n_dropped == 1
    assert out[1].text_clean == "body one"


def test_boilerplate_strip_order_preserved(spark):
    docs = [
        (1, "h1", "z last\nbp\na first"),
        (2, "h1", "bp\nmiddle"),
        (3, "h1", "bp\nend"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "host", "text"])
    out = _rows(boilerplate_strip(df, min_docs=2, threshold_pct=60))
    # original position order, NOT lexicographic
    assert out[1].text_clean == "z last\na first"


# ---- keyness_terms ----------------------------------------------------------

def test_keyness_known_g2_value(spark):
    import math

    docs = [
        (1, "en", "alpha alpha beta"),
        (2, "fr", "beta beta"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    from navigator_document_parser_spark.operators.text import keyness_terms

    out = {r.term: r for r in keyness_terms(df, focus="en", k=10).collect()}
    # alpha: a=2, b=0, Na=3, Nb=2 -> G2 = 2 * 2*ln((2*5)/(3*2))
    expect = round(2.0 * 2.0 * math.log(10.0 / 6.0), 4)
    assert out["alpha"].g2 == expect
    assert out["alpha"].direction == "focus"
    # beta: a=1/3 vs b=2/2 -> rest-leaning
    assert out["beta"].direction == "rest"
    # ranking: alpha's g2 > beta's
    assert out["alpha"].rank < out["beta"].rank


def test_keyness_symmetric_balanced_term_scores_zero(spark):
    # identical rates in both corpora -> expected == observed -> G2 = 0
    docs = [
        (1, "en", "same same"),
        (2, "fr", "same same"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    from navigator_document_parser_spark.operators.text import keyness_terms

    row = keyness_terms(df, focus="en", k=5).collect()[0]
    assert row.g2 == 0.0


def test_keyness_k_limits_output(spark):
    docs = [(i, "en" if i % 2 else "fr", f"w{i} w{i} common")
            for i in range(20)]
    df = spark.createDataFrame(docs, ["doc_id", "lang", "text"])
    from navigator_document_parser_spark.operators.text import keyness_terms

    rows = keyness_terms(df, focus="en", k=7).collect()
    assert len(rows) == 7
    assert sorted(r.rank for r in rows) == list(range(1, 8))


# ---- recrawl_schedule -------------------------------------------------------

def test_recrawl_tiers_and_lambda(spark):
    import math

    rows = []
    # u_hot: 4/4 changed; u_half: 2/4; u_quarter: 1/4; u_cold: 0/4
    for v in range(4):
        rows.append(("u_hot", v, True))
        rows.append(("u_half", v, v < 2))
        rows.append(("u_quarter", v, v < 1))
        rows.append(("u_cold", v, False))
    df = spark.createDataFrame(rows, ["url", "visit_idx", "changed"])
    from navigator_document_parser_spark.operators.urls import (
        recrawl_schedule,
    )

    out = {r.url: r for r in recrawl_schedule(df).collect()}
    assert out["u_hot"].revisit == "hourly"
    assert out["u_half"].revisit == "daily"
    assert out["u_quarter"].revisit == "weekly"
    assert out["u_cold"].revisit == "monthly"
    # Cho & Garcia-Molina: -ln((n - x + 0.5) / (n + 0.5))
    assert out["u_hot"].lambda4 == round(-math.log(0.5 / 4.5), 4)
    assert out["u_cold"].lambda4 == 0.0  # +0.0, never -0.0
    assert out["u_cold"].n_visits == 4 and out["u_cold"].n_changes == 0


# ---- dust_rules -------------------------------------------------------------

def test_dust_rules_verdicts(spark):
    pages = [
        ("https://x/a", "h1"), ("https://x/a/index.html", "h1"),
        ("https://x/b", "h2"), ("https://x/b/index.html", "h2"),
        ("https://x/c", "h3"), ("https://x/c/index.html", "HX"),
        ("https://x/d?sid=1", "h4"), ("https://x/d", "h4"),
        ("https://x/e?sid=2&ref=r", "h5"), ("https://x/e?sid=2", "h5"),
    ]
    df = spark.createDataFrame(pages, ["url", "content_hash"])
    from navigator_document_parser_spark.operators.urls import dust_rules

    out = {r.rule: r for r in dust_rules(df, min_support=1).collect()}
    # index.html: 3 applications, one with DIFFERENT content -> invalid
    ix = out["strip-index"]
    assert (ix.n_applicable, ix.n_same, ix.n_diff) == (3, 2, 1)
    assert not ix.valid
    # sid strip: d?sid=1 -> d (same hash); the two e-urls rewrite to
    # uncrawled targets (unresolved, not counterevidence)
    sid = out["strip-param:sid"]
    assert (sid.n_applicable, sid.n_same, sid.n_diff) == (3, 1, 0)
    assert sid.valid
    # ref strip: e?sid=2&ref=r -> e?sid=2, crawled, same hash
    ref = out["strip-param:ref"]
    assert (ref.n_applicable, ref.n_same, ref.n_diff) == (1, 1, 0)
    assert ref.valid


def test_dust_rules_min_support_gates_valid(spark):
    pages = [
        ("https://x/e?sid=2&ref=r", "h5"), ("https://x/e?sid=2", "h5"),
    ]
    df = spark.createDataFrame(pages, ["url", "content_hash"])
    from navigator_document_parser_spark.operators.urls import dust_rules

    out = {r.rule: r for r in dust_rules(df, min_support=2).collect()}
    assert out["strip-param:ref"].n_same == 1
    assert not out["strip-param:ref"].valid


# ---- cocitation_topk --------------------------------------------------------

def test_cocitation_counts_and_ranks(spark):
    edges = [
        ("s1", "a"), ("s1", "b"),
        ("s2", "a"), ("s2", "b"),
        ("s3", "a"), ("s3", "c"),
        ("s3", "a"),  # duplicate edge must collapse
    ]
    df = spark.createDataFrame(edges, ["src_host", "dst_host"])
    from navigator_document_parser_spark.operators.graph import (
        cocitation_topk,
    )

    out = {(r.host, r.related): r
           for r in cocitation_topk(df, k=3).collect()}
    assert out[("a", "b")].n_shared == 2
    assert out[("b", "a")].n_shared == 2
    assert out[("a", "c")].n_shared == 1
    assert out[("a", "b")].rank == 1 and out[("a", "c")].rank == 2
    assert ("b", "c") not in out


def test_cocitation_hub_cap_drops_directory_pages(spark):
    edges = [
        ("s1", "a"), ("s1", "b"),
        ("hub", "a"), ("hub", "b"), ("hub", "c"), ("hub", "d"),
    ]
    df = spark.createDataFrame(edges, ["src_host", "dst_host"])
    from navigator_document_parser_spark.operators.graph import (
        cocitation_topk,
    )

    out = {(r.host, r.related): r.n_shared
           for r in cocitation_topk(df, k=5, max_out=3).collect()}
    # hub (out-degree 4 > 3) is excluded: only s1's wedge remains
    assert out == {("a", "b"): 1, ("b", "a"): 1}


# ---- lsh_audit --------------------------------------------------------------

def test_lsh_audit_perfect_on_exact_duplicates(spark):
    x = "alpha beta gamma delta epsilon zeta"
    y = "one two three four five six seven"
    z = "totally different words entirely here now"
    docs = [(1, x), (2, x), (3, x), (4, y), (5, y), (6, z)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from navigator_document_parser_spark.operators.dedup import lsh_audit

    row = lsh_audit(df, num_hashes=4, bands=2, threshold=0.5).collect()[0]
    # truth: the 3 X-pairs + 1 Y-pair; identical docs share every band
    # key so all 4 are candidates; disjoint docs share no shingle
    assert row.n_truth == 4
    assert row.n_true_positive == 4
    assert row.recall4 == 1.0
    assert row.n_candidates >= 4
    assert row.precision4 <= 1.0


def test_lsh_audit_tp_bounded_by_both_sets(spark):
    docs = [(i, f"w{i} w{i+1} w{i+2} w{i+3} shared common tail words")
            for i in range(12)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from navigator_document_parser_spark.operators.dedup import lsh_audit

    row = lsh_audit(df, num_hashes=4, bands=2, threshold=0.2).collect()[0]
    assert row.n_true_positive <= row.n_truth
    assert row.n_true_positive <= row.n_candidates


# ---- sorted_neighborhood_pairs ---------------------------------------------

def test_snm_finds_prefix_clones(spark):
    docs = [
        (1, "the cat sat on the mat today fine"),
        (2, "the cat sat on the mat today ok"),
        (3, "zebra xylophone quite different text body"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from navigator_document_parser_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    out = {(r.id_a, r.id_b): r for r in
           sorted_neighborhood_pairs(df, window=2, threshold=0.3).collect()}
    assert (1, 2) in out
    assert out[(1, 2)].rn_dist == 1
    assert out[(1, 2)].jaccard_sim > 0.5


def test_snm_window_bounds_the_neighborhood(spark):
    # identical 16-char sort key for all three (ties break by id), so
    # the order is 1, 2, 3: docs 1 and 3 are near-dups at sort
    # distance 2 with the dissimilar doc 2 between them
    docs = [
        (1, "prefix shared words alpha beta gamma delta"),
        (2, "prefix shared words zzz unrelated content entirely"),
        (3, "prefix shared words alpha beta gamma epsilon"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from navigator_document_parser_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    w1 = sorted_neighborhood_pairs(df, window=1, threshold=0.4).collect()
    assert all((r.id_a, r.id_b) != (1, 3) for r in w1)
    w2 = {(r.id_a, r.id_b): r.rn_dist for r in
          sorted_neighborhood_pairs(df, window=2, threshold=0.4).collect()}
    assert w2.get((1, 3)) == 2


def test_snm_empty_docs_never_pair(spark):
    docs = [(1, ""), (2, ""), (3, "real content words here now")]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from navigator_document_parser_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    # empty-vs-empty is degenerate (union 0) and must never pair, even
    # at threshold 0; empty-vs-real pairs carry jaccard 0 and vanish at
    # any positive threshold
    at0 = {(r.id_a, r.id_b)
           for r in sorted_neighborhood_pairs(
               df, window=4, threshold=0.0).collect()}
    assert (1, 2) not in at0 and (2, 1) not in at0
    assert sorted_neighborhood_pairs(df, window=4, threshold=0.1).count() == 0


# ---- extract_html_tables ----------------------------------------------------

def test_html_tables_structure_and_headers(spark):
    html = (
        '<html><TABLE border="1">\n'
        "  <tr><th>Name</th><th>Age</th></tr>\n"
        "  <tr><td>Ada</td><td>36</td></tr>\n"
        "</TABLE>\n"
        "<table><tr><td><b>only</b> cell</td></tr></table></html>"
    )
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    from navigator_document_parser_spark.operators.tables import (
        extract_html_tables,
    )

    out = {(r.table_idx, r.row_idx, r.col_idx): r
           for r in extract_html_tables(df).collect()}
    assert out[(0, 0, 0)].cell_text == "Name"
    assert out[(0, 0, 0)].is_header
    assert out[(0, 1, 1)].cell_text == "36"
    assert not out[(0, 1, 1)].is_header
    # inner markup stripped, second table indexed 1
    assert out[(1, 0, 0)].cell_text == "only cell"
    assert len(out) == 5


def test_html_tables_no_table_yields_nothing(spark):
    df = spark.createDataFrame(
        [(1, "<html><p>prose only</p></html>"), (2, "")],
        ["doc_id", "html"],
    )
    from navigator_document_parser_spark.operators.tables import (
        extract_html_tables,
    )

    assert extract_html_tables(df).count() == 0


def test_html_tables_multiline_cells_flattened(spark):
    html = "<table><tr>\n<td>line\nbroken   cell</td>\n</tr></table>"
    df = spark.createDataFrame([(7, html)], ["doc_id", "html"])
    from navigator_document_parser_spark.operators.tables import (
        extract_html_tables,
    )

    row = extract_html_tables(df).collect()[0]
    assert row.cell_text == "line broken   cell"


# ---- search_eval ------------------------------------------------------------

def test_search_eval_hand_computed_ndcg(spark):
    import math

    hits = spark.createDataFrame(
        [(0, 10, 1), (0, 11, 2), (0, 12, 3)],
        ["query_id", "doc_id", "rank"],
    )
    rels = spark.createDataFrame(
        [(0, 10, 0), (0, 11, 2), (0, 12, 1)],
        ["query_id", "doc_id", "rel"],
    )
    from navigator_document_parser_spark.operators.search import search_eval

    row = search_eval(hits, rels, k=5).collect()[0]
    w = [1.0 / math.log2(i + 1) for i in range(1, 6)]
    dcg = 0 * w[0] + 3 * w[1] + 1 * w[2]
    idcg = 3 * w[0] + 1 * w[1] + 0 * w[2]
    assert row.ndcg5 == round(dcg / idcg, 4)
    assert row.mrr5 == 0.5  # first relevant at rank 2
    assert row.n_rel == 2


def test_search_eval_perfect_ranking_is_one(spark):
    hits = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 2)], ["query_id", "doc_id", "rank"]
    )
    rels = spark.createDataFrame(
        [(1, 20, 3), (1, 21, 1)], ["query_id", "doc_id", "rel"]
    )
    from navigator_document_parser_spark.operators.search import search_eval

    row = search_eval(hits, rels, k=5).collect()[0]
    assert row.ndcg5 == 1.0 and row.mrr5 == 1.0


def test_search_eval_no_relevant_docs_is_null(spark):
    hits = spark.createDataFrame(
        [(2, 30, 1)], ["query_id", "doc_id", "rank"]
    )
    rels = spark.createDataFrame(
        [(2, 30, 0)], ["query_id", "doc_id", "rel"]
    )
    from navigator_document_parser_spark.operators.search import search_eval

    row = search_eval(hits, rels, k=5).collect()[0]
    assert row.ndcg5 is None and row.mrr5 is None and row.n_rel == 0


# ---- token_entropy ----------------------------------------------------------

def test_token_entropy_known_values(spark):
    docs = [
        (1, "a a b b"),        # two symbols, uniform -> 1 bit
        (2, "a b c d"),        # four distinct -> 2 bits
        (3, "a a a a"),        # degenerate -> 0 bits
        (4, ""),               # empty -> no row
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    from navigator_document_parser_spark.operators.text import token_entropy

    out = {r.doc_id: r for r in token_entropy(df).collect()}
    assert out[1].entropy4 == 1.0
    assert out[2].entropy4 == 2.0
    assert out[3].entropy4 == 0.0
    assert 4 not in out
    assert out[1].n_tokens == 4 and out[1].n_distinct == 2


def test_token_entropy_skewed_below_uniform(spark):
    df = spark.createDataFrame(
        [(1, "x x x x x x y"), (2, "p q r s t u v")],
        ["doc_id", "text"],
    )
    from navigator_document_parser_spark.operators.text import token_entropy

    out = {r.doc_id: r.entropy4 for r in token_entropy(df).collect()}
    assert out[1] < out[2]  # stuffing scores lower than diverse text


def test_search_eval_n_rel_not_capped_at_k(spark):
    hits = spark.createDataFrame(
        [(3, d, r) for r, d in enumerate(range(40, 43), start=1)],
        ["query_id", "doc_id", "rank"],
    )
    rels = spark.createDataFrame(
        [(3, d, 1) for d in range(40, 48)],  # 8 relevant judged docs
        ["query_id", "doc_id", "rel"],
    )
    from navigator_document_parser_spark.operators.search import search_eval

    row = search_eval(hits, rels, k=5).collect()[0]
    assert row.n_rel == 8  # total, not min(8, k)


def test_html_tables_th_inside_data_row_not_header(spark):
    html = "<table><tr><td>val</td><th>label</th></tr></table>"
    df = spark.createDataFrame([(1, html)], ["doc_id", "html"])
    from navigator_document_parser_spark.operators.tables import (
        extract_html_tables,
    )

    rows = extract_html_tables(df).collect()
    assert all(not r.is_header for r in rows)  # first cell tag is <td>


# ---- trustrank --------------------------------------------------------------

def test_trustrank_matches_numpy_power_iteration(spark):
    import numpy as np

    edges = [("a", "b", 2.0), ("b", "c", 1.0), ("a", "c", 1.0),
             ("x", "a", 1.0)]
    df = spark.createDataFrame(edges, ["src_host", "dst_host", "n_links"])
    from navigator_document_parser_spark.operators.graph import trustrank

    seeds, d, iters = ["a"], 0.85, 5
    out = {r.node: r.rank
           for r in trustrank(df, seeds=seeds, damping=d,
                              iterations=iters).collect()}

    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    idx = {n: i for i, n in enumerate(nodes)}
    n = len(nodes)
    A = np.zeros((n, n))
    outw = {}
    for s, t, w in edges:
        outw[s] = outw.get(s, 0.0) + w
    for s, t, w in edges:
        A[idx[t], idx[s]] += w / outw[s]
    tvec = np.zeros(n)
    for s in seeds:
        tvec[idx[s]] = 1.0 / len(seeds)
    dangling = np.array([1.0 if nd not in outw else 0.0 for nd in nodes])
    r = tvec.copy()
    for _ in range(iters):
        dm = float(r @ dangling)
        r = (1 - d) * tvec + d * (A @ r + dm * tvec)
    for nd in nodes:
        assert abs(out[nd] - r[idx[nd]]) < 1e-9, nd
    # probability mass conserved
    assert abs(sum(out.values()) - 1.0) < 1e-9


def test_trustrank_unreachable_component_gets_zero(spark):
    edges = [("a", "b", 1.0), ("c", "d", 1.0)]
    df = spark.createDataFrame(edges, ["src_host", "dst_host", "n_links"])
    from navigator_document_parser_spark.operators.graph import trustrank

    out = {r.node: r.rank
           for r in trustrank(df, seeds=["a"], iterations=4).collect()}
    assert out["c"] == 0.0 and out["d"] == 0.0
    assert out["a"] > 0 and out["b"] > 0


def test_trustrank_empty_seeds_rejected(spark):
    import pytest

    df = spark.createDataFrame([("a", "b", 1.0)],
                               ["src_host", "dst_host", "n_links"])
    from navigator_document_parser_spark.operators.graph import trustrank

    with pytest.raises(ValueError):
        trustrank(df, seeds=[])
