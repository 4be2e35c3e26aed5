"""Property-style invariants for the session-2 operators.

Spark-side properties run BATCHED: one DataFrame of many generated
cases per assertion (a per-example Spark action would be 100x slower
than the property is worth). The pure-Python robots parser gets real
hypothesis treatment.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators.robots import parse_robots_txt


# ---------------------------------------------------------------------------
# robots.txt parser (pure python -> hypothesis proper)
# ---------------------------------------------------------------------------

path_text = st.text(
    alphabet=string.ascii_lowercase + "/", min_size=1, max_size=12
)


@given(
    st.lists(
        st.tuples(
            st.sampled_from(["*", "googlebot", "crawler"]), path_text
        ),
        min_size=1,
        max_size=6,
    ),
    st.text(alphabet=" \t", max_size=3),
)
@settings(max_examples=100, deadline=None)
def test_robots_parse_ignores_comments_and_whitespace(groups, pad):
    """Injecting comments, blank lines, and field-case changes never
    alters the parsed rules."""
    plain_lines, noisy_lines = [], []
    for agent, path in groups:
        plain_lines += [f"User-agent: {agent}", f"Disallow: {path}"]
        noisy_lines += [
            "",
            f"# about {agent}",
            f"uSeR-AgEnT:{pad}{agent}{pad}",
            f"DISALLOW:{pad}{path}{pad}# note",
        ]
    assert parse_robots_txt("\n".join(plain_lines)) == parse_robots_txt(
        "\n".join(noisy_lines)
    )


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_robots_parse_never_raises(garbage):
    rules = parse_robots_txt(garbage)
    for agent, rule_type, path in rules:
        assert rule_type in ("allow", "disallow") and path


# ---------------------------------------------------------------------------
# batched Spark properties
# ---------------------------------------------------------------------------

def test_url_canonicalization_is_idempotent(spark):
    """canonicalize(canonicalize(u)) == canonicalize(u) over a messy
    generated URL matrix (case x port x params x fragment x slash)."""
    from navigator_document_parser_spark.operators.urls import (
        with_canonical_url,
    )

    rows = []
    i = 0
    for scheme in ("http", "HTTPS"):
        for port in ("", ":80", ":443", ":8080"):
            for q in ("", "?utm_source=a", "?id=7&utm_x=1", "?a=1&b=2"):
                for frag in ("", "#top"):
                    for slash in ("", "/", "///"):
                        rows.append(
                            (i, f"{scheme}://WWW.Ex{i % 5}.ORG{port}"
                                f"/P/q{slash}{q}{frag}")
                        )
                        i += 1
    df = spark.createDataFrame(rows, ["doc_id", "url"])
    once = with_canonical_url(df).select(
        "doc_id", F.col("url_canonical").alias("url")
    )
    twice = with_canonical_url(once).select("doc_id", "url_canonical")
    joined = (
        once.withColumnRenamed("url", "c1")
        .join(twice, "doc_id")
        .filter(F.col("c1") != F.col("url_canonical"))
    )
    assert joined.count() == 0


def test_chunk_windows_partition_and_coverage(spark):
    """stride == window -> chunks partition the token stream exactly
    (concatenation reconstructs the normalized text)."""
    from navigator_document_parser_spark.operators.text import chunk_windows

    rows = [
        (i, " ".join(f"t{i}x{j}" for j in range(n)))
        for i, n in enumerate([1, 3, 7, 8, 9, 15, 16, 17, 40])
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = chunk_windows(df, window=8, stride=8).toPandas()
    rebuilt = (
        out.sort_values(["doc_id", "chunk_idx"])
        .groupby("doc_id")
        .chunk_text.apply(" ".join)
    )
    for i, text in rows:
        assert rebuilt[i] == text
    # chunk_tokens always sums to the doc's token count
    sums = out.groupby("doc_id").chunk_tokens.sum()
    for i, text in rows:
        assert sums[i] == len(text.split())


def test_paragraph_dedup_conservation(spark):
    """Kept paragraph instances == number of DISTINCT paragraph strings
    (exactly one survivor per distinct chunk), and the globally first
    doc never loses anything it introduced."""
    from navigator_document_parser_spark.operators.dedup import (
        paragraph_dedup,
    )

    rows = [
        (0, "a b c d e f"),
        (1, "a b c x y z"),         # chunk 'a b c' dup of doc0's
        (2, "a b c d e f"),         # full dup of doc0
        (3, "p q r"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = paragraph_dedup(df, chunk_tokens=3).toPandas()
    kept_total = int((out.n_paras - out.n_dropped).sum())
    distinct_chunks = len(
        {"a b c", "d e f", "x y z", "p q r"}
    )
    assert kept_total == distinct_chunks
    first = out.set_index("doc_id").loc[0]
    assert first.n_dropped == 0 and first.kept_text == "a b c d e f"


def test_keyword_search_conjunctive_monotonicity(spark):
    """Adding a term to a query can only shrink its match set."""
    from navigator_document_parser_spark.operators.search import (
        keyword_search,
    )

    rows = [(i, "alpha beta gamma"[: 5 + (i % 3) * 6]) for i in range(30)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = keyword_search(
        df, [(1, ["alpha"]), (2, ["alpha", "beta"])], k=100
    ).toPandas()
    docs1 = set(out[out.query_id == 1].doc_id)
    docs2 = set(out[out.query_id == 2].doc_id)
    assert docs2 <= docs1
    assert docs1 and docs2 != docs1  # the fixture exercises both sides


def test_lm_rarity_duplicated_doc_is_never_rare(spark):
    """A doc repeated >= min_count times makes all its own bigrams
    common, so every copy scores rare_frac 0."""
    from navigator_document_parser_spark.operators.text import lm_rarity

    rows = [(i, "same exact tokens repeated here") for i in range(6)]
    rows.append((99, "a lone unusual document body"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = lm_rarity(df, min_count=5, max_rare_frac=0.5).toPandas()
    dup = out[out.doc_id < 6]
    assert (dup.rare_frac == 0.0).all() and dup.pass_lm.all()
    lone = out[out.doc_id == 99].iloc[0]
    assert lone.rare_frac == 1.0 and not lone.pass_lm
