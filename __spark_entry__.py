"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)   -> flagship: real extraction pipeline over the sf0.001
                  documents table (text re-wrapped as HTML pages, parsed
                  by the from-scratch engine).
queries()      -> one entry per implemented operator family from
                  SURVEY.md §2 + the training-data-pipeline operators.
oracle_sql()   -> DuckDB-equivalent SQL for every SQL-expressible query;
                  non-expressible ones (extraction itself, IVF ANN,
                  the multimodal frame fan-out) are rows-only by design.

Column names are aligned 1:1 between Spark and oracle (the driver's
compare sorts columns by name before hashing).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from navigator_document_parser_spark.operators import ratio4_sql
from navigator_document_parser_spark.operators import text as T
from navigator_document_parser_spark.operators.dedup import (
    duplicated_spans,
    exact_dup_groups,
    minhash_dedup_pairs,
    minhash_signature,
    ngram_jaccard_pairs,
    simhash,
)
from navigator_document_parser_spark.operators.dedup import (
    oracle_bloom_snapshot_filter as _oracle_bloom_snapshot_filter,
    oracle_cdc_dedup as _oracle_cdc_dedup,
    oracle_snapshot_diff as _oracle_snapshot_diff,
    oracle_paragraph_dedup as _oracle_paragraph_dedup,
    oracle_snapshot_dedup as _oracle_snapshot_dedup,
)
from navigator_document_parser_spark.operators.bpe import (
    oracle_bpe_train as _oracle_bpe_train,
)
from navigator_document_parser_spark.operators.layout import (
    oracle_zorder_layout as _oracle_zorder_layout,
)
from navigator_document_parser_spark.operators.search import (
    oracle_bm25_search as _oracle_bm25_search,
    oracle_boolean_search as _oracle_boolean_search,
    oracle_index_export as _oracle_index_export,
    oracle_index_lookup as _oracle_index_lookup,
    oracle_prefix_suggest as _oracle_prefix_suggest,
    oracle_keyword_search as _oracle_keyword_search,
    oracle_phrase_search as _oracle_phrase_search,
)
from navigator_document_parser_spark.operators.robots import (
    oracle_robots_filter as _oracle_robots_filter,
)
from navigator_document_parser_spark.operators.urls import (
    oracle_fetch_schedule as _oracle_fetch_schedule,
    oracle_filter_urls as _oracle_filter_urls,
)
from navigator_document_parser_spark.operators.selection import (
    oracle_budget_select as _oracle_budget_select,
    oracle_curriculum_order as _oracle_curriculum_order,
    oracle_host_split as _oracle_host_split,
    oracle_importance_select as _oracle_importance_select,
    oracle_mix_rebalance as _oracle_mix_rebalance,
    oracle_temperature_mix as _oracle_temperature_mix,
)
from navigator_document_parser_spark.operators.similarity import (
    embedding_neardup_pairs,
    knn_bruteforce,
    knn_lsh,
)

SF_DEFAULT = "/root/testdata/sf0.001"

_REPO_DIR = __import__("os").path.dirname(__import__("os").path.abspath(__file__))
_PKG_ZIP: list[str] = []


def _ensure_workers_can_import(spark: SparkSession) -> None:
    """Ship the package to Python workers regardless of the driver's cwd.

    Local-mode workers resolve imports from their own cwd/PYTHONPATH, not
    the driver's sys.path — a harness running from elsewhere would
    otherwise hit ModuleNotFoundError inside pandas UDFs. Equivalent to
    spark-submit --py-files on a cluster.
    """
    import hashlib
    import os
    import zipfile

    if not _PKG_ZIP:
        pkg_root = os.path.join(_REPO_DIR, "navigator_document_parser_spark")
        sources = []
        for dirpath, _dirs, files in os.walk(pkg_root):
            for fn in sorted(files):
                if fn.endswith(".py"):
                    sources.append(os.path.join(dirpath, fn))
        # content-hash the zip name: addPyFile never overwrites an
        # already-added path, so a fixed /tmp name could ship STALE code
        # from an older process/version to the Python workers
        h = hashlib.md5()
        for full in sorted(sources):
            h.update(full.encode())
            with open(full, "rb") as f:
                h.update(f.read())
        path = os.path.join("/tmp", f"ndps_pkg-{h.hexdigest()[:12]}.zip")
        if not os.path.exists(path):
            tmp = f"{path}.{os.getpid()}.tmp"
            with zipfile.ZipFile(tmp, "w") as z:
                for full in sorted(sources):
                    z.write(full, os.path.relpath(full, _REPO_DIR))
            os.replace(tmp, path)  # atomic: concurrent drivers race safely
        _PKG_ZIP.append(path)
    try:
        spark.sparkContext.addPyFile(_PKG_ZIP[0])
    except Exception:
        pass  # already added in this context


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the testdata tables are single small parquet files -> a single scan
    # task; repartition to defaultParallelism so per-doc expression work
    # parallelizes (a real corpus scan has many splits and doesn't need
    # this — narrow text rows make the shuffle negligible here)
    return spark.read.parquet(f"{sf_dir}/documents.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/embeddings.parquet").repartition(
        spark.sparkContext.defaultParallelism
    )


# ---------------------------------------------------------------------------
# flagship: the extraction pipeline itself (rows-only; correctness is the
# golden byte-identical pytest contract, SURVEY §5)
# ---------------------------------------------------------------------------

def _extract_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wrap each driver document's text into an HTML page, run the real
    extraction engine (route -> Arrow extract UDF -> output shape), and
    return per-document results."""
    from navigator_document_parser_spark.plans.job import run_extraction

    _ensure_workers_can_import(spark)
    docs = _docs(spark, sf_dir)
    paragraphs = F.array_join(
        F.transform(
            F.filter(
                F.transform(F.split(F.col("text"), r"\."), lambda s: F.trim(s)),
                lambda s: F.length(s) > 0,
            ),
            lambda s: F.concat(F.lit("<p>"), s, F.lit(". </p>")),
        ),
        "",
    )
    html = F.concat(
        F.lit("<html><head><title>doc </title></head><body>"
              '<nav class="nav"><a href="/">Home</a> <a href="/a">About</a></nav>'
              '<div class="article-content">'),
        paragraphs,
        F.lit("</div><footer class=\"footer\"><a href=\"/p\">Privacy</a>"
              "</footer></body></html>"),
    )
    pages = docs.select(
        F.concat(F.lit("https://docs.example.org/"), F.col("doc_id")).alias("url"),
        F.to_timestamp(F.lit("2024-01-01 00:00:00")).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit("").alias("text"),
        F.col("lang"),
    )
    out = run_extraction(pages, run_id="entry")
    return out.select(
        "url",
        "parser",
        "has_valid_text",
        F.size("text_blocks").cast("bigint").alias("n_blocks"),
        F.length("text").cast("bigint").alias("n_chars"),
        T.quality_score(F.col("text")).alias("quality"),
    )


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return _extract_pipeline(spark, SF_DEFAULT)


def _translate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6-P8 gating + M14 stub translation over freshly extracted rows
    (rows-only: the translator UDF is not SQL-expressible)."""
    from navigator_document_parser_spark.plans.job import (
        run_extraction,
        run_translation,
    )
    from navigator_document_parser_spark.sources.synth import synth_documents

    _ensure_workers_can_import(spark)
    docs = synth_documents(spark, 120, partitions=4)
    extracted = run_extraction(docs, run_id="tq")
    out = run_translation(extracted, ["en"])
    return out.select(
        "url",
        "translated_to",
        F.size("text_blocks").cast("bigint").alias("n_blocks"),
        F.length("text").cast("bigint").alias("n_chars"),
        F.col("languages")[0].alias("doc_lang"),
    )


# ---------------------------------------------------------------------------
# SQL-expressible queries (Spark side)
# ---------------------------------------------------------------------------

def _lang_doc_stats(spark, sf):
    return (
        _docs(spark, sf)
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
            F.sum("n_chars").alias("sum_chars"),
        )
    )


def _route_split(spark, sf):
    # P1 3-way router analog over the driver table (cli/run_parser.py:176-192)
    d = _docs(spark, sf).withColumn(
        "route",
        F.when(F.col("source").endswith("0"), F.lit("pdf"))
        .when(F.col("lang") == "en", F.lit("html"))
        .otherwise(F.lit("none")),
    )
    return d.groupBy("route").agg(F.count(F.lit(1)).alias("n_docs"))


def _valid_text_filter(spark, sf):
    # P5 validity predicate analog (>= 6 whitespace tokens)
    d = _docs(spark, sf).withColumn(
        "has_valid_text", T.token_count(F.col("text")) >= 6
    )
    return d.groupBy("lang", "has_valid_text").agg(
        F.count(F.lit(1)).alias("n_docs")
    )


def _translate_gating(spark, sf):
    # P6 gate + P8 worthiness + P7 target set difference (targets = ['en'])
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        "lang",
        (F.col("text").rlike("[A-Za-z]")).alias("worth_translating"),
        F.size(
            F.array_except(F.array(F.lit("en")), F.array(F.col("lang")))
        ).cast("bigint").alias("n_targets"),
    )


def _line_blocks(spark, sf):
    # M3/M5 analog: sentence-split + positional block ids b{idx}
    d = _docs(spark, sf).filter(F.col("doc_id") < 100)
    parts = F.filter(
        F.transform(F.split(F.col("text"), r"\."), lambda s: F.trim(s)),
        lambda s: F.length(s) > 0,
    )
    return d.select(
        "doc_id", F.posexplode(parts).alias("idx", "block_text")
    ).select(
        "doc_id",
        F.col("idx").cast("bigint").alias("idx"),
        F.concat(F.lit("b"), F.col("idx")).alias("text_block_id"),
        "block_text",
    )


def _text_metrics(spark, sf):
    d = _docs(spark, sf)
    return d.select(
        "doc_id",
        T.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        T.punct_count(F.col("text")).cast("bigint").alias("n_punct"),
        T.quality_score(F.col("text")).alias("quality"),
        T.lang_guess(F.col("text")).alias("lang_guess"),
        T.fingerprint(F.col("text")).alias("fp"),
    )


def _corpus_curation(spark, sf):
    """Composed training-data curation: exact-dedup keeper ∩ quality gate.

    The one-liner every corpus pipeline ends with: keep one copy per
    distinct text, drop low-quality docs, tag with the heuristic lang.
    """
    d = _docs(spark, sf)
    keepers = (
        d.groupBy(F.md5(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        d.join(keepers, "doc_id")
        .select(
            "doc_id",
            T.lang_guess(F.col("text")).alias("lang_guess"),
            T.quality_score(F.col("text")).alias("quality"),
            T.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        )
        .filter((F.col("quality") >= 0.1) & (F.col("n_tokens") >= 10))
    )


def _quality_by_lang(spark, sf):
    """Exact median/p90 of the quality score per language."""
    d = _docs(spark, sf).select(
        "lang", T.quality_score(F.col("text")).alias("q")
    )
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.expr("percentile(q, 0.5)"), 4).alias("q_median"),
        F.round(F.expr("percentile(q, 0.9)"), 4).alias("q_p90"),
    )


def _winnow_pairs(spark, sf):
    """MOSS-style plagiarism pairs over winnowing fingerprints
    (operators/text.py winnow_pairs): shared selected fingerprints
    >= 40 (selective on this corpus: the tiny synthetic vocabulary
    makes low thresholds near-all-pairs), containment vs the
    smaller set (ratio4)."""
    from navigator_document_parser_spark.operators.text import (
        winnow_pairs,
    )

    return winnow_pairs(_docs(spark, sf), min_shared=40)


def _fingerprint_winnow(spark, sf):
    from navigator_document_parser_spark.operators.text import (
        winnow_fingerprints,
    )

    _ensure_workers_can_import(spark)
    return winnow_fingerprints(_docs(spark, sf))


def _dedup_exact(spark, sf):
    return exact_dup_groups(_docs(spark, sf))


def _dedup_minhash_sig(spark, sf):
    return _docs(spark, sf).select(
        "doc_id",
        F.concat_ws("|", minhash_signature(F.col("text"), 4)).alias("sig"),
    )


def _dedup_minhash_pairs(spark, sf):
    return minhash_dedup_pairs(
        _docs(spark, sf), num_hashes=4, bands=2, threshold=0.2
    )


def _dedup_components(spark, sf):
    """Near-dup pairs -> connected components (min-label clusters)."""
    from navigator_document_parser_spark.operators.dedup import (
        connected_components,
        ngram_jaccard_pairs,
    )

    pairs = ngram_jaccard_pairs(_docs(spark, sf), threshold=0.1, length_band=64)
    return connected_components(pairs).select(
        F.col("node").cast("bigint").alias("node"),
        F.col("comp").cast("bigint").alias("comp"),
    )


def _fuzzy_dedup_corpus(spark, sf):
    """SlimPajama-style fuzzy dedup end-to-end: near-dup pairs (n-gram
    Jaccard within blocks) -> connected components -> keep the min-id
    representative per cluster -> filtered corpus. Complements
    corpus_curation, whose dedup stage is exact-hash only."""
    from navigator_document_parser_spark.operators.dedup import (
        dedup_corpus,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf)
    pairs = ngram_jaccard_pairs(docs, threshold=0.1, length_band=64)
    return dedup_corpus(
        docs.select("doc_id", "lang", "n_chars"), pairs
    )


def _dedup_keep_best(spark, sf):
    """Keep-best fuzzy dedup (operators/dedup.py dedup_keep_best): same
    near-dup components as fuzzy_dedup_corpus, but the cluster keeper is
    the LONGEST copy (n_chars, ties to min id) — the production rule:
    near-dup groups hold a canonical page plus truncated copies."""
    from navigator_document_parser_spark.operators.dedup import (
        dedup_keep_best,
        ngram_jaccard_pairs,
    )

    docs = _docs(spark, sf)
    pairs = ngram_jaccard_pairs(docs, threshold=0.1, length_band=64)
    return dedup_keep_best(
        docs.select("doc_id", "lang", "n_chars"), pairs,
        quality_col="n_chars",
    )


def _dedup_simhash(spark, sf):
    return simhash(_docs(spark, sf))


def _dedup_simhash_pairs(spark, sf):
    """Pigeonhole-blocked near-dup pairs on the 16-bit signature —
    oracle-checked against a DuckDB all-pairs xor+bit_count (exact
    recall by the pigeonhole theorem, so blocking must lose nothing)."""
    from navigator_document_parser_spark.operators.dedup import (
        simhash_near_pairs,
    )

    out = simhash_near_pairs(_docs(spark, sf), max_hamming=2)
    return out.select(
        "id_a", "id_b", F.col("hamming").cast("bigint").alias("hamming")
    )


def _dedup_ngram_jaccard(spark, sf):
    return ngram_jaccard_pairs(_docs(spark, sf), threshold=0.1, length_band=64)


_SNAPSHOT_NEW_TEXT_SQL = (
    "CASE WHEN doc_id % 4 = 0 THEN text "
    "WHEN doc_id % 4 = 1 THEN text || "
    "' plus an updated paragraph appended in the new crawl' "
    "ELSE 'fresh snapshot document ' || CAST(doc_id AS VARCHAR) || "
    "' with brand new unique content never seen before in this corpus' "
    "END"
)


def _dedup_incremental(spark, sf):
    """Monthly-snapshot dedup: a synthetic new crawl (1/4 re-crawled
    identical, 1/4 updated near-dup, 1/2 fresh) deduped against the
    committed corpus (operators/dedup.py snapshot_dedup)."""
    from navigator_document_parser_spark.operators.dedup import snapshot_dedup

    old = _docs(spark, sf)
    new = old.withColumn(
        "text",
        F.expr(_SNAPSHOT_NEW_TEXT_SQL.replace("AS VARCHAR", "AS STRING")),
    )
    return snapshot_dedup(new, old)


def _dedup_bloom(spark, sf):
    """Bloom-prefiltered snapshot dedup: same synthetic new crawl as
    dedup_incremental, but the committed set is summarized by a
    broadcastable 64 Kbit Bloom bitmap and the exact verify join only
    touches bloom-hit rows (operators/dedup.py bloom_snapshot_filter).
    No false negatives -> exact_dup is bit-identical to a full join."""
    from navigator_document_parser_spark.operators.dedup import (
        bloom_snapshot_filter,
    )

    old = _docs(spark, sf)
    new = old.withColumn(
        "text",
        F.expr(_SNAPSHOT_NEW_TEXT_SQL.replace("AS VARCHAR", "AS STRING")),
    )
    return bloom_snapshot_filter(new, old)


def _dedup_cdc(spark, sf):
    """Content-defined chunk dedup: token-hash boundaries (rsync/LBFS
    trick) re-sync after insertions, so shifted duplicates still chunk
    identically; first occurrence owns a chunk (operators/dedup.py
    cdc_dedup)."""
    from navigator_document_parser_spark.operators.dedup import cdc_dedup

    return cdc_dedup(_docs(spark, sf), avg_chunk=8)


_SNAPSHOT_DIFF_NEW_SQL = (
    "SELECT doc_id, " + _SNAPSHOT_NEW_TEXT_SQL + " AS text, source "
    "FROM documents WHERE doc_id % 17 <> 3 "
    "UNION ALL "
    "SELECT doc_id + 1000000 AS doc_id, "
    "'brand new page ' || CAST(doc_id AS VARCHAR) AS text, source "
    "FROM documents WHERE doc_id % 29 = 0"
)


def _snapshot_diff(spark, sf):
    """Crawl-snapshot audit: per-source added/removed/changed/unchanged
    counts between the committed corpus and a synthetic new crawl
    (re-crawls + edits + 1/17 dropped + 1/29 new pages) — ONE full-outer
    id join shipping only md5 hashes + one group aggregate
    (operators/dedup.py snapshot_diff)."""
    from navigator_document_parser_spark.operators.dedup import snapshot_diff

    old = _docs(spark, sf)
    old.createOrReplaceTempView("documents")
    new = spark.sql(
        _SNAPSHOT_DIFF_NEW_SQL.replace("AS VARCHAR", "AS STRING")
    )
    return snapshot_diff(new, old)


def _dedup_paragraphs(spark, sf):
    """CCNet-style paragraph dedup: repeated 12-token chunks are dropped
    corpus-wide (first occurrence wins) and docs are rebuilt from their
    kept chunks (operators/dedup.py paragraph_dedup)."""
    from navigator_document_parser_spark.operators.dedup import paragraph_dedup

    return paragraph_dedup(_docs(spark, sf), chunk_tokens=12)


def _dedup_substring(spark, sf):
    """Exact-substring (duplicated span) detection, the distributed
    analog of Lee et al. 2022 suffix-array dedup: maximal token spans
    >= 8 tokens shared verbatim across >= 2 documents."""
    return duplicated_spans(_docs(spark, sf), min_tokens=8)


def _token_stats(spark, sf):
    """Corpus token accounting: whitespace vs BPE-ish pre-token counts
    per language + corpus totals (the 'how many training tokens' query
    every dataset card reports)."""
    d = _docs(spark, sf)
    return d.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(T.token_count(F.col("text")).cast("bigint")).alias("ws_tokens"),
        F.sum(T.bpe_token_count(F.col("text"))).alias("bpe_tokens"),
        F.round(
            F.sum(T.bpe_token_count(F.col("text"))).cast("double")
            / F.sum(F.length("text")).cast("double"),
            4,
        ).alias("tokens_per_char"),
    )


def _pack_sequences(spark, sf):
    """Sharded greedy sequence packing (2048-token packs, 16 shards)."""
    return T.pack_sequences(_docs(spark, sf), max_tokens=2048, n_shards=16)


def _corpus_sample(spark, sf):
    """Deterministic stratified subsample (data-mix construction):
    default keep-25%, en upweighted to 50%, zh downweighted to 5%."""
    return T.hash_sample(
        _docs(spark, sf), fraction=0.25,
        strata={"en": 0.5, "zh": 0.05},
    ).select("doc_id", "lang")


def _host_split(spark, sf):
    """Leakage-safe train/val/test split: hash the HOST (all pages of a
    site share a split, so same-site near-dups can't straddle the
    train/eval boundary), 90/5/5 via the shared md5 Bernoulli
    (operators/selection.py host_split)."""
    from navigator_document_parser_spark.operators.selection import (
        host_split,
    )

    return host_split(_docs(spark, sf), val_frac=0.05, test_frac=0.05)


def _curriculum_order(spark, sf):
    """Curriculum phase assignment (operators/selection.py
    curriculum_order): 4dp mean-word-length difficulty -> integer
    quantile phases via a histogram cumsum, never a global sort."""
    from navigator_document_parser_spark.operators.selection import (
        curriculum_order,
    )

    return curriculum_order(_docs(spark, sf), n_phases=4)


def _budget_select(spark, sf):
    """Per-language token-budget selection: fill ~1,500 BPE-ish tokens
    per language with the highest-quality documents first (the
    'best N tokens per language' mix-construction step)."""
    from navigator_document_parser_spark.operators.selection import (
        budget_select,
    )

    return budget_select(_docs(spark, sf), token_budget=1500)


def _mix_rebalance(spark, sf):
    """Uniform-language data mix: deterministically thin every language
    to (about) the smallest language's size via the replayable
    md5-threshold rule."""
    from navigator_document_parser_spark.operators.selection import (
        mix_rebalance,
    )

    return mix_rebalance(_docs(spark, sf))


def _temperature_mix(spark, sf):
    """Temperature-scaled multilingual sampling (mT5/XLM-R rule):
    p_g ∝ (n_g/N)^0.3, corpus thinned to ~half matching that mix via
    the replayable md5-threshold rule; 8dp-rounded rates on both
    engines so pow() ulps can't flip a keep decision
    (operators/selection.py temperature_mix)."""
    from navigator_document_parser_spark.operators.selection import (
        temperature_mix,
    )

    return temperature_mix(_docs(spark, sf), alpha=0.3, budget_frac=0.5)


def _quality_filters(spark, sf):
    """Gopher-rule quality filtering (word count / mean word length /
    symbol ratio / required-stopword bands)."""
    return T.gopher_quality(_docs(spark, sf))


def _repetition_filters(spark, sf):
    """Gopher A1.3 repetition signals: per-doc top-2-gram and
    duplicate-2-gram character fractions + pass flag."""
    return T.repetition_signals(_docs(spark, sf))


def _host_cap(spark, sf):
    """Anti-domination cap: deterministic hash-ordered keep<=10 docs per
    origin (source column = the host analog in the documents table)."""
    return T.cap_per_group(_docs(spark, sf), group_col="source", k=10)


def _tfidf_top_terms(spark, sf):
    """Top-3 characteristic terms per doc by tf-idf (rational idf — see
    operators/text.py tfidf_top_terms for the engine-portability why)."""
    return T.tfidf_top_terms(_docs(spark, sf), k=3)


_URL_BLOCKLIST = ["site0.example.org", "site3.example.org"]

_URL_SYNTH_SQL = (
    "(CASE WHEN doc_id % 2 = 0 THEN 'HTTP' ELSE 'https' END) || "
    "'://WWW.Site' || CAST(doc_id % 7 AS VARCHAR) || '.Example.ORG' || "
    "(CASE WHEN doc_id % 3 = 0 THEN "
    "   (CASE WHEN doc_id % 2 = 0 THEN ':80' ELSE ':443' END) "
    " WHEN doc_id % 3 = 1 THEN ':8080' ELSE '' END) || "
    "'/docs/' || CAST(doc_id AS VARCHAR) || "
    "(CASE WHEN doc_id % 2 = 0 THEN '/' ELSE '' END) || "
    "(CASE doc_id % 4 "
    " WHEN 0 THEN '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) "
    "   || '&utm_campaign=x' "
    " WHEN 1 THEN '?id=' || CAST(doc_id AS VARCHAR) || '&fbclid=abc' "
    "   || CAST(doc_id AS VARCHAR) "
    " WHEN 2 THEN '?id=' || CAST(doc_id AS VARCHAR) ELSE '' END) || "
    "(CASE WHEN doc_id % 5 = 0 THEN '#sec1' ELSE '' END)"
)


def _url_filter(spark, sf):
    """URL canonicalization + UT1-style domain blocklist over messy
    synthetic URLs (mixed-case hosts, default/odd ports, utm/fbclid
    params, fragments, trailing slashes) built identically in the
    oracle (operators/urls.py)."""
    from navigator_document_parser_spark.operators.urls import filter_urls

    # same synth expression as the oracle; Spark spells VARCHAR as STRING
    d = _docs(spark, sf).withColumn(
        "url", F.expr(_URL_SYNTH_SQL.replace("AS VARCHAR", "AS STRING"))
    )
    return filter_urls(d, _URL_BLOCKLIST).select(
        "doc_id", "url_canonical", "domain", "blocked"
    )


_ROBOTS_RULES = [
    # longest-prefix-wins showcase: /private blocked except /private/p2*
    ("site0.example.org", "*", "disallow", "/private/"),
    ("site0.example.org", "*", "allow", "/private/p2"),
    # allow carve-out under a disallowed subtree
    ("site1.example.org", "*", "disallow", "/docs/"),
    ("site1.example.org", "*", "allow", "/docs/public/"),
    # whole-host block
    ("site2.example.org", "*", "disallow", "/"),
    # different agent: must NOT affect '*' filtering
    ("site3.example.org", "googlebot", "disallow", "/"),
]

_ROBOTS_URLS_SQL = (
    "SELECT doc_id, "
    "'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org' AS host, "
    "CASE WHEN doc_id % 4 = 0 THEN '/private/p' || CAST(doc_id AS VARCHAR) "
    "     WHEN doc_id % 4 = 1 THEN '/docs/d' || CAST(doc_id AS VARCHAR) "
    "     WHEN doc_id % 4 = 2 THEN '/docs/public/x' || CAST(doc_id AS VARCHAR) "
    "     ELSE '/' END AS path "
    "FROM documents"
)


# robots synth for sitemap discovery: one robots.txt per source with
# a canonical Sitemap line, a lowercase variant w/ trailing comment on
# ~half the hosts, and an EMPTY Sitemap: line (must be dropped)
_ROBOTS_SITEMAP_SRC_SQL = """
    SELECT source AS host,
      '# robots for ' || source || chr(10)
      || 'User-agent: *' || chr(10)
      || 'Disallow: /tmp' || chr(10)
      || 'Sitemap: https://' || source || '/sitemap.xml' || chr(10)
      || CASE WHEN substring(md5(source), 1, 1) < '8'
              THEN 'sitemap: https://' || source
                || '/news.xml   # discovered' || chr(10)
              ELSE '' END
      || 'Sitemap:' AS robots_txt
    FROM (SELECT DISTINCT source FROM documents)
"""


def _robots_sitemaps(spark, sf):
    """Sitemap discovery from robots.txt Sitemap: directives
    (operators/robots.py robots_sitemaps): case-insensitive field,
    comment tail stripped, empty values dropped — pure built-ins."""
    from navigator_document_parser_spark.operators.robots import (
        robots_sitemaps,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return robots_sitemaps(spark.sql(_ROBOTS_SITEMAP_SRC_SQL))


def _robots_filter(spark, sf):
    """Robots-Exclusion-Protocol filtering: longest-prefix rule wins,
    allow beats disallow on ties, ruleless hosts are allowed
    (operators/robots.py)."""
    from navigator_document_parser_spark.operators.robots import robots_filter

    d = _docs(spark, sf).selectExpr(
        "doc_id",
        "'site' || CAST(doc_id % 7 AS STRING) || '.example.org' AS host",
        "CASE WHEN doc_id % 4 = 0 THEN '/private/p' || CAST(doc_id AS STRING) "
        "     WHEN doc_id % 4 = 1 THEN '/docs/d' || CAST(doc_id AS STRING) "
        "     WHEN doc_id % 4 = 2 THEN '/docs/public/x' || CAST(doc_id AS STRING) "
        "     ELSE '/' END AS path",
    )
    rules = spark.createDataFrame(
        _ROBOTS_RULES,
        "host string, agent string, rule_type string, path_prefix string",
    )
    return robots_filter(d, rules)


_SEARCH_QUERIES = [
    (0, ["hash", "join"]),
    (1, ["window", "agg", "stream"]),
    (2, ["slow", "query"]),
    (3, ["dup"]),
]


def _keyword_search(spark, sf):
    """Inverted-index conjunctive search: top-10 docs per query, ranked
    by an integer idf-weighted score (engine-exact — operators/search.py)."""
    from navigator_document_parser_spark.operators.search import keyword_search

    return keyword_search(_docs(spark, sf), _SEARCH_QUERIES, k=10)


_BOOLEAN_QUERIES = [
    # (query_id, must, should, must_not)
    (0, ["table", "hash"], [], ["spark"]),
    (1, ["join"], ["window", "sort"], []),
    (2, [], ["merge", "batch"], ["slow"]),
    (3, ["scan"], ["fast"], ["agg", "stream"]),
]


def _boolean_search(spark, sf):
    """Boolean retrieval (MUST / SHOULD / MUST_NOT) over the inverted
    index: same one-scan vocabulary-filtered postings as keyword_search,
    negation as a candidate-row flag (never a corpus anti-scan), ranked
    by positive-term tf — integer-exact (operators/search.py
    boolean_search)."""
    from navigator_document_parser_spark.operators.search import (
        boolean_search,
    )

    return boolean_search(_docs(spark, sf), _BOOLEAN_QUERIES, k=10)


_PHRASE_QUERIES = [
    (0, ["fast", "table"]),
    (1, ["table", "table"]),
    (2, ["a", "a"]),
    (3, ["batch", "window", "spark"]),
    (4, ["no", "phrase", "here"]),
]


# deterministic mess: curly quotes + zero-width, doubled spaces, control
# chars, NBSPs, CRLF + em dash tail. Non-ASCII codepoints are embedded
# as literal characters (NOT chr(): Spark's chr is ASCII mod-256 while
# DuckDB's is a Unicode codepoint); chr() appears only for < 128, where
# the two engines agree. No backslashes -> same text parses identically.
_MESSY_TEXT_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN '“' || text || '”' || '​' "
    "WHEN doc_id % 5 = 1 THEN replace(text, ' ', '  ') "
    "WHEN doc_id % 5 = 2 THEN chr(9) || text || chr(1) || chr(31) "
    "WHEN doc_id % 5 = 3 THEN replace(text, ' ', ' ') "
    "ELSE text || chr(13) || chr(10) || 'tail' || '—' || 'x' END"
)


def _unigram_tokenize(spark, sf):
    """Unigram-LM Viterbi segmentation diagnostics (operators/
    unigram.py): integer piece scores -> exact DP; max score, tie ->
    fewest pieces; oracle unrolls the DP one CTE level per position."""
    from navigator_document_parser_spark.operators.unigram import (
        unigram_tokenize_stats,
    )

    return unigram_tokenize_stats(_docs(spark, sf))


def _bpe_train(spark, sf):
    """Distributed BPE vocabulary training: 8 merge rules learned from
    word-frequency-weighted pair counts; vocabulary-sized state, one
    narrow shuffle + one single-row collect per round (operators/bpe.py
    bpe_train; oracle is an 8-round unrolled CTE chain)."""
    from navigator_document_parser_spark.operators.bpe import bpe_train

    return bpe_train(_docs(spark, sf), num_merges=8)


def _text_normalize(spark, sf):
    """Unicode/whitespace cleanup over deterministically messied text:
    control-char strip, zero-width removal, quote/dash/NBSP unification,
    whitespace collapse — pure codegen projection (operators/text.py
    normalize_text)."""
    d = _docs(spark, sf).withColumn("text", F.expr(_MESSY_TEXT_SQL))
    return T.with_normalized_text(d)


_FETCH_PLAN_SQL = (
    "SELECT 'https://h' || CAST(doc_id % 23 AS VARCHAR) "
    "|| '.example.org/p/' || CAST(doc_id AS VARCHAR) AS url, "
    "'h' || CAST(doc_id % 23 AS VARCHAR) || '.example.org' AS host "
    "FROM documents"
)


def _zorder_layout(spark, sf):
    """Z-order (Morton) clustering of documents on (n_chars, doc_id):
    integer min-max scaling + bit interleave, the multi-dimensional
    scan-pruning layout Delta's OPTIMIZE ZORDER writes
    (operators/layout.py zorder_layout)."""
    from navigator_document_parser_spark.operators.layout import (
        zorder_layout,
    )

    return zorder_layout(
        _docs(spark, sf), "n_chars", "doc_id", bits=16, n_buckets=32
    )


def _fetch_schedule(spark, sf):
    """Politeness crawl scheduling: md5-sharded host->worker ownership +
    breadth-first host interleave per worker, all window functions
    (operators/urls.py fetch_schedule)."""
    from navigator_document_parser_spark.operators.urls import fetch_schedule

    _docs(spark, sf).createOrReplaceTempView("documents")
    plan = spark.sql(_FETCH_PLAN_SQL.replace("AS VARCHAR", "AS STRING"))
    return fetch_schedule(plan, n_workers=8)


def _serialize_postings(idx):
    """The driver's canonicalizer sorts result rows with pandas
    sort_values over every raw column, which crashes on list values
    (CORRECTNESS_r04 TypeError: unhashable type) — so the CONTRACT
    projection serializes the posting array to a comma-joined string.
    The operator itself keeps the typed array column."""
    return idx.select(
        "shard",
        "term",
        "block_id",
        "block_df",
        F.array_join(
            F.col("postings").cast("array<string>"), ","
        ).alias("postings"),
    )


def _index_export(spark, sf):
    """Sharded inverted-index materialization: delta-encoded posting
    blocks keyed (term, doc-range block) so hot terms never build one
    giant array on one reducer (operators/search.py index_export)."""
    from navigator_document_parser_spark.operators.search import index_export

    return _serialize_postings(
        index_export(_docs(spark, sf), n_shards=8, block_size=128)
    )


def _index_merge(spark, sf):
    """Incremental index maintenance: the committed index covers 9/10
    of the corpus; the remaining tenth merges in, rebuilding only the
    touched posting blocks. The oracle is the FROM-SCRATCH full-corpus
    index — merge correctness as an engine-independent invariant
    (operators/search.py index_merge)."""
    from navigator_document_parser_spark.operators.search import (
        index_export,
        index_merge,
    )

    d = _docs(spark, sf)
    old_idx = index_export(
        d.filter(F.col("doc_id") % 10 != 7), n_shards=8, block_size=128
    )
    return _serialize_postings(
        index_merge(
            old_idx,
            d.filter(F.col("doc_id") % 10 == 7),
            n_shards=8,
            block_size=128,
        )
    )


def _oracle_index_export_str():
    """index_export oracle with the posting array serialized to the
    same comma-joined string as _serialize_postings (DuckDB
    array_to_string casts BIGINT elements exactly like Spark's
    cast(array<string>))."""
    return f"""
        SELECT shard, term, block_id, block_df,
               array_to_string(postings, ',') AS postings
        FROM ({_oracle_index_export()})
    """


_INDEX_LOOKUP_TERMS = ["hash", "join", "table"]


def _prefix_suggest(spark, sf):
    """Query-autocomplete index: top-k terms by document frequency per
    1..4-char prefix (operators/search.py prefix_suggest) — integer
    DF ranks, deterministic ties, hapax tail pruned pre-explode."""
    from navigator_document_parser_spark.operators.search import (
        prefix_suggest,
    )

    return prefix_suggest(_docs(spark, sf), k=3, max_prefix=4,
                          min_count=2)


def _index_lookup(spark, sf):
    """Conjunctive retrieval served FROM the materialized posting
    index (build -> decode -> intersect; zero corpus access); the
    oracle is a raw-corpus tokenize-and-test scan, so the whole
    build->serve loop cross-validates (operators/search.py
    index_lookup)."""
    from navigator_document_parser_spark.operators.search import (
        index_export,
        index_lookup,
    )

    idx = index_export(_docs(spark, sf), n_shards=8, block_size=128)
    return index_lookup(idx, _INDEX_LOOKUP_TERMS)


def _bm25_search(spark, sf):
    """Disjunctive BM25 top-10 per query (k1=1.2, b=0.75), ranked on the
    4dp-rounded score so cross-engine double math can't flip an order
    (operators/search.py bm25_search)."""
    from navigator_document_parser_spark.operators.search import bm25_search

    return bm25_search(_docs(spark, sf), _SEARCH_QUERIES, k=10)


def _phrase_search(spark, sf):
    """Positional-index exact phrase matching: anchor-vote conjunction,
    one aggregation instead of an n-way postings self-join; the DuckDB
    oracle is a deliberately different naive list-slice scan
    (operators/search.py phrase_search)."""
    from navigator_document_parser_spark.operators.search import phrase_search

    return phrase_search(_docs(spark, sf), _PHRASE_QUERIES)


def _ml_quality_score(spark, sf):
    """Hashed-linear-classifier quality scoring (fastText-filter shape;
    integer weight sums keep the margin bit-identical cross-engine)."""
    return T.ml_quality_score(_docs(spark, sf))


def _c4_filters(spark, sf):
    """C4 heuristic cleaning over synthesized newline-structured text:
    12-token lines, 2/3 given terminal periods, with deterministic
    lorem-ipsum / curly-brace / bad-word injections — identical
    synthesis in the oracle (operators/text.py c4_filters)."""
    d = _docs(spark, sf).select(
        "doc_id",
        F.split(F.trim(F.lower(F.col("text"))), r"\s+").alias("t"),
    ).localCheckpoint(eager=True)
    did = F.col("doc_id")
    lines = F.transform(
        F.sequence(F.lit(0), F.floor((F.size("t") - 1) / 12).cast("int")),
        lambda i: F.concat(
            F.array_join(F.slice("t", i * 12 + 1, 12), " "),
            F.when((did + i) % 3 != 0, F.lit(".")).otherwise(F.lit("")),
        ),
    )
    text2 = F.concat(
        F.array_join(lines, "\n"),
        F.when(
            did % 41 == 0,
            F.lit("\nthis block has lorem ipsum filler inside it."),
        ).otherwise(F.lit("")),
        F.when(
            did % 37 == 0, F.lit("\nvar x = { a: 1 };")
        ).otherwise(F.lit("")),
        F.when(
            did % 43 == 0,
            F.lit("\nthis line mentions badword1 openly today."),
        ).otherwise(F.lit("")),
    )
    return T.c4_filters(d.select("doc_id", text2.alias("text")))


def _lm_rarity(spark, sf):
    """Bigram-LM rarity gate (KenLM-perplexity proxy): drop docs whose
    bigrams the corpus itself rarely produces (operators/text.py)."""
    return T.lm_rarity(_docs(spark, sf))


def _top_ngrams(spark, sf):
    """Corpus-wide top-20 trigrams (WIMBD-style corpus audit): one
    count aggregate + TakeOrderedAndProject top-k — never a global
    window sort (operators/text.py top_ngrams)."""
    return T.top_ngrams(_docs(spark, sf), n=3, k=20)


def _ccnet_buckets(spark, sf):
    """CCNet head/middle/tail perplexity terciles per language: rank by
    the lm_rarity fraction, split by integer rank thresholds — the
    Common Crawl LM-quality stratification step (operators/text.py
    ccnet_buckets)."""
    return T.ccnet_buckets(_docs(spark, sf))


def _corpus_report(spark, sf):
    """Multi-level corpus report via ROLLUP(lang, source): per-(lang,
    source) stats plus per-lang and grand totals in one aggregation pass
    (Spark computes all grouping sets in a single shuffle)."""
    return (
        _docs(spark, sf)
        .rollup("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("sum_chars"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


def _bpe_tokenize(spark, sf):
    """BPE subword tokenization as a chain of literal replaces over a
    ';'-suffixed symbol representation — pure codegen, zero shuffle
    (operators/text.py bpe_tokenize_stats)."""
    return T.bpe_tokenize_stats(_docs(spark, sf))


def _domain_quality(spark, sf):
    """The domain-level curation table a crawl prioritizer consumes:
    link-graph authority (the pagerank_hosts ranks) joined with
    per-source content quality aggregates. Composition query — the
    same edge synthesis and 5 power iterations as pagerank_hosts, plus
    one groupBy and a broadcast-able 20-row join."""
    from navigator_document_parser_spark.operators.graph import pagerank

    d = _docs(spark, sf)
    edges = (
        d.select(
            F.col("source").alias("src_host"),
            F.concat(
                F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
            ).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    ranks = pagerank(edges, iterations=5, checkpoint_every=3).select(
        "node", F.round(F.col("rank"), 8).alias("rank")
    )
    quality = d.groupBy(F.col("source").alias("node")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.round(F.avg("n_chars"), 4).alias("avg_chars"),
    )
    return ranks.join(quality, "node").select(
        F.col("node").alias("host"), "rank", "n_docs", "avg_chars"
    )


def _split_sentences(spark, sf):
    """Regex sentence segmentation (mark-then-split so the RE2-based
    oracle matches exactly) — zero-shuffle generate+projection
    (operators/text.py split_sentences). The synth corpus carries no
    punctuation, so the entry inserts a period after every 5th word
    (identically in the oracle via a derived-table expression — the
    _pii_scrub augmentation pattern) to exercise real fan-out."""
    d = _docs(spark, sf).withColumn(
        "text",
        F.concat(
            F.regexp_replace(
                F.col("text"), r"((\S+ ){4}\S+) ", "$1. "
            ),
            F.lit("."),
        ),
    )
    return T.split_sentences(d)


_SENTENCE_SYNTH_TABLE = """(
  SELECT doc_id,
         regexp_replace(text, '((\\S+ ){4}\\S+) ', '\\1. ', 'g') || '.'
           AS text
  FROM documents
) synth"""


def _pagerank_hosts(spark, sf):
    """Weighted PageRank over a deterministic host link graph derived
    from the documents table: src = the doc's source host (every source
    has out-links), dst = 'h<k>' sink hosts that never link out — so
    the dangling-mass redistribution path is exercised, not just the
    edge-walk. 5 power iterations (operators/graph.py pagerank: one
    shuffle per iteration, dangling mass via 1-row broadcast, no driver
    collects); ranks rounded to 8dp — summation-order float noise
    across engines/partitions is ~1e-14 after 5 iterations, far below
    the 5e-9 rounding half-step."""
    from navigator_document_parser_spark.operators.graph import pagerank

    d = _docs(spark, sf)
    edges = (
        d.select(
            F.col("source").alias("src_host"),
            F.concat(
                F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
            ).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    ranks = pagerank(edges, iterations=5, checkpoint_every=3)
    return ranks.select("node", F.round(F.col("rank"), 8).alias("rank"))


def _pagerank_hosts_oracle_sql(damping: float = 0.85,
                               iterations: int = 5) -> str:
    """DuckDB replica of _pagerank_hosts: the same edge synthesis, the
    power iteration unrolled as a chained-CTE sequence (r0..r5). Every
    float op mirrors the Spark side — (1-d)/N and 1/N are IEEE
    divisions both engines perform identically; only SUM accumulation
    order differs, which the 8dp rounding absorbs."""
    it = """
        r{t1} AS (
          SELECT nd.node,
                 ({base}) + {d} * (COALESCE(c.m, 0.0) + dmx.dm / nn.n)
                   AS rank
          FROM nodes nd
          CROSS JOIN nn
          CROSS JOIN (SELECT COALESCE(SUM(r.rank), 0.0) AS dm
                      FROM r{t0} r JOIN dang USING (node)) dmx
          LEFT JOIN (SELECT f.dst AS node, SUM(r.rank * f.frac) AS m
                     FROM frac f JOIN r{t0} r ON r.node = f.src
                     GROUP BY f.dst) c
            ON c.node = nd.node
        )"""
    d = repr(float(damping))
    base = f"(1.0 - {d}) / nn.n"
    steps = ", ".join(
        it.format(t0=t, t1=t + 1, d=d, base=base)
        for t in range(iterations)
    )
    return f"""
        WITH edges AS (
          SELECT source AS src,
                 'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst,
                 count(*) AS w
          FROM documents GROUP BY 1, 2
        ), outw AS (
          SELECT src, SUM(CAST(w AS DOUBLE)) AS ow FROM edges GROUP BY src
        ), frac AS (
          SELECT e.src, e.dst, CAST(e.w AS DOUBLE) / o.ow AS frac
          FROM edges e JOIN outw o USING (src)
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst FROM edges
        ), nn AS (
          SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes
        ), dang AS (
          SELECT node FROM nodes
          WHERE node NOT IN (SELECT DISTINCT src FROM edges)
        ), r0 AS (
          SELECT node, 1.0 / nn.n AS rank FROM nodes CROSS JOIN nn
        ), {steps}
        SELECT node, round(rank, 8) AS rank FROM r{iterations}
    """


def _anchor_text(spark, sf):
    """Top-3 anchor texts per link target over the same deterministic
    host link graph as pagerank_hosts, anchors drawn from the linking
    doc's own tokens ((doc_id % 3)+1-th token; 'link' when the doc is
    too short) — the Common Crawl anchor-text-dataset shape
    (operators/graph.py anchor_text_topk)."""
    from navigator_document_parser_spark.operators.graph import (
        anchor_text_topk,
    )

    d = _docs(spark, sf)
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    raw = F.try_element_at(toks, (F.col("doc_id") % 3 + 1).cast("int"))
    edges = d.select(
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
        ).alias("dst_host"),
        F.when(
            raw.isNull() | (raw == ""), F.lit("link")
        ).otherwise(raw).alias("anchor"),
    )
    return anchor_text_topk(edges, k=3)


_ANCHOR_TEXT_ORACLE = """
    WITH toks AS (
      SELECT doc_id,
             string_split_regex(trim(lower(text)), '\\s+') AS t
      FROM documents
    ), e AS (
      SELECT 'h' || CAST((d.doc_id * 7 + 3) % 40 AS VARCHAR) AS dst_host,
             CASE WHEN tk.t[CAST(d.doc_id % 3 AS INTEGER) + 1] IS NULL
                    OR tk.t[CAST(d.doc_id % 3 AS INTEGER) + 1] = ''
                  THEN 'link'
                  ELSE tk.t[CAST(d.doc_id % 3 AS INTEGER) + 1] END AS anchor
      FROM documents d JOIN toks tk USING (doc_id)
    ), counts AS (
      SELECT dst_host, anchor, count(*) AS n_links
      FROM e GROUP BY dst_host, anchor
    )
    SELECT dst_host, anchor, CAST(n_links AS BIGINT) AS n_links,
           CAST(rank AS BIGINT) AS rank
    FROM (
      SELECT *, row_number() OVER (PARTITION BY dst_host
               ORDER BY n_links DESC, anchor ASC) AS rank
      FROM counts
    )
    WHERE rank <= 3
"""


# ring clusters: 7 communities ('c0'..'c6'), each a ring of <= 9 nodes —
# multi-community output AND a diameter the 5 fixed rounds fully cover
_HOST_COMMUNITY_EDGES_SQL = """
    SELECT 'c' || CAST(doc_id % 7 AS VARCHAR)
             || 'n' || CAST((doc_id // 7) % 9 AS VARCHAR) AS src_host,
           'c' || CAST(doc_id % 7 AS VARCHAR)
             || 'n' || CAST(((doc_id // 7) + 1) % 9 AS VARCHAR) AS dst_host
    FROM documents
"""


def _host_communities(spark, sf):
    """Fixed-round min-label propagation over a deterministic clustered
    host graph (7 ring communities): the site-cluster grouping step a
    crawl pipeline runs before per-community caps (operators/graph.py
    label_propagation; oracle = the same 5 rounds unrolled as CTEs)."""
    from navigator_document_parser_spark.operators.graph import (
        label_propagation,
    )

    d = _docs(spark, sf)
    edges = d.select(
        F.concat(
            F.lit("c"), (F.col("doc_id") % 7).cast("string"),
            F.lit("n"), F.expr("(doc_id div 7) % 9").cast("string"),
        ).alias("src_host"),
        F.concat(
            F.lit("c"), (F.col("doc_id") % 7).cast("string"),
            F.lit("n"), F.expr("((doc_id div 7) + 1) % 9").cast("string"),
        ).alias("dst_host"),
    )
    return label_propagation(edges, iterations=5)


def _hits_hosts(spark, sf):
    """HITS hubs/authorities over the same deterministic host link
    graph as pagerank_hosts: 5 iterations, L1 normalization (no sqrt —
    scalar factor only, rankings unchanged vs L2), 8dp rounding
    (operators/graph.py hits)."""
    from navigator_document_parser_spark.operators.graph import hits

    d = _docs(spark, sf)
    edges = (
        d.select(
            F.col("source").alias("src_host"),
            F.concat(
                F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
            ).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    out = hits(edges, iterations=5)
    return out.select(
        "node",
        F.round(F.col("authority"), 8).alias("authority"),
        F.round(F.col("hub"), 8).alias("hub"),
    )


def _hits_hosts_oracle_sql(iterations: int = 5) -> str:
    """DuckDB replica of _hits_hosts, unrolled chained CTEs (one
    raw auth+hub pair per iteration, L1 normalization once at the end
    — mirroring operators/graph.py hits), same edge synthesis as the
    pagerank oracle."""
    step = """
        a{t} AS (
          SELECT nd.node, COALESCE(x.s, 0.0) AS authority
          FROM nodes nd LEFT JOIN (
            SELECT e.dst AS node, SUM(h.hub * CAST(e.w AS DOUBLE)) AS s
            FROM edges e JOIN h{p} h ON h.node = e.src
            GROUP BY e.dst
          ) x ON x.node = nd.node
        ), h{t} AS (
          SELECT nd.node, COALESCE(x.s, 0.0) AS hub
          FROM nodes nd LEFT JOIN (
            SELECT e.src AS node,
                   SUM(a.authority * CAST(e.w AS DOUBLE)) AS s
            FROM edges e JOIN a{t} a ON a.node = e.dst
            GROUP BY e.src
          ) x ON x.node = nd.node
        )"""
    steps = ", ".join(
        step.format(t=t + 1, p=t) for t in range(iterations)
    )
    it = iterations
    return f"""
        WITH edges AS (
          SELECT source AS src,
                 'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst,
                 count(*) AS w
          FROM documents GROUP BY 1, 2
        ), nodes AS (
          SELECT src AS node FROM edges
          UNION
          SELECT dst FROM edges
        ), h0 AS (
          SELECT node, 1.0 AS hub FROM nodes
        ), {steps},
        an AS (SELECT COALESCE(SUM(authority), 0.0) AS s FROM a{it}),
        hn AS (SELECT COALESCE(SUM(hub), 0.0) AS s FROM h{it})
        SELECT a.node,
               round(CASE WHEN an.s = 0 THEN 0.0
                          ELSE a.authority / an.s END, 8) AS authority,
               round(CASE WHEN hn.s = 0 THEN 0.0
                          ELSE h.hub / hn.s END, 8) AS hub
        FROM a{it} a JOIN h{it} h ON a.node = h.node
        CROSS JOIN an CROSS JOIN hn
    """


def _chunk_windows(spark, sf):
    """RAG-prep overlapping window chunking: 16-token windows, stride 12
    (operators/text.py chunk_windows) — zero-shuffle projection."""
    return T.chunk_windows(_docs(spark, sf), window=16, stride=12)


def _importance_select(spark, sf):
    """DSIR-style distribution-matching selection: score docs by token
    mass leaning toward the English-language target distribution vs the
    whole corpus (operators/selection.py importance_select)."""
    from navigator_document_parser_spark.operators.selection import (
        importance_select,
    )

    return importance_select(_docs(spark, sf), F.col("lang") == "en")


def _decontaminate(spark, sf):
    """Benchmark decontamination: docs with doc_id % 37 == 0 act as the
    synthetic holdout set; every other doc is checked for 3-gram overlap
    against it (exact duplicates in the corpus guarantee hits)."""
    d = _docs(spark, sf)
    return T.decontaminate(
        corpus=d.filter(F.col("doc_id") % 37 != 0),
        benchmark=d.filter(F.col("doc_id") % 37 == 0),
        ngram=3,
        threshold=1,
    )


def _pii_scrub(spark, sf):
    """PII redaction over text augmented with deterministic synthetic
    emails/phones (the raw synth corpus contains none): docs with
    doc_id % 7 == 0 gain one email + one phone, built identically in
    the DuckDB oracle."""
    d = _docs(spark, sf).withColumn(
        "pii_text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(
                    F.lit(" Contact user"),
                    F.col("doc_id").cast("string"),
                    F.lit("@example.org or call +44 555 "),
                    (F.lit(1000) + F.col("doc_id") % 9000).cast("string"),
                    F.lit(" now."),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    return T.pii_scrub(d, text_col="pii_text")


def _knn_cosine(spark, sf):
    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_bruteforce(emb, queries, k=5)
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("bigint").alias("rank")
    )


def _bitext_mine(spark, sf):
    """Margin-based bitext mining (CCMatrix/LASER shape): vec_id % 3
    partitions the embedding table into a 'source-language' and a
    'target-language' side; each source vector takes its best target
    iff it beats both an absolute cosine floor and a top-2 margin
    (operators/similarity.py bitext_margin_mine)."""
    from navigator_document_parser_spark.operators.similarity import (
        bitext_margin_mine,
    )

    emb = _emb(spark, sf)
    src = emb.filter(F.col("vec_id") % 3 != 0)
    tgt = emb.filter(F.col("vec_id") % 3 == 0)
    return bitext_margin_mine(src, tgt, min_sim=0.3, min_margin=0.02)


_BITEXT_SRC_SQL = ("SELECT vec_id, embedding FROM embeddings "
                   "WHERE vec_id % 3 <> 0")
_BITEXT_TGT_SQL = ("SELECT vec_id, embedding FROM embeddings "
                   "WHERE vec_id % 3 = 0")


def _bitext_mine_lsh(spark, sf):
    """LSH-band-blocked margin mining — the scale path for bitext_mine
    (VERDICT r4 #4): candidates come from a (tbl, bkt) equi-join instead
    of the exact baseline's crossJoin, with the same top-2 margin
    criterion per block. Deterministic md5 hyperplanes keep the
    approximate banding fully oracle-checkable
    (operators/similarity.py bitext_margin_mine_lsh)."""
    from navigator_document_parser_spark.operators.similarity import (
        bitext_margin_mine_lsh,
    )

    emb = _emb(spark, sf)
    src = emb.filter(F.col("vec_id") % 3 != 0)
    tgt = emb.filter(F.col("vec_id") % 3 == 0)
    return bitext_margin_mine_lsh(
        src, tgt, dim=64, min_sim=0.3, min_margin=0.02,
        n_planes=4, n_tables=4,
    )


def _embedding_neardup(spark, sf):
    return embedding_neardup_pairs(_emb(spark, sf), threshold=0.35)


def _semantic_decontaminate(spark, sf):
    """Embedding-level decontamination (operators/similarity.py
    semantic_decontaminate): corpus vectors within 4dp cosine 0.9 of
    ANY held-out benchmark vector (every 10th corpus vector) are
    flagged — banded cross-table matmul, oracle ranks the full banded
    candidate set."""
    from navigator_document_parser_spark.operators.similarity import (
        semantic_decontaminate,
    )

    emb = _emb(spark, sf)
    bench = emb.filter(F.col("vec_id") % 10 == 0)
    return semantic_decontaminate(
        emb, bench, threshold=0.9, dim=64, n_planes=4, n_tables=4
    )


def _semantic_clusters(spark, sf):
    """Transitive closure of the embedding near-dup pairs into clusters
    (operators/similarity.py semantic_clusters): pair semantics are
    embedding_neardup VERBATIM, closure is the oracle-checked
    connected_components; cluster_id = min member id."""
    from navigator_document_parser_spark.operators.similarity import (
        semantic_clusters,
    )

    return semantic_clusters(_emb(spark, sf), threshold=0.35)


def _hll_distinct(spark, sf):
    """HyperLogLog per-language vocabulary-size estimate (p=8, integer
    rho via binary-string length, dyadic harmonic sum — exact across
    engines; operators/sketches.py hll_distinct)."""
    from navigator_document_parser_spark.operators.sketches import (
        hll_distinct,
    )

    toks = _docs(spark, sf).select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    return hll_distinct(toks, group_col="lang", value_col="tok", p=8)


def _kmv_distinct(spark, sf):
    """KMV (k minimum values) per-language vocabulary estimate, k=32;
    exact-count fallback for groups under k distinct hashes
    (operators/sketches.py kmv_distinct)."""
    from navigator_document_parser_spark.operators.sketches import (
        kmv_distinct,
    )

    toks = _docs(spark, sf).select(
        "lang",
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok"),
    )
    return kmv_distinct(toks, group_col="lang", value_col="tok", k=32)


_SKETCH_TOKENS_SQL = (
    "SELECT lang, unnest(list_filter(string_split_regex("
    "trim(lower(text)), '\\s+'), t -> length(t) > 0)) AS tok "
    "FROM documents"
)

_CMS_TERMS = ["table", "hash", "join", "window", "spark", "neverseen"]


def _cms_counts(spark, sf):
    """Count-min sketch point estimates (d=4, w=256) for a fixed term
    list over the token stream — bounded d*w counter state, min-of-rows
    lookup (operators/sketches.py cms_counts)."""
    from navigator_document_parser_spark.operators.sketches import cms_counts

    toks = _docs(spark, sf).select(
        F.explode(
            F.filter(
                F.split(F.trim(F.lower(F.col("text"))), r"\s+"),
                lambda t: F.length(t) > 0,
            )
        ).alias("tok")
    )
    return cms_counts(toks, _CMS_TERMS, value_col="tok")


def _pq_encode(spark, sf):
    """Product quantization over the embeddings table: 64-dim vectors
    -> 4 codebook ids (8 centroids each, md5-deterministic — swap in
    per-subspace trained k-means for production) + the exact ADC
    reconstruction error (operators/similarity.py pq_encode)."""
    from navigator_document_parser_spark.operators.similarity import (
        pq_encode,
    )

    return pq_encode(_emb(spark, sf), dim=64, n_subspaces=4, n_centroids=8)


def _knn_pq(spark, sf):
    """ADC kNN over PQ codes (the IVF-PQ query path): corpus reduced
    to 4 codebook ids, queries score via a broadcast literal distance
    table — approximate vs true kNN but deterministic given the codes,
    hence fully oracle-checked (operators/similarity.py knn_pq)."""
    from navigator_document_parser_spark.operators.similarity import knn_pq

    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return knn_pq(emb, queries, dim=64, n_subspaces=4, n_centroids=8, k=10)


def _semdedup(spark, sf):
    """SemDeDup-style semantic dedup over the embeddings table:
    md5-deterministic centroids (oracle-expressible; swap in ivf_train
    for production), per-cluster cosine pruning, first-occurrence
    keeps (operators/similarity.py semdedup)."""
    from navigator_document_parser_spark.operators.similarity import (
        semdedup,
    )

    return semdedup(
        _emb(spark, sf), dim=64, n_clusters=8, threshold=0.35
    )


def _quantize_embeddings(spark, sf):
    """Int8 symmetric quantization of the embeddings table (q serialized
    to a csv string: the driver compare stringifies columns, and numpy
    vs duckdb array reprs differ)."""
    from navigator_document_parser_spark.operators.similarity import (
        quantize_embeddings,
    )

    _ensure_workers_can_import(spark)
    out = quantize_embeddings(_emb(spark, sf))
    return out.select(
        "vec_id", "scale", F.concat_ws(",", F.col("q")).alias("q_csv")
    )


def _knn_lsh(spark, sf):
    emb = _emb(spark, sf)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_lsh(emb, queries, dim=64, k=5, n_planes=4, n_tables=4)
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("bigint").alias("rank")
    )


def _knn_graph(spark, sf):
    """All-vectors top-k neighbor graph, LSH-banded + per-block numpy
    gram matmul with a containment-safe in-block prune; deterministic
    banding makes the approximate graph fully oracle-checkable
    (operators/similarity.py knn_graph)."""
    from navigator_document_parser_spark.operators.similarity import (
        knn_graph,
    )

    out = knn_graph(_emb(spark, sf), dim=64, k=5, n_planes=4, n_tables=4)
    return out.select(
        "src_id", "nbr_id", "sim",
        F.col("rank").cast("bigint").alias("rank"),
    )


def _knn_ivf(spark, sf):
    """IVF coarse-quantizer ANN (rows-only: iterative k-means is not a
    single SQL statement; recall is pytest-checked vs brute force).
    r4: trains on a bounded md5-ordered driver sample (FAISS-style,
    operators/similarity.py ivf_train_sampled) — 2 Spark jobs total
    instead of 2 + iterations; distributed Lloyd (ivf_train) remains
    available and parity-tested."""
    from navigator_document_parser_spark.operators.similarity import (
        ivf_train_sampled,
        knn_ivf,
    )

    emb = _emb(spark, sf)
    cents = ivf_train_sampled(emb, n_centroids=16)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_ivf(emb, queries, cents, k=5, n_probe=6)
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("bigint").alias("rank")
    )


def _knn_ivf_fullprobe(spark, sf):
    """IVF with n_probe == n_centroids: every cell is probed, so the
    result provably equals brute force (pytest-pinned in
    test_operators.py) — which makes the IVF machinery (k-means||
    training, vectorized cell assignment, per-cell candidate join)
    hash-checkable against the knn_cosine oracle while the approximate
    n_probe < n_centroids query stays rows-only (VERDICT r3 #6).
    Full-probe equality holds for ANY centroid set, so the r4 switch
    to sample-trained centroids cannot affect this oracle."""
    from navigator_document_parser_spark.operators.similarity import (
        ivf_train_sampled,
        knn_ivf,
    )

    emb = _emb(spark, sf)
    cents = ivf_train_sampled(emb, n_centroids=16)
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = knn_ivf(emb, queries, cents, k=5, n_probe=16)
    return out.select(
        "query_id", "vec_id", "sim", F.col("rank").cast("bigint").alias("rank")
    )


def _events_hourly(spark, sf):
    e = spark.read.parquet(f"{sf}/events.parquet")
    return e.groupBy(
        F.date_trunc("hour", F.col("ts")).alias("hour"),
        "event_type",
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _events_gapfill(spark, sf):
    """Time-series resample + gap-fill: hourly buckets per event_type on
    a COMPLETE global grid (types x hours cross join of two tiny
    broadcast sides), zero-filled counts and forward-filled value sums
    (last non-null over an ordered per-type window — bounded partitions,
    one shuffle). The missing-bucket handling BI pipelines need before
    charting or anomaly detection; sums rounded 4dp pre-fill so the
    forward-filled value is the rounded observation on both engines."""
    from pyspark.sql.window import Window

    e = spark.read.parquet(f"{sf}/events.parquet")
    agg = (
        e.select(
            "event_type", F.date_trunc("hour", "ts").alias("bucket_ts"),
            "value",
        )
        .groupBy("event_type", "bucket_ts")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("value_sum"),
        )
    )
    bounds = e.agg(
        F.date_trunc("hour", F.min("ts")).alias("t0"),
        F.date_trunc("hour", F.max("ts")).alias("t1"),
    )
    grid = (
        e.select("event_type").distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(
                F.expr("sequence(t0, t1, interval 1 hour)")
            ).alias("bucket_ts"),
        )
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        grid.join(agg, ["event_type", "bucket_ts"], "left")
        .select(
            "event_type",
            "bucket_ts",
            F.coalesce("n_events", F.lit(0)).cast("bigint").alias(
                "n_events"
            ),
            F.last("value_sum", ignorenulls=True)
            .over(w)
            .alias("filled_value"),
        )
    )


_EVENTS_GAPFILL_ORACLE = """
    WITH agg AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket_ts,
             count(*) AS n_events, round(sum(value), 4) AS value_sum
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT date_trunc('hour', min(ts)) AS t0,
             date_trunc('hour', max(ts)) AS t1
      FROM events
    ), grid AS (
      SELECT t.event_type, g.bucket_ts
      FROM (SELECT DISTINCT event_type FROM events) t
      CROSS JOIN (
        SELECT unnest(generate_series(t0, t1, INTERVAL 1 HOUR))
          AS bucket_ts
        FROM bounds
      ) g
    )
    SELECT g.event_type, g.bucket_ts,
           CAST(COALESCE(a.n_events, 0) AS BIGINT) AS n_events,
           last_value(a.value_sum IGNORE NULLS) OVER (
             PARTITION BY g.event_type ORDER BY g.bucket_ts
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS filled_value
    FROM grid g LEFT JOIN agg a
      ON a.event_type = g.event_type AND a.bucket_ts = g.bucket_ts
"""


def _events_anomaly(spark, sf):
    """Rolling anomaly detection over the gap-filled hourly series:
    trailing-24h mean/std of the event count per type, z-score flag at
    |z| > 3. The window sums are INTEGER (counts), so mean and variance
    derive from exact sums with one fixed-order float division each —
    deterministic across engines without tolerance."""
    from pyspark.sql.window import Window

    counts = _events_gapfill(spark, sf).select(
        "event_type", "bucket_ts", "n_events"
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("bucket_ts")
        .rowsBetween(-23, 0)
    )
    stats = counts.select(
        "event_type",
        "bucket_ts",
        "n_events",
        F.sum("n_events").over(w).alias("s"),
        F.sum(F.col("n_events") * F.col("n_events")).over(w).alias("ss"),
        F.count(F.lit(1)).over(w).alias("nw"),
    )
    mean = F.col("s").cast("double") / F.col("nw")
    var = (
        F.col("ss").cast("double") / F.col("nw") - mean * mean
    )
    std = F.sqrt(F.greatest(var, F.lit(0.0)))
    z = F.when(
        std > 0, F.round((F.col("n_events") - mean) / std, 4)
    )
    return stats.select(
        "event_type",
        "bucket_ts",
        "n_events",
        z.alias("z_score"),
        F.coalesce(F.abs(z) > 3.0, F.lit(False)).alias("is_anomaly"),
    )


_EVENTS_ANOMALY_ORACLE = """
    WITH filled AS ({gapfill}),
    stats AS (
      SELECT event_type, bucket_ts, n_events,
             SUM(n_events) OVER w AS s,
             SUM(n_events * n_events) OVER w AS ss,
             COUNT(*) OVER w AS nw
      FROM filled
      WINDOW w AS (PARTITION BY event_type ORDER BY bucket_ts
                   ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
    ), scored AS (
      SELECT event_type, bucket_ts, n_events,
             CASE WHEN sqrt(greatest(
                      CAST(ss AS DOUBLE)/nw
                      - (CAST(s AS DOUBLE)/nw)*(CAST(s AS DOUBLE)/nw),
                      0.0)) > 0
                  THEN round((n_events - CAST(s AS DOUBLE)/nw)
                       / sqrt(greatest(
                           CAST(ss AS DOUBLE)/nw
                           - (CAST(s AS DOUBLE)/nw)*(CAST(s AS DOUBLE)/nw),
                           0.0)), 4)
             END AS z_score
      FROM stats
    )
    SELECT event_type, bucket_ts, n_events, z_score,
           COALESCE(abs(z_score) > 3.0, FALSE) AS is_anomaly
    FROM scored
""".replace("{gapfill}", _EVENTS_GAPFILL_ORACLE)


def _events_sessionize(spark, sf):
    """Gap-based sessionization (30-min inactivity) — the batch analog of
    the streaming stateful operator; pure window functions."""
    from pyspark.sql.window import Window

    e = spark.read.parquet(f"{sf}/events.parquet")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    secs = F.unix_timestamp(F.col("ts").cast("timestamp"))
    gap = F.when(secs - F.lag(secs).over(w) > 1800, 1).otherwise(0)
    with_session = e.withColumn(
        "session_idx",
        F.sum(gap).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("bigint"),
    )
    return with_session.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        F.round(F.sum("value"), 4).alias("sum_value"),
    )


def _events_asof_join(spark, sf):
    """Backward as-of join: every click gains the latest view (<= its
    ts) of the same user — matched against DuckDB's native ASOF JOIN."""
    from navigator_document_parser_spark.operators.joins import asof_join

    e = spark.read.parquet(f"{sf}/events.parquet")
    views = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")  # unique per (key, ts): deterministic
        .agg(F.round(F.max("value"), 4).alias("view_value"))
        .withColumn("view_ts", F.col("ts"))
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        "event_id", "user_id", "ts", F.round("value", 4).alias("click_value")
    )
    return asof_join(
        clicks, views, on=["user_id"], ts_col="ts",
        value_cols=["view_value", "view_ts"],
    ).select(
        "event_id", "user_id", "ts", "click_value", "view_ts", "view_value"
    )


def _events_range_join(spark, sf):
    """Keyless interval-containment join: every click is attributed to
    each purchase's 30-minute window containing it — bucketed equi-join
    formulation (never the cartesian Catalyst would plan for a bare
    inequality join)."""
    from navigator_document_parser_spark.operators.joins import range_join

    e = spark.read.parquet(f"{sf}/events.parquet")
    windows = e.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("window_id"),
        F.col("ts").alias("w_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("w_end"),
    )
    clicks = e.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    return range_join(
        clicks, windows, "click_ts", "w_start", "w_end", bucket=1800.0
    ).select("click_id", "click_ts", "window_id")


def _events_retention(spark, sf):
    """Weekly cohort retention: users grouped by the week of their first
    event, counted in each subsequent week they were active. Two
    aggregations and a join, all keyed on user_id."""
    e = spark.read.parquet(f"{sf}/events.parquet")
    first = e.groupBy("user_id").agg(
        F.min(F.date_trunc("week", F.col("ts"))).alias("cohort_week")
    )
    active = e.select(
        "user_id", F.date_trunc("week", F.col("ts")).alias("active_week")
    ).dropDuplicates(["user_id", "active_week"])
    j = active.join(first, "user_id")
    return (
        j.groupBy(
            "cohort_week",
            (
                F.datediff(F.col("active_week"), F.col("cohort_week"))
                / 7
            ).cast("bigint").alias("week_n"),
        )
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


def _events_funnel(spark, sf):
    """Temporal conversion funnel per user: first view, first click AT
    OR AFTER that view, first purchase at or after that click, and the
    stage reached (0-3). Three conditional aggregations all keyed on
    user_id — one hash partitioning carried through."""
    e = spark.read.parquet(f"{sf}/events.parquet").select(
        "user_id", "event_type", "ts"
    )
    v = e.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("ts"))).alias(
            "first_view"
        )
    )
    c = (
        e.join(v, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("ts") >= F.col("first_view")),
                    F.col("ts"),
                )
            ).alias("first_click")
        )
    )
    p = (
        e.join(c, "user_id")
        .groupBy("user_id")
        .agg(
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("ts") >= F.col("first_click")),
                    F.col("ts"),
                )
            ).alias("first_purchase")
        )
    )
    out = v.join(c, "user_id").join(p, "user_id")
    stage = (
        F.when(F.col("first_purchase").isNotNull(), 3)
        .when(F.col("first_click").isNotNull(), 2)
        .when(F.col("first_view").isNotNull(), 1)
        .otherwise(0)
    )
    return out.select(
        "user_id",
        "first_view",
        "first_click",
        "first_purchase",
        stage.cast("bigint").alias("stage"),
    )


def _events_pivot(spark, sf):
    """PIVOT: per-day event-type counts as columns (one aggregation
    pass; Spark computes the pivot in a single shuffle over day)."""
    e = spark.read.parquet(f"{sf}/events.parquet")
    p = (
        e.groupBy(F.date_trunc("day", F.col("ts")).alias("day"))
        .pivot("event_type", ["view", "click", "purchase"])
        .agg(F.count(F.lit(1)))
    )
    return p.select(
        "day",
        F.coalesce("view", F.lit(0)).cast("bigint").alias("n_view"),
        F.coalesce("click", F.lit(0)).cast("bigint").alias("n_click"),
        F.coalesce("purchase", F.lit(0)).cast("bigint").alias("n_purchase"),
    )


def _json_extract(spark, sf):
    """Semi-structured path: synthesize a JSON payload per doc, parse it
    with from_json, and explode the nested tag array. The oracle does
    NOT parse JSON — it derives the same rows from the synthesis rule,
    so this checks OUR parse against ground truth."""
    d = _docs(spark, sf)
    js = F.concat(
        F.lit('{"doc": '),
        F.col("doc_id").cast("string"),
        F.lit(', "lang": "'),
        F.col("lang"),
        F.lit('", "tags": ["t'),
        (F.col("doc_id") % 5).cast("string"),
        F.lit('", "u'),
        (F.col("doc_id") % 3).cast("string"),
        F.lit('"]}'),
    )
    parsed = d.select(
        F.from_json(
            js, "struct<doc:bigint,lang:string,tags:array<string>>"
        ).alias("p")
    )
    return parsed.select(
        F.col("p.doc").alias("doc"),
        F.col("p.lang").alias("lang"),
        F.explode("p.tags").alias("tag"),
    )


def _events_topk_per_type(spark, sf):
    from pyspark.sql.window import Window

    e = spark.read.parquet(f"{sf}/events.parquet")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").desc(), F.col("event_id").asc()
    )
    return (
        e.withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 3)
        .select("event_type", "rank", "event_id", F.round("value", 4).alias("value"))
    )


def _q1_pricing_summary(spark, sf):
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def _q3_revenue_top10(spark, sf):
    cust = spark.read.parquet(f"{sf}/customer.parquet")
    orders = spark.read.parquet(f"{sf}/orders.parquet")
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    rev = (
        li.groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    j = (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(rev, orders.o_orderkey == rev.l_orderkey)
        .select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("c_name").alias("customer"),
            "revenue",
        )
    )
    return j.orderBy(F.col("revenue").desc(), F.col("orderkey").asc()).limit(10)


def _q5_local_supplier(spark, sf):
    """TPC-H Q5 shape: revenue per nation where customer and supplier
    share the nation, one region, one order year — the 6-table join
    whose ordering Catalyst must get right: region/nation broadcast up
    the chain, the selective o_orderdate predicate pushed to the orders
    scan, lineitem joined last on the shrunken keys."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    o = spark.read.parquet(f"{sf}/orders.parquet").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = spark.read.parquet(f"{sf}/customer.parquet")
    s = spark.read.parquet(f"{sf}/supplier.parquet")
    n = spark.read.parquet(f"{sf}/nation.parquet")
    r = spark.read.parquet(f"{sf}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    j = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(
            s,
            (li.l_suppkey == s.s_suppkey)
            & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    )
    return (
        j.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice") * (1 - F.col("l_discount"))
                ),
                2,
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_lineitems"),
        )
    )


def _q6_forecast_revenue(spark, sf):
    """TPC-H Q6 shape: the pushed-filter showcase — three selective
    scan predicates, zero joins, one global aggregate."""
    li = spark.read.parquet(f"{sf}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1996-01-01")
            & (F.col("l_shipdate") < "1997-01-01")
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def _multimodal_features(spark, sf):
    from navigator_document_parser_spark.operators.multimodal import (
        extract_media_features,
        synth_media,
    )

    _ensure_workers_can_import(spark)
    media = synth_media(spark, 200, partitions=4)
    # features ride as an int CSV: each fake feature is exactly
    # (k - 10000)/10000 for an integer k, so round(x*10000) recovers the
    # integer on any engine (float32 error is ~6e-4 after the multiply —
    # far from the .5 boundary), sidestepping float-repr differences
    return extract_media_features(media, dim=8).select(
        "media_id",
        "kind",
        "n_bytes",
        "content_hash",
        F.expr(
            "concat_ws(',', transform(features, "
            "x -> CAST(round(CAST(x AS DOUBLE) * 10000) AS INT)))"
        ).alias("features_q"),
    )


def _multimodal_features_oracle_sql(n: int = 200, dim: int = 8) -> str:
    """Independent pure-Python re-derivation of the deterministic fake
    media pipeline (synth_media payload -> md5-chain features), embedded
    as a VALUES literal: DuckDB's md5() is VARCHAR-only, so the
    binary-payload hash cannot be derived in SQL. The derivation below
    deliberately does NOT import the operator module — it restates the
    spec (multimodal.py synth_media/fake_features) the way the golden
    fixtures restate the extraction spec."""
    import hashlib as _hl

    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        size = 64 + (i * 37) % 512
        payload = (
            _hl.md5(f"media{i}".encode()).digest() * (size // 16 + 1)
        )[:size]
        h = payload
        feats = []
        for d in range(dim):
            h = _hl.md5(h + bytes([d])).digest()
            feats.append(int.from_bytes(h[:4], "big") % 20001 - 10000)
        rows.append(
            f"({i}, '{kinds[i % 3]}', {size}, "
            f"'{_hl.md5(payload).hexdigest()}', "
            f"'{','.join(str(f) for f in feats)}')"
        )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, kind, "
        "CAST(n_bytes AS BIGINT) AS n_bytes, content_hash, features_q "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(media_id, kind, "
        "n_bytes, content_hash, features_q)"
    )


def _multimodal_frames_oracle_sql(n: int = 200, n_frames: int = 4,
                                  frame_px: int = 16) -> str:
    """Independent pure-Python re-derivation of sample_video_frames over
    synth_media, embedded as a VALUES literal (same technique and
    reasoning as _multimodal_features_oracle_sql: the md5-of-binary
    chain is not derivable in DuckDB SQL). Restates the spec — synth
    payload -> duration proxy -> mid-frame timestamps -> fake raster ->
    content hash — without importing the operator module."""
    import hashlib as _hl

    def raster(data: bytes, w: int, h: int) -> bytes:
        need = w * h
        out = bytearray()
        d = _hl.md5(data + f":{w}x{h}".encode()).digest()
        while len(out) < need:
            out.extend(d)
            d = _hl.md5(d).digest()
        return bytes(out[:need])

    rows = []
    for i in range(n):
        if i % 3 != 2:  # kinds cycle image/audio/video; video is i%3==2
            continue
        size = 64 + (i * 37) % 512
        payload = (
            _hl.md5(f"media{i}".encode()).digest() * (size // 16 + 1)
        )[:size]
        duration_ms = size * 10
        for k in range(n_frames):
            ts = (duration_ms * (2 * k + 1)) // (2 * n_frames)
            frame = raster(
                payload + ts.to_bytes(8, "big"), frame_px, frame_px
            )
            rows.append(
                f"({i}, {k}, {ts}, '{_hl.md5(frame).hexdigest()}')"
            )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, "
        "CAST(frame_idx AS BIGINT) AS frame_idx, "
        "CAST(frame_ts_ms AS BIGINT) AS frame_ts_ms, content_hash "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(media_id, "
        "frame_idx, frame_ts_ms, content_hash)"
    )


def _multimodal_audio_oracle_sql(n: int = 200, window_bytes: int = 64,
                                 hop_bytes: int = 32) -> str:
    """Independent pure-Python re-derivation of window_audio_samples
    over synth_media as a VALUES literal (same technique as the frames
    oracle — md5-of-binary chains are not derivable in DuckDB SQL)."""
    import hashlib as _hl

    rows = []
    for i in range(n):
        if i % 3 != 1:  # kinds cycle image/audio/video; audio is i%3==1
            continue
        size = 64 + (i * 37) % 512
        payload = (
            _hl.md5(f"media{i}".encode()).digest() * (size // 16 + 1)
        )[:size]
        n_wins = (
            0 if size < window_bytes
            else 1 + (size - window_bytes) // hop_bytes
        )
        for k in range(n_wins):
            start = k * hop_bytes
            win = payload[start:start + window_bytes]
            rows.append(
                f"({i}, {k}, {start}, '{_hl.md5(win).hexdigest()}')"
            )
    return (
        "SELECT CAST(media_id AS BIGINT) AS media_id, "
        "CAST(win_idx AS BIGINT) AS win_idx, "
        "CAST(start_byte AS BIGINT) AS start_byte, content_hash "
        "FROM (VALUES " + ", ".join(rows) + ") AS t(media_id, "
        "win_idx, start_byte, content_hash)"
    )


def _multimodal_audio(spark, sf):
    """Audio sample-window fan-out (variable 1->N mapInPandas; PCM
    decode is the documented stub boundary, the window byte-ranges and
    content hashes are pure md5-chain math — hash-checked against the
    python VALUES oracle)."""
    from navigator_document_parser_spark.operators.multimodal import (
        synth_media,
        window_audio_samples,
    )

    _ensure_workers_can_import(spark)
    media = synth_media(spark, 200, partitions=4)
    return window_audio_samples(media, window_bytes=64, hop_bytes=32).select(
        "media_id", "win_idx", "start_byte", "content_hash"
    )


def _multimodal_frames(spark, sf):
    """Video frame-sampling fan-out (mapInPandas 1->N shape; the raster
    decode is the documented stub boundary, but frame timestamps and
    content hashes are pure md5-chain math — hash-checked against the
    python VALUES oracle since r4)."""
    from navigator_document_parser_spark.operators.multimodal import (
        sample_video_frames,
        synth_media,
    )

    _ensure_workers_can_import(spark)
    media = synth_media(spark, 200, partitions=4)
    return sample_video_frames(media, n_frames=4).select(
        "media_id", "frame_idx", "frame_ts_ms", "content_hash"
    )


def _dedup_containment(spark, sf):
    """Asymmetric shingle containment (|A∩B|/|A|) — the
    snippet-inside-page duplication Jaccard misses; deliberately
    length-band-free, inverted-index formulation
    (operators/dedup.py containment_pairs)."""
    from navigator_document_parser_spark.operators.dedup import (
        containment_pairs,
    )

    return containment_pairs(_docs(spark, sf), threshold=0.3)


def _quantile_sketch(spark, sf):
    """Mergeable log2-histogram quantiles of doc length per language,
    with the exact order statistic alongside as the error audit
    (operators/sketches.py quantile_hist)."""
    from navigator_document_parser_spark.operators.sketches import (
        quantile_hist,
    )

    return quantile_hist(_docs(spark, sf))


def _crawl_depth(spark, sf):
    """Multi-source BFS crawl depth from seed hosts over a two-layer
    directed link graph (source hosts -> 'h<k>' content hosts -> back
    to source hosts, so real multi-hop paths exist); 4 bounded rounds,
    integer sentinel for unreached (operators/graph.py bfs_depth)."""
    from navigator_document_parser_spark.operators.graph import bfs_depth

    d = _docs(spark, sf)
    fwd = d.select(
        F.col("source").alias("src_host"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
        ).alias("dst_host"),
    )
    back = d.select(
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
        ).alias("src_host"),
        F.concat(
            F.lit("src"), ((F.col("doc_id") * 11 + 5) % 20).cast("string")
        ).alias("dst_host"),
    )
    return bfs_depth(fwd.union(back), seeds=["src0", "src1"], rounds=4)


_CRAWL_DEPTH_EDGES_SQL = """
    SELECT source AS src_host,
           'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst_host
    FROM documents
    UNION ALL
    SELECT 'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR),
           'src' || CAST((doc_id * 11 + 5) % 20 AS VARCHAR)
    FROM documents
"""


def _embed_hash(spark, sf):
    """Hashing-trick document embeddings (16-dim signed token-count
    vectors, pure integer — the model-free on-cluster text embedder;
    operators/similarity.py feature_hash_embed)."""
    from navigator_document_parser_spark.operators.similarity import (
        feature_hash_embed,
    )

    return feature_hash_embed(_docs(spark, sf))


def _hybrid_search(spark, sf):
    """Hybrid retrieval: BM25 + feature-hash-cosine fused by
    reciprocal-rank fusion (rank-only math — engine-exact;
    operators/search.py hybrid_search_rrf)."""
    from navigator_document_parser_spark.operators.search import (
        hybrid_search_rrf,
    )

    return hybrid_search_rrf(_docs(spark, sf), _SEARCH_QUERIES)


def _k_core_hosts(spark, sf):
    """Bounded k-core peel of a doc-derived undirected host graph
    (distinct moduli give an irregular degree distribution, so low-
    degree fringe nodes actually peel); 5 rounds, k=4
    (operators/graph.py k_core)."""
    from navigator_document_parser_spark.operators.graph import k_core

    d = _docs(spark, sf)
    edges = d.select(
        F.concat(
            F.lit("n"), (F.col("doc_id") % 97).cast("string")
        ).alias("src_host"),
        F.concat(
            F.lit("n"), ((F.col("doc_id") * 13 + 5) % 89).cast("string")
        ).alias("dst_host"),
    )
    return k_core(edges, k=4, rounds=5)


_K_CORE_EDGES_SQL = """
    SELECT 'n' || CAST(doc_id % 97 AS VARCHAR) AS src_host,
           'n' || CAST((doc_id * 13 + 5) % 89 AS VARCHAR) AS dst_host
    FROM documents
"""


def _shard_layout(spark, sf):
    """Rendezvous-hash shard assignment at 8 and 9 shards in one pass;
    the moved column is the relayout cost of adding a shard (expected
    1/9 of keys — vs ~8/9 under mod-hash; operators/layout.py
    rendezvous_shards)."""
    from navigator_document_parser_spark.operators.layout import (
        rendezvous_shards,
    )

    d = _docs(spark, sf).withColumn(
        "url",
        F.concat(
            F.lit("https://"), F.col("source"), F.lit("/doc/"),
            F.col("doc_id").cast("string"),
        ),
    )
    return rendezvous_shards(d, key_col="url", shards=8, alt_shards=9)


# every repairable mojibake good char (incl. an invisible U+00A0 nbsp
# between the 'ç' and 'end'), exercised at least once in a fixed
# suffix: the corpus text is ASCII-ish, so the suffix guarantees
# nonzero repair mass per row; pytest pins suffix-covers-all-goods
_MOJI_SUFFIX = (
    " café – élève’s “quote…"
    " ä ö ü ñ ç end — fin"
)


def _fix_encoding(spark, sf):
    """Encoding repair (ftfy's UTF-8-as-cp1252 core case): corrupt
    text||suffix through the inverse mojibake map, repair with
    fix_mojibake, and verify restoration — the full corrupt->repair
    loop in one codegen projection (operators/text.py fix_mojibake;
    chars_repaired = length delta, never per-pattern counts — lessons
    2/9)."""
    from navigator_document_parser_spark.operators.text import (
        fix_mojibake,
        mojibake_pairs,
    )

    d = _docs(spark, sf)
    orig = F.concat(F.col("text"), F.lit(_MOJI_SUFFIX))
    corrupted = orig
    for bad, good in mojibake_pairs():
        corrupted = F.replace(corrupted, F.lit(good), F.lit(bad))
    fixed = fix_mojibake(corrupted)
    return d.select(
        "doc_id",
        F.length(corrupted).cast("bigint").alias("n_chars"),
        (F.length(corrupted) - F.length(fixed))
        .cast("bigint")
        .alias("chars_repaired"),
        (fixed == orig).cast("int").alias("restored"),
    )


def _fix_encoding_oracle() -> str:
    from navigator_document_parser_spark.operators import sql_quote
    from navigator_document_parser_spark.operators.text import (
        mojibake_pairs,
        oracle_fix_mojibake_sql,
    )

    orig = f"(text || {sql_quote(_MOJI_SUFFIX)})"
    corr = orig
    for bad, good in mojibake_pairs():
        corr = f"replace({corr}, {sql_quote(good)}, {sql_quote(bad)})"
    fixed = oracle_fix_mojibake_sql(corr)
    return f"""
        SELECT doc_id,
               CAST(length(corr) AS BIGINT) AS n_chars,
               CAST(length(corr) - length(fixed) AS BIGINT)
                 AS chars_repaired,
               CAST(CASE WHEN fixed = orig THEN 1 ELSE 0 END AS INT)
                 AS restored
        FROM (
          SELECT doc_id, {orig} AS orig, {corr} AS corr, {fixed} AS fixed
          FROM documents
        )
    """


def _weighted_sample(spark, sf):
    """A-ES weighted sampling without replacement: 10 length-weighted
    exemplar docs per language via rounded exponential keys
    (operators/selection.py weighted_sample)."""
    from navigator_document_parser_spark.operators.selection import (
        weighted_sample,
    )

    return weighted_sample(_docs(spark, sf), k=10)


def _triangle_hosts(spark, sf):
    """Per-host triangle counts over the same doc-derived undirected
    graph as k_core_hosts (operators/graph.py triangle_count: canonical
    a<b<c wedge enumeration, two equi-joins + one semi-join)."""
    from navigator_document_parser_spark.operators.graph import (
        triangle_count,
    )

    d = _docs(spark, sf)
    edges = d.select(
        F.concat(
            F.lit("n"), (F.col("doc_id") % 97).cast("string")
        ).alias("src_host"),
        F.concat(
            F.lit("n"), ((F.col("doc_id") * 13 + 5) % 89).cast("string")
        ).alias("dst_host"),
    )
    return triangle_count(edges)


def _snippet_search(spark, sf):
    """Serving-side snippet extraction over the BM25 top-5: first
    case-folded term occurrence anchors an 80-char display window
    (operators/search.py snippet_search; integer strpos/substr math,
    engine-exact including the snippet text)."""
    from navigator_document_parser_spark.operators.search import (
        snippet_search,
    )

    return snippet_search(_docs(spark, sf), _SEARCH_QUERIES)


def _sitemap_parse(spark, sf):
    """Sitemap ingestion roundtrip: synthesize one pretty-printed
    sitemap XML document per source (urls sorted by doc_id, optional
    priority, plus one <sitemap> child to exercise the index path —
    the parser is deliberately lenient about element placement), then
    parse it back with sources/sitemap.parse_sitemap. Exercises the
    newline-flatten + block/field regex pipeline end-to-end; the
    DuckDB oracle replays synthesis AND parse."""
    from navigator_document_parser_spark.sources.sitemap import (
        parse_sitemap,
    )

    d = _docs(spark, sf)
    entry = F.concat(
        F.lit("<url> <loc>https://"), F.col("source"), F.lit("/doc/"),
        F.col("doc_id").cast("string"),
        F.lit("</loc> <lastmod>2025-"),
        F.lpad(((F.col("doc_id") % 12) + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0"),
        F.lit("</lastmod> "),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit("<priority>0."),
                (F.col("doc_id") % 10).cast("string"),
                F.lit("</priority> "),
            ),
        ).otherwise(F.lit("")),
        F.lit("</url>"),
    )
    sm = (
        d.select(
            F.col("source").alias("site"),
            F.struct(F.col("doc_id"), entry.alias("e")).alias("s"),
        )
        .groupBy("site")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["e"]
                ),
                "\n",
            ).alias("body")
        )
    )
    xml = sm.select(
        "site",
        F.concat(
            F.lit('<?xml version="1.0"?>\n<urlset>\n'),
            F.col("body"),
            F.lit("\n<sitemap><loc>https://"),
            F.col("site"),
            F.lit("/sitemap2.xml</loc></sitemap>\n</urlset>"),
        ).alias("xml"),
    )
    return parse_sitemap(xml)


def _sitemap_parse_oracle() -> str:
    from navigator_document_parser_spark.sources.sitemap import (
        oracle_parse_sitemap,
    )

    synth = """
        WITH e AS (
          SELECT source AS site, doc_id,
                 '<url> <loc>https://' || source || '/doc/'
                 || CAST(doc_id AS VARCHAR)
                 || '</loc> <lastmod>2025-'
                 || lpad(CAST((doc_id % 12) + 1 AS VARCHAR), 2, '0')
                 || '-'
                 || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
                 || '</lastmod> '
                 || CASE WHEN doc_id % 3 = 0
                         THEN '<priority>0.'
                              || CAST(doc_id % 10 AS VARCHAR)
                              || '</priority> '
                         ELSE '' END
                 || '</url>' AS entry
          FROM documents
        )
        SELECT site,
               '<?xml version="1.0"?>' || chr(10) || '<urlset>'
               || chr(10)
               || string_agg(entry, chr(10) ORDER BY doc_id)
               || chr(10) || '<sitemap><loc>https://' || site
               || '/sitemap2.xml</loc></sitemap>' || chr(10)
               || '</urlset>' AS xml
        FROM e GROUP BY site
    """
    return oracle_parse_sitemap(synth)


def _feed_parse(spark, sf):
    """RSS/Atom feed ingestion roundtrip: synthesize one feed document
    per source (format chosen by md5(source) — ~half RSS 2.0, half
    Atom), entries pretty-printed across lines, with deliberate field
    omissions (title / pubDate / Atom link) to exercise NULLs and the
    required-url drop; parse back with sources/feed.parse_feed. The
    DuckDB oracle replays synthesis AND parse."""
    from navigator_document_parser_spark.sources.feed import parse_feed

    d = _docs(spark, sf)
    n = F.col("doc_id").cast("string")
    date = F.concat(
        F.lit("2025-"),
        F.lpad(((F.col("doc_id") % 12) + 1).cast("string"), 2, "0"),
        F.lit("-"),
        F.lpad(((F.col("doc_id") % 28) + 1).cast("string"), 2, "0"),
    )
    title = F.when(
        F.col("doc_id") % 5 != 0,
        F.concat(F.lit("<title>Doc "), n, F.lit("</title>\n")),
    ).otherwise(F.lit(""))
    rss_item = F.concat(
        F.lit("<item>\n"),
        title,
        F.lit("<link>https://"), F.col("source"), F.lit("/doc/"), n,
        F.lit("</link>\n"),
        F.lit('<guid isPermaLink="true">guid-'), n, F.lit("</guid>\n"),
        F.when(
            F.col("doc_id") % 7 != 0,
            F.concat(F.lit("<pubDate>"), date, F.lit("</pubDate>\n")),
        ).otherwise(F.lit("")),
        F.lit("</item>"),
    )
    atom_entry = F.concat(
        F.lit("<entry>\n"),
        title,
        F.lit("<id>tag:"), F.col("source"), F.lit(","), n,
        F.lit("</id>\n"),
        F.when(
            F.col("doc_id") % 6 != 0,
            F.concat(
                F.lit('<link rel="alternate" href="https://'),
                F.col("source"), F.lit("/doc/"), n, F.lit('"/>\n'),
            ),
        ).otherwise(F.lit("")),
        F.lit("<updated>"), date, F.lit("</updated>\n</entry>"),
    )
    fmt = F.when(
        F.substring(F.md5(F.col("source")), 1, 1) < "8", F.lit("rss")
    ).otherwise(F.lit("atom"))
    entry = F.when(fmt == "rss", rss_item).otherwise(atom_entry)
    feeds = (
        d.select(
            F.col("source").alias("feed"),
            fmt.alias("fmt"),
            F.struct(F.col("doc_id"), entry.alias("e")).alias("s"),
        )
        .groupBy("feed", "fmt")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list("s")), lambda x: x["e"]
                ),
                "\n",
            ).alias("body")
        )
    )
    xml = feeds.select(
        "feed",
        F.when(
            F.col("fmt") == "rss",
            F.concat(
                F.lit('<?xml version="1.0"?>\n<rss version="2.0">'
                      "<channel>\n<title>"),
                F.col("feed"),
                F.lit(" feed</title>\n"),
                F.col("body"),
                F.lit("\n</channel></rss>"),
            ),
        ).otherwise(
            F.concat(
                F.lit('<feed xmlns="http://www.w3.org/2005/Atom">\n'
                      "<title>"),
                F.col("feed"),
                F.lit(" feed</title>\n<id>tag:"),
                F.col("feed"),
                F.lit("</id>\n"),
                F.col("body"),
                F.lit("\n</feed>"),
            ),
        ).alias("xml"),
    )
    return parse_feed(xml, xml_col="xml", feed_col="feed")


def _feed_parse_oracle() -> str:
    from navigator_document_parser_spark.sources.feed import (
        oracle_parse_feed,
    )

    synth = """
        WITH e AS (
          SELECT source AS feed, doc_id,
                 CASE WHEN substring(md5(source), 1, 1) < '8'
                      THEN 'rss' ELSE 'atom' END AS fmt,
                 CASE WHEN doc_id % 5 <> 0
                      THEN '<title>Doc ' || CAST(doc_id AS VARCHAR)
                           || '</title>' || chr(10)
                      ELSE '' END AS title,
                 '2025-'
                 || lpad(CAST((doc_id % 12) + 1 AS VARCHAR), 2, '0')
                 || '-'
                 || lpad(CAST((doc_id % 28) + 1 AS VARCHAR), 2, '0')
                   AS dt
          FROM documents
        ), entries AS (
          SELECT feed, fmt, doc_id,
                 CASE WHEN fmt = 'rss' THEN
                   '<item>' || chr(10) || title
                   || '<link>https://' || feed || '/doc/'
                   || CAST(doc_id AS VARCHAR) || '</link>' || chr(10)
                   || '<guid isPermaLink="true">guid-'
                   || CAST(doc_id AS VARCHAR) || '</guid>' || chr(10)
                   || CASE WHEN doc_id % 7 <> 0
                           THEN '<pubDate>' || dt || '</pubDate>'
                                || chr(10)
                           ELSE '' END
                   || '</item>'
                 ELSE
                   '<entry>' || chr(10) || title
                   || '<id>tag:' || feed || ','
                   || CAST(doc_id AS VARCHAR) || '</id>' || chr(10)
                   || CASE WHEN doc_id % 6 <> 0
                           THEN '<link rel="alternate" href="https://'
                                || feed || '/doc/'
                                || CAST(doc_id AS VARCHAR) || '"/>'
                                || chr(10)
                           ELSE '' END
                   || '<updated>' || dt || '</updated>' || chr(10)
                   || '</entry>'
                 END AS entry
          FROM e
        )
        SELECT feed,
               CASE WHEN fmt = 'rss' THEN
                 '<?xml version="1.0"?>' || chr(10)
                 || '<rss version="2.0"><channel>' || chr(10)
                 || '<title>' || feed || ' feed</title>' || chr(10)
                 || string_agg(entry, chr(10) ORDER BY doc_id)
                 || chr(10) || '</channel></rss>'
               ELSE
                 '<feed xmlns="http://www.w3.org/2005/Atom">' || chr(10)
                 || '<title>' || feed || ' feed</title>' || chr(10)
                 || '<id>tag:' || feed || '</id>' || chr(10)
                 || string_agg(entry, chr(10) ORDER BY doc_id)
                 || chr(10) || '</feed>'
               END AS xml
        FROM entries GROUP BY feed, fmt
    """
    return oracle_parse_feed(synth)


# shared Spark/DuckDB synthesis (chr(10) is ASCII-safe in both engines —
# CLAUDE.md lesson 17): every doc gets a host nav line + a copyright
# footer; 1/3 get a semi-common 'subscribe' line that must SURVIVE the
# 60% threshold; the body line is the doc's own text (dropped only if
# the identical body repeats across >=60% of a host's docs — exact dups
# exist in the corpus and both engines agree).
_BOILERPLATE_SRC_SQL = """
    SELECT doc_id, source AS host,
           concat_ws(chr(10),
             'home | about | ' || source,
             text,
             CASE WHEN doc_id % 3 = 0 THEN 'subscribe to ' || source END,
             'copyright ' || source) AS text
    FROM documents
"""


def _boilerplate_strip(spark, sf):
    """Per-host template-line removal at a 60% document-frequency
    threshold: nav + footer lines (100% of host docs) are stripped, the
    1/3-frequency subscribe line and unique bodies survive
    (operators/text.py boilerplate_strip — line frequency is one
    (host, md5(line)) hash aggregate, rebuild one more; no windows)."""
    from navigator_document_parser_spark.operators.text import (
        boilerplate_strip,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    src = spark.sql(_BOILERPLATE_SRC_SQL)
    return boilerplate_strip(src, min_docs=2, threshold_pct=60)


def _keyness_terms(spark, sf):
    """Top-25 characteristic terms of the English slice vs the rest by
    Dunning G^2 log-likelihood — the corpus-comparison profile run
    before writing domain filter rules (operators/text.py
    keyness_terms: one conditional token aggregate + checkpointed
    totals fold-back + TakeOrdered top-k)."""
    from navigator_document_parser_spark.operators.text import (
        keyness_terms,
    )

    return keyness_terms(_docs(spark, sf), focus="en", k=25)


def _recrawl_visits_sql(dialect: str) -> str:
    """Shared visit-log synthesis: 5 visits per url, changed with a
    per-url propensity (doc_id%5+1)/6 decided by the portable md5_u32
    hash — integer mod both sides, engine-exact."""
    from navigator_document_parser_spark.operators import md5_u32_sql

    cast = "STRING" if dialect == "spark" else "VARCHAR"
    inner = (
        f"'cr:' || CAST(doc_id AS {cast}) || ':' || CAST(v AS {cast})"
    )
    fan = (
        "documents LATERAL VIEW explode(sequence(0, 4)) t AS v"
        if dialect == "spark"
        else "documents, generate_series(0, 4) AS t(v)"
    )
    return f"""
        SELECT 'https://' || source || '/p' || CAST(doc_id AS {cast})
                 AS url,
               ({md5_u32_sql(inner, dialect)} % 6) < (doc_id % 5 + 1)
                 AS changed
        FROM {fan}
    """


def _recrawl_schedule(spark, sf):
    """Freshness loop of an incremental crawler: per-URL Cho &
    Garcia-Molina change-rate estimates + integer-exact revisit tiers
    from a synthetic 5-visit change log (operators/urls.py
    recrawl_schedule — one hash aggregate, shared SQL fragments)."""
    from navigator_document_parser_spark.operators.urls import (
        recrawl_schedule,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    visits = spark.sql(_recrawl_visits_sql("spark"))
    return recrawl_schedule(visits)


# DUST synthesis: groups of 4 urls (canonical / index.html / ?sid= /
# ?sid=&ref=x) sharing one content hash, except every 7th group's
# index.html carries DIFFERENT content — so strip-param:ref validates,
# strip-param:sid part-resolves, and strip-index accumulates
# counterevidence (the negative path is exercised, not just the happy
# one).
_DUST_PAGES_SQL = """
    SELECT CASE doc_id % 4
             WHEN 0 THEN base
             WHEN 1 THEN base || '/index.html'
             WHEN 2 THEN base || '?sid=' || sid
             ELSE base || '?sid=' || sid || '&ref=x' END AS url,
           CASE WHEN doc_id % 4 = 1 AND g % 7 = 0
                THEN md5('c:' || CAST(g AS STRING) || ':x')
                ELSE md5('c:' || CAST(g AS STRING)) END AS content_hash
    FROM (
      SELECT doc_id, doc_id {DIV} 4 AS g,
             'https://h' || CAST((doc_id {DIV} 4) % 10 AS STRING)
               || '.example/p' || CAST(doc_id {DIV} 4 AS STRING) AS base,
             substring(md5('s:' || CAST(doc_id {DIV} 4 AS STRING)), 1, 6)
               AS sid
      FROM documents
    )
"""


def _dust_rules(spark, sf):
    """DUST rule mining (Bar-Yossef et al.): which URL rewrites
    (strip index.html, strip sid/ref params) provably preserve content
    on this crawl — candidates are a map-only projection, resolution
    ONE equi-join on the rewrite target, verdict a #rules-row aggregate
    (operators/urls.py dust_rules)."""
    from navigator_document_parser_spark.operators.urls import dust_rules

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    pages = spark.sql(_DUST_PAGES_SQL.format(DIV="div"))
    return dust_rules(pages, min_support=2)


def _related_hosts(spark, sf):
    """Top-5 related hosts by co-citation over a two-generator host
    link graph (each source cites two deterministic sink families) —
    the "related pages" neighborhood signal (operators/graph.py
    cocitation_topk: distinct edges, hub cap, one wedge self-join)."""
    from navigator_document_parser_spark.operators.graph import (
        cocitation_topk,
    )

    d = _docs(spark, sf)
    e1 = d.select(
        F.col("source").alias("src_host"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
        ).alias("dst_host"),
    )
    e2 = d.select(
        F.col("source").alias("src_host"),
        F.concat(
            F.lit("h"), ((F.col("doc_id") * 11 + 5) % 40).cast("string")
        ).alias("dst_host"),
    )
    return cocitation_topk(e1.unionByName(e2), k=5, max_out=1000)


_RELATED_HOSTS_EDGES_SQL = """
    SELECT source AS src_host,
           'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst_host
    FROM documents
    UNION ALL
    SELECT source AS src_host,
           'h' || CAST((doc_id * 11 + 5) % 40 AS VARCHAR) AS dst_host
    FROM documents
"""


# the audit's documented usage is ON A SAMPLE (the unblocked exact
# ground truth is quadratic in shingle document frequency — that cost
# is the whole reason production dedups use LSH); the deterministic
# half-corpus sample is an integer-exact md5 parity test, not a float
# fraction compare
_LSH_AUDIT_SAMPLE_INNER = "'lshaudit:' || CAST(doc_id AS {cast})"


def _lsh_audit(spark, sf):
    """LSH tuning audit: precision/recall of the (4 hashes, 2 bands)
    MinHash candidate set vs unblocked exact-Jaccard ground truth at
    J >= 0.2, measured on a deterministic md5-parity half-sample — the
    parameter-selection loop run before a full-corpus dedup
    (operators/dedup.py lsh_audit; one checkpointed shingle table
    feeds truth + candidate branches)."""
    from navigator_document_parser_spark.operators import md5_u32_sql
    from navigator_document_parser_spark.operators.dedup import lsh_audit

    inner = _LSH_AUDIT_SAMPLE_INNER.format(cast="STRING")
    sampled = _docs(spark, sf).filter(
        F.expr(f"{md5_u32_sql(inner, 'spark')} % 2 = 0")
    )
    return lsh_audit(sampled, num_hashes=4, bands=2, threshold=0.2)


def _dedup_snm(spark, sf):
    """Sorted-neighborhood dedup blocking: 4-row sliding window down
    the (text-prefix, id) sort order, exact-Jaccard verify inside the
    window (operators/dedup.py sorted_neighborhood_pairs — distributed
    rank via range partitions + offsets, one integer equi-join)."""
    from navigator_document_parser_spark.operators.dedup import (
        sorted_neighborhood_pairs,
    )

    return sorted_neighborhood_pairs(
        _docs(spark, sf), window=4, threshold=0.2
    )


# shared HTML synthesis: header row (th), a data row, an extra row for
# 1/4 of docs (with a colspan attribute), a second single-cell table
# with inner markup for 1/5, pretty-print newlines to exercise the
# flatten, and 1/11 of docs carry no table at all
_HTML_TABLES_SRC_SQL = """
    SELECT doc_id,
           CASE WHEN doc_id % 11 = 0
                THEN '<html><p>just text, no tables</p></html>'
                ELSE '<html><body><h1>' || source || '</h1>'
                  || '<table class="t"> <tr><th> Name </th>'
                  || '<th>Value</th></tr> ' || chr(10)
                  || '<tr><td>doc</td><td>'
                  || CAST(doc_id AS STRING) || '</td></tr>'
                  || CASE WHEN doc_id % 4 = 0
                          THEN '<tr><td colspan="2">extra '
                            || CAST(doc_id % 7 AS STRING) || '</td></tr>'
                          ELSE '' END
                  || '</table>'
                  || CASE WHEN doc_id % 5 = 0
                          THEN '<table><tr><td><b>bold</b> cell'
                            || '</td></tr></table>'
                          ELSE '' END
                  || '<p>no table here</p></body></html>' END AS html
    FROM documents
"""


def _html_tables(spark, sf):
    """HTML table mining: <table> markup to structured cell rows with
    header detection — the WikiTables-style structured-data payload
    next to the running-text extraction core (operators/tables.py
    extract_html_tables: three map-only posexplode levels, shared
    Java/RE2-safe patterns, zero shuffles)."""
    from navigator_document_parser_spark.operators.tables import (
        extract_html_tables,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    pages = spark.sql(_HTML_TABLES_SRC_SQL)
    return extract_html_tables(pages)


def _table_linearize(spark, sf):
    """Table-to-text linearization (operators/tables.py
    table_linearize): extract_html_tables cells -> ' | '-joined rows,
    newline-joined tables — the WikiTables/TaPas pretraining shape."""
    from navigator_document_parser_spark.operators.tables import (
        extract_html_tables,
        table_linearize,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return table_linearize(
        extract_html_tables(spark.sql(_HTML_TABLES_SRC_SQL))
    )


def _search_eval(spark, sf):
    """Retrieval quality measurement: nDCG@5 + MRR@5 of the BM25
    top-10 against md5-derived graded relevance judgments — the
    evaluate step that closes the index build -> serve loop
    (operators/search.py search_eval: pivoted explicit DCG sums, no
    cross-row float SUM). The hit table is checkpointed once — it
    feeds both the ranking side and the derived judgment side."""
    from navigator_document_parser_spark.operators import md5_u32_sql
    from navigator_document_parser_spark.operators.search import (
        bm25_search,
        search_eval,
    )

    hits = bm25_search(
        _docs(spark, sf), _SEARCH_QUERIES, k=10
    ).localCheckpoint(eager=True)
    inner = (
        "'rel:' || CAST(query_id AS STRING) || ':'"
        " || CAST(doc_id AS STRING)"
    )
    rels = hits.select(
        "query_id",
        "doc_id",
        F.expr(f"{md5_u32_sql(inner, 'spark')} % 4").alias("rel"),
    )
    return search_eval(hits, rels, k=5)


def _search_eval_oracle() -> str:
    from navigator_document_parser_spark.operators import md5_u32_sql
    from navigator_document_parser_spark.operators.search import (
        oracle_bm25_search,
        oracle_search_eval,
    )

    hits_sql = oracle_bm25_search(_SEARCH_QUERIES, k=10)
    inner = (
        "'rel:' || CAST(query_id AS VARCHAR) || ':'"
        " || CAST(doc_id AS VARCHAR)"
    )
    rels_sql = (
        f"SELECT query_id, doc_id,"
        f" {md5_u32_sql(inner, 'duckdb')} % 4 AS rel"
        f" FROM ({hits_sql}) hh"
    )
    return oracle_search_eval(hits_sql, rels_sql, k=5)


def _token_entropy(spark, sf):
    """Per-document token-distribution entropy — the whole-distribution
    gibberish/keyword-stuffing signal next to the Gopher top-term
    fractions (operators/text.py token_entropy; the entropy sum rides
    the shuffle as an exact fixed-point BIGINT, so partition order
    cannot perturb it)."""
    from navigator_document_parser_spark.operators.text import (
        token_entropy,
    )

    return token_entropy(_docs(spark, sf))


_TRUST_SEEDS = ["src0", "src1", "src2"]


def _trustrank_hosts(spark, sf):
    """TrustRank over the same doc-derived host graph as
    pagerank_hosts, trust teleporting to three curated seed hosts —
    the spam-demotion / seed-first frontier-expansion signal
    (operators/graph.py trustrank; one dst shuffle per iteration,
    5 rounds, 8dp)."""
    from navigator_document_parser_spark.operators.graph import trustrank

    d = _docs(spark, sf)
    edges = (
        d.select(
            F.col("source").alias("src_host"),
            F.concat(
                F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
            ).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
    ranks = trustrank(edges, seeds=_TRUST_SEEDS, iterations=5)
    return ranks.select("node", F.round(F.col("rank"), 8).alias("rank"))


# code-vs-prose routing: the synthetic corpus is pure prose, so a
# deterministic fifth of the documents gets a code-shaped preamble
# (keywords + symbols + indented/;-terminated lines) built from the SAME
# portable SQL on both engines (chr(10) < 128 is lesson-17-safe)
_CODE_SYNTH_SQL = (
    "CASE WHEN doc_id % 5 = 0 THEN "
    "'def fn_' || CAST(doc_id AS VARCHAR) || '(x):' || chr(10) || "
    "'    y = (x + 1);' || chr(10) || "
    "'    return y;' || chr(10) || text "
    "WHEN doc_id % 7 = 3 THEN 'var x = ' || CAST(doc_id AS VARCHAR) "
    "|| ';' || chr(10) || text "
    "ELSE text END"
)


def _code_detect(spark, sf):
    """Code-vs-prose routing over code-decorated synthetic documents
    (operators/text.py code_detect): whole-token keyword hits, symbol
    mass, indented/;-terminated line counts — integer signals, one
    ratio4. Zero shuffle; the StarCoder/RedPajama-style corpus split."""
    from navigator_document_parser_spark.operators.text import code_detect

    d = _docs(spark, sf).withColumn(
        "text", F.expr(_CODE_SYNTH_SQL.replace("AS VARCHAR", "AS STRING"))
    )
    return code_detect(d)


def _code_detect_oracle() -> str:
    from navigator_document_parser_spark.operators.text import (
        oracle_code_detect,
    )

    prelude = (
        "WITH synth AS (SELECT doc_id, "
        f"{_CODE_SYNTH_SQL} AS text FROM documents)"
    )
    return oracle_code_detect(table="synth", prelude_cte=prelude)


# crawler-trap synth: path CLASS is keyed by the same residue as the
# host, so each synthetic host exhibits one trap pattern (calendar /
# archive dates, recursive /page/page, adjacent-dup, deep chain, benign)
_TRAP_HOST_EXPR = (
    "'site' || CAST(doc_id % 7 AS VARCHAR) || '.example.org'"
)
_TRAP_PATH_EXPR = (
    "CASE doc_id % 7 "
    " WHEN 0 THEN '/cal/' || CAST(2000 + doc_id % 30 AS VARCHAR) || '/'"
    "   || CAST(1 + doc_id % 12 AS VARCHAR) || '/'"
    "   || CAST(1 + doc_id % 28 AS VARCHAR) "
    " WHEN 1 THEN '/archive/' || CAST(1990 + doc_id % 40 AS VARCHAR)"
    "   || '/' || CAST(1 + doc_id % 12 AS VARCHAR) || '/'"
    "   || CAST(1 + doc_id % 28 AS VARCHAR) "
    " WHEN 2 THEN repeat('/page', CAST(1 + doc_id % 9 AS INTEGER))"
    "   || '/x' || CAST(doc_id AS VARCHAR) "
    " WHEN 3 THEN '/p/p/q' || CAST(doc_id AS VARCHAR) "
    " WHEN 4 THEN '/a/b/c/d/e/f/g/h' || CAST(doc_id % 5 AS VARCHAR) "
    " ELSE '/doc' || CAST(doc_id AS VARCHAR) END"
)
_TRAP_URLS_SQL = (
    f"SELECT {_TRAP_HOST_EXPR} AS host, {_TRAP_PATH_EXPR} AS path "
    "FROM documents"
)


def _trap_detect(spark, sf):
    """Crawler-trap host detection over synthetic trap-shaped URL
    paths (operators/urls.py trap_detect): calendar/archive date
    paths, recursive /page/page chains, deep static chains, benign
    hosts — one per-host aggregate, segment arrays checkpointed."""
    from navigator_document_parser_spark.operators.urls import trap_detect

    u = _docs(spark, sf).selectExpr(
        _TRAP_HOST_EXPR.replace("AS VARCHAR", "AS STRING") + " AS host",
        _TRAP_PATH_EXPR.replace("AS VARCHAR", "AS STRING") + " AS path",
    )
    return trap_detect(u)


def _trap_detect_oracle() -> str:
    from navigator_document_parser_spark.operators.urls import (
        oracle_trap_detect,
    )

    return oracle_trap_detect(_TRAP_URLS_SQL)


def _corpus_similarity(spark, sf):
    """Slice-overlap dashboard: KMV-sketch Jaccard between language
    slices of the corpus (operators/sketches.py kmv_slice_jaccard) —
    per-slice k-min hash sketches, pair math on <= k rows per slice,
    one ratio4 at the end."""
    from navigator_document_parser_spark.operators.sketches import (
        kmv_slice_jaccard,
    )

    return kmv_slice_jaccard(_docs(spark, sf), k=64)


def _corpus_similarity_oracle() -> str:
    from navigator_document_parser_spark.operators.sketches import (
        oracle_kmv_slice_jaccard,
    )

    return oracle_kmv_slice_jaccard(_SHINGLE_CTE, k=64)


def _embedding_outliers(spark, sf):
    """Farthest-from-centroid embedding triage (operators/similarity.py
    embedding_outliers): fixed-point integer centroid sums (order-safe),
    per-row 4dp distance fold, TakeOrderedAndProject top-20."""
    from navigator_document_parser_spark.operators.similarity import (
        embedding_outliers,
    )

    return embedding_outliers(_emb(spark, sf), n_top=20)


def _mmr_rerank(spark, sf):
    """MMR diversity reranking of the top-8 cosine candidates per
    query, greedy 4-pick at lambda=0.7 (operators/similarity.py
    mmr_rerank): all rounds operate on checkpointed n_cands-per-query
    tables, never the corpus."""
    from navigator_document_parser_spark.operators.similarity import (
        mmr_rerank,
    )

    emb = _emb(spark, sf)
    qs = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    return mmr_rerank(emb, qs, n_cands=8, k=4, lam=0.7)


# script-profile synth: non-ASCII embedded as LITERAL chars in the
# shared SQL (lesson 17: chr() is ASCII-mod-256 in Spark vs Unicode in
# DuckDB — never build non-ASCII through chr()). \u escapes below are
# PYTHON escapes; the rendered SQL carries the actual characters.
_SCRIPT_SYNTH_SQL = (
    "CASE doc_id % 6 "
    " WHEN 0 THEN text || ' привет "
    "мир' "                      # Cyrillic words
    " WHEN 1 THEN text || ' 你好 世界 "
    "こんにちは' "          # CJK + kana
    " WHEN 2 THEN text || ' pаypal bаnk' "  # homoglyph spoofs
    "ELSE text END"
)


def _script_stats(spark, sf):
    """Unicode script profiling + homoglyph-spoof detection over
    script-decorated synthetic documents (operators/text.py
    script_stats): shared \\x{...} regex classes, map-only."""
    from navigator_document_parser_spark.operators.text import script_stats

    d = _docs(spark, sf).withColumn("text", F.expr(_SCRIPT_SYNTH_SQL))
    return script_stats(d)


def _script_stats_oracle() -> str:
    from navigator_document_parser_spark.operators.text import (
        oracle_script_stats,
    )

    prelude = (
        "WITH synth AS (SELECT doc_id, "
        f"{_SCRIPT_SYNTH_SQL} AS text FROM documents)"
    )
    return oracle_script_stats(table="synth", prelude_cte=prelude)


def _vocab_coverage(spark, sf):
    """Top-V vocabulary + per-language coverage/OOV table
    (operators/text.py vocab_coverage). V=16 against the ~31-term
    synthetic vocabulary so the OOV tail is non-trivial; TakeOrdered
    vocabulary, broadcast membership join."""
    from navigator_document_parser_spark.operators.text import (
        vocab_coverage,
    )

    return vocab_coverage(_docs(spark, sf), vocab_size=16)


def _topic_classify(spark, sf):
    """Explainable keyword-lexicon topic routing (operators/text.py
    topic_classify): whole-token lexicon scores, earlier-wins argmax
    ladder, map-only."""
    from navigator_document_parser_spark.operators.text import (
        topic_classify,
    )

    return topic_classify(_docs(spark, sf))


# parallel-url synth: groups of 5 docs share a page id; even doc_ids
# use the language-subdomain convention, odd the path-segment one —
# pairs form within a (convention, page) group across different langs
def _parallel_urls_sql(dialect: str) -> str:
    st = "STRING" if dialect == "spark" else "VARCHAR"
    g = f"CAST(CAST(floor(doc_id / 5) AS BIGINT) AS {st})"
    host = (
        f"concat('site', CAST(CAST(floor(doc_id / 5) AS BIGINT) % 25"
        f" AS {st}), '.org')"
    )
    return f"""
        SELECT doc_id AS id, lang,
               CASE WHEN doc_id % 2 = 0
                    THEN concat('https://', lang, '.', {host},
                                '/page-', {g})
                    ELSE concat('https://', {host}, '/', lang,
                                '/page-', {g}) END AS url
        FROM documents
    """


def _url_parallel_pairs(spark, sf):
    """Parallel-document candidates mined from URL structure
    (operators/urls.py url_parallel_pairs): language subdomain / path
    segment normalized to one template key, cross-language pairs per
    key — the ParaCrawl-style blocking stage ahead of bitext scoring."""
    from navigator_document_parser_spark.operators.urls import (
        url_parallel_pairs,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return url_parallel_pairs(
        spark.sql(_parallel_urls_sql("spark")), id_col="id"
    )


def _url_templates(spark, sf):
    """Dominant path-template mining per host over the same trap-shaped
    URL synth (operators/urls.py url_templates): numeric runs -> <n>,
    one aggregate + a per-host top-k window over aggregated rows."""
    from navigator_document_parser_spark.operators.urls import (
        url_templates,
    )

    u = _docs(spark, sf).selectExpr(
        _TRAP_HOST_EXPR.replace("AS VARCHAR", "AS STRING") + " AS host",
        _TRAP_PATH_EXPR.replace("AS VARCHAR", "AS STRING") + " AS path",
    )
    return url_templates(u, top_k=3)


def _url_templates_oracle() -> str:
    from navigator_document_parser_spark.operators.urls import (
        oracle_url_templates,
    )

    return oracle_url_templates(_TRAP_URLS_SQL, top_k=3)


# host-reputation synth: every 4th source mass-duplicates ~40% of its
# pages into one boilerplate text (the SEO-farm profile); (doc_id % 100)
# decorrelates the 40% pick from the source residue
_REPUTATION_SYNTH_SQL = (
    "CASE WHEN (doc_id % 20) % 4 = 0 AND doc_id % 100 < 40 "
    "THEN 'duplicate boilerplate page body' ELSE text END"
)


def _host_reputation(spark, sf):
    """Per-host reputation rollup over dup-farm-decorated sources
    (operators/selection.py host_reputation): duplication ratio,
    language coherence, integer cross-multiplied flags."""
    from navigator_document_parser_spark.operators.selection import (
        host_reputation,
    )

    d = _docs(spark, sf).withColumn(
        "text", F.expr(_REPUTATION_SYNTH_SQL)
    )
    return host_reputation(d)


def _host_reputation_oracle() -> str:
    from navigator_document_parser_spark.operators.selection import (
        oracle_host_reputation,
    )

    docs_sql = (
        "SELECT source, lang, "
        f"{_REPUTATION_SYNTH_SQL} AS text FROM documents"
    )
    return oracle_host_reputation(docs_sql)


def _training_pairs(spark, sf):
    """Contrastive (anchor, positive, negative) triplets: positives =
    the embedding near-dup pairs, negatives = deterministic hash picks
    over the dense id space (operators/similarity.py
    contrastive_triplets)."""
    from navigator_document_parser_spark.operators.similarity import (
        contrastive_triplets,
        embedding_neardup_pairs,
    )

    emb = _emb(spark, sf)
    pairs = embedding_neardup_pairs(emb, threshold=0.35)
    return contrastive_triplets(emb, pairs)


def _training_pairs_oracle() -> str:
    from navigator_document_parser_spark.operators.similarity import (
        oracle_contrastive_triplets,
    )

    # ONE pair definition shared with the embedding_neardup oracle
    # (module constant below) — the positive set cannot drift
    return oracle_contrastive_triplets(_NEARDUP_PAIRS_SQL)


def _dedup_bbit(spark, sf):
    """b-bit MinHash resemblance over the standard LSH candidates
    (operators/dedup.py bbit_minhash_pairs): 8 one-byte signature
    columns instead of md5-string arrays — the 100 TB signature-store
    compression path, with the Li-König collision correction as an
    exact integer ratio."""
    from navigator_document_parser_spark.operators.dedup import (
        bbit_minhash_pairs,
    )

    return bbit_minhash_pairs(_docs(spark, sf), num_hashes=8, b=8)


def _dedup_bbit_oracle() -> str:
    from navigator_document_parser_spark.operators.dedup import (
        oracle_bbit_minhash_pairs,
    )

    return oracle_bbit_minhash_pairs(
        num_hashes=8, b=8, shingle_cte=_SHINGLE_CTE
    )


def _dedup_cluster_stats(spark, sf):
    """Duplicate-cluster size histogram over the same n-gram-Jaccard
    pair graph as dedup_components (operators/dedup.py
    dedup_cluster_stats); singletons reported as the size-1 row."""
    from navigator_document_parser_spark.operators.dedup import (
        dedup_cluster_stats,
        ngram_jaccard_pairs,
    )

    d = _docs(spark, sf)
    pairs = ngram_jaccard_pairs(d, threshold=0.1, length_band=64)
    return dedup_cluster_stats(d, pairs)


# shared page synth for the metadata/markup miners: head tags vary by
# residue (og on %3, description on %4, rss feed on %5, scripts on %6),
# link count by parity — every field exercises both present and absent
_META_HTML_SRC_SQL = """
    SELECT doc_id,
      '<html><head><title>Doc ' || CAST(doc_id AS STRING) || '</title>'
      || CASE WHEN doc_id % 3 = 0
              THEN '<meta property="og:title" content="OG '
                || CAST(doc_id AS STRING)
                || '"><meta property="og:type" content="article">'
              ELSE '' END
      || CASE WHEN doc_id % 4 = 1
              THEN '<meta name="description" content="about '
                || source || '">'
              ELSE '' END
      || CASE WHEN doc_id % 5 = 2
              THEN '<link rel="alternate" type="application/rss+xml"'
                || ' href="/feed' || CAST(doc_id % 3 AS STRING)
                || '.xml">'
              ELSE '' END
      || CASE WHEN doc_id % 6 = 0
              THEN '<script src="a.js"></script><script>var x=1;'
                || '</script>'
              ELSE '' END
      || '</head><body><a href="/l1">one</a>'
      || CASE WHEN doc_id % 2 = 0
              THEN '<a href="/l2">two</a>' ELSE '' END
      || '<p>' || text || '</p></body></html>' AS html
    FROM documents
"""


# link synth: every page gets a root-relative link; evens add a
# directory-relative one, %3 a nofollow absolute, %4==1 a
# protocol-relative, %5==2 the three droppable shapes
_LINKS_HTML_SRC_SQL = """
    SELECT doc_id,
      'https://' || source || '/sec/page'
        || CAST(doc_id AS STRING) || '.html' AS url,
      '<html><body><a href="/root' || CAST(doc_id % 7 AS STRING)
      || '">Root</a>'
      || CASE WHEN doc_id % 2 = 0
              THEN '<a href="rel' || CAST(doc_id % 5 AS STRING)
                || '.html">relative</a>' ELSE '' END
      || CASE WHEN doc_id % 3 = 0
              THEN '<a rel="nofollow" href="https://ads.example/c'
                || CAST(doc_id AS STRING) || '">sponsored</a>'
              ELSE '' END
      || CASE WHEN doc_id % 4 = 1
              THEN '<a href="//cdn.' || source || '/x">cdn</a>'
              ELSE '' END
      || CASE WHEN doc_id % 5 = 2
              THEN '<a href="mailto:x@y.z">mail</a>'
                || '<a href="#top">top</a>'
                || '<a href="javascript:void(0)">js</a>'
              ELSE '' END
      || '<p>' || text || '</p></body></html>' AS html
    FROM documents
"""


def _extract_links(spark, sf):
    """Outlink extraction + base-url resolution from raw markup
    (operators/tables.py extract_links): absolute / protocol-relative /
    root-relative / directory-relative all resolved; fragment,
    javascript: and mailto: dropped; nofollow surfaced."""
    from navigator_document_parser_spark.operators.tables import (
        extract_links,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return extract_links(spark.sql(_LINKS_HTML_SRC_SQL))


# rel-link synth: every 2nd page declares a canonical (often another
# page — a dup-farm shape), every 3rd paginates next/prev, every 5th
# declares an AMP mirror; the rest have no rel links at all
_RELS_HTML_SRC_SQL = """
    SELECT doc_id,
      'https://' || source || '/p/' || CAST(doc_id AS STRING) AS url,
      '<html><head>'
      || CASE WHEN doc_id % 2 = 0
              THEN '<link rel="canonical" href="/p/'
                || CAST(doc_id - (doc_id % 4) AS STRING) || '">'
              ELSE '' END
      || CASE WHEN doc_id % 3 = 0
              THEN '<link rel="next" href="p-next-'
                || CAST(doc_id + 1 AS STRING) || '.html">'
                || '<link rel="prev" href="//' || source
                || '/p/' || CAST(doc_id - 1 AS STRING) || '">'
              ELSE '' END
      || CASE WHEN doc_id % 5 = 0
              THEN '<link rel="amphtml" href="https://amp.'
                || source || '/p/' || CAST(doc_id AS STRING) || '">'
              ELSE '' END
      || '</head><body><p>' || text || '</p></body></html>' AS html
    FROM documents
"""


def _link_rels(spark, sf):
    """rel-link extraction (operators/tables.py link_rels): canonical /
    next / prev / amphtml resolved against the page url; absent rels
    NULL — the dedup-by-declaration and pagination signals."""
    from navigator_document_parser_spark.operators.tables import link_rels

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return link_rels(spark.sql(_RELS_HTML_SRC_SQL))


def _meta_tags(spark, sf):
    """Page-metadata mining (title/OpenGraph/description/feed link)
    over head-tag-decorated synthetic pages (operators/tables.py
    meta_tags): one shared-safe regexp_extract per field, map-only."""
    from navigator_document_parser_spark.operators.tables import meta_tags

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return meta_tags(spark.sql(_META_HTML_SRC_SQL))


def _markup_stats(spark, sf):
    """Markup-density profile (tag/link/script counts, text-to-markup
    ratio) over the same synthetic pages (operators/tables.py
    markup_stats)."""
    from navigator_document_parser_spark.operators.tables import (
        markup_stats,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return markup_stats(spark.sql(_META_HTML_SRC_SQL))


# redirect-chain synth by decade position p = doc_id % 10:
# p 1,2 -> the decade's 5-slot; 5 -> the 9-slot; 3 -> ITSELF (cycle);
# everything else terminal. Chains: 1/2 resolve in 2 hops, 5 in 1,
# 3 never (self-cycle), rest in 0.
_REDIRECTS_SRC_SQL = """
    SELECT 'u' || CAST(doc_id AS STRING) AS url,
           CASE WHEN doc_id % 10 IN (1, 2)
                THEN 'u' || CAST(doc_id - (doc_id % 10) + 5 AS STRING)
                WHEN doc_id % 10 = 5
                THEN 'u' || CAST(doc_id + 4 AS STRING)
                WHEN doc_id % 10 = 3
                THEN 'u' || CAST(doc_id AS STRING)
                ELSE NULL END AS target
    FROM documents
"""


def _resolve_redirects(spark, sf):
    """Bounded redirect/canonical-chain resolution over a synthetic
    301 map with chains, terminals, and a self-cycle
    (operators/urls.py resolve_redirects): max_hops equi-joins against
    the checkpointed map, cycles surface as resolved=false."""
    from navigator_document_parser_spark.operators.urls import (
        resolve_redirects,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return resolve_redirects(spark.sql(_REDIRECTS_SRC_SQL), max_hops=4)


_JSONLD_HTML_SRC_SQL = """
    SELECT doc_id,
      '<html><head>'
      || CASE WHEN doc_id % 3 = 0 THEN
           '<script type="application/ld+json">{"@type": "Article",'
           || ' "name": "Doc ' || CAST(doc_id AS STRING)
           || '", "datePublished": "2026-0'
           || CAST(1 + doc_id % 9 AS STRING)
           || '-01", "author": {"name": "au'
           || CAST(doc_id % 5 AS STRING) || '"}}</script>'
         WHEN doc_id % 3 = 1 THEN
           '<script type="application/ld+json">{"@type": "Product",'
           || ' "name": "P' || CAST(doc_id AS STRING) || '"}</script>'
         ELSE '' END
      || '</head><body><p>x</p></body></html>' AS html
    FROM documents
"""


def _jsonld_extract(spark, sf):
    """schema.org JSON-LD mining over ld+json-decorated synthetic pages
    (operators/tables.py jsonld_extract): shared block regex + JSONPath
    probes (engine-specific quoting for the '@type' key), map-only;
    pages without a block yield NULL fields."""
    from navigator_document_parser_spark.operators.tables import (
        jsonld_extract,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return jsonld_extract(spark.sql(_JSONLD_HTML_SRC_SQL))


def _readability_score(spark, sf):
    """Flesch reading-ease per document (operators/text.py
    readability_score): vowel-group syllables, terminator-run
    sentences, and the whole score assembled in BIGINT fixed point —
    no round() anywhere for HALF_UP to diverge on."""
    from navigator_document_parser_spark.operators.text import (
        readability_score,
    )

    return readability_score(_docs(spark, sf))


def _gibberish_score(spark, sf):
    """Char-trigram LM gibberish detector (operators/text.py
    gibberish_score): corpus trigram counts -> per-doc mean log2
    probability, summed as exact fixed-point BIGINT (the token_entropy
    discipline)."""
    from navigator_document_parser_spark.operators.text import (
        gibberish_score,
    )

    return gibberish_score(_docs(spark, sf))


# mirror synth: src0 and src4 serve IDENTICAL content sets keyed by the
# doc's decade index k = (doc_id - doc_id%20)/20 (same k for both hosts
# by construction); src8 mirrors only even k — a partial mirror
_MIRROR_K = "CAST((doc_id - doc_id % 20) / 20 AS BIGINT)"
_MIRROR_SYNTH_SQL = (
    f"CASE WHEN doc_id % 20 IN (0, 4) THEN "
    f"'mirror page ' || CAST({_MIRROR_K} AS STRING) "
    f"WHEN doc_id % 20 = 8 AND {_MIRROR_K} % 2 = 0 THEN "
    f"'mirror page ' || CAST({_MIRROR_K} AS STRING) "
    f"ELSE text END"
)


def _mirror_hosts(spark, sf):
    """Cross-host mirror detection over mirror-decorated sources
    (operators/dedup.py mirror_hosts): content collapses to md5, pair
    join per hash, integer cross-multiplied overlap thresholds."""
    from navigator_document_parser_spark.operators.dedup import (
        mirror_hosts,
    )

    d = _docs(spark, sf).withColumn("text", F.expr(_MIRROR_SYNTH_SQL))
    return mirror_hosts(d)


def _mirror_hosts_oracle() -> str:
    from navigator_document_parser_spark.operators.dedup import (
        oracle_mirror_hosts,
    )

    docs_sql = (
        f"SELECT source, {_MIRROR_SYNTH_SQL} AS text FROM documents"
    )
    return oracle_mirror_hosts(docs_sql)


# title synth: a third of pages title themselves with their own first
# three words (consistent), a third with one real word + clickbait
# filler (partial), a third with pure clickbait (inconsistent)
_TITLE_SYNTH_SQL = """
    SELECT doc_id, text,
           CASE doc_id % 3
            WHEN 0 THEN regexp_extract(text,
              '^ *([a-z]+ [a-z]+ [a-z]+)', 1)
            WHEN 1 THEN regexp_extract(text, '^ *([a-z]+)', 1)
              || ' shocking secret trick'
            ELSE 'totally unrelated clickbait here' END AS title
    FROM documents
"""


def _title_consistency(spark, sf):
    """Title-vs-body token-overlap consistency (operators/tables.py
    title_consistency): the clickbait / wrong-metadata signal; shared
    tokenization, ratio4, map-only."""
    from navigator_document_parser_spark.operators.tables import (
        title_consistency,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    return title_consistency(spark.sql(_TITLE_SYNTH_SQL))


def _degree_stats(spark, sf):
    """Link-graph degree distribution: log2-bucket histogram of in- and
    out-degrees over the doc-derived host graph (same edge synth as
    pagerank_hosts) — the power-law sanity report read before any
    centrality run; buckets via binary-string length (integer-exact,
    the hll/quantile discipline)."""
    d = _docs(spark, sf)
    edges = (
        d.select(
            F.col("source").alias("src"),
            F.concat(
                F.lit("h"), ((F.col("doc_id") * 7 + 3) % 40).cast("string")
            ).alias("dst"),
        )
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("w"))
    )
    out_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).select(F.lit("out").alias("direction"), "deg")
    in_deg = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    ).select(F.lit("in").alias("direction"), "deg")
    both = out_deg.unionByName(in_deg)
    return (
        both.withColumn(
            "bucket", F.length(F.expr("conv(deg, 10, 2)")).cast("bigint")
        )
        .groupBy("direction", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_hosts"))
    )


_DEGREE_STATS_ORACLE = """
    WITH edges AS (
      SELECT source AS src,
             'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst,
             count(*) AS w
      FROM documents GROUP BY 1, 2
    ), degs AS (
      SELECT 'out' AS direction, count(*) AS deg FROM edges GROUP BY src
      UNION ALL
      SELECT 'in' AS direction, count(*) AS deg FROM edges GROUP BY dst
    )
    SELECT direction, CAST(length(bin(deg)) AS BIGINT) AS bucket,
           CAST(count(*) AS BIGINT) AS n_hosts
    FROM degs GROUP BY 1, 2
"""


# edit-distance family synth: groups of 10 docs share a 12-hex-char
# base title; per-doc mutation m = doc_id % 5 (0 identical, 1 delete,
# 2 substitute 'z', 3 insert 'q', 4 unrelated) at position p in 1..9.
# Everything is md5/substring/concat — identical in both engines; only
# the int->string cast spelling differs (STRING vs VARCHAR).
def _editdist_titles_sql(dialect: str) -> str:
    s = "STRING" if dialect == "spark" else "VARCHAR"
    base = (
        "substring(md5(concat('t', CAST(CAST(floor(doc_id / 10) AS"
        f" BIGINT) AS {s}))), 1, 12)"
    )
    far = f"substring(md5(concat('far', CAST(id AS {s}))), 1, 12)"
    return f"""
        SELECT id, CASE m
            WHEN 0 THEN base
            WHEN 1 THEN concat(substring(base, 1, p-1),
                               substring(base, p+1, 100))
            WHEN 2 THEN concat(substring(base, 1, p-1), 'z',
                               substring(base, p+1, 100))
            WHEN 3 THEN concat(substring(base, 1, p-1), 'q',
                               substring(base, p, 100))
            ELSE {far} END AS s
        FROM (
          SELECT doc_id AS id, CAST(doc_id % 5 AS INT) AS m,
                 1 + CAST(doc_id % 9 AS INT) AS p, {base} AS base
          FROM documents
        )
    """


def _dedup_editdist(spark, sf):
    """SymSpell deletion-neighborhood title dedup: all pairs within
    Levenshtein distance 1, EXACT (100% recall blocking + native
    levenshtein verify; operators/editdist.py). Integer distances —
    no rounding surface."""
    from navigator_document_parser_spark.operators.editdist import (
        dedup_editdist,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    titles = spark.sql(_editdist_titles_sql("spark"))
    return dedup_editdist(titles, id_col="id", str_col="s", max_dist=1)


# spell-correct synth: queries are corpus first-words mutated by
# m = doc_id % 3 (0 as-is, 1 delete, 2 substitute) at p2 in 1..4 —
# no backslash regex classes (Spark SQL literals eat unknown escapes,
# lesson 17), so ONE string serves both engines.
_SPELL_QUERIES_SQL = """
    SELECT qid, CASE m
        WHEN 0 THEN w
        WHEN 1 THEN concat(substring(w, 1, p2-1),
                           substring(w, p2+1, 100))
        ELSE concat(substring(w, 1, p2-1), 'z',
                    substring(w, p2+1, 100)) END AS q
    FROM (
      SELECT doc_id AS qid, CAST(doc_id % 3 AS INT) AS m,
             1 + CAST(doc_id % 4 AS INT) AS p2,
             regexp_extract(text, '^ *([a-z]+)', 1) AS w
      FROM documents WHERE doc_id % 7 = 0
    )
"""

_SPELL_VOCAB_ORACLE = """
    SELECT term, CAST(count(*) AS BIGINT) AS cnt FROM (
      SELECT unnest(list_filter(string_split_regex(lower(text),
             '[^a-z0-9_]+'), x -> x <> '')) AS term
      FROM documents
    ) GROUP BY term
"""


def _dedup_editdist2(spark, sf):
    """The staged d=2 deletion neighborhood at contract level (the d=1
    entry cannot exercise the second explode): all pairs within
    Levenshtein distance 2 over the same title synth."""
    from navigator_document_parser_spark.operators.editdist import (
        dedup_editdist,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    titles = spark.sql(_editdist_titles_sql("spark"))
    return dedup_editdist(titles, id_col="id", str_col="s", max_dist=2)


def _spell_correct(spark, sf):
    """SymSpell spelling correction of query terms against the corpus
    vocabulary: deletes-join candidates, best = (dist asc, count desc,
    term asc) — operators/editdist.py spell_correct."""
    from navigator_document_parser_spark.operators.editdist import (
        spell_correct,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    # r7: extract token runs instead of splitting on the negated class
    # — java-regex split on '[^a-z0-9_]+' measured 13x slower than the
    # complementary extract (2.0s vs 0.22s warm at sf1.0), and the old
    # filter() HOF around it re-evaluated the split per access on top.
    # extract-all of the class == split on its complement with empties
    # dropped (token multiset equality probed), so the vocabulary (and
    # the oracle) is unchanged.
    vocab = (
        d.select(
            F.explode(
                F.regexp_extract_all(
                    F.lower(F.col("text")), F.lit("[a-z0-9_]+"), F.lit(0)
                )
            ).alias("term")
        )
        .groupBy("term")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    qs = spark.sql(_SPELL_QUERIES_SQL)
    return spell_correct(qs, vocab, max_dist=1)


def _boilerplate_strip_oracle() -> str:
    from navigator_document_parser_spark.operators.text import (
        oracle_boilerplate_strip,
    )

    return oracle_boilerplate_strip(
        _BOILERPLATE_SRC_SQL, min_docs=2, threshold_pct=60
    )


def _phash_images_sql(dialect: str) -> str:
    """Deterministic synthetic 9x8 grayscale grids with PLANTED
    near-duplicates: docs form groups of 4 (g = doc_id div 4); member
    m = 0 is the group's base image (pixel j = first md5 byte of
    'px:g:j'), members 1-3 flip ONE group+member-dependent pixel by
    +128 mod 256, so base-member pairs sit <= 2 dHash bits apart and
    member-member pairs <= 4 (caught iff <= max_dist) — all integer,
    bit-identical across engines. The perturbed-pixel index derives
    from the GROUP id and member id, never a per-doc column (the
    url_parallel_pairs synth checklist item)."""
    g = "CAST(doc_id div 4 AS STRING)" if dialect == "spark" else \
        "CAST(doc_id // 4 AS VARCHAR)"
    gi = "(doc_id div 4)" if dialect == "spark" else "(doc_id // 4)"
    if dialect == "spark":
        px = (
            "CAST(conv(substring(md5(concat('px:', " + g + ", ':', "
            "CAST(j AS STRING))), 1, 2), 16, 10) AS INT)"
        )
        return f"""
          SELECT doc_id AS media_id,
                 transform(sequence(1, 72), j ->
                   CASE WHEN CAST(doc_id % 4 AS INT) > 0
                             AND j = 1 + CAST(({gi} * 7
                                 + (doc_id % 4) * 13) % 72 AS INT)
                        THEN CAST(({px} + 128) % 256 AS INT)
                        ELSE {px} END) AS pixels
          FROM documents
        """
    px = (
        "CAST('0x' || substring(md5('px:' || " + g + " || ':' || "
        "CAST(j AS VARCHAR)), 1, 2) AS BIGINT)"
    )
    return f"""
      SELECT doc_id AS media_id,
             list_transform(range(1, 73), j ->
               CASE WHEN (doc_id % 4) > 0
                         AND j = 1 + (({gi} * 7
                             + (doc_id % 4) * 13) % 72)
                    THEN ({px} + 128) % 256
                    ELSE {px} END) AS pixels
      FROM documents
    """


def _video_frames_sql(dialect: str) -> str:
    """Deterministic sampled-frame grids: every doc is a 'video' with
    4 frames; groups of 4 docs share base frames (g = doc_id div 4),
    members 1-3 perturb ONE (group, member, frame)-dependent pixel per
    frame, so member videos match the base on all 4 frames at <= 2
    dHash bits each — the video_neardup planted signal, engine-exact."""
    if dialect == "spark":
        g = "CAST(doc_id div 4 AS STRING)"
        gi = "(doc_id div 4)"
        px = (
            "CAST(conv(substring(md5(concat('vf:', " + g + ", ':', "
            "CAST(fi AS STRING), ':', CAST(j AS STRING))), 1, 2), "
            "16, 10) AS INT)"
        )
        return f"""
          SELECT doc_id AS media_id, f.fi AS frame_idx,
                 transform(sequence(1, 72), j ->
                   CASE WHEN CAST(doc_id % 4 AS INT) > 0
                             AND j = 1 + CAST(({gi} * 7
                                 + (doc_id % 4) * 13 + fi * 5)
                                 % 72 AS INT)
                        THEN CAST(({px} + 128) % 256 AS INT)
                        ELSE {px} END) AS pixels
          FROM documents LATERAL VIEW explode(sequence(0, 3)) f AS fi
        """
    g = "CAST(doc_id // 4 AS VARCHAR)"
    gi = "(doc_id // 4)"
    px = (
        "CAST('0x' || substring(md5('vf:' || " + g + " || ':' || "
        "CAST(fi AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 2) "
        "AS BIGINT)"
    )
    return f"""
      SELECT doc_id AS media_id, f.fi AS frame_idx,
             list_transform(range(1, 73), j ->
               CASE WHEN (doc_id % 4) > 0
                         AND j = 1 + (({gi} * 7
                             + (doc_id % 4) * 13 + fi * 5) % 72)
                    THEN ({px} + 128) % 256
                    ELSE {px} END) AS pixels
      FROM documents, (SELECT unnest(range(0, 4)) AS fi) f
    """


# file-listing synth for compact_plan: sizes 1000..9999 bytes (some at
# or over the 8192 target stay un-compacted), 8 table partitions, paths
# lexicographic — ONE string serves both engines (|| and STRING casts
# parse identically).
_COMPACT_FILES_SQL = """
    SELECT CAST(doc_id % 8 AS BIGINT) AS part,
           'part=' || CAST(doc_id % 8 AS STRING) || '/f'
             || CAST(doc_id AS STRING) || '.parquet' AS path,
           CAST(1000 + (doc_id * 997) % 9000 AS BIGINT) AS bytes
    FROM documents
"""


def _audio_frames_sql(dialect: str) -> str:
    """Deterministic spectral-frame synth: every doc is a 'track' with
    4 frames of 33 band energies (md5-derived); groups of 4 docs share
    base frames, members 1-3 perturb ONE (group, member)-dependent band
    in ONE member-dependent frame by +128 mod 256 — that touches <= 2
    fingerprint bits in each of the two adjacent fingerprint frames, so
    member tracks match the base on all 3 fingerprint frames at
    max_dist=3. Engine-exact integers throughout."""
    if dialect == "spark":
        g = "CAST(doc_id div 4 AS STRING)"
        gi = "(doc_id div 4)"
        px = (
            "CAST(conv(substring(md5(concat('ae:', " + g + ", ':', "
            "CAST(fi AS STRING), ':', CAST(j AS STRING))), 1, 2), "
            "16, 10) AS INT)"
        )
        return f"""
          SELECT doc_id AS media_id, f.fi AS frame_idx,
                 transform(sequence(1, 33), j ->
                   CASE WHEN CAST(doc_id % 4 AS INT) > 0
                             AND fi = CAST(doc_id % 4 AS INT) - 1
                             AND j = 1 + CAST(({gi} * 7
                                 + (doc_id % 4) * 13) % 33 AS INT)
                        THEN CAST(({px} + 128) % 256 AS INT)
                        ELSE {px} END) AS energies
          FROM documents LATERAL VIEW explode(sequence(0, 3)) f AS fi
        """
    g = "CAST(doc_id // 4 AS VARCHAR)"
    gi = "(doc_id // 4)"
    px = (
        "CAST('0x' || substring(md5('ae:' || " + g + " || ':' || "
        "CAST(fi AS VARCHAR) || ':' || CAST(j AS VARCHAR)), 1, 2) "
        "AS BIGINT)"
    )
    return f"""
      SELECT doc_id AS media_id, f.fi AS frame_idx,
             list_transform(range(1, 34), j ->
               CASE WHEN (doc_id % 4) > 0
                         AND fi = (doc_id % 4) - 1
                         AND j = 1 + (({gi} * 7
                             + (doc_id % 4) * 13) % 33)
                    THEN ({px} + 128) % 256
                    ELSE {px} END) AS energies
      FROM documents, (SELECT unnest(range(0, 4)) AS fi) f
    """


def _audio_neardup(spark, sf):
    """Audio near-dup pairs: Haitsma-Kalker frame fingerprints (sign of
    the spectral second difference), pigeonhole-banded, rolled up to
    (trk_a, trk_b, n_matched >= 2) — completes the perceptual dedup
    trio (operators/dedup.py audio_neardup)."""
    from navigator_document_parser_spark.operators.dedup import (
        audio_neardup,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    frames = spark.sql(_audio_frames_sql("spark"))
    return audio_neardup(frames, track_col="media_id",
                         frame_col="frame_idx", energies_col="energies",
                         max_dist=3, min_frames=2)


def _compact_plan(spark, sf):
    """Small-file compaction planning (Iceberg rewrite_data_files /
    Delta OPTIMIZE analog): next-fit rewrite groups per table
    partition, integer offsets — operators/layout.py compact_plan."""
    from navigator_document_parser_spark.operators.layout import (
        compact_plan,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    files = spark.sql(_COMPACT_FILES_SQL)
    return compact_plan(files, target_bytes=8192, min_input_files=2)


def _video_neardup(spark, sf):
    """Video near-dup pairs: per-frame dHash pigeonhole matching rolled
    up to (vid_a, vid_b, n_matched >= 2) — the multimodal dedup family's
    video face (operators/dedup.py video_neardup)."""
    from navigator_document_parser_spark.operators.dedup import (
        video_neardup,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    frames = spark.sql(_video_frames_sql("spark"))
    return video_neardup(frames, vid_col="media_id",
                         frame_col="frame_idx", pixels_col="pixels",
                         max_dist=3, min_frames=2)


def _phash_mirror_images_sql(dialect: str) -> str:
    """The _phash_images_sql synth with member 3 replaced by the exact
    HORIZONTAL MIRROR of the group's base image (pixel j reads the
    base value at the row-mirrored index) — invisible to plain dHash
    matching (direct hamming ~32 bits), found only by the
    mirror-invariant path."""
    if dialect == "spark":
        g = "CAST(doc_id div 4 AS STRING)"
        gi = "(doc_id div 4)"
        mj = "(((j-1) div 9) * 9 + (8 - ((j-1) % 9)) + 1)"
        dia_div = "div"
    else:
        g = "CAST(doc_id // 4 AS VARCHAR)"
        gi = "(doc_id // 4)"
        mj = "(((j-1) // 9) * 9 + (8 - ((j-1) % 9)) + 1)"
        dia_div = "//"

    def px(e: str) -> str:
        if dialect == "spark":
            return (
                "CAST(conv(substring(md5(concat('px:', " + g + ", ':', "
                f"CAST({e} AS STRING))), 1, 2), 16, 10) AS INT)"
            )
        return (
            "CAST('0x' || substring(md5('px:' || " + g + " || ':' || "
            f"CAST({e} AS VARCHAR)), 1, 2) AS BIGINT)"
        )

    if dialect == "spark":
        return f"""
          SELECT doc_id AS media_id,
                 transform(sequence(1, 72), j ->
                   CASE WHEN CAST(doc_id % 4 AS INT) = 3
                        THEN {px(mj)}
                        WHEN CAST(doc_id % 4 AS INT) > 0
                             AND j = 1 + CAST(({gi} * 7
                                 + (doc_id % 4) * 13) % 72 AS INT)
                        THEN CAST(({px('j')} + 128) % 256 AS INT)
                        ELSE {px('j')} END) AS pixels
          FROM documents
        """
    return f"""
      SELECT doc_id AS media_id,
             list_transform(range(1, 73), j ->
               CASE WHEN (doc_id % 4) = 3
                    THEN {px(mj)}
                    WHEN (doc_id % 4) > 0
                         AND j = 1 + (({gi} * 7
                             + (doc_id % 4) * 13) % 72)
                    THEN ({px('j')} + 128) % 256
                    ELSE {px('j')} END) AS pixels
      FROM documents
    """


def _phash_old_images_sql(dialect: str) -> str:
    """Committed-corpus synth for phash_snapshot_dedup: one UNPERTURBED
    base image per group (the doc_id % 4 = 0 rows) — every new-crawl
    image then sits <= 2 dHash bits from exactly its group's base."""
    g = "CAST(doc_id div 4 AS STRING)" if dialect == "spark" else \
        "CAST(doc_id // 4 AS VARCHAR)"
    if dialect == "spark":
        px = (
            "CAST(conv(substring(md5(concat('px:', " + g + ", ':', "
            "CAST(j AS STRING))), 1, 2), 16, 10) AS INT)"
        )
        return f"""
          SELECT doc_id AS media_id,
                 transform(sequence(1, 72), j -> {px}) AS pixels
          FROM documents WHERE doc_id % 4 = 0
        """
    px = (
        "CAST('0x' || substring(md5('px:' || " + g + " || ':' || "
        "CAST(j AS VARCHAR)), 1, 2) AS BIGINT)"
    )
    return f"""
      SELECT doc_id AS media_id,
             list_transform(range(1, 73), j -> {px}) AS pixels
      FROM documents WHERE doc_id % 4 = 0
    """


def _kn_counts(spark, sf):
    """Kneser-Ney bigram count export (KenLM lmplz counting pass):
    c / c(w1 .) / N1+(w1 .) / N1+(. w2) / N1+(. .) per surviving
    bigram, integers end to end (operators/text.py kn_bigram_counts).
    min_count=2 exercises the post-aggregate pruning path."""
    from navigator_document_parser_spark.operators.text import (
        kn_bigram_counts,
    )

    return kn_bigram_counts(_docs(spark, sf), min_count=2)


def _table_stats(spark, sf):
    """ANALYZE-style per-column stats over documents in one scan:
    rows / nulls / exact NDV / min / max per column (operators/
    layout.py table_stats). BIGINT/VARCHAR columns only — float and
    temporal string reprs differ across engines (the lesson-17/18
    family), integers and strings render identically."""
    from navigator_document_parser_spark.operators.layout import (
        table_stats,
    )

    return table_stats(
        _docs(spark, sf), cols=["doc_id", "lang", "source", "n_chars"]
    )


def _phash_incremental(spark, sf):
    """Incremental perceptual dedup: the new crawl's perturbed images
    against the committed base-image corpus — new-vs-old band joins
    only (operators/dedup.py phash_snapshot_dedup)."""
    from navigator_document_parser_spark.operators.dedup import (
        phash_snapshot_dedup,
    )

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    new = spark.sql(_phash_images_sql("spark"))
    old = spark.sql(_phash_old_images_sql("spark"))
    return phash_snapshot_dedup(new, old, max_dist=3)


def _dedup_phash_mirror(spark, sf):
    """Mirror-invariant perceptual dedup: the synth's member 3 is the
    exact horizontal mirror of its group base — caught only by the
    min(direct, mirror) Hamming path (operators/dedup.py dedup_phash
    mirror_invariant=True)."""
    from navigator_document_parser_spark.operators.dedup import dedup_phash

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    imgs = spark.sql(_phash_mirror_images_sql("spark"))
    return dedup_phash(imgs, id_col="media_id", pixels_col="pixels",
                       max_dist=3, mirror_invariant=True)


def _dedup_phash(spark, sf):
    """Perceptual image dedup: 64-bit dHash over the synthetic pixel
    grids, 4x16-bit pigeonhole bands folded into ONE equi-join key,
    exact bit_count verify — integer end to end (VERDICT r5 #4;
    operators/dedup.py dedup_phash)."""
    from navigator_document_parser_spark.operators.dedup import dedup_phash

    d = _docs(spark, sf)
    d.createOrReplaceTempView("documents")
    imgs = spark.sql(_phash_images_sql("spark"))
    return dedup_phash(imgs, id_col="media_id", pixels_col="pixels",
                       max_dist=3)


# Round-6 window rotation (VERDICT r5 next-round #2): the driver's
# CORRECTNESS artifact records only the FIRST 50 queries() entries, and
# rounds 1-5 cumulatively hash-checked 82 distinct queries — these 50
# are all oracle-checked entries that have NEVER had a driver-grade
# check (every one is hash-green in the committed CONTRACT_r05
# replicas; the driver run promotes them to the hard signal). The r5
# window (and the r1-r4 ones) remain covered by tools/check_contract.py
# replicas committed per round. Disjoint from CORRECTNESS_r01..r05 by
# construction — pinned in tests/test_contract_window.py.
_R6_FRONT = [
    "dedup_bloom", "dedup_cdc", "snapshot_diff", "dedup_keep_best",
    "knn_graph", "knn_ivf_fullprobe", "semantic_clusters",
    "semantic_decontaminate", "bitext_mine", "bitext_mine_lsh",
    "semdedup", "pq_encode", "knn_pq", "hll_distinct", "kmv_distinct",
    "cms_counts", "dedup_containment", "quantile_sketch", "crawl_depth",
    "embed_hash", "k_core_hosts", "shard_layout", "triangle_hosts",
    "recrawl_schedule", "dust_rules", "related_hosts", "lsh_audit",
    "dedup_snm", "trustrank_hosts", "trap_detect", "corpus_similarity",
    "embedding_outliers", "mmr_rerank", "url_parallel_pairs",
    "host_reputation", "training_pairs", "dedup_bbit",
    "dedup_cluster_stats", "extract_links", "link_rels", "mirror_hosts",
    "degree_stats", "dedup_editdist", "dedup_editdist2",
    "spell_correct", "search_eval", "token_entropy", "code_detect",
    "vocab_coverage", "resolve_redirects",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """ORDER MATTERS: the driver's CORRECTNESS artifact records only the
    first 50 entries. Round 6 rotates the window (_R6_FRONT above):
    the first 50 are oracle-checked queries the driver has never
    hash-checked in rounds 1-5; everything previously driver-checked
    moves behind them (still oracle-checked and re-runnable via
    `python tools/check_one.py <name>`, with full-contract replicas
    committed per round). The 3 rows-only-by-design queries
    (approximate or golden-pinned) stay pinned last; their
    verification story lives in BENCH/BASELINE.md (VERDICT r3 #2)."""
    reg = _registry()
    front = {k: reg[k] for k in _R6_FRONT}
    rest = {k: v for k, v in reg.items() if k not in front}
    return front | rest


def _registry() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        # --- oracle-checked (rows+schema+hash vs DuckDB) -------------
        # extraction dataflow analogs (SURVEY §2.2/2.5)
        "route_split": _route_split,                # P1
        "valid_text_filter": _valid_text_filter,    # P5
        "translate_gating": _translate_gating,      # P6/P7/P8
        "line_blocks": _line_blocks,                # M3/M5
        "text_metrics": _text_metrics,              # M9-adjacent + quality
        "fingerprint_winnow": _fingerprint_winnow,  # rolling-hash winnowing
        "winnow_pairs": _winnow_pairs,              # MOSS shared-fp pairs
        "corpus_curation": _corpus_curation,        # composed curation
        "token_stats": _token_stats,                # ws + BPE-ish counting
        "quality_filters": _quality_filters,        # Gopher-rule bands
        "repetition_filters": _repetition_filters,  # Gopher A1.3 repetition
        "host_cap": _host_cap,                      # per-origin cap
        "tfidf_top_terms": _tfidf_top_terms,        # corpus analytics
        "keyword_search": _keyword_search,          # inverted-index top-k
        "boolean_search": _boolean_search,          # MUST/SHOULD/NOT retrieval
        "phrase_search": _phrase_search,            # positional phrase match
        "bm25_search": _bm25_search,                # BM25 ranked retrieval
        "index_export": _index_export,              # posting-block export
        "index_merge": _index_merge,                # incremental update
        "index_lookup": _index_lookup,              # serve from the index
        "prefix_suggest": _prefix_suggest,          # autocomplete index
        "fetch_schedule": _fetch_schedule,          # politeness crawl slots
        "text_normalize": _text_normalize,          # unicode/ws cleanup
        "zorder_layout": _zorder_layout,            # Morton-curve layout
        "bpe_train": _bpe_train,                    # learn BPE merges
        "unigram_tokenize": _unigram_tokenize,     # Viterbi subwords
        "url_filter": _url_filter,                  # canonicalize + blocklist
        "robots_filter": _robots_filter,            # REP longest-match rules
        "robots_sitemaps": _robots_sitemaps,        # Sitemap: discovery
        "ml_quality_score": _ml_quality_score,      # hashed linear filter
        "lm_rarity": _lm_rarity,                    # bigram-LM rarity gate
        "ccnet_buckets": _ccnet_buckets,            # head/middle/tail terciles
        "top_ngrams": _top_ngrams,                  # WIMBD corpus audit
        "c4_filters": _c4_filters,                  # C4 heuristic cleaning
        "importance_select": _importance_select,    # DSIR-style selection
        "pagerank_hosts": _pagerank_hosts,          # host link-graph rank
        "hits_hosts": _hits_hosts,                  # hubs & authorities
        "anchor_text": _anchor_text,                # CC anchor-text top-k
        "host_communities": _host_communities,      # label propagation
        "domain_quality": _domain_quality,          # rank x quality join
        "split_sentences": _split_sentences,        # sentence segmentation
        "bpe_tokenize": _bpe_tokenize,              # BPE subword stats
        "chunk_windows": _chunk_windows,            # RAG overlap chunking
        "host_split": _host_split,                  # leakage-safe split
        "curriculum_order": _curriculum_order,    # difficulty quantiles
        "budget_select": _budget_select,            # per-lang token budget
        "mix_rebalance": _mix_rebalance,            # uniform-lang data mix
        "temperature_mix": _temperature_mix,        # mT5-style lang mix
        "pack_sequences": _pack_sequences,          # token-budget packing
        "decontaminate": _decontaminate,            # holdout n-gram overlap
        "pii_scrub": _pii_scrub,                    # email/phone redaction
        # training-data pipeline operators
        "dedup_exact": _dedup_exact,
        "dedup_minhash_sig": _dedup_minhash_sig,
        "dedup_minhash_pairs": _dedup_minhash_pairs,
        "dedup_simhash": _dedup_simhash,
        "dedup_simhash_pairs": _dedup_simhash_pairs,
        "dedup_ngram_jaccard": _dedup_ngram_jaccard,
        "dedup_incremental": _dedup_incremental,
        "dedup_bloom": _dedup_bloom,
        "dedup_cdc": _dedup_cdc,
        "snapshot_diff": _snapshot_diff,
        "dedup_paragraphs": _dedup_paragraphs,
        "dedup_substring": _dedup_substring,
        "dedup_components": _dedup_components,
        "fuzzy_dedup_corpus": _fuzzy_dedup_corpus,
        "dedup_keep_best": _dedup_keep_best,        # longest-copy keeper
        "knn_cosine": _knn_cosine,
        "knn_lsh": _knn_lsh,                # oracle: deterministic planes
        "knn_graph": _knn_graph,            # kNN graph (banded, oracle-exact)
        "knn_ivf_fullprobe": _knn_ivf_fullprobe,    # == brute force
        "embedding_neardup": _embedding_neardup,
        "semantic_clusters": _semantic_clusters,  # neardup closure
        "semantic_decontaminate": _semantic_decontaminate,  # holdout flag
        "bitext_mine": _bitext_mine,                # margin-based alignment
        "bitext_mine_lsh": _bitext_mine_lsh,        # blocked mining (scale path)
        "semdedup": _semdedup,                      # semantic cluster dedup
        "pq_encode": _pq_encode,                    # product quantization
        "knn_pq": _knn_pq,                          # ADC search over codes
        "hll_distinct": _hll_distinct,              # HyperLogLog sketch
        "kmv_distinct": _kmv_distinct,              # KMV distinct sketch
        "cms_counts": _cms_counts,                  # count-min estimates
        "quantize_embeddings": _quantize_embeddings,
        "multimodal_features": _multimodal_features,  # oracle: python VALUES
        "multimodal_frames": _multimodal_frames,      # oracle: python VALUES
        "multimodal_audio": _multimodal_audio,        # audio window fan-out
        "events_asof_join": _events_asof_join,        # custom AS-OF join
        "events_range_join": _events_range_join,      # custom range join
        # --- position 51+: oracle-checked, beyond the recorded slots --
        "dedup_containment": _dedup_containment,    # asymmetric overlap
        "quantile_sketch": _quantile_sketch,        # log2-histogram + audit
        "crawl_depth": _crawl_depth,                # multi-source BFS
        "embed_hash": _embed_hash,                  # hashing-trick embed
        "hybrid_search": _hybrid_search,            # BM25 + dense RRF
        "k_core_hosts": _k_core_hosts,              # bounded k-core peel
        "shard_layout": _shard_layout,              # rendezvous shards
        "fix_encoding": _fix_encoding,              # mojibake repair
        "sitemap_parse": _sitemap_parse,            # sitemap roundtrip
        "feed_parse": _feed_parse,                  # RSS/Atom roundtrip
        "snippet_search": _snippet_search,          # serving snippets
        "triangle_hosts": _triangle_hosts,          # triangle counts
        "weighted_sample": _weighted_sample,        # A-ES exemplars
        "boilerplate_strip": _boilerplate_strip,    # host template lines
        "keyness_terms": _keyness_terms,            # Dunning G^2 profile
        "recrawl_schedule": _recrawl_schedule,      # change-rate revisit
        "dust_rules": _dust_rules,                  # URL rewrite mining
        "related_hosts": _related_hosts,            # co-citation top-k
        "lsh_audit": _lsh_audit,                    # LSH precision/recall
        "dedup_snm": _dedup_snm,                    # sorted-neighborhood
        "html_tables": _html_tables,                # table cell mining
        "table_linearize": _table_linearize,      # tables -> text
        "search_eval": _search_eval,                # nDCG/MRR measurement
        "token_entropy": _token_entropy,            # distribution entropy
        "trustrank_hosts": _trustrank_hosts,        # seed-biased rank
        # --- position 51+: oracle-checked relational block -----------
        # (plain-SQL parity breadth; check_one-verifiable on demand;
        # lang_doc_stats, quality_by_lang, corpus_report, and
        # corpus_sample demoted
        # here — plain aggregation / hash-threshold shapes whose
        # families stay represented above — so the custom AS-OF and
        # range joins and the BPE op sit inside the 50 recorded slots)
        "lang_doc_stats": _lang_doc_stats,          # §2.4 aggregation
        "quality_by_lang": _quality_by_lang,        # exact percentiles
        "corpus_report": _corpus_report,            # ROLLUP grouping sets
        "corpus_sample": _corpus_sample,            # stratified hash sample
        "events_hourly": _events_hourly,
        "events_gapfill": _events_gapfill,          # resample + fwd fill
        "events_anomaly": _events_anomaly,          # rolling z-score flag
        "events_sessionize": _events_sessionize,
        "events_funnel": _events_funnel,
        "events_retention": _events_retention,
        "events_pivot": _events_pivot,
        "json_extract": _json_extract,
        "events_topk_per_type": _events_topk_per_type,
        "q1_pricing_summary": _q1_pricing_summary,
        "q3_revenue_top10": _q3_revenue_top10,
        "q5_local_supplier": _q5_local_supplier,
        "q6_forecast_revenue": _q6_forecast_revenue,
        "code_detect": _code_detect,                # code-vs-prose router
        "trap_detect": _trap_detect,                # crawler-trap hosts
        "corpus_similarity": _corpus_similarity,    # KMV slice Jaccard
        "embedding_outliers": _embedding_outliers,  # centroid-distance tail
        "mmr_rerank": _mmr_rerank,                  # diversity rerank
        "script_stats": _script_stats,              # unicode script profile
        "vocab_coverage": _vocab_coverage,          # top-V OOV table
        "topic_classify": _topic_classify,          # lexicon domain router
        "url_templates": _url_templates,            # path-shape mining
        "url_parallel_pairs": _url_parallel_pairs,  # bitext URL blocking
        "host_reputation": _host_reputation,        # SEO-farm profiling
        "training_pairs": _training_pairs,          # contrastive triplets
        "dedup_bbit": _dedup_bbit,                  # b-bit minhash estimate
        "dedup_cluster_stats": _dedup_cluster_stats,  # cluster histogram
        "extract_links": _extract_links,          # outlink resolution
        "link_rels": _link_rels,                  # canonical/next/prev/amp
        "meta_tags": _meta_tags,                    # og/title/feed mining
        "markup_stats": _markup_stats,              # markup-density profile
        "resolve_redirects": _resolve_redirects,    # canonical chains
        "jsonld_extract": _jsonld_extract,          # schema.org mining
        "readability_score": _readability_score,    # Flesch reading ease
        "gibberish_score": _gibberish_score,        # char-trigram LM
        "mirror_hosts": _mirror_hosts,              # cross-host mirrors
        "title_consistency": _title_consistency,    # clickbait signal
        "degree_stats": _degree_stats,              # degree histogram
        "dedup_phash": _dedup_phash,                # dHash image pairs
        "dedup_phash_mirror": _dedup_phash_mirror,  # flip-invariant pairs
        "phash_incremental": _phash_incremental,    # new-vs-committed imgs
        "table_stats": _table_stats,                # ANALYZE per-column
        "kn_counts": _kn_counts,                    # KN bigram counts
        "video_neardup": _video_neardup,            # frame-hash video pairs
        "compact_plan": _compact_plan,              # small-file rewrite plan
        "audio_neardup": _audio_neardup,            # HK-fingerprint tracks
        "dedup_editdist": _dedup_editdist,          # SymSpell pairs, exact
        "dedup_editdist2": _dedup_editdist2,        # staged d=2 path
        "spell_correct": _spell_correct,            # deletes-join correction
        # --- rows-only by design (reasons documented per-entry) ------
        "extract_pipeline": _extract_pipeline,      # golden byte-identity
        "translate_pipeline": _translate_pipeline,  # M14 invariant pytest
        "knn_ivf": _knn_ivf,                        # approx; fullprobe==exact
    }


# ---------------------------------------------------------------------------
# oracles
# ---------------------------------------------------------------------------

_SHINGLE_CTE = """
  WITH toks AS (
    SELECT doc_id, lang, n_chars, text,
           string_split_regex(trim(lower(text)), '\\s+') AS t
    FROM documents
  ), sh AS (
    SELECT doc_id, lang, n_chars, text,
           CASE WHEN length(t) < 3 THEN []
           ELSE list_distinct(list_transform(
              generate_series(1, length(t) - 2),
              i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) END AS s
    FROM toks
  )
"""

_JACCARD = (
    "CASE WHEN length(list_distinct(list_concat(a.s, b.s))) = 0 "
    "THEN 0.0 ELSE "
    + ratio4_sql(
        "length(list_intersect(a.s, b.s))",
        "length(list_distinct(list_concat(a.s, b.s)))",
    )
    + " END"
)

# ONE definition of the n-gram-Jaccard pair graph + recursive
# connected-components reach, shared by the dedup_components /
# fuzzy_dedup_corpus / dedup_cluster_stats oracles — the blocking
# params (threshold 0.1, length band 64) are pinned in exactly one
# place, mirroring ngram_jaccard_pairs' entry arguments
_COMPONENTS_CTE_TAIL = """
    , pairs AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b
      FROM sh a JOIN sh b
        ON a.lang = b.lang
       AND (length(a.text) // 64) = (length(b.text) // 64)
       AND a.doc_id < b.doc_id
      WHERE {jaccard} >= 0.1
    ), edges AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL
      SELECT id_b AS src, id_a AS dst FROM pairs
    ), nodes AS (
      SELECT DISTINCT src AS node FROM edges
    ), reach AS (
      SELECT node, node AS r FROM nodes
      UNION
      SELECT reach.node, e.dst AS r
      FROM reach JOIN edges e ON reach.r = e.src
    )
"""


def _components_cte() -> str:
    return _SHINGLE_CTE.replace(
        "WITH", "WITH RECURSIVE", 1
    ) + _COMPONENTS_CTE_TAIL.format(jaccard=_JACCARD)

# the embedding near-dup pair SQL — shared verbatim by the
# embedding_neardup oracle and the training_pairs (contrastive
# triplets) oracle so the positive-pair definition cannot drift
_NEARDUP_PAIRS_SQL = """
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 4) AS sim
    FROM embeddings a JOIN embeddings b
      ON a.label = b.label AND a.vec_id < b.vec_id
    WHERE round(list_cosine_similarity(
             CAST(a.embedding AS DOUBLE[]),
             CAST(b.embedding AS DOUBLE[])), 4) >= 0.35
"""


def _lsh_oracle_sql(dim: int = 64, n_planes: int = 4, n_tables: int = 4,
                    k: int = 5) -> str:
    """DuckDB replica of _knn_lsh: the hyperplanes are deterministic md5
    literals, so bucket assignment is pure SQL. Projections are written
    as explicit left-associated sums starting at 0.0 — bit-identical to
    Spark's aggregate(zip_with(...), 0.0, acc + x) fold order."""
    from navigator_document_parser_spark.operators.similarity import (
        _hyperplane,
    )

    def proj(t: int, p: int) -> str:
        plane = _hyperplane(dim, p, seed=42 + t)
        terms = " + ".join(f"v[{d + 1}]*({plane[d]!r})" for d in range(dim))
        return f"(0.0 + {terms})"

    def bucket(t: int) -> str:
        return " + ".join(
            f"(CASE WHEN {proj(t, p)} >= 0 THEN {1 << p} ELSE 0 END)"
            for p in range(n_planes)
        )

    bcols = ", ".join(f"({bucket(t)}) AS b{t}" for t in range(n_tables))
    branches = "\n              UNION\n".join(
        f"              SELECT e.vec_id, q.query_id, e.embedding, q.qvec\n"
        f"              FROM b e JOIN q ON e.b{t} = q.b{t}"
        f" AND e.vec_id <> q.query_id"
        for t in range(n_tables)
    )
    qb = ", ".join(f"b{t}" for t in range(n_tables))
    return f"""
        WITH base AS (
          SELECT vec_id, embedding, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings
        ), b AS (
          SELECT vec_id, embedding, {bcols} FROM base
        ), q AS (
          SELECT vec_id AS query_id, embedding AS qvec, {qb}
          FROM b WHERE vec_id < 5
        ), cand AS (
{branches}
        ), scored AS (
          SELECT query_id, vec_id,
                 round(list_cosine_similarity(
                   CAST(embedding AS DOUBLE[]), CAST(qvec AS DOUBLE[])), 4)
                   AS sim
          FROM cand
        )
        SELECT query_id, vec_id, sim,
               CAST(row_number() OVER (PARTITION BY query_id
                    ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
        FROM scored
        QUALIFY rank <= {k}
    """


def oracle_sql() -> dict[str, str]:
    minhash_cols = ", ".join(
        f"list_aggregate(list_transform(s, x -> md5('{h}:' || x)), 'min')"
        for h in range(4)
    )
    bit_sums = ", ".join(
        f"SUM(CASE WHEN (h // {1 << b}) % 2 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(16)
    )
    sig16 = " + ".join(
        f"(CASE WHEN s{b} >= 0 THEN {1 << b} ELSE 0 END)" for b in range(16)
    )
    band_keys = (
        "md5(sig1 || ',' || sig2) AS band0, md5(sig3 || ',' || sig4) AS band1"
    )

    oracles = {
        "lang_doc_stats": """
            SELECT lang, COUNT(*) AS n_docs,
                   round(AVG(n_chars), 4) AS avg_chars,
                   CAST(SUM(n_chars) AS BIGINT) AS sum_chars
            FROM documents GROUP BY lang
        """,
        "route_split": """
            SELECT CASE WHEN source LIKE '%0' THEN 'pdf'
                        WHEN lang = 'en' THEN 'html'
                        ELSE 'none' END AS route,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1
        """,
        "valid_text_filter": f"""
            SELECT lang, ({T.oracle_token_count('text')}) >= 6 AS has_valid_text,
                   COUNT(*) AS n_docs
            FROM documents GROUP BY 1, 2
        """,
        "translate_gating": """
            SELECT doc_id, lang,
                   regexp_matches(text, '[A-Za-z]') AS worth_translating,
                   CAST(CASE WHEN lang = 'en' THEN 0 ELSE 1 END AS BIGINT)
                     AS n_targets
            FROM documents
        """,
        "line_blocks": """
            WITH parts AS (
              SELECT doc_id,
                     list_filter(list_transform(string_split(text, '.'),
                                                s -> trim(s)),
                                 s -> length(s) > 0) AS p
              FROM documents WHERE doc_id < 100
            )
            SELECT doc_id, CAST(i - 1 AS BIGINT) AS idx,
                   'b' || (i - 1) AS text_block_id,
                   p[i] AS block_text
            FROM parts, unnest(generate_series(1, length(p))) AS u(i)
        """,
        "text_metrics": f"""
            SELECT doc_id,
                   CAST({T.oracle_token_count('text')} AS BIGINT) AS n_tokens,
                   CAST({T.oracle_punct_count('text')} AS BIGINT) AS n_punct,
                   {T.oracle_quality('text')} AS quality,
                   {T.oracle_lang_guess('text')} AS lang_guess,
                   {T.oracle_fingerprint('text')} AS fp
            FROM documents
        """,
        "fingerprint_winnow": T.oracle_winnow(),
        "winnow_pairs": T.oracle_winnow_pairs(min_shared=40),
        "corpus_curation": f"""
            WITH keepers AS (
              SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)
            )
            SELECT d.doc_id,
                   {T.oracle_lang_guess('d.text')} AS lang_guess,
                   {T.oracle_quality('d.text')} AS quality,
                   CAST({T.oracle_token_count('d.text')} AS BIGINT) AS n_tokens
            FROM documents d JOIN keepers USING (doc_id)
            WHERE {T.oracle_quality('d.text')} >= 0.1
              AND {T.oracle_token_count('d.text')} >= 10
        """,
        "quality_by_lang": f"""
            WITH q AS (
              SELECT lang, {T.oracle_quality('text')} AS q FROM documents
            )
            SELECT lang, COUNT(*) AS n_docs,
                   round(quantile_cont(q, 0.5), 4) AS q_median,
                   round(quantile_cont(q, 0.9), 4) AS q_p90
            FROM q GROUP BY lang
        """,
        "quality_filters": T.oracle_gopher(),
        "repetition_filters": T.oracle_repetition(),
        "host_cap": T.oracle_cap_per_group(),
        "tfidf_top_terms": T.oracle_tfidf(),
        "keyword_search": _oracle_keyword_search(_SEARCH_QUERIES),
        "boolean_search": _oracle_boolean_search(_BOOLEAN_QUERIES),
        "phrase_search": _oracle_phrase_search(_PHRASE_QUERIES),
        "bm25_search": _oracle_bm25_search(_SEARCH_QUERIES),
        "index_export": _oracle_index_export_str(),
        # merge(index(9/10), last tenth) must equal the from-scratch
        # full-corpus index — the oracle IS index_export's oracle
        "index_merge": _oracle_index_export_str(),
        "index_lookup": _oracle_index_lookup(_INDEX_LOOKUP_TERMS),
        "prefix_suggest": _oracle_prefix_suggest(
            k=3, max_prefix=4, min_count=2
        ),
        "fetch_schedule": _oracle_fetch_schedule(_FETCH_PLAN_SQL, 8),
        "text_normalize": T.oracle_normalize_text(_MESSY_TEXT_SQL),
        "zorder_layout": _oracle_zorder_layout(
            "n_chars", "doc_id", bits=16, n_buckets=32
        ),
        "bpe_train": _oracle_bpe_train(8),
        "url_filter": _oracle_filter_urls(_URL_BLOCKLIST, _URL_SYNTH_SQL),
        "robots_filter": _oracle_robots_filter(
            _ROBOTS_RULES, _ROBOTS_URLS_SQL
        ),
        "ml_quality_score": T.oracle_ml_quality(),
        "lm_rarity": T.oracle_lm_rarity(),
        "ccnet_buckets": T.oracle_ccnet_buckets(),
        "top_ngrams": T.oracle_top_ngrams(n=3, k=20),
        "c4_filters": T.oracle_c4_filters(
            table="synth",
            prelude_cte="""
              WITH toks AS (
                SELECT doc_id,
                       string_split_regex(trim(lower(text)), '\\s+') AS t
                FROM documents
              ), pos AS (
                SELECT doc_id, t,
                       unnest(generate_series(0, (length(t)-1)//12)) AS i
                FROM toks
              ), ch AS (
                SELECT doc_id, i,
                       array_to_string(t[i*12+1:i*12+12], ' ') ||
                       CASE WHEN (doc_id + i) % 3 <> 0 THEN '.' ELSE '' END
                         AS line
                FROM pos
              ), lined AS (
                SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS text
                FROM ch GROUP BY doc_id
              ), synth AS (
                SELECT doc_id, text ||
                  CASE WHEN doc_id % 41 = 0 THEN chr(10) ||
                    'this block has lorem ipsum filler inside it.'
                    ELSE '' END ||
                  CASE WHEN doc_id % 37 = 0 THEN chr(10) ||
                    'var x = { a: 1 };' ELSE '' END ||
                  CASE WHEN doc_id % 43 = 0 THEN chr(10) ||
                    'this line mentions badword1 openly today.'
                    ELSE '' END AS text
                FROM lined
              )""",
        ),
        "importance_select": _oracle_importance_select("lang = 'en'"),
        "chunk_windows": T.oracle_chunk_windows(window=16, stride=12),
        "corpus_report": """
            SELECT lang, source,
                   CAST(count(*) AS BIGINT) AS n_docs,
                   CAST(sum(n_chars) AS BIGINT) AS sum_chars,
                   round(avg(n_chars), 4) AS avg_chars
            FROM documents
            GROUP BY ROLLUP (lang, source)
        """,
        "pack_sequences": T.oracle_pack_sequences(),
        "corpus_sample": f"""
            SELECT doc_id, lang FROM documents
            WHERE {T.oracle_hash_sample(0.25,
                                        strata={'en': 0.5, 'zh': 0.05})}
        """,
        "host_split": _oracle_host_split(),
        "curriculum_order": _oracle_curriculum_order(n_phases=4),
        "budget_select": _oracle_budget_select(1500),
        "mix_rebalance": _oracle_mix_rebalance(),
        "temperature_mix": _oracle_temperature_mix(
            alpha=0.3, budget_frac=0.5
        ),
        "token_stats": f"""
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM({T.oracle_token_count('text')}) AS BIGINT)
                     AS ws_tokens,
                   CAST(SUM({T.oracle_bpe_token_count('text')}) AS BIGINT)
                     AS bpe_tokens,
                   round(SUM({T.oracle_bpe_token_count('text')}) * 1.0
                         / SUM(length(text)), 4) AS tokens_per_char
            FROM documents GROUP BY lang
        """,
        "decontaminate": f"""
            {_SHINGLE_CTE}
            , bench AS (
              SELECT DISTINCT unnest(s) AS g FROM sh WHERE doc_id % 37 = 0
            ), corp AS (
              SELECT doc_id, unnest(s) AS g FROM sh WHERE doc_id % 37 <> 0
            ), hits AS (
              SELECT doc_id, COUNT(*) AS n_hits
              FROM corp JOIN bench USING (g) GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
                   COALESCE(h.n_hits, 0) >= 1 AS contaminated
            FROM (SELECT doc_id FROM documents WHERE doc_id % 37 <> 0) d
            LEFT JOIN hits h USING (doc_id)
        """,
        "pii_scrub": f"""
            WITH aug AS (
              SELECT doc_id,
                     text || CASE WHEN doc_id % 7 = 0
                       THEN ' Contact user' || CAST(doc_id AS VARCHAR)
                            || '@example.org or call +44 555 '
                            || CAST(1000 + doc_id % 9000 AS VARCHAR)
                            || ' now.'
                       ELSE '' END AS pii_text
              FROM documents
            )
            SELECT doc_id,
                   CAST(len(regexp_extract_all(pii_text,
                     '{T.EMAIL_RE}')) AS BIGINT) AS n_emails,
                   CAST(len(regexp_extract_all(pii_text,
                     '{T.PHONE_RE}')) AS BIGINT) AS n_phones,
                   regexp_replace(regexp_replace(pii_text,
                     '{T.EMAIL_RE}', '<EMAIL>', 'g'),
                     '{T.PHONE_RE}', '<PHONE>', 'g') AS scrubbed
            FROM aug
        """,
        "dedup_exact": """
            SELECT md5(text) AS fp, COUNT(*) AS n_copies,
                   MIN(doc_id) AS keeper_id
            FROM documents GROUP BY md5(text)
        """,
        "dedup_minhash_sig": f"""
            {_SHINGLE_CTE}
            SELECT doc_id, concat_ws('|', {minhash_cols}) AS sig FROM sh
        """,
        "dedup_minhash_pairs": f"""
            {_SHINGLE_CTE}
            , sigs AS (
              SELECT doc_id, s,
                     list_aggregate(list_transform(s, x -> md5('0:' || x)), 'min') AS sig1,
                     list_aggregate(list_transform(s, x -> md5('1:' || x)), 'min') AS sig2,
                     list_aggregate(list_transform(s, x -> md5('2:' || x)), 'min') AS sig3,
                     list_aggregate(list_transform(s, x -> md5('3:' || x)), 'min') AS sig4
              FROM sh
            ), banded AS (
              SELECT doc_id, s, {band_keys} FROM sigs
            ), bands AS (
              SELECT doc_id, s, 0 AS band, band0 AS key FROM banded
              UNION ALL
              SELECT doc_id, s, 1 AS band, band1 AS key FROM banded
            ), cand AS (
              SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
              FROM bands a JOIN bands b
                ON a.key = b.key AND a.band = b.band AND a.doc_id < b.doc_id
            )
            SELECT c.id_a, c.id_b, {_JACCARD} AS jaccard_sim
            FROM cand c
            JOIN sh a ON a.doc_id = c.id_a
            JOIN sh b ON b.doc_id = c.id_b
            WHERE {_JACCARD} >= 0.2
        """,
        "dedup_components": f"""
            {_components_cte()}
            SELECT node, CAST(MIN(r) AS BIGINT) AS comp
            FROM reach GROUP BY node
        """,
        "fuzzy_dedup_corpus": f"""
            {_components_cte()}
            , losers AS (
              SELECT node FROM reach GROUP BY node HAVING MIN(r) <> node
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d
            WHERE d.doc_id NOT IN (SELECT node FROM losers)
        """,
        "dedup_keep_best": f"""
            {_components_cte()}
            , comp AS (
              SELECT node, MIN(r) AS comp FROM reach GROUP BY node
            ), scored AS (
              SELECT c.node, c.comp, d.n_chars
              FROM comp c JOIN documents d ON c.node = d.doc_id
            ), winners AS (
              SELECT comp, node AS keeper FROM (
                SELECT comp, node, row_number() OVER (PARTITION BY comp
                  ORDER BY n_chars DESC, node ASC) AS rn
                FROM scored
              ) WHERE rn = 1
            ), losers AS (
              SELECT node FROM comp JOIN winners USING (comp)
              WHERE node <> keeper
            )
            SELECT d.doc_id, d.lang, d.n_chars
            FROM documents d
            WHERE NOT EXISTS (SELECT 1 FROM losers l
                              WHERE l.node = d.doc_id)
        """,
        "dedup_simhash": f"""
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(
                       string_split_regex(trim(lower(text)), '\\s+'))) AS tok
              FROM documents
            ), hashed AS (
              SELECT doc_id,
                     CAST('0x' || substring(md5(tok), 1, 4) AS BIGINT) AS h
              FROM toks WHERE length(tok) > 0
            ), agg AS (
              SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id
            )
            SELECT d.doc_id, COALESCE(({sig16}), 0) AS simhash
            FROM (SELECT DISTINCT doc_id FROM documents) d
            LEFT JOIN agg USING (doc_id)
        """,
        "dedup_simhash_pairs": f"""
            WITH toks AS (
              SELECT doc_id, unnest(list_distinct(
                       string_split_regex(trim(lower(text)), '\\s+'))) AS tok
              FROM documents
            ), hashed AS (
              SELECT doc_id,
                     CAST('0x' || substring(md5(tok), 1, 4) AS BIGINT) AS h
              FROM toks WHERE length(tok) > 0
            ), agg AS (
              SELECT doc_id, {bit_sums} FROM hashed GROUP BY doc_id
            ), sigs AS (
              SELECT d.doc_id, COALESCE(({sig16}), 0) AS simhash
              FROM (SELECT DISTINCT doc_id FROM documents) d
              LEFT JOIN agg USING (doc_id)
            )
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT)
                     AS hamming
            FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
            WHERE bit_count(xor(a.simhash, b.simhash)) <= 2
        """,
        "dedup_ngram_jaccard": f"""
            {_SHINGLE_CTE}
            SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                   {_JACCARD} AS jaccard_sim
            FROM sh a JOIN sh b
              ON a.lang = b.lang
             AND (length(a.text) // 64) = (length(b.text) // 64)
             AND a.doc_id < b.doc_id
            WHERE {_JACCARD} >= 0.1
        """,
        "dedup_incremental": _oracle_snapshot_dedup(_SNAPSHOT_NEW_TEXT_SQL),
        "dedup_bloom": _oracle_bloom_snapshot_filter(_SNAPSHOT_NEW_TEXT_SQL),
        "dedup_cdc": _oracle_cdc_dedup(avg_chunk=8),
        "snapshot_diff": _oracle_snapshot_diff(_SNAPSHOT_DIFF_NEW_SQL),
        "dedup_paragraphs": _oracle_paragraph_dedup(),
        "dedup_substring": """
            WITH toks AS (
              SELECT doc_id,
                     string_split_regex(trim(lower(text)), '\\s+') AS t
              FROM documents
            ), pos AS (
              SELECT doc_id, t,
                     unnest(generate_series(
                       1, greatest(0, length(t) - 7))) AS i
              FROM toks
            ), sh AS (
              SELECT doc_id, i - 1 AS pos,
                     md5(array_to_string(t[i:i+7], ' ')) AS h
              FROM pos
            ), marked AS (
              SELECT doc_id, pos,
                     min(doc_id) OVER (PARTITION BY h) AS lo,
                     max(doc_id) OVER (PARTITION BY h) AS hi
              FROM sh
            ), hits AS (
              SELECT doc_id, pos FROM marked WHERE lo <> hi
            ), isl AS (
              SELECT doc_id, pos,
                     pos - row_number() OVER (PARTITION BY doc_id
                                              ORDER BY pos) AS grp
              FROM hits
            )
            SELECT doc_id,
                   CAST(min(pos) AS BIGINT) AS span_start,
                   CAST(max(pos) + 7 AS BIGINT) AS span_end,
                   CAST(max(pos) - min(pos) + 8 AS BIGINT) AS span_tokens
            FROM isl GROUP BY doc_id, grp
        """,
        "knn_lsh": _lsh_oracle_sql(),
        "multimodal_features": _multimodal_features_oracle_sql(),
        "multimodal_frames": _multimodal_frames_oracle_sql(),
        "multimodal_audio": _multimodal_audio_oracle_sql(),
        "knn_cosine": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qvec
                       FROM embeddings WHERE vec_id < 5),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     round(list_cosine_similarity(
                       CAST(e.embedding AS DOUBLE[]),
                       CAST(q.qvec AS DOUBLE[])), 4) AS sim
              FROM embeddings e CROSS JOIN q
              WHERE e.vec_id <> q.query_id
            )
            SELECT query_id, vec_id, sim,
                   CAST(row_number() OVER (PARTITION BY query_id
                        ORDER BY sim DESC, vec_id ASC) AS BIGINT) AS rank
            FROM scored
            QUALIFY rank <= 5
        """,
        "quantize_embeddings": """
            WITH base AS (
              SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
              FROM embeddings
            ), m AS (
              SELECT vec_id, v,
                     list_aggregate(list_transform(v, x -> abs(x)), 'max')
                       / 127.0 AS scale
              FROM base
            )
            SELECT vec_id, round(scale, 8) AS scale,
                   array_to_string(list_transform(v, x ->
                     CAST(CASE WHEN scale = 0 THEN 0
                          ELSE sign(x) * floor(abs(x) / scale + 0.5)
                          END AS INTEGER)), ',') AS q_csv
            FROM m
        """,
        "embedding_neardup": _NEARDUP_PAIRS_SQL,
        "semantic_clusters": f"""
            WITH RECURSIVE pairs AS ({_NEARDUP_PAIRS_SQL}),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL
              SELECT id_b AS src, id_a AS dst FROM pairs
            ), nodes AS (
              SELECT DISTINCT src AS node FROM edges
            ), reach AS (
              SELECT node, node AS r FROM nodes
              UNION
              SELECT reach.node, e.dst AS r
              FROM reach JOIN edges e ON reach.r = e.src
            ), comp AS (
              SELECT node, MIN(r) AS comp FROM reach GROUP BY node
            ), sizes AS (
              SELECT comp, CAST(count(*) AS BIGINT) AS cluster_size
              FROM comp GROUP BY comp
            )
            SELECT CAST(c.node AS BIGINT) AS vec_id,
                   CAST(c.comp AS BIGINT) AS cluster_id,
                   s.cluster_size
            FROM comp c JOIN sizes s ON c.comp = s.comp
        """,
        "events_hourly": """
            SELECT date_trunc('hour', ts) AS hour, event_type,
                   COUNT(*) AS n_events, round(SUM(value), 4) AS sum_value
            FROM events GROUP BY 1, 2
        """,
        "events_gapfill": _EVENTS_GAPFILL_ORACLE,
        "events_anomaly": _EVENTS_ANOMALY_ORACLE,
        "events_sessionize": """
            WITH g AS (
              SELECT user_id, event_id, ts, value,
                     CASE WHEN epoch(ts) - epoch(lag(ts) OVER
                          (PARTITION BY user_id
                           ORDER BY ts ASC, event_id ASC)) > 1800
                          THEN 1 ELSE 0 END AS new_sess
              FROM events
            ), s AS (
              SELECT user_id, ts, value,
                     CAST(SUM(new_sess) OVER (PARTITION BY user_id
                          ORDER BY ts ASC, event_id ASC
                          ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS session_idx
              FROM g
            )
            SELECT user_id, session_idx, COUNT(*) AS n_events,
                   MIN(ts) AS session_start, MAX(ts) AS session_end,
                   round(SUM(value), 4) AS sum_value
            FROM s GROUP BY user_id, session_idx
        """,
        "events_range_join": """
            WITH w AS (
              SELECT event_id AS window_id, ts AS w_start,
                     ts + INTERVAL 30 MINUTE AS w_end
              FROM events WHERE event_type = 'purchase'
            ), c AS (
              SELECT event_id AS click_id, ts AS click_ts
              FROM events WHERE event_type = 'click'
            )
            SELECT c.click_id, c.click_ts, w.window_id
            FROM c JOIN w
              ON w.w_start <= c.click_ts AND c.click_ts <= w.w_end
        """,
        "events_asof_join": """
            WITH views AS (
              SELECT user_id, ts, ts AS view_ts,
                     round(MAX(value), 4) AS view_value
              FROM events WHERE event_type = 'view'
              GROUP BY user_id, ts
            ), clicks AS (
              SELECT event_id, user_id, ts, round(value, 4) AS click_value
              FROM events WHERE event_type = 'click'
            )
            SELECT c.event_id, c.user_id, c.ts, c.click_value,
                   v.view_ts, v.view_value
            FROM clicks c
            ASOF LEFT JOIN views v
              ON c.user_id = v.user_id AND c.ts >= v.ts
        """,
        "events_retention": """
            WITH first AS (
              SELECT user_id, min(date_trunc('week', ts)) AS cohort_week
              FROM events GROUP BY user_id
            ), active AS (
              SELECT DISTINCT user_id, date_trunc('week', ts)
                       AS active_week
              FROM events
            )
            SELECT f.cohort_week,
                   CAST(date_diff('day', f.cohort_week, a.active_week)
                        // 7 AS BIGINT) AS week_n,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_users
            FROM active a JOIN first f USING (user_id)
            GROUP BY f.cohort_week, week_n
        """,
        "events_funnel": """
            WITH v AS (
              SELECT user_id,
                     min(CASE WHEN event_type = 'view' THEN ts END)
                       AS first_view
              FROM events GROUP BY user_id
            ), c AS (
              SELECT e.user_id,
                     min(CASE WHEN e.event_type = 'click'
                              AND e.ts >= v.first_view THEN e.ts END)
                       AS first_click
              FROM events e JOIN v USING (user_id) GROUP BY e.user_id
            ), p AS (
              SELECT e.user_id,
                     min(CASE WHEN e.event_type = 'purchase'
                              AND e.ts >= c.first_click THEN e.ts END)
                       AS first_purchase
              FROM events e JOIN c USING (user_id) GROUP BY e.user_id
            )
            SELECT user_id, first_view, first_click, first_purchase,
                   CAST(CASE WHEN first_purchase IS NOT NULL THEN 3
                        WHEN first_click IS NOT NULL THEN 2
                        WHEN first_view IS NOT NULL THEN 1
                        ELSE 0 END AS BIGINT) AS stage
            FROM v JOIN c USING (user_id) JOIN p USING (user_id)
        """,
        "events_pivot": """
            SELECT date_trunc('day', ts) AS day,
                   CAST(count(*) FILTER (event_type = 'view') AS BIGINT)
                     AS n_view,
                   CAST(count(*) FILTER (event_type = 'click') AS BIGINT)
                     AS n_click,
                   CAST(count(*) FILTER (event_type = 'purchase')
                        AS BIGINT) AS n_purchase
            FROM events GROUP BY day
        """,
        "json_extract": """
            SELECT doc_id AS doc, lang,
                   unnest(['t' || CAST(doc_id % 5 AS VARCHAR),
                           'u' || CAST(doc_id % 3 AS VARCHAR)]) AS tag
            FROM documents
        """,
        "events_topk_per_type": """
            SELECT event_type,
                   CAST(row_number() OVER (PARTITION BY event_type
                        ORDER BY value DESC, event_id ASC) AS BIGINT) AS rank,
                   event_id, round(value, 4) AS value
            FROM events
            QUALIFY rank <= 3
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(SUM(l_quantity), 2) AS sum_qty,
                   round(SUM(l_extendedprice), 2) AS sum_base_price,
                   round(SUM(l_extendedprice * (1 - l_discount)), 2)
                     AS sum_disc_price,
                   round(AVG(l_quantity), 4) AS avg_qty,
                   COUNT(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
            GROUP BY l_returnflag, l_linestatus
        """,
        "q5_local_supplier": """
            SELECT n.n_name AS nation,
                   round(SUM(l.l_extendedprice * (1 - l.l_discount)), 2)
                     AS revenue,
                   CAST(count(*) AS BIGINT) AS n_lineitems
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
                           AND c.c_nationkey = s.s_nationkey
            JOIN nation n ON c.c_nationkey = n.n_nationkey
            JOIN region r ON n.n_regionkey = r.r_regionkey
            WHERE r.r_name = 'ASIA'
              AND o.o_orderdate >= '1996-01-01'
              AND o.o_orderdate < '1997-01-01'
            GROUP BY n.n_name
        """,
        "q6_forecast_revenue": """
            SELECT round(SUM(l_extendedprice * l_discount), 2) AS revenue,
                   CAST(count(*) AS BIGINT) AS n_items
            FROM lineitem
            WHERE l_shipdate >= '1996-01-01'
              AND l_shipdate < '1997-01-01'
              AND l_discount >= 0.05 AND l_discount <= 0.07
              AND l_quantity < 24
        """,
        "q3_revenue_top10": """
            WITH rev AS (
              SELECT l_orderkey,
                     round(SUM(l_extendedprice * (1 - l_discount)), 2)
                       AS revenue
              FROM lineitem GROUP BY l_orderkey
            )
            SELECT o.o_orderkey AS orderkey, c.c_name AS customer, rev.revenue
            FROM orders o
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN rev ON o.o_orderkey = rev.l_orderkey
            ORDER BY rev.revenue DESC, orderkey ASC
            LIMIT 10
        """,
    }
    # full-probe IVF provably equals brute force (pytest-pinned), so it
    # shares the exact knn_cosine oracle
    oracles["knn_ivf_fullprobe"] = oracles["knn_cosine"]
    from navigator_document_parser_spark.operators.similarity import (
        oracle_bitext_margin_mine as _oracle_bitext_margin_mine,
    )
    oracles["bitext_mine"] = _oracle_bitext_margin_mine(
        _BITEXT_SRC_SQL, _BITEXT_TGT_SQL, min_sim=0.3, min_margin=0.02
    )
    from navigator_document_parser_spark.operators.similarity import (
        oracle_bitext_margin_mine_lsh as _oracle_bitext_margin_mine_lsh,
    )
    oracles["bitext_mine_lsh"] = _oracle_bitext_margin_mine_lsh(
        _BITEXT_SRC_SQL, _BITEXT_TGT_SQL, dim=64,
        min_sim=0.3, min_margin=0.02, n_planes=4, n_tables=4,
    )
    from navigator_document_parser_spark.operators.similarity import (
        oracle_knn_graph as _oracle_knn_graph,
    )
    oracles["knn_graph"] = _oracle_knn_graph(
        "SELECT vec_id, embedding FROM embeddings",
        dim=64, k=5, n_planes=4, n_tables=4,
    )
    from navigator_document_parser_spark.operators.similarity import (
        oracle_semantic_decontaminate as _oracle_sem_decon,
    )

    oracles["semantic_decontaminate"] = _oracle_sem_decon(
        "SELECT vec_id, embedding FROM embeddings",
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id % 10 = 0",
        threshold=0.9, dim=64, n_planes=4, n_tables=4,
    )
    oracles["pagerank_hosts"] = _pagerank_hosts_oracle_sql()
    oracles["hits_hosts"] = _hits_hosts_oracle_sql()
    oracles["anchor_text"] = _ANCHOR_TEXT_ORACLE
    from navigator_document_parser_spark.operators.graph import (
        oracle_label_propagation as _oracle_label_propagation,
    )
    oracles["host_communities"] = _oracle_label_propagation(
        _HOST_COMMUNITY_EDGES_SQL, iterations=5
    )
    from navigator_document_parser_spark.operators.similarity import (
        oracle_semdedup,
    )

    from navigator_document_parser_spark.operators.similarity import (
        oracle_knn_pq,
        oracle_pq_encode,
    )

    oracles["pq_encode"] = oracle_pq_encode(
        dim=64, n_subspaces=4, n_centroids=8
    )
    oracles["knn_pq"] = oracle_knn_pq(
        dim=64, n_subspaces=4, n_centroids=8, k=10
    )
    from navigator_document_parser_spark.operators.sketches import (
        oracle_hll_distinct,
        oracle_kmv_distinct,
    )

    oracles["hll_distinct"] = oracle_hll_distinct(
        value_col="tok", table=f"({_SKETCH_TOKENS_SQL})", p=8
    )
    oracles["kmv_distinct"] = oracle_kmv_distinct(
        value_col="tok", table=f"({_SKETCH_TOKENS_SQL})", k=32
    )
    from navigator_document_parser_spark.operators.sketches import (
        oracle_cms_counts,
    )

    oracles["cms_counts"] = oracle_cms_counts(
        _CMS_TERMS, value_col="tok", table=f"({_SKETCH_TOKENS_SQL})"
    )
    oracles["semdedup"] = oracle_semdedup(
        dim=64, n_clusters=8, threshold=0.35
    )
    oracles["split_sentences"] = T.oracle_split_sentences(
        table=_SENTENCE_SYNTH_TABLE
    )
    oracles["bpe_tokenize"] = T.oracle_bpe_tokenize_stats()
    oracles["domain_quality"] = f"""
        SELECT pr.node AS host, pr.rank, q.n_docs, q.avg_chars
        FROM ({_pagerank_hosts_oracle_sql()}) pr
        JOIN (SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
                     round(avg(n_chars), 4) AS avg_chars
              FROM documents GROUP BY source) q
          ON pr.node = q.source
    """
    from navigator_document_parser_spark.operators import ratio4_sql

    oracles["dedup_containment"] = f"""
        {_SHINGLE_CTE}
        SELECT id_a, id_b, inter, cont_a, cont_b FROM (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                 CAST(length(list_intersect(a.s, b.s)) AS BIGINT) AS inter,
                 {ratio4_sql('length(list_intersect(a.s, b.s))',
                             'length(a.s)')} AS cont_a,
                 {ratio4_sql('length(list_intersect(a.s, b.s))',
                             'length(b.s)')} AS cont_b
          FROM sh a JOIN sh b
            ON a.lang = b.lang AND a.doc_id < b.doc_id
          WHERE length(a.s) > 0 AND length(b.s) > 0
        )
        WHERE greatest(cont_a, cont_b) >= 0.3
    """
    from navigator_document_parser_spark.operators.sketches import (
        oracle_quantile_hist,
    )

    oracles["quantile_sketch"] = oracle_quantile_hist()
    from navigator_document_parser_spark.operators.graph import (
        oracle_bfs_depth,
    )

    oracles["crawl_depth"] = oracle_bfs_depth(
        _CRAWL_DEPTH_EDGES_SQL, seeds=["src0", "src1"], rounds=4
    )
    from navigator_document_parser_spark.operators.similarity import (
        oracle_feature_hash_embed,
    )

    oracles["embed_hash"] = oracle_feature_hash_embed()
    from navigator_document_parser_spark.operators.search import (
        oracle_hybrid_search_rrf,
    )

    oracles["hybrid_search"] = oracle_hybrid_search_rrf(_SEARCH_QUERIES)
    from navigator_document_parser_spark.operators.graph import (
        oracle_k_core,
    )

    oracles["k_core_hosts"] = oracle_k_core(
        _K_CORE_EDGES_SQL, k=4, rounds=5
    )
    from navigator_document_parser_spark.operators.layout import (
        oracle_rendezvous_shards,
    )

    oracles["shard_layout"] = oracle_rendezvous_shards(
        key_col="url",
        shards=8,
        alt_shards=9,
        table=(
            "(SELECT doc_id, 'https://' || source || '/doc/'"
            " || CAST(doc_id AS VARCHAR) AS url FROM documents)"
        ),
    )
    oracles["fix_encoding"] = _fix_encoding_oracle()
    oracles["sitemap_parse"] = _sitemap_parse_oracle()
    oracles["feed_parse"] = _feed_parse_oracle()
    from navigator_document_parser_spark.operators.search import (
        oracle_snippet_search,
    )

    oracles["snippet_search"] = oracle_snippet_search(_SEARCH_QUERIES)
    oracles["boilerplate_strip"] = _boilerplate_strip_oracle()
    from navigator_document_parser_spark.operators.text import (
        oracle_keyness_terms,
    )

    oracles["keyness_terms"] = oracle_keyness_terms(focus="en", k=25)
    from navigator_document_parser_spark.operators.urls import (
        oracle_dust_rules,
        oracle_recrawl_schedule,
    )

    oracles["recrawl_schedule"] = oracle_recrawl_schedule(
        _recrawl_visits_sql("duckdb")
    )
    oracles["dust_rules"] = oracle_dust_rules(
        _DUST_PAGES_SQL.format(DIV="//").replace("AS STRING", "AS VARCHAR"),
        min_support=2,
    )
    from navigator_document_parser_spark.operators.graph import (
        oracle_cocitation_topk,
    )

    oracles["related_hosts"] = oracle_cocitation_topk(
        _RELATED_HOSTS_EDGES_SQL, k=5, max_out=1000
    )
    from navigator_document_parser_spark.operators.tables import (
        oracle_extract_html_tables,
    )

    oracles["html_tables"] = oracle_extract_html_tables(
        _HTML_TABLES_SRC_SQL.replace("AS STRING", "AS VARCHAR")
    )
    oracles["search_eval"] = _search_eval_oracle()
    from navigator_document_parser_spark.operators.text import (
        oracle_token_entropy,
    )

    oracles["token_entropy"] = oracle_token_entropy()
    from navigator_document_parser_spark.operators.graph import (
        oracle_trustrank,
    )

    oracles["trustrank_hosts"] = oracle_trustrank(
        """SELECT source AS src,
                  'h' || CAST((doc_id * 7 + 3) % 40 AS VARCHAR) AS dst,
                  count(*) AS w
           FROM documents GROUP BY 1, 2""",
        seeds=_TRUST_SEEDS,
        iterations=5,
    )
    from navigator_document_parser_spark.operators.dedup import (
        oracle_sorted_neighborhood,
    )

    oracles["dedup_snm"] = oracle_sorted_neighborhood(
        window=4, threshold=0.2, shingle_cte=_SHINGLE_CTE
    )
    # lsh_audit: truth = the UNBLOCKED inverted-index exact-Jaccard
    # pair set; candidates = the same (4,2) band construction as the
    # dedup_minhash_pairs oracle; compared via one full-outer join.
    # The shared shingle CTE is re-sourced onto the same md5-parity
    # half-sample the Spark entry reads (single FROM documents site).
    from navigator_document_parser_spark.operators import md5_u32_sql

    _audit_pred = (
        md5_u32_sql(
            _LSH_AUDIT_SAMPLE_INNER.format(cast="VARCHAR"), "duckdb"
        )
        + " % 2 = 0"
    )
    _audit_cte = _SHINGLE_CTE.replace(
        "FROM documents", f"FROM documents WHERE {_audit_pred}"
    )
    oracles["lsh_audit"] = f"""
        {_audit_cte}
        , shf AS (
          SELECT doc_id, s, length(s) AS n FROM sh WHERE length(s) > 0
        ), inv AS (
          SELECT doc_id, n, unnest(s) AS tok FROM shf
        ), truth AS (
          SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i,
                 any_value(a.n) AS na, any_value(b.n) AS nb
          FROM inv a JOIN inv b
            ON a.tok = b.tok AND a.doc_id < b.doc_id
          GROUP BY 1, 2
        ), truthf AS (
          SELECT id_a, id_b, 1 AS t FROM truth
          WHERE {ratio4_sql('i', 'na + nb - i')} >= 0.2
        ), sigs AS (
          SELECT doc_id,
                 list_aggregate(list_transform(s, x -> md5('0:' || x)),
                                'min') AS sig1,
                 list_aggregate(list_transform(s, x -> md5('1:' || x)),
                                'min') AS sig2,
                 list_aggregate(list_transform(s, x -> md5('2:' || x)),
                                'min') AS sig3,
                 list_aggregate(list_transform(s, x -> md5('3:' || x)),
                                'min') AS sig4
          FROM shf
        ), bandrows AS (
          SELECT doc_id, 0 AS band, md5(sig1 || ',' || sig2) AS key
          FROM sigs
          UNION ALL
          SELECT doc_id, 1 AS band, md5(sig3 || ',' || sig4) AS key
          FROM sigs
        ), cand AS (
          SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b, 1 AS c
          FROM bandrows a JOIN bandrows b
            ON a.key = b.key AND a.band = b.band
           AND a.doc_id < b.doc_id
        ), j AS (
          SELECT t.t AS t, c.c AS c
          FROM truthf t FULL OUTER JOIN cand c
            ON t.id_a = c.id_a AND t.id_b = c.id_b
        ), agg AS (
          SELECT CAST(SUM(t) AS BIGINT) AS n_truth,
                 CAST(SUM(c) AS BIGINT) AS n_candidates,
                 CAST(SUM(CASE WHEN t IS NOT NULL AND c IS NOT NULL
                          THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_true_positive
          FROM j
        )
        SELECT n_truth, n_candidates, n_true_positive,
               CASE WHEN n_candidates > 0 THEN
                 {ratio4_sql('n_true_positive', 'n_candidates')}
               END AS precision4,
               CASE WHEN n_truth > 0 THEN
                 {ratio4_sql('n_true_positive', 'n_truth')}
               END AS recall4
        FROM agg
    """
    from navigator_document_parser_spark.operators.graph import (
        oracle_triangle_count,
    )

    oracles["triangle_hosts"] = oracle_triangle_count(_K_CORE_EDGES_SQL)
    from navigator_document_parser_spark.operators.selection import (
        oracle_weighted_sample,
    )

    oracles["weighted_sample"] = oracle_weighted_sample(k=10)
    oracles["code_detect"] = _code_detect_oracle()
    oracles["trap_detect"] = _trap_detect_oracle()
    oracles["corpus_similarity"] = _corpus_similarity_oracle()
    from navigator_document_parser_spark.operators.similarity import (
        oracle_embedding_outliers,
    )

    oracles["embedding_outliers"] = oracle_embedding_outliers(n_top=20)
    from navigator_document_parser_spark.operators.similarity import (
        oracle_mmr_rerank,
    )

    oracles["mmr_rerank"] = oracle_mmr_rerank(
        queries_pred="vec_id < 3", n_cands=8, k=4, lam=0.7
    )
    oracles["script_stats"] = _script_stats_oracle()
    from navigator_document_parser_spark.operators.text import (
        oracle_vocab_coverage,
    )

    oracles["vocab_coverage"] = oracle_vocab_coverage(vocab_size=16)
    from navigator_document_parser_spark.operators.text import (
        oracle_topic_classify,
    )

    oracles["topic_classify"] = oracle_topic_classify()
    oracles["url_templates"] = _url_templates_oracle()
    from navigator_document_parser_spark.operators.tables import (
        oracle_extract_html_tables as _o_tables,
        oracle_table_linearize as _o_tlin,
    )

    oracles["table_linearize"] = _o_tlin(_o_tables(
        _HTML_TABLES_SRC_SQL.replace("AS STRING", "AS VARCHAR")
    ))
    from navigator_document_parser_spark.operators.unigram import (
        oracle_unigram_tokenize_stats,
    )

    oracles["unigram_tokenize"] = oracle_unigram_tokenize_stats()
    from navigator_document_parser_spark.operators.robots import (
        oracle_robots_sitemaps,
    )

    oracles["robots_sitemaps"] = oracle_robots_sitemaps(
        _ROBOTS_SITEMAP_SRC_SQL
    )
    from navigator_document_parser_spark.operators.tables import (
        oracle_extract_links,
    )

    oracles["extract_links"] = oracle_extract_links(
        _LINKS_HTML_SRC_SQL
    )
    from navigator_document_parser_spark.operators.tables import (
        oracle_link_rels,
    )

    oracles["link_rels"] = oracle_link_rels(_RELS_HTML_SRC_SQL)
    from navigator_document_parser_spark.operators.urls import (
        oracle_url_parallel_pairs,
    )

    oracles["url_parallel_pairs"] = oracle_url_parallel_pairs(
        _parallel_urls_sql("duckdb")
    )
    oracles["host_reputation"] = _host_reputation_oracle()
    oracles["training_pairs"] = _training_pairs_oracle()
    oracles["dedup_bbit"] = _dedup_bbit_oracle()
    from navigator_document_parser_spark.operators.tables import (
        oracle_markup_stats,
        oracle_meta_tags,
    )

    oracles["meta_tags"] = oracle_meta_tags(_META_HTML_SRC_SQL)
    oracles["markup_stats"] = oracle_markup_stats(_META_HTML_SRC_SQL)
    from navigator_document_parser_spark.operators.urls import (
        oracle_resolve_redirects,
    )

    oracles["resolve_redirects"] = oracle_resolve_redirects(
        _REDIRECTS_SRC_SQL, max_hops=4
    )
    from navigator_document_parser_spark.operators.tables import (
        oracle_jsonld_extract,
    )

    oracles["jsonld_extract"] = oracle_jsonld_extract(
        _JSONLD_HTML_SRC_SQL
    )
    from navigator_document_parser_spark.operators.text import (
        oracle_readability_score,
    )

    oracles["readability_score"] = oracle_readability_score()
    from navigator_document_parser_spark.operators.text import (
        oracle_gibberish_score,
    )

    oracles["gibberish_score"] = oracle_gibberish_score()
    oracles["mirror_hosts"] = _mirror_hosts_oracle()
    from navigator_document_parser_spark.operators.tables import (
        oracle_title_consistency,
    )

    oracles["title_consistency"] = oracle_title_consistency(
        _TITLE_SYNTH_SQL
    )
    oracles["degree_stats"] = _DEGREE_STATS_ORACLE
    from navigator_document_parser_spark.operators.dedup import (
        oracle_dedup_phash,
        oracle_video_neardup,
    )

    oracles["dedup_phash"] = oracle_dedup_phash(
        _phash_images_sql("duckdb"), max_dist=3
    )
    oracles["dedup_phash_mirror"] = oracle_dedup_phash(
        _phash_mirror_images_sql("duckdb"), max_dist=3,
        mirror_invariant=True,
    )
    from navigator_document_parser_spark.operators.dedup import (
        oracle_phash_snapshot_dedup,
    )

    oracles["phash_incremental"] = oracle_phash_snapshot_dedup(
        _phash_images_sql("duckdb"), _phash_old_images_sql("duckdb"),
        max_dist=3,
    )
    from navigator_document_parser_spark.operators.layout import (
        oracle_table_stats,
    )

    oracles["table_stats"] = oracle_table_stats(
        "SELECT * FROM documents",
        cols=["doc_id", "lang", "source", "n_chars"],
    )
    from navigator_document_parser_spark.operators.text import (
        oracle_kn_bigram_counts,
    )

    oracles["kn_counts"] = oracle_kn_bigram_counts(
        "SELECT doc_id, text FROM documents", min_count=2
    )
    oracles["video_neardup"] = oracle_video_neardup(
        _video_frames_sql("duckdb"), max_dist=3, min_frames=2
    )
    from navigator_document_parser_spark.operators.layout import (
        oracle_compact_plan,
    )

    oracles["compact_plan"] = oracle_compact_plan(
        _COMPACT_FILES_SQL, target_bytes=8192, min_input_files=2
    )
    from navigator_document_parser_spark.operators.dedup import (
        oracle_audio_neardup,
    )

    oracles["audio_neardup"] = oracle_audio_neardup(
        _audio_frames_sql("duckdb"), max_dist=3, min_frames=2
    )
    from navigator_document_parser_spark.operators.editdist import (
        oracle_dedup_editdist,
        oracle_spell_correct,
    )

    oracles["dedup_editdist"] = oracle_dedup_editdist(
        _editdist_titles_sql("duckdb"), max_dist=1
    )
    oracles["dedup_editdist2"] = oracle_dedup_editdist(
        _editdist_titles_sql("duckdb"), max_dist=2
    )
    oracles["spell_correct"] = oracle_spell_correct(
        _SPELL_QUERIES_SQL, _SPELL_VOCAB_ORACLE, max_dist=1
    )
    oracles["dedup_cluster_stats"] = f"""
        {_components_cte()}
        , comp AS (
          SELECT node, MIN(r) AS comp FROM reach GROUP BY node
        ), sizes AS (
          SELECT comp, count(*) AS sz FROM comp GROUP BY comp
        ), hist AS (
          SELECT sz, CAST(count(*) AS BIGINT) AS n_clusters,
                 CAST(sum(sz) AS BIGINT) AS n_docs
          FROM sizes GROUP BY sz
        ), tot AS (
          SELECT count(*) AS total FROM documents
        ), clus AS (
          SELECT coalesce(sum(sz), 0) AS c FROM sizes
        )
        SELECT CAST(sz AS BIGINT) AS cluster_size, n_clusters, n_docs
        FROM hist
        UNION ALL
        SELECT CAST(1 AS BIGINT) AS cluster_size,
               CAST(total - c AS BIGINT) AS n_clusters,
               CAST(total - c AS BIGINT) AS n_docs
        FROM tot, clus WHERE total - c > 0
    """
    return oracles
