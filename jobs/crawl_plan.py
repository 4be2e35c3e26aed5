"""spark-submit entrypoint for crawl planning: discovery artifacts in,
a politeness-scheduled, policy-filtered fetch plan out.

Composes the crawl-side operator stack end-to-end:

    sitemap urls ──> canonicalize + blocklist (urls.filter_urls)
                 ──> robots.txt allow/deny   (robots.robots_filter)
                 ──> drop already-committed  (left-anti on url)
                 ──> worker/slot assignment  (urls.fetch_schedule)

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/crawl_plan.py \
        --sitemaps  's3a://bucket/discovery/sitemaps/*.xml' \
        --robots    s3a://bucket/discovery/robots.parquet \
        --committed s3a://bucket/warehouse/documents \
        --output    s3a://bucket/plans/2026-08 \
        --workers 64 --blocklist spam.example,ads.example

``--robots`` is a parquet table (host, robots_txt) — the fetcher that
collected robots.txt bodies writes it; ``--committed`` needs only a
``url`` column. The plan is written partitioned by worker so each
fetcher process reads exactly its own queue, ordered by slot.

Every stage is the same operator the contract queries pin
(sitemap_parse / url_filter / robots_filter / fetch_schedule), so the
CLI adds composition, not new semantics.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F


def build_plan(spark, sitemaps_glob: str, robots_path: str,
               committed_path: str | None, blocklist: list[str],
               workers: int, agent: str = "*"):
    """Returns (plan_df, stats_dict); plan_df = (url, host, worker,
    host_seq, slot)."""
    from navigator_document_parser_spark.operators.robots import (
        robots_filter,
        robots_rules,
    )
    from navigator_document_parser_spark.operators.urls import (
        fetch_schedule,
        filter_urls,
    )
    from navigator_document_parser_spark.sources.sitemap import (
        read_sitemaps,
    )

    # persist each funnel stage: the stats counts and the downstream
    # stage would otherwise re-execute the wholetext read + regex parse
    # and the robots Arrow stage once per action (caches are
    # process-lifetime here; a long-lived service would unpersist after
    # the write)
    entries = (
        read_sitemaps(spark, sitemaps_glob)
        .filter(F.col("kind") == "url")
        .persist()
    )
    n_discovered = entries.count()

    kept = (
        filter_urls(entries.select("url").dropDuplicates(), blocklist)
        .filter(~F.col("blocked"))
        .select(F.col("url_canonical").alias("url"))
        .dropDuplicates()
        .persist()
    )
    n_after_blocklist = kept.count()

    parts = kept.select(
        "url",
        F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://([^/?#]*)", 1)
        .alias("host"),
        # RFC 9309 matches rules against path INCLUDING the query
        # string ('Disallow: /search?' must block /search?q=x), so keep
        # everything after the authority except the fragment
        F.coalesce(
            F.nullif(
                F.regexp_extract("url", r"^[a-z][a-z0-9+.-]*://[^/?#]*([^#]*)", 1),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("path"),
    )
    rules = robots_rules(spark.read.parquet(robots_path))
    allowed = (
        robots_filter(parts, rules, agent=agent, id_col="url")
        .filter(F.col("allowed"))
        .select("url", "host")
        .persist()
    )
    n_allowed = allowed.count()

    if committed_path:
        committed = spark.read.parquet(committed_path).select("url")
        allowed = allowed.join(committed, "url", "left_anti")
    n_new = allowed.count()

    plan = fetch_schedule(allowed, n_workers=workers)
    return plan, {
        "discovered": n_discovered,
        "after_blocklist": n_after_blocklist,
        "robots_allowed": n_allowed,
        "new_urls": n_new,
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--sitemaps", required=True)
    p.add_argument("--robots", required=True)
    p.add_argument("--committed", default=None)
    p.add_argument("--output", required=True)
    p.add_argument("--workers", type=int, default=8)
    p.add_argument("--agent", default="*")
    p.add_argument("--blocklist", default="")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from navigator_document_parser_spark.config import build_spark

    spark = build_spark("crawl-plan", master=args.master)
    blocklist = [d for d in args.blocklist.split(",") if d]
    plan, stats = build_plan(
        spark,
        args.sitemaps,
        args.robots,
        args.committed,
        blocklist,
        args.workers,
        agent=args.agent,
    )
    (
        plan.repartition("worker")
        .sortWithinPartitions("slot")
        .write.mode("overwrite")
        .partitionBy("worker")
        .parquet(args.output)
    )
    stats["planned"] = spark.read.parquet(args.output).count()
    print({"crawl_plan": stats})
    return stats


if __name__ == "__main__":
    main()
