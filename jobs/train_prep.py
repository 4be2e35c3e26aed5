"""spark-submit entrypoint: curated corpus -> training-ready packs.

The last mile between curation and the training loader. Composes the
oracle-checked operators end-to-end:

    curate (exact dedup -> Gopher gate -> optional decontamination,
            jobs/curate.py)
      -> optional temperature-scaled language mixing (mT5/XLM-R rule,
         selection.temperature_mix)
      -> optional per-language token-budget selection
         (selection.budget_select)
      -> sequence packing into fixed-token-budget packs across
         deterministic shards (text.pack_sequences)
      -> parquet partitioned by shard — (shard, pack_id) is the file
         key the training loader streams in order.

Cluster usage:

    zip -r ndps.zip navigator_document_parser_spark
    spark-submit --py-files ndps.zip jobs/train_prep.py \
        --input  s3a://bucket/warehouse/documents \
        --output s3a://bucket/warehouse/train_packs \
        --holdout s3a://bucket/warehouse/benchmark_docs \
        --alpha 0.3 --budget-frac 0.5 \
        --token-budget 1000000 --max-tokens 2048 --n-shards 64

Scale shape: curation is hash-aggregates + broadcast joins (see
jobs/curate.py); both selection stages are one group-count aggregate
plus a broadcast rate/budget table over a shuffle-free projection;
packing windows are per-shard (never a global running sum). Every keep
decision is a deterministic function of ids — re-running the job on
the same input reproduces the same packs bit-for-bit.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def prep(spark, docs, holdout=None, alpha=None, budget_frac: float = 0.5,
         token_budget=None, max_tokens: int = 2048, n_shards: int = 16,
         curriculum_phases=None, with_counts: bool = True):
    """documents(doc_id, text, lang, ...) -> (packed docs, stage counts).

    Returns a DataFrame with the surviving documents' columns plus
    (n_tokens, shard, pack_id). Caller owns unpersist of the returned
    frame when with_counts=True (the curate() ownership contract).
    """
    from pyspark.sql import functions as F

    from jobs.curate import curate
    from navigator_document_parser_spark.operators.selection import (
        budget_select,
        temperature_mix,
    )
    from navigator_document_parser_spark.operators.text import (
        pack_sequences,
    )

    curated, counts = curate(spark, docs, holdout=holdout,
                             with_counts=with_counts)

    # the curate() counting discipline: every counted intermediate is
    # persisted for the build so later stages read it instead of
    # re-executing the selection chain once per downstream count
    pinned = []

    def stage(df, name):
        if with_counts:
            df = df.persist()
            pinned.append(df)
            counts[name] = df.count()
        return df

    selected = curated
    if alpha is not None:
        keep_ids = (
            temperature_mix(selected, alpha=alpha,
                            budget_frac=budget_frac)
            .filter("keep")
            .select(F.col("id").alias("doc_id"))
        )
        selected = stage(selected.join(keep_ids, "doc_id"),
                         "after_temperature_mix")

    if token_budget is not None:
        kept = budget_select(selected, token_budget).select("doc_id")
        selected = stage(selected.join(kept, "doc_id"),
                         "after_budget_select")

    if curriculum_phases is not None:
        # curriculum training: packs must be PHASE-HOMOGENEOUS or the
        # loader cannot stream phase 0 first without splitting packs
        # (review finding) — compute phases first, then pack each
        # phase independently; (phase, shard, pack_id) is the pack key
        from navigator_document_parser_spark.operators.selection import (
            curriculum_order,
        )

        if not with_counts:
            # lazy mode persists nothing, and this frame feeds the
            # curriculum histogram + join AND every per-phase packing
            # branch — one eager barrier instead of ~4 re-executions
            selected = selected.localCheckpoint(eager=True)
        phases = curriculum_order(
            selected, n_phases=curriculum_phases
        ).select("doc_id", "phase")
        staged = selected.join(phases, "doc_id")
        parts = []
        for ph in range(curriculum_phases):
            sub = staged.filter(F.col("phase") == ph)
            packs_p = pack_sequences(sub, max_tokens=max_tokens,
                                     n_shards=n_shards, salt=f"pack{ph}")
            parts.append(sub.join(packs_p, "doc_id"))
        out = parts[0]
        for part in parts[1:]:
            out = out.unionByName(part)
    else:
        packs = pack_sequences(selected, max_tokens=max_tokens,
                               n_shards=n_shards)
        out = selected.join(packs, "doc_id")
    if with_counts:
        out = out.persist()
        counts["packed_docs"] = out.count()
        # with --curriculum the pack key is (phase, shard, pack_id):
        # pack_sequences runs once per phase with its own salt, so
        # pack_id collides across phases (r6 ADVICE)
        pack_key = (
            ["phase", "shard", "pack_id"]
            if curriculum_phases is not None
            else ["shard", "pack_id"]
        )
        counts["n_packs"] = out.select(*pack_key).distinct().count()
        for df in pinned:
            df.unpersist()
        curated.unpersist()
    return out, counts


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--holdout", default=None,
                   help="optional benchmark/holdout docs parquet dir")
    p.add_argument("--alpha", type=float, default=None,
                   help="temperature-mix exponent (omit to skip mixing)")
    p.add_argument("--budget-frac", type=float, default=0.5)
    p.add_argument("--token-budget", type=int, default=None,
                   help="per-language token budget (omit to keep all)")
    p.add_argument("--max-tokens", type=int, default=2048)
    p.add_argument("--n-shards", type=int, default=16)
    p.add_argument("--curriculum", type=int, default=None,
                   help="stamp difficulty-quantile phases (easy->hard)")
    p.add_argument("--master", default=None)
    args = p.parse_args(argv)

    from navigator_document_parser_spark.config import build_spark

    spark = build_spark("train-prep", master=args.master)
    docs = spark.read.parquet(args.input)
    holdout = spark.read.parquet(args.holdout) if args.holdout else None

    out, counts = prep(
        spark, docs, holdout=holdout, alpha=args.alpha,
        budget_frac=args.budget_frac, token_budget=args.token_budget,
        max_tokens=args.max_tokens, n_shards=args.n_shards,
        curriculum_phases=args.curriculum,
    )
    (out.repartition("shard")
        .write.mode("overwrite").partitionBy("shard")
        .parquet(args.output))
    out.unpersist()
    for k, v in counts.items():
        print(f"{k}: {v}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
