"""Scaling-efficiency evidence: same extraction job at two parallelism
levels (sandbox proxy for N vs 4N executors, per BASELINE.md).

Runs the full extraction pipeline over the same deterministic corpus on
local[N] and local[4N], reports docs/sec at both and
efficiency = (throughput_4N / throughput_N) / 4. Results are appended to
BENCH/BASELINE.md by hand (the file records the runs we publish).

Usage: python tools/bench_scaling.py [n_docs] [n_small] [n_large]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def run_once(master_threads: int, n_docs: int) -> dict:
    """Run one measurement in a FRESH subprocess: stopping a SparkContext
    keeps the (churned) JVM alive, and the accumulated heap/Arrow garbage
    degrades the next in-process session by up to 3x (measured 6114 ->
    1865 docs/s on round 2) — a fresh JVM per point is the only honest
    protocol on one box."""
    import subprocess

    out = subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--once",
         str(master_threads), str(n_docs)],
        capture_output=True, text=True,
    )
    if out.returncode != 0:
        sys.stderr.write(out.stderr)  # keep the child's traceback
        raise SystemExit(f"scaling run failed (rc={out.returncode})")
    return json.loads(out.stdout.strip().splitlines()[-1])


def _run_once_inproc(master_threads: int, n_docs: int) -> dict:
    from navigator_document_parser_spark.config import build_spark
    from bench import run_extraction_bench

    spark = build_spark(
        "scaling-bench",
        master=f"local[{master_threads}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": str(master_threads),
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM JIT/codegen + python worker fork/imports (steady state
    # is what a long-running cluster job sees), then best of three runs
    # (local-machine noise is +-15% run to run)
    run_extraction_bench(spark, min(5000, n_docs))
    secs = []
    text_bytes = 0
    for _ in range(3):
        s, text_bytes = run_extraction_bench(spark, n_docs)
        secs.append(s)
    sec = min(secs)
    spark.stop()
    return {
        "threads": master_threads,
        "n_docs": n_docs,
        "wall_sec": round(sec, 2),
        "docs_per_sec": round(n_docs / sec, 1),
        "text_bytes": text_bytes,
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--once":
        print(json.dumps(_run_once_inproc(int(sys.argv[2]), int(sys.argv[3]))))
        return
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    n_small = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    n_large = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    rounds = int(sys.argv[4]) if len(sys.argv) > 4 else 2

    # INTERLEAVED rounds: the N-thread run leaves more turbo headroom
    # than the 4N-thread run, so measuring them back-to-back under the
    # same thermal state (small, large, small, large, ...) and taking
    # the median per side cancels most of the frequency-scaling skew
    # that plagues single-box N-vs-4N comparisons.
    smalls, larges = [], []
    for _ in range(rounds):
        smalls.append(run_once(n_small, n_docs))
        larges.append(run_once(n_large, n_docs))

    def avg(results):
        vals = [r["docs_per_sec"] for r in results]
        return round(sum(vals) / len(vals), 1)

    s_tp, l_tp = avg(smalls), avg(larges)
    eff = (l_tp / s_tp) / (n_large / n_small)
    out = {
        "small": {"threads": n_small, "n_docs": n_docs,
                  "docs_per_sec_runs": [r["docs_per_sec"] for r in smalls],
                  "docs_per_sec": s_tp},
        "large": {"threads": n_large, "n_docs": n_docs,
                  "docs_per_sec_runs": [r["docs_per_sec"] for r in larges],
                  "docs_per_sec": l_tp},
        "scale_ratio": n_large / n_small,
        "efficiency": round(eff, 3),
        "pass_0p8": eff >= 0.8,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
