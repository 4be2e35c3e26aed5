"""Extra benchmarks for the optimization rounds (bench.py is FROZEN).

Times named contract queries with bench.py's exact methodology (same
session conf, noop sink, best-of-2, System.gc() nudge between runs) in
THIS process — run it in a fresh interpreter per batch for comparable
JVM state, e.g.:

    SPARK_GRAFT_SF_DIR=/root/testdata/sf1.0 python bench_extra.py \
        winnow_pairs audio_neardup bitext_mine

Prints one JSON line {"queries": {name: best_sec}, "sf_dir": ...}.
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    runs_flag = 3 if "--best-of-3" in sys.argv else 2
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    import __spark_entry__ as E
    from navigator_document_parser_spark.config import build_spark

    spark = build_spark(
        "bench-extra",
        master=f"local[{cpus}]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": str(cpus),
            "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    # same untimed warmup as bench.py ops batches
    for wname in ("events_hourly", "q3_revenue_top10",
                  "text_metrics", "multimodal_features"):
        qs[wname](spark, sf_dir).write.format("noop").mode(
            "overwrite"
        ).save()
    out: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        best = float("inf")
        for _ in range(runs_flag):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            best = min(best, time.time() - t0)
            del df
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        out[name] = round(best, 3)
        print(f"# {name}: {out[name]}s", file=sys.stderr)
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "cpus": cpus}))


if __name__ == "__main__":
    main()
