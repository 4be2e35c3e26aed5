"""Fresh-subprocess A/B probe for embedding_neardup (VERDICT r3 #1).

Run: python tools/probe_neardup.py [sf_dir] [n_runs]
Prints per-run wall-clock for the query as currently wired in
__spark_entry__.py, using the same session config as bench.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4

    import __spark_entry__ as E
    from navigator_document_parser_spark.config import build_spark

    spark = build_spark(
        "probe",
        master="local[32]",
        extra_conf={
            "spark.ui.enabled": "false",
            "spark.sql.shuffle.partitions": "32",
            "spark.driver.memory": "24g",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    fn = E.queries()["embedding_neardup"]
    for i in range(n):
        t0 = time.time()
        df = fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        print(f"run {i}: {time.time() - t0:.3f}s")


if __name__ == "__main__":
    main()
