"""Dump .explain('formatted') for named contract queries.

Usage: python tools/dump_plan.py name [name ...] [--sf SF_DIR] [--out DIR]
Writes <out>/<name>.txt (or prints to stdout with --stdout).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, ".")


def main() -> None:
    names: list[str] = []
    sf_dir = "/root/testdata/sf0.1"
    out_dir = None
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            i += 1
            sf_dir = argv[i]
        elif a == "--out":
            i += 1
            out_dir = argv[i]
        else:
            names.append(a)
        i += 1

    import __spark_entry__ as E
    from navigator_document_parser_spark.config import build_spark

    spark = build_spark(
        "dump-plan", master="local[4]",
        extra_conf={"spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        txt = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        if out_dir:
            path = os.path.join(out_dir, f"{name}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path}")
        else:
            print(f"==== {name} ====\n{txt}")


if __name__ == "__main__":
    main()
