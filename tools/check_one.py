"""Check a subset of queries() against their oracles (fast iteration).

Usage: python tools/check_one.py name [name ...] [--sf SF_DIR]
"""

from __future__ import annotations

import sys
import time

import duckdb

sys.path.insert(0, ".")

from tools.check_contract import TABLES, value_hash  # noqa: E402


def main():
    sf_dir = "/root/testdata/sf0.01"
    args: list[str] = []
    argv = sys.argv[1:]
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--sf="):
            sf_dir = a.split("=", 1)[1]
        elif a == "--sf":
            i += 1
            sf_dir = argv[i]
        else:
            args.append(a)
        i += 1

    import __spark_entry__ as E
    from navigator_document_parser_spark.config import build_spark

    spark = build_spark("check-one", master="local[8]",
                        extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = E.queries(), E.oracle_sql()
    rc = 0
    unknown = [n for n in args if n not in qs]
    if unknown:
        sys.exit(f"unknown queries {unknown}; known: {sorted(qs)}")
    for name in args:
        t0 = time.time()
        sdf = qs[name](spark, sf_dir).toPandas()
        if name not in oracles:
            print(f"rows-only {name}: rows={len(sdf)} ({time.time()-t0:.1f}s)")
            continue
        ddf = con.sql(oracles[name]).df()
        ok = (len(sdf) == len(ddf)
              and sorted(sdf.columns) == sorted(ddf.columns)
              and value_hash(sdf) == value_hash(ddf))
        print(f"{'OK  ' if ok else 'FAIL'} {name}: rows {len(sdf)}/{len(ddf)} "
              f"cols {sorted(sdf.columns)} vs {sorted(ddf.columns)} "
              f"({time.time()-t0:.1f}s)")
        if not ok:
            rc = 1
            if len(sdf) and len(ddf):
                s = sdf[sorted(sdf.columns)].sort_values(
                    sorted(sdf.columns)).head(5)
                d = ddf[sorted(ddf.columns)].sort_values(
                    sorted(ddf.columns)).head(5)
                print("spark:\n", s, "\noracle:\n", d)
    sys.exit(rc)


if __name__ == "__main__":
    main()
