"""Local replica of the driver's CORRECTNESS gate.

Runs every queries() entry on Spark and, when an oracle exists, the
matching SQL on DuckDB; compares row count, sorted column names, and an
order-insensitive value hash (floats rounded to 6dp, columns sorted by
name — the documented driver comparison).

Usage: python tools/check_contract.py [sf_dir] [master]
"""

from __future__ import annotations

import hashlib
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def value_hash(df: pd.DataFrame) -> str:
    """Driver-faithful canonicalization (CORRECTNESS gate replica).

    The driver's _canon sorts rows with pandas sort_values over every
    RAW column before hashing — which raises TypeError on list/struct
    values (CORRECTNESS_r04 index_export/index_merge shipped because
    the old replica stringified columns BEFORE sorting and so passed
    locally). Canonicalize the driver's way so any non-scalar result
    column fails here first.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
    # raises on unhashable (list/struct) cells, exactly like the driver
    df = df.sort_values(by=list(df.columns), kind="mergesort")
    df = df.reset_index(drop=True)
    for c in df.columns:
        df[c] = df[c].astype(str)
    rows = df.apply("|".join, axis=1).tolist()
    return hashlib.md5("\n".join(rows).encode()).hexdigest()


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    master = sys.argv[2] if len(sys.argv) > 2 else "local[8]"

    import __spark_entry__ as E
    from navigator_document_parser_spark.config import build_spark

    spark = build_spark("contract-check", master=master,
                        extra_conf={"spark.ui.enabled": "false"})
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )

    print("== entry() smoke ==")
    t0 = time.time()
    edf = E.entry(spark)
    n = edf.count()
    print(f"entry rows={n} schema={[f.name for f in edf.schema.fields]} "
          f"({time.time()-t0:.1f}s)")
    assert n > 0

    qs, oracles = E.queries(), E.oracle_sql()
    fails = []
    for name, fn in qs.items():
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as e:
            fails.append((name, f"SPARK ERROR {e}"))
            print(f"FAIL  {name}: spark error {str(e)[:200]}")
            continue
        if name not in oracles:
            print(f"rows-only  {name}: rows={len(sdf)} "
                  f"cols={sorted(sdf.columns)} ({time.time()-t0:.1f}s)")
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            fails.append((name, f"ORACLE ERROR {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        ok_hash = ok_rows and ok_cols and value_hash(sdf) == value_hash(ddf)
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        print(f"{status} {name}: rows {len(sdf)}/{len(ddf)} "
              f"cols={'ok' if ok_cols else (sorted(sdf.columns), sorted(ddf.columns))} "
              f"hash={'ok' if ok_hash else 'MISMATCH'} ({time.time()-t0:.1f}s)")
        if not (ok_rows and ok_cols and ok_hash):
            fails.append((name, "mismatch"))

    print(f"\n{len(qs) - len(fails)}/{len(qs)} queries OK")
    if fails:
        for f in fails:
            print("FAILED:", f[0])
        sys.exit(1)


if __name__ == "__main__":
    main()
