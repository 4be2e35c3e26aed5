"""Local replica of the driver's CORRECTNESS gate.

Runs every queries() entry on Spark and, when an oracle exists, the
matching SQL on DuckDB; compares row count, sorted column names, and an
order-insensitive value hash (floats rounded to 6dp, columns sorted by
name — the documented driver comparison).

Usage: python tools/check_contract.py [sf_dir] [master] [--json OUT.json]

--json writes a driver-CORRECTNESS-shaped artifact (per-query
rows/schema/hash match booleans) covering ALL queries — the committed
evidence for the slots the driver's 50-slot artifact never sees.
"""

from __future__ import annotations

import hashlib
import json
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
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i:i + 2]
    sf_dir = argv[0] if len(argv) > 0 else "/root/testdata/sf0.01"
    master = argv[1] if len(argv) > 1 else "local[8]"
    results: dict[str, dict] = {}

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
            results[name] = {"err": f"spark: {e}"[:500]}
            continue
        if name not in oracles:
            print(f"rows-only  {name}: rows={len(sdf)} "
                  f"cols={sorted(sdf.columns)} ({time.time()-t0:.1f}s)")
            results[name] = {"rows_only": True, "spark_rows": len(sdf),
                             "secs": round(time.time() - t0, 2)}
            continue
        try:
            ddf = con.sql(oracles[name]).df()
        except Exception as e:
            fails.append((name, f"ORACLE ERROR {e}"))
            print(f"FAIL  {name}: oracle error {str(e)[:200]}")
            results[name] = {"err": f"oracle: {e}"[:500]}
            continue
        ok_rows = len(sdf) == len(ddf)
        ok_cols = sorted(sdf.columns) == sorted(ddf.columns)
        try:
            ok_hash = (ok_rows and ok_cols
                       and value_hash(sdf) == value_hash(ddf))
            hash_err = None
        except Exception as e:  # driver-style canon crash (list cols)
            ok_hash, hash_err = False, f"canon: {e}"[:500]
        status = "OK   " if (ok_rows and ok_cols and ok_hash) else "FAIL "
        print(f"{status} {name}: rows {len(sdf)}/{len(ddf)} "
              f"cols={'ok' if ok_cols else (sorted(sdf.columns), sorted(ddf.columns))} "
              f"hash={'ok' if ok_hash else 'MISMATCH'} ({time.time()-t0:.1f}s)")
        results[name] = {
            "rows_match": ok_rows, "schema_match": ok_cols,
            "hash_match": ok_hash, "spark_rows": len(sdf),
            "oracle_rows": len(ddf), "err": hash_err,
            "secs": round(time.time() - t0, 2),
        }
        if not (ok_rows and ok_cols and ok_hash):
            fails.append((name, "mismatch"))

    print(f"\n{len(qs) - len(fails)}/{len(qs)} queries OK")
    if json_out:
        with open(json_out, "w") as fh:
            json.dump({"sf_dir": sf_dir, "master": master,
                       "results": results}, fh, indent=1)
        print(f"wrote {json_out}")
    if fails:
        for f in fails:
            print("FAILED:", f[0])
        sys.exit(1)


if __name__ == "__main__":
    main()
