#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB oracles.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir> [only_query ...]

Mimics the driver's t2 gate as observed from CORRECTNESS_r01.json:
  - Spark side loaded with pandas.read_parquet (pyarrow): DECIMAL columns
    stay decimal.Decimal objects, ARRAY columns become numpy.ndarray.
  - Oracle side fetched with duckdb .df(): DECIMAL becomes float64.
  - Values are compared via their string form after sorting columns by
    name and rows by value.
So a Spark DECIMAL(38,2) "3651.00" vs oracle float "3651.0" FAILS here
(exactly as in the driver), and any ndarray cell raises (driver's
"unhashable numpy.ndarray"). Queries must emit DOUBLE / string / int /
timestamp outputs only.
"""
import sys, json, glob
import duckdb
import numpy as np
import pandas as pd


def norm(v):
    import datetime, decimal
    if isinstance(v, (list, tuple, np.ndarray)):
        # the driver's pandas compare dies on array cells; surface it as a
        # loud failure instead of silently tuple-izing like the old check
        raise TypeError("driver-hostile array-typed output cell")
    # null check FIRST: a float NaN must normalize to the same token as
    # None, or a Spark null vs DuckDB-NaN column falsely mismatches
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return "dec:" + str(v)  # distinct from float repr, like the driver
    if isinstance(v, (pd.Timestamp, datetime.datetime)):
        return v.isoformat()
    return str(v)


def canon(df):
    cols = sorted(df.columns)
    rows = []
    for r in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(norm(x) for x in r))
    rows.sort()
    return cols, rows


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_df = pd.concat([pd.read_parquet(f) for f in files],
                                 ignore_index=True)
            oracle_df = con.execute(sql).df()
            gc, grr = canon(spark_df)
            oc, orr = canon(oracle_df)
        except Exception as e:
            print(f"FAIL {name}: {type(e).__name__}: {e}"); n_fail += 1
            continue
        if gc != oc:
            print(f"FAIL {name}: cols {gc} != oracle {oc}"); n_fail += 1
        elif grr != orr:
            diff = [(a, b) for a, b in zip(grr, orr) if a != b][:3]
            print(f"FAIL {name}: rows {len(grr)} vs {len(orr)}; first diffs {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
