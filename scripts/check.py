#!/usr/bin/env python3
"""Local driver-mimic: compare Verify output parquet against DuckDB oracles.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
Mimics the driver's t2 gate: for each query, run the oracle SQL in DuckDB
over the same parquet tables, sort columns by name, sort rows, and compare
values (hash-style exact compare).
"""
import sys, json, glob, os
import duckdb

def canon(rows, cols):
    # sort columns by name, then rows; stringify values for a stable compare
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        out.append(tuple(norm(r[i]) for i in order))
    out.sort()
    return sorted(c for c in cols), out

def norm(v):
    import datetime, decimal
    if isinstance(v, float):
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(norm(x) for x in v)
    return v

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    only = sys.argv[3:] or None
    for name, sql in sorted(oracles.items()):
        if only and name not in only:
            continue
        pq = f"{out_dir}/{name}"
        if not glob.glob(f"{pq}/*.parquet"):
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            orc = con.execute(sql)
            ocols = [d[0] for d in orc.description]
            orows = orc.fetchall()
            got = con.execute(f"SELECT * FROM '{pq}/*.parquet'")
            gcols = [d[0] for d in got.description]
            grows = got.fetchall()
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        oc, orr = canon(orows, ocols)
        gc, grr = canon(grows, gcols)
        if oc != gc:
            print(f"FAIL {name}: cols {gc} != oracle {oc}"); n_fail += 1
        elif orr != grr:
            diff = [(a, b) for a, b in zip(grr, orr) if a != b][:3]
            print(f"FAIL {name}: rows {len(grr)} vs {len(orr)}; first diffs {diff}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(grr)} rows)"); n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
