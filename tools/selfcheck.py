#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the parquet tables in <sfDir>, normalize (sort columns by name,
round doubles to 4dp), and diff against the Spark parquet dump.
"""
import sys, json, glob, math
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{round(v, 4):.4f}"
    if v is None:
        return ""
    return str(v)

def norm(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm_cell(r[i]) for i in order) for r in rows]

fails = 0
for name, sql in sorted(oracle.items()):
    try:
        oc = con.execute(sql)
        ocols = [d[0] for d in oc.description]
        orows = oc.fetchall()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}")
        fails += 1
        continue
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    sc = con.execute(f"SELECT * FROM read_parquet({files!r})")
    scols = [d[0] for d in sc.description]
    srows = sc.fetchall()
    if sorted(ocols) != sorted(scols):
        print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
        fails += 1
        continue
    no, ns = norm(orows, ocols), norm(srows, scols)
    if no != ns:
        print(f"FAIL {name}: rows oracle={len(no)} spark={len(ns)}")
        for i, (a, b) in enumerate(zip(no, ns)):
            if a != b:
                print(f"  first diff @ {i}: oracle={a} spark={b}")
                break
        fails += 1
    else:
        print(f"OK   {name} ({len(no)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
