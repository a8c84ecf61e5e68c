#!/usr/bin/env python3
"""Local pre-flight of the driver's DuckDB oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query in <verifyOutDir>/oracle_sql.json: run the SQL in DuckDB
against the parquet tables in <sfDir> and diff against the Spark
parquet dump two ways:

 1. TYPE-STRICT (the driver's hasher is type-sensitive): compare the
    Arrow schemas after sorting columns by name. DuckDB returns
    HUGEINT (decimal128) for integer sum()s — that hash-mismatches a
    Spark LONG even when every value is equal (round-1 q17/q28
    failure class), so a type diff here is a FAIL.
 2. Value compare (sort columns by name, round doubles to 4dp).

Also lints every oracle SQL for integer sum() windows/aggregates not
wrapped in CAST(... AS BIGINT).
"""
import sys, json, glob, math, re
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

def sorted_types(arrow_table):
    """(name, type) pairs sorted by column name — the driver hashes
    typed Arrow values, so int64 vs decimal128 is a real mismatch.
    Integer WIDTHS are normalized (int32 vs int64 hashed equal in
    round 1: q14 rn passed with Spark int32 vs DuckDB int64)."""
    ints = {"int8", "int16", "int32", "int64", "uint8", "uint16",
            "uint32", "uint64"}
    def n(t):
        return "int" if t in ints else t
    s = arrow_table.schema
    return sorted((f.name, n(str(f.type))) for f in s)

# lint: integer sum() in DuckDB yields HUGEINT; require an enclosing
# CAST(...) or a round(...) (doubles) immediately before the sum. A
# heuristic backstop — the Arrow type compare below is the real gate.
def lint_hugeint(name, sql):
    hits = 0
    for m in re.finditer(r"sum\s*\(", sql, re.IGNORECASE):
        prefix = re.sub(r"\s+", "", sql[max(0, m.start() - 30):m.start()]).lower()
        if prefix.endswith("cast(") or prefix.endswith("round(") \
                or prefix.endswith("list_"):
            continue
        # find the sum's argument; sums over doubles are safe
        depth, i = 1, m.end()
        while i < len(sql) and depth:
            depth += {"(": 1, ")": -1}.get(sql[i], 0)
            i += 1
        if "double" in sql[m.end():i - 1].lower():
            continue
        print(f"LINT {name}: integer sum() without CAST AS BIGINT near "
              f"char {m.start()}: …{' '.join(sql[max(0, m.start() - 30):i].split())}…")
        hits += 1
    return hits

fails = 0
lints = 0
for name, sql in sorted(oracle.items()):
    lints += lint_hugeint(name, sql)
    try:
        oc = con.execute(sql)
        ot = oc.arrow()
        ocols = ot.column_names
        orows = [tuple(r) for r in zip(*[c.to_pylist() for c in ot.columns])] \
            if ot.num_columns else []
        if ot.num_rows == 0:
            orows = []
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
    st = sc.arrow()
    scols = st.column_names
    srows = [tuple(r) for r in zip(*[c.to_pylist() for c in st.columns])] \
        if st.num_columns else []
    if st.num_rows == 0:
        srows = []
    if sorted(ocols) != sorted(scols):
        print(f"FAIL {name}: cols oracle={sorted(ocols)} spark={sorted(scols)}")
        fails += 1
        continue
    otypes, stypes = sorted_types(ot), sorted_types(st)
    if otypes != stypes:
        diff = [(a, b) for a, b in zip(otypes, stypes) if a != b]
        print(f"FAIL {name}: TYPE mismatch (driver hasher is "
              f"type-sensitive): {diff}")
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
print(f"\n{len(oracle) - fails}/{len(oracle)} passed, {lints} lint warnings")
sys.exit(1 if fails or lints else 0)
