#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the same parquet tables, compare with the Verify dump
(column-name-sorted, row-sorted, value-exact modulo float 1e-9)."""
import sys, json, math, glob, os
import duckdb
import pyarrow.parquet as pq
from decimal import Decimal

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))

def norm(v):
    if isinstance(v, Decimal):
        return float(v)
    if isinstance(v, float):
        return round(v, 9)
    return v

def canon(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out, key=lambda t: tuple(str(x) for x in t))

fails = 0
# a query whose Verify dump is MISSING failed inside Verify (its stderr
# has the exception) — count it, never skip silently: the driver's gate
# records such queries as err, and this tool exists to predict that gate
dumped = {n for n in os.listdir(out_dir) if os.path.isdir(f"{out_dir}/{n}")}
for name in sorted(set(oracle) - dumped):
    print(f"{name}: MISSING VERIFY DUMP (query failed in graft.Verify)")
    fails += 1
for name in sorted(os.listdir(out_dir)):
    d = f"{out_dir}/{name}"
    if not os.path.isdir(d):
        continue
    tbl = pq.read_table(d)
    scols = tbl.column_names
    srows = [tuple(row[c] for c in scols) for row in tbl.to_pylist()]
    if name not in oracle:
        print(f"{name}: NO-ORACLE rows={len(srows)} {'OK' if len(srows) > 0 else 'EMPTY!'}")
        continue
    try:
        res = con.execute(oracle[name])
        ocols = [c[0] for c in res.description]
        orows = res.fetchall()
    except Exception as e:
        print(f"{name}: ORACLE SQL ERROR: {str(e)[:200]}")
        fails += 1
        continue
    sc, sr = canon(scols, srows)
    oc, orr = canon(ocols, orows)
    if sc != oc:
        print(f"{name}: COLUMN MISMATCH spark={sc} duckdb={oc}")
        fails += 1
        continue
    if len(sr) != len(orr):
        print(f"{name}: ROWCOUNT spark={len(sr)} duckdb={len(orr)}")
        fails += 1
        continue
    bad = 0
    for a, b in zip(sr, orr):
        if a != b:
            ok = len(a) == len(b) and all(
                (isinstance(x, float) and isinstance(y, (float, int))
                 and math.isclose(x, y, rel_tol=1e-9, abs_tol=1e-9)) or x == y
                for x, y in zip(a, b))
            if not ok:
                if bad < 3:
                    print(f"  {name} row diff: spark={a} duckdb={b}")
                bad += 1
    if bad:
        print(f"{name}: {bad}/{len(sr)} row diffs")
        fails += 1
    else:
        print(f"{name}: OK ({len(sr)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
