#!/usr/bin/env python3
"""Scan every oracle SQL's DuckDB result schema at the ARROW layer for types
the driver's hash treats differently from Spark's output (the q85 lesson:
DuckDB sum(BIGINT) -> HUGEINT -> decimal128(38,0) while Spark emits int64 —
rows/schema compare after coercion, the hash does not). Any hugeint/int128/
decimal column that Spark cannot emit is a future hash-only red row.

Usage: python3 tools/oracle_type_scan.py <sf_dir> <verify_out_dir>
(run graft.Verify first — it dumps oracle_sql.json into the out dir).
Exit 1 on any offending column.
"""
import sys, json, glob, os
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
bad = 0
for name in sorted(oracle):
    tbl = con.execute(oracle[name]).fetch_arrow_table()
    for field in tbl.schema:
        t = str(field.type)
        if t.startswith("decimal128") or t.startswith("decimal256") or "int128" in t:
            print(f"{name}: column '{field.name}' is {t} at the Arrow layer "
                  f"— Spark cannot emit this; cast the oracle expression")
            bad += 1
print(f"OFFENDING COLUMNS: {bad}")
sys.exit(1 if bad else 0)
