#!/usr/bin/env python3
"""Local replica of the driver's DuckDB correctness gate.

Usage: compare_oracle.py <verify_out_dir> <sf_dir>

Registers each <sf_dir>/*.parquet as a view named by file stem, runs every
oracle_sql.json query, and compares against the Spark-written parquet in
<verify_out_dir>/<name>/ (columns sorted by name, rows sorted, values
string-compared).
"""
import duckdb, json, glob, os, sys

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df

def main(out, sf):
    con = duckdb.connect()
    for p in glob.glob(f"{sf}/*.parquet"):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    resdirs = {os.path.basename(d) for d in glob.glob(f"{out}/*") if os.path.isdir(d)}
    for name in sorted(resdirs - set(oracle)):
        q = "SELECT count(*) FROM '" + out + "/" + name + "/*.parquet'"
        n = con.execute(q).fetchone()[0]
        print(f"{name}: rows-only ({n} rows, no oracle)")
    for name, sql in sorted(oracle.items()):
        respath = f"{out}/{name}"
        if not os.path.isdir(respath):
            print(f"{name}: MISSING RESULT"); failures += 1; continue
        try:
            mine = con.execute(f"SELECT * FROM '{respath}/*.parquet'").df()
            orc = con.execute(sql).df()
        except Exception as e:
            print(f"{name}: ORACLE ERROR {e}"); failures += 1; continue
        m, o = norm(mine), norm(orc)
        if list(m.columns) != list(o.columns):
            print(f"{name}: SCHEMA MISMATCH {list(m.columns)} vs {list(o.columns)}")
            failures += 1; continue
        if len(m) != len(o):
            print(f"{name}: ROWCOUNT {len(m)} vs {len(o)}"); failures += 1; continue
        if not m.astype(str).equals(o.astype(str)):
            print(f"{name}: VALUE MISMATCH ({len(m)} rows)")
            diff = (m.astype(str) != o.astype(str)).any(axis=1)
            print(m[diff].head(3)); print(o[diff].head(3))
            failures += 1; continue
        print(f"{name}: OK ({len(m)} rows)")
    print(f"== {len(oracle) - failures}/{len(oracle)} oracles OK ==")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])
