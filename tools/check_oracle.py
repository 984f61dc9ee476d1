#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs each oracle SQL from <outdir>/oracle_sql.json in DuckDB over the
scale-factor parquet tables, loads the Spark result parquet from
<outdir>/<name>/, canonicalizes both (sort columns by name, sort rows by all
columns), and compares exactly. Exit code = number of failing queries.

Usage: python3 tools/check_oracle.py [sf_dir] [out_dir] [query_filter...]
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df) and len(df.columns):
        df = df.sort_values(by=list(df.columns), kind="mergesort", na_position="first")
    return df.reset_index(drop=True)

def cell_eq(a, b):
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    try:
        if pd.isna(a) and pd.isna(b):
            return True
    except (TypeError, ValueError):
        pass
    if isinstance(a, (int, float)) and isinstance(b, (int, float)) and not (
            isinstance(a, bool) != isinstance(b, bool)):
        return a == b
    return a == b

def compare(name, oracle: pd.DataFrame, spark: pd.DataFrame):
    issues = []
    if sorted(oracle.columns) != sorted(spark.columns):
        return [f"columns differ: oracle={sorted(oracle.columns)} spark={sorted(spark.columns)}"]
    if len(oracle) != len(spark):
        issues.append(f"row count: oracle={len(oracle)} spark={len(spark)}")
    o, s = canon(oracle), canon(spark)
    n = min(len(o), len(s))
    bad = 0
    for col in o.columns:
        ov, sv = o[col].tolist()[:n], s[col].tolist()[:n]
        for i in range(n):
            if not cell_eq(ov[i], sv[i]):
                bad += 1
                if bad <= 3:
                    issues.append(f"  [{col}] row {i}: oracle={ov[i]!r} spark={sv[i]!r}")
    if bad:
        issues.insert(0, f"{bad} mismatched cells")
    return issues

def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/target/verify_out"
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracle_sql = json.load(open(f"{out}/oracle_sql.json"))
    failures = 0
    matched = set()
    for name in sorted(oracle_sql):
        if only:
            hits = {f for f in only if name == f or name.startswith(f)}
            if not hits:
                continue
            matched |= hits
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            # Verify leaves a _FAILED sentinel (with the exception message)
            # when the query threw — surface it instead of a bare "no output"
            try:
                msg = open(f"{out}/{name}/_FAILED").read().strip()
                print(f"FAIL {name}: query threw: {msg[:200]}")
            except OSError:
                print(f"FAIL {name}: no spark output")
            failures += 1
            continue
        try:
            odf = con.execute(oracle_sql[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        sdf = con.execute(
            f"SELECT * FROM read_parquet('{out}/{name}/*.parquet')").df()
        issues = compare(name, odf, sdf)
        if issues:
            failures += 1
            print(f"FAIL {name} ({len(odf)} oracle rows / {len(sdf)} spark rows)")
            for msg in issues[:6]:
                print(f"    {msg}")
        else:
            print(f"PASS {name} ({len(sdf)} rows)")
    # a filter that matched nothing is a FAILURE, not a vacuous pass —
    # "0 failures" must never mean "0 comparisons"
    for miss in sorted(only - matched):
        print(f"FAIL filter '{miss}' matched no query")
        failures += 1
    print(f"\n{failures} failures")
    sys.exit(min(failures, 120))

if __name__ == "__main__":
    main()
