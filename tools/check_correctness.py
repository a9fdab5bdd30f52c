#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate: run graft.Verify at a
scale factor, then re-run each oracle SQL in DuckDB over the same parquet
tables and compare the Spark result parquet against the oracle result —
row count, schema (column names), and exact values (columns sorted by name,
rows in emitted order). Builder-side dev tool only; the engine is Scala."""
import json, sys, glob, math
import duckdb
import pandas as pd

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
ONLY = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in glob.glob(f"{SF_DIR}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
results = {}
for name, sql in sorted(oracle.items()):
    if ONLY and name not in ONLY:
        continue
    entry = {}
    try:
        spark_df = con.execute(
            f"SELECT * FROM '{OUT_DIR}/{name}/*.parquet'").fetchdf()
        duck_df = con.execute(sql).fetchdf()
        entry["rows"] = [len(spark_df), len(duck_df)]
        entry["rows_match"] = len(spark_df) == len(duck_df)
        sc, dc = sorted(spark_df.columns), sorted(duck_df.columns)
        entry["schema_match"] = sc == dc
        if not entry["schema_match"]:
            entry["cols"] = [sc, dc]
        if entry["rows_match"] and entry["schema_match"]:
            a, b = spark_df[sc].reset_index(drop=True), duck_df[sc].reset_index(drop=True)
            mism = []
            for col in sc:
                av, bv = a[col], b[col]
                try:
                    # NULL == NULL must count as equal (None==None / NaT==NaT
                    # are False under pandas elementwise ==).
                    eq = (av.isna() & bv.isna()) | (
                        av.astype("object") == bv.astype("object"))
                    neq = int((~eq).sum())
                except Exception as e:
                    neq, eq = -1, None
                if neq:
                    detail = {"col": col, "n_diff": neq,
                              "dtypes": [str(av.dtype), str(bv.dtype)]}
                    if eq is not None and neq > 0:
                        idx = (~eq)[~eq].index[:3]
                        detail["sample"] = [[i, repr(av[i])[:60], repr(bv[i])[:60]]
                                            for i in idx]
                    mism.append(detail)
            entry["hash_match"] = not mism
            if mism:
                entry["mismatches"] = mism
        else:
            entry["hash_match"] = False
    except Exception as e:
        entry = {"error": str(e)[:300]}
    results[name] = entry
    ok = entry.get("hash_match")
    flag = "OK " if ok else "FAIL"
    print(f"[{flag}] {name}: {json.dumps(entry)[:400]}")

n_ok = sum(1 for e in results.values() if e.get("hash_match"))
print(f"\n{n_ok}/{len(results)} hash-match")
