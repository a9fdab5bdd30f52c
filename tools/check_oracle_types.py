#!/usr/bin/env python3
"""Guard against the rolling_7d_metrics bug class (round 9): DuckDB widens
integer aggregates (sum over BIGINT, windowed or not) to HUGEINT/INT128,
which Spark cannot emit — rows and schema still "match" but the value hash
doesn't. DESCRIBE every registered oracle SQL against the sf tables and
fail if any output column types as HUGEINT/INT128 (or UHUGEINT/UINT128).

Usage: python3 tools/check_oracle_types.py [SF_DIR] [OUT_DIR]
where OUT_DIR holds oracle_sql.json (written by graft.Verify).
Builder-side dev tool only; the engine is Scala."""
import glob
import json
import sys

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

BAD_TYPES = ("HUGEINT", "INT128", "UHUGEINT", "UINT128")

con = duckdb.connect()
for f in glob.glob(f"{SF_DIR}/*.parquet"):
    name = f.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{OUT_DIR}/oracle_sql.json"))
bad, errs = {}, {}
for name, sql in sorted(oracle.items()):
    try:
        desc = con.execute(f"DESCRIBE {sql}").fetchall()
    except Exception as e:  # a DESCRIBE failure is its own red flag
        errs[name] = str(e).split("\n")[0][:200]
        continue
    hits = [(c, t) for c, t, *_ in desc if t.upper() in BAD_TYPES]
    if hits:
        bad[name] = hits

for name, hits in bad.items():
    cols = ", ".join(f"{c} {t}" for c, t in hits)
    print(f"[BAD] {name}: {cols} — add an explicit CAST in the oracle SQL")
for name, err in errs.items():
    print(f"[ERR] {name}: {err}")
if not bad and not errs:
    print(f"{len(oracle)}/{len(oracle)} oracles emit no "
          f"HUGEINT/INT128 column")
sys.exit(1 if (bad or errs) else 0)
