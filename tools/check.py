#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Runs graft.Verify (Spark) on a scale factor, then executes each oracle SQL
in DuckDB over the same parquet tables and compares: column names (sorted),
row counts, and values (rows sorted, stringified). Usage:

    python3 tools/check.py [sfdir] [outdir] [--skip-verify] [query ...]
"""
import json, math, subprocess, sys, os

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith("--") else "/tmp/verify_out"
SKIP = "--skip-verify" in sys.argv
ONLY = [a for a in sys.argv[3:] if not a.startswith("--")]

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

if not SKIP:
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}'],
        capture_output=True, text=True, cwd="/root/repo")
    for line in r.stdout.splitlines():
        if "[verify]" in line or "error" in line.lower():
            print(line)
    if r.returncode != 0:
        print("VERIFY FAILED"); print(r.stdout[-3000:]); print(r.stderr[-2000:]); sys.exit(1)

import duckdb
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))

# Loud-failure gate: Verify writes a manifest of declared query names and
# per-query exceptions. ANY declared name with no output dir (or a recorded
# failure) is a hard fail — a thrown query must never read as "0 fail".
declared_fails = []
status_path = f"{OUT}/_verify_status.json"
if os.path.exists(status_path):
    status = json.load(open(status_path))
    declared = [n for n in status.get("declared", "").split(",") if n]
    for entry in status.get("failed", []):
        for n, msg in entry.items():
            declared_fails.append((n, f"verify threw: {msg}"))
    for n in declared:
        if (not ONLY or n in ONLY) and not os.path.isdir(f"{OUT}/{n}") \
                and n not in [f[0] for f in declared_fails]:
            declared_fails.append((n, "declared but no spark output"))

def norm(v):
    if v is None: return "NULL"
    if isinstance(v, float):
        if math.isnan(v): return "NaN"
        if math.isinf(v): return "Inf" if v > 0 else "-Inf"
        if v == int(v) and abs(v) < 1e15: return f"{int(v)}.0"
        return repr(v)
    return str(v)

def frame(df):
    cols = sorted(df.columns)
    df = df[cols]
    rows = sorted(tuple(norm(v) for v in row) for row in df.itertuples(index=False, name=None))
    return cols, rows

fails, passes, skips = list(declared_fails), 0, 0
names = ONLY if ONLY else sorted(oracle.keys())
for name in names:
    sql = oracle.get(name)
    if sql is None:
        continue  # rows-only query named explicitly; reported below
    spark_path = f"{OUT}/{name}"
    if not os.path.isdir(spark_path):
        if name not in [f[0] for f in fails]:
            fails.append((name, "spark output missing"))
        continue
    try:
        sdf = con.sql(f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
    except Exception as e:
        fails.append((name, f"spark read: {e}")); continue
    try:
        odf = con.sql(sql).df()
    except Exception as e:
        fails.append((name, f"oracle sql: {str(e)[:300]}")); continue
    scols, srows = frame(sdf)
    ocols, orows = frame(odf)
    if scols != ocols:
        fails.append((name, f"columns differ: spark={scols} oracle={ocols}")); continue
    if len(srows) != len(orows):
        fails.append((name, f"row count: spark={len(srows)} oracle={len(orows)}")); continue
    if srows != orows:
        diffs = [(a, b) for a, b in zip(srows, orows) if a != b][:3]
        fails.append((name, f"values differ ({sum(1 for a,b in zip(srows,orows) if a!=b)} rows), e.g. {diffs}")); continue
    passes += 1
    print(f"PASS {name} ({len(srows)} rows)")

# rows-only queries (no oracle)
for name in sorted(os.listdir(OUT)):
    p = os.path.join(OUT, name)
    if os.path.isdir(p) and name not in oracle and (not ONLY or name in ONLY):
        try:
            n = con.sql(f"SELECT count(*) FROM read_parquet('{p}/*.parquet')").fetchone()[0]
            print(f"ROWS-ONLY {name}: {n} rows" + (" (EMPTY!)" if n == 0 else ""))
        except Exception as e:
            print(f"ROWS-ONLY {name}: READ ERROR {e}")

print(f"\n== {passes} pass, {len(fails)} fail ==")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)
