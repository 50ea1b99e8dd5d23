#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Runs graft.Verify (Spark) into /tmp/graft_verify, then replays each
oracle_sql.json query in DuckDB over the same sf dir and compares
row counts, sorted column names, and value hashes (order-insensitive,
values stringified with float rounding) — strictly harsher than needed,
so passing here should pass the driver.

Usage: python3 tools/mini_verify.py [sfdir] [--skip-spark]
"""
import json, subprocess, sys, os
import duckdb
import pandas as pd

SF = sys.argv[1] if len(sys.argv) > 1 and not sys.argv[1].startswith("--") \
    else "/root/testdata/sf0.01"
OUT = "/tmp/graft_verify"
# --only=q24_geo_cells_on_way,q18_... : restrict both sides to these names
ONLY = None
for a in sys.argv:
    if a.startswith("--only="):
        ONLY = set(a[len("--only="):].split(","))

if "--skip-spark" not in sys.argv:
    flt = (" " + ",".join(sorted(ONLY))) if ONLY else ""
    r = subprocess.run(
        ["sbt", "-batch", f'runMain graft.Verify {SF} {OUT}{flt}'],
        cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write(r.stdout[-3000:])
    sys.stderr.write(r.stderr[-3000:])
    if r.returncode != 0:
        sys.exit("sbt runMain failed")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")

def canon(df):
    """DataFrame -> (sorted colnames, sorted row tuples as strings).

    Values are stringified with NO numeric coercion or rounding: a
    Decimal('2006.000000') from Spark parquet must literally equal what
    DuckDB's .df() yields (float64 2006.0 -> '2006.0') or it FAILS --
    this mirrors the driver, which reads Spark output via pyarrow and
    hashes stringified values exactly (see CORRECTNESS_r01: every
    decimal-output query hash-mismatched)."""
    cols = sorted(df.columns)
    df = df[cols]
    rows = []
    for row in df.itertuples(index=False):
        vals = []
        for v in row:
            if isinstance(v, float):
                vals.append(repr(v))
            else:
                vals.append(str(v))
        rows.append("\x01".join(vals))
    return cols, sorted(rows)

fails = 0
if ONLY:
    oracle = {k: v for k, v in oracle.items() if k in ONLY}
for name, sql in sorted(oracle.items()):
    pdir = f"{OUT}/{name}"
    if not os.path.isdir(pdir):
        print(f"FAIL {name}: no spark output")
        fails += 1
        continue
    try:
        # Spark side via pyarrow/pandas (preserves Decimal objects, like
        # the driver); oracle side via DuckDB's pandas conversion.
        got = pd.read_parquet(pdir)
        want = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}")
        fails += 1
        continue
    gc, gr = canon(got)
    wc, wr = canon(want)
    if gc != wc:
        print(f"FAIL {name}: columns {gc} != {wc}")
        fails += 1
    elif len(gr) != len(wr):
        print(f"FAIL {name}: rows {len(gr)} != {len(wr)}")
        fails += 1
    elif gr != wr:
        diff = [(a, b) for a, b in zip(gr, wr) if a != b][:3]
        print(f"FAIL {name}: value mismatch, e.g. {diff}")
        fails += 1
    else:
        print(f"ok   {name} ({len(gr)} rows)")
print(f"\n{len(oracle) - fails}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)
