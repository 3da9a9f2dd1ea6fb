#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate.

Usage: python3 tools/check.py [sfDir] [outDir]

Reads the parquet dumps produced by `sbt "runMain graft.Verify <sfDir> <outDir>"`
plus outDir/oracle_sql.json, runs each oracle in DuckDB over the same tables,
and compares: schema (column name set), row count, and a hash of all values
with columns sorted by name. Exact value compare (no tolerance) — if this
passes locally at sf0.01, the driver's gate should too.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    if os.path.isdir(p):  # Spark directory-style output (ScaleUp corpora)
        p = f"{p}/*.parquet"
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    if name == "events":
        # ScaleUp probe corpora store ts as the raw nanosecond BIGINT the
        # engine consumes (Spark can't write TIMESTAMP(NANOS)); re-expose
        # it as a timestamp so the oracles' epoch_us(ts) works unchanged.
        (ts_type,) = [t for c, t, *_ in con.execute(
            f"DESCRIBE {name}").fetchall() if c == "ts"]
        if ts_type == "BIGINT":
            con.execute(f"""CREATE OR REPLACE VIEW {name} AS
                SELECT * REPLACE (make_timestamp(ts // 1000) AS ts)
                FROM read_parquet('{p}')""")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        v = df[c]
        if v.dtype == object:
            df[c] = v.astype(str)
        elif np.issubdtype(v.dtype, np.floating):
            df[c] = v.astype(np.float64)
        elif np.issubdtype(v.dtype, np.integer) or v.dtype == bool:
            df[c] = v.astype(np.int64)
    return df.reset_index(drop=True)

fails, passes, skips = [], [], []
for qdir in sorted(glob.glob(f"{outdir}/*/")):
    name = os.path.basename(qdir.rstrip("/"))
    spark_df = con.sql(f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
    if name not in oracle:
        skips.append(f"{name}: rows={len(spark_df)} (no oracle)")
        if len(spark_df) == 0:
            fails.append(f"{name}: NO-ORACLE QUERY RETURNED 0 ROWS")
        continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        fails.append(f"{name}: oracle SQL error: {e}")
        continue
    # The driver's value hash is TYPE-sensitive: DuckDB HUGEINT lands in
    # pandas as float64 while Spark emits int64, and the hash diverges even
    # when every value compares equal numerically (r7's graph_pagerank /
    # win_cumulative_distinct). Fail on any int-vs-float dtype asymmetry
    # BEFORE canon() coerces it away — the oracle needs an explicit CAST.
    dtype_mismatch = []
    shared = set(spark_df.columns) & set(duck_df.columns)
    for c in sorted(shared):
        sflt = np.issubdtype(spark_df[c].dtype, np.floating)
        dflt = np.issubdtype(duck_df[c].dtype, np.floating)
        sint = np.issubdtype(spark_df[c].dtype, np.integer)
        dint = np.issubdtype(duck_df[c].dtype, np.integer)
        if (sflt and dint) or (sint and dflt):
            dtype_mismatch.append(
                f"col {c}: spark={spark_df[c].dtype} duck={duck_df[c].dtype}"
                " (driver hash is type-sensitive — CAST the oracle)")
    if dtype_mismatch:
        fails.append(f"{name}: dtype mismatch: " + "; ".join(dtype_mismatch))
        continue
    a, b = canon(spark_df), canon(duck_df)
    if list(a.columns) != list(b.columns):
        fails.append(f"{name}: column mismatch spark={list(a.columns)} duck={list(b.columns)}")
        continue
    if len(a) != len(b):
        fails.append(f"{name}: row count spark={len(a)} duck={len(b)}")
        continue
    # row-order-insensitive: sort by all columns
    a = a.sort_values(list(a.columns), kind="mergesort").reset_index(drop=True)
    b = b.sort_values(list(b.columns), kind="mergesort").reset_index(drop=True)
    neq = []
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating):
            same = (av.isna() & bv.isna()) | (av == bv)
        else:
            same = (av.isna() & bv.isna()) | (av == bv)
        if not same.all():
            i = int(np.argmax(~same.values))
            neq.append(f"col {c} row {i}: spark={av.iloc[i]!r} duck={bv.iloc[i]!r}")
    if neq:
        fails.append(f"{name}: value mismatch: " + "; ".join(neq[:3]))
    else:
        passes.append(f"{name}: OK ({len(a)} rows)")

print(f"== PASS {len(passes)} / FAIL {len(fails)} / NO-ORACLE {len(skips)} ==")
for p in passes: print("  PASS", p)
for s in skips: print("  SKIP", s)
for f in fails: print("  FAIL", f)
sys.exit(1 if fails else 0)
