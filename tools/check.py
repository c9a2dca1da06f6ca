#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only; the shipped
engine is the Scala library). Usage:
  sbt 'runMain graft.Verify /root/testdata/sf0.01 /tmp/verify_out'
  python3 tools/check.py /root/testdata/sf0.01 /tmp/verify_out
"""
import json, sys, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
names = sorted(d for d in os.listdir(out_dir)
               if os.path.isdir(os.path.join(out_dir, d)))
fails = 0
for name in names:
    files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no parquet written"); fails += 1; continue
    # Read the Spark parquet with pandas, NOT through DuckDB: DuckDB would
    # float-convert DECIMAL columns on BOTH sides and mask exactly the
    # dtype/representation mismatches the driver's compare catches.
    spark_df = pd.read_parquet(files[0])
    nrows = len(spark_df)
    if name not in oracle:
        print(f"ROWS {name}: {nrows} rows (no oracle)"); continue
    try:
        duck_df = con.sql(oracle[name]).df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}"); fails += 1; continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}")
        fails += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rowcount {len(a)} vs {len(b)}"); fails += 1; continue
    def norm_dtype(d):
        s = str(d)
        if s.startswith("datetime64"): return "datetime"
        return s
    da = [norm_dtype(t) for t in a.dtypes]
    db = [norm_dtype(t) for t in b.dtypes]
    if da != db:
        mism = [z for z in zip(a.columns, da, db) if z[1] != z[2]]
        # Numeric-kind drift (decimal-object/int vs float) is exactly the
        # trailing-zero trap that red-flagged round 1: values can str-render
        # differently ('1.50' vs '1.5') or, worse, identically by luck while
        # the driver's dtype-sensitive hash still splits. FAIL those;
        # date-representation pairs (date32→object vs DATE→datetime64)
        # str-render identically by construction and stay WARN.
        def kind(s):
            if s.startswith(("int", "uint")): return "int"
            if s.startswith("float"): return "float"
            return s  # object / datetime / bool / ...
        numeric = [m for m in mism
                   if kind(m[1]) != kind(m[2])
                   and {kind(m[1]), kind(m[2])} <= {"int", "float", "object"}]
        if numeric:
            print(f"FAIL {name}: numeric dtype drift {numeric}"); fails += 1; continue
        print(f"WARN {name}: dtype drift {mism}")
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    # per-COLUMN str conversion, not DataFrame.astype(str): pandas formats
    # datetime64 blocks jointly, so a subsecond column in the same frame
    # would force midnight dates to render '... 00:00:00.000000' and
    # spuriously fail against the other side's date objects.
    av = pd.DataFrame({c: a[c].astype(str) for c in a.columns})
    bv = pd.DataFrame({c: b[c].astype(str) for c in b.columns})
    if not av.equals(bv):
        diff = (av != bv).any(axis=1)
        print(f"FAIL {name}: {int(diff.sum())}/{len(a)} rows differ; first:")
        idx = diff[diff].index[0]
        print("  spark:", dict(a.iloc[idx]))
        print("  duck :", dict(b.iloc[idx]))
        fails += 1; continue
    print(f"PASS {name}: {nrows} rows")
print(f"\n{len(names)-fails}/{len(names)} ok")
sys.exit(1 if fails else 0)
