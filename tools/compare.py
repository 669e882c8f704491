#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
outputs against the DuckDB oracles and diff. Usage:
    python3 tools/compare.py <sfDir> <verifyOutDir> [q1,q2,...]
The optional third arg restricts the sweep to the named queries — for
re-checking a follow-up fix, or at stress scales where one ORACLE (not
the engine) is the bottleneck (q68's DuckDB twin materializes the
billions of pre-aggregation join pairs Spark's pushed-down plan never
builds).
"""
import json, sys, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    # driver tables are single files; StressGen tables are Spark part-file
    # directories — point DuckDB at the parts in that case
    src = f"{p}/*.parquet" if os.path.isdir(p) else p
    cols = "*"
    if name == "events":
        # driver events.ts is TIMESTAMP(NANOS) (DuckDB reads timestamp);
        # StressGen keeps ts a raw nanos BIGINT so Spark 4 can read it —
        # apply the same ns -> us truncation graft.sources.Tables does
        probe = src if not os.path.isdir(p) else glob.glob(f"{p}/*.parquet")[0]
        ts_type = str(pq.read_schema(probe).field("ts").type)
        if ts_type.startswith("int"):
            cols = ("* REPLACE (make_timestamp(CAST(ts // 1000 AS BIGINT))"
                    " AS ts)")
    con.execute(f"CREATE VIEW {name} AS SELECT {cols} FROM read_parquet('{src}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    qdir = f"{outdir}/{name}"
    if not os.path.isdir(qdir):
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    files = glob.glob(f"{qdir}/*.parquet")
    spark_df = pq.ParquetDataset(files).read().to_pandas()
    try:
        duck_df = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle error: {e}"); fails += 1; continue
    # driver-style compare: sort columns by name, then hash values
    s = spark_df[sorted(spark_df.columns)]
    d = duck_df[sorted(duck_df.columns)]
    if list(s.columns) != list(d.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(d.columns)}"); fails += 1; continue
    if len(s) != len(d):
        print(f"FAIL {name}: rows {len(s)} vs {len(d)}"); fails += 1; continue
    # normalize dtypes for compare (tz-aware etc.)
    def norm(df):
        df = df.copy()
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime64"):
                df[c] = df[c].astype(str)
            elif df[c].dtype == object:
                df[c] = df[c].astype(str)
        return df.reset_index(drop=True)
    sn, dn = norm(s), norm(d)
    bad = []
    for c in sn.columns:
        a, b = sn[c], dn[c]
        if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
            eq = (a.fillna(-1e308) == b.fillna(-1e308))
        else:
            eq = (a.astype(str) == b.astype(str))
        if not eq.all():
            i = int((~eq).idxmax())
            bad.append((c, i, a.iloc[i], b.iloc[i]))
    # dtype mismatch report (schema check)
    dt = [(c, str(spark_df[c].dtype), str(duck_df[c].dtype))
          for c in s.columns if str(s[c].dtype) != str(d[c].dtype)]
    if bad:
        print(f"FAIL {name}: value diffs {bad[:3]}"); fails += 1
    elif dt:
        print(f"WARN {name}: dtype diffs {dt} (values match, {len(s)} rows)")
    else:
        print(f"OK   {name} ({len(s)} rows)")
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
