#!/usr/bin/env python3
"""Dev-tool mimic of the driver's DuckDB-oracle compare (NOT part of the
engine): reads Verify's parquet output + oracle_sql.json, runs each oracle
in DuckDB with the sf tables registered as views, sorts columns by name and
rows by value, and diffs exactly."""
import sys, json, glob, os
import duckdb

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
oracles = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fail = 0
for q, sql in sorted(oracles.items()):
    rp = os.path.join(outdir, q)
    try:
        spark_df = con.execute(f"SELECT * FROM read_parquet('{rp}/*.parquet')").fetchdf()
        oracle_df = con.execute(sql).fetchdf()
        sc = sorted(spark_df.columns); oc = sorted(oracle_df.columns)
        schema_match = sc == oc
        if not schema_match:
            fail += 1
            print(f"{q}: SCHEMA MISMATCH {sc} vs {oc}")
            continue
        s = spark_df[sc].sort_values(by=sc, ignore_index=True)
        o = oracle_df[sc].sort_values(by=sc, ignore_index=True)
        if len(s) != len(o):
            fail += 1
            print(f"{q}: ROWS MISMATCH {len(s)} vs {len(o)}")
            continue
        o = o.astype(s.dtypes.to_dict())
        if not s.equals(o):
            fail += 1
            diff = (s != o) & ~(s.isna() & o.isna())
            bad = diff.any(axis=1)
            print(f"{q}: VALUE MISMATCH on {int(bad.sum())} rows")
            print("spark:\n", s[bad].head(5), "\noracle:\n", o[bad].head(5))
            continue
        print(f"{q}: OK rows={len(s)}")
    except Exception as e:
        fail += 1
        print(f"{q}: ERROR {e}")
sys.exit(1 if fail else 0)
