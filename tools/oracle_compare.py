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


def type_family(t):
    """Collapse a DuckDB type to the family the driver's value hash
    distinguishes. The r13 q76 slip motivates this: DuckDB widens
    sum(BIGINT) to HUGEINT, fetchdf turns HUGEINT into float64/object, and
    the hash sees 3549.0 vs 3549 even though schema_match (name-level) and
    the value compare (after astype) both pass. Int widths <= 64-bit are
    one family (pandas prints 42 for int32 and int64 alike); HUGEINT,
    FLOAT-vs-DOUBLE, and DECIMAL scale are NOT equivalent."""
    t = t.strip().upper()
    if t.endswith("[]"):
        return type_family(t[:-2]) + "[]"
    if t in ("TINYINT", "SMALLINT", "INTEGER", "BIGINT",
             "UTINYINT", "USMALLINT", "UINTEGER"):
        return "INT<=64"
    return t


def described_types(prefix, q):
    rows = con.execute(f"DESCRIBE {prefix}").fetchall()
    return {r[0]: type_family(r[1]) for r in rows}


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
        st = described_types(f"SELECT * FROM read_parquet('{rp}/*.parquet')", q)
        ot = described_types(sql, q)
        tbad = {c: (st[c], ot[c]) for c in st if ot.get(c) != st[c]}
        if tbad:
            fail += 1
            print(f"{q}: TYPE MISMATCH (parquet vs oracle) {tbad}")
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
