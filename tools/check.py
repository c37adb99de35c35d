#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: for each
query dumped by graft.Verify, run the oracle SQL in DuckDB over the same
parquet tables and compare (columns sorted by name, row order as produced,
values via pandas equality with NaN==NaN)."""
import json, sys, duckdb, pandas as pd, numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif s.dtype == object:
            pass
        else:
            try: df[c] = s.astype("int64")
            except (TypeError, ValueError): pass
    return df

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_ok = n_bad = n_rowsonly = 0
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)"); n_bad += 1; continue
        spark_df = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if name not in oracle:
            status = "ROWSONLY" if len(spark_df) > 0 else "EMPTY!"
            if len(spark_df) > 0: n_rowsonly += 1
            else: n_bad += 1
            print(f"{status} {name} rows={len(spark_df)}")
            continue
        try:
            duck_df = canon(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"SCHEMA   {name}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"ROWS     {name}: spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1; continue
        bad_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if pd.api.types.is_float_dtype(a) or pd.api.types.is_float_dtype(b):
                eq = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                eq = ((a.isna() & b.isna()) | (a.astype(object) == b.astype(object))).all()
            if not eq: bad_cols.append(c)
        if bad_cols:
            print(f"VALUES   {name}: cols {bad_cols}")
            for c in bad_cols[:2]:
                m = ~((spark_df[c].isna() & duck_df[c].isna()) | (spark_df[c].astype(object) == duck_df[c].astype(object)))
                idx = list(m[m].index[:3])
                print(f"   {c} first diffs at rows {idx}: spark={list(spark_df[c][idx])} duck={list(duck_df[c][idx])}")
            n_bad += 1
        else:
            print(f"OK       {name} rows={len(spark_df)}"); n_ok += 1
    print(f"\n== {n_ok} hash-ok, {n_rowsonly} rows-only, {n_bad} BAD ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
