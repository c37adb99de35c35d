#!/usr/bin/env python3
"""Local dev harness mimicking the driver's correctness gate: for each
query dumped by graft.Verify, run the oracle SQL in DuckDB over the same
parquet tables and compare. Columns are sorted by name and every cell is
SERIALIZED to a canonical string before comparison (no dtype coercion):
this is what the driver's hash does, so a DuckDB HUGEINT sum that arrives
as float64 '123.0' vs Spark int64 '123' FAILS here, as it does there."""
import json, sys, duckdb, pandas as pd, numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def ser_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if np.isnan(v):
            return "NULL"
        return repr(v + 0.0)  # normalize -0.0 -> 0.0 (engines disagree)
    if isinstance(v, (np.floating,)):
        if np.isnan(v):
            return "NULL"
        return repr(float(v) + 0.0)
    if isinstance(v, (bool, np.bool_)):
        return "true" if v else "false"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (np.ndarray, list)):
        return "[" + ",".join(ser_cell(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    return str(v)

def ser(df):
    """Canonical serialized frame: columns sorted by name, datetimes at
    microsecond precision, every other value serialized as-is (dtype-
    preserving — the whole point)."""
    df = df[sorted(df.columns)].reset_index(drop=True)
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            if getattr(s.dt, "tz", None) is not None:
                # pandas 2.x disallows tz-aware -> naive astype
                s = s.dt.tz_convert("UTC").dt.tz_localize(None)
            s = s.astype("datetime64[us]")
            out[c] = s.map(lambda v: "NULL" if pd.isna(v) else str(v))
        else:
            out[c] = s.map(ser_cell)
    return pd.DataFrame(out)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob, os
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(f"{out_dir}/{d}"))
    n_ok = n_bad = n_rowsonly = 0
    errf = f"{out_dir}/_verify_errors.json"
    if os.path.exists(errf):
        for name, err in sorted(json.load(open(errf)).items()):
            print(f"ERRORED  {name}: {err[:160]}")
            n_bad += 1
    for name in names:
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"MISSING  {name} (no spark output)"); n_bad += 1; continue
        spark_raw = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            status = "ROWSONLY" if len(spark_raw) > 0 else "EMPTY!"
            if len(spark_raw) > 0: n_rowsonly += 1
            else: n_bad += 1
            print(f"{status} {name} rows={len(spark_raw)}")
            continue
        try:
            duck_raw = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_bad += 1; continue
        spark_df, duck_df = ser(spark_raw), ser(duck_raw)
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"SCHEMA   {name}: spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_bad += 1; continue
        if len(spark_df) != len(duck_df):
            print(f"ROWS     {name}: spark={len(spark_df)} duck={len(duck_df)}")
            n_bad += 1; continue
        bad_cols = [c for c in spark_df.columns
                    if not (spark_df[c] == duck_df[c]).all()]
        if bad_cols:
            print(f"VALUES   {name}: cols {bad_cols}")
            for c in bad_cols[:2]:
                m = spark_df[c] != duck_df[c]
                idx = list(m[m].index[:3])
                print(f"   {c} first diffs at rows {idx}: spark={list(spark_df[c][idx])} duck={list(duck_df[c][idx])}")
            n_bad += 1
        else:
            print(f"OK       {name} rows={len(spark_df)}"); n_ok += 1
    print(f"\n== {n_ok} hash-ok, {n_rowsonly} rows-only, {n_bad} BAD ==")
    return 1 if n_bad else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
