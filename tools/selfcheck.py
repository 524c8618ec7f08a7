#!/usr/bin/env python3
"""Self-check harness approximating the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

For each query in oracle_sql.json: run the SQL in DuckDB over views named
after the testdata tables, load the Spark parquet result, sort columns by
name, sort rows, and compare values. Exits non-zero on any mismatch.
"""
import sys, os, json, glob
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize datetimes to naive
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            try:
                df[c] = df[c].dt.tz_localize(None)
            except TypeError:
                pass
    return df.reset_index(drop=True)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracles.items()):
        spark_path = f"{out_dir}/{name}"
        files = glob.glob(f"{spark_path}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output at {spark_path}")
            failures += 1
            continue
        try:
            oracle = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            failures += 1
            continue
        spark = canon(pd.concat([pd.read_parquet(f) for f in sorted(files)]))
        if list(oracle.columns) != list(spark.columns):
            print(f"FAIL {name}: columns oracle={list(oracle.columns)} spark={list(spark.columns)}")
            failures += 1
            continue
        if len(oracle) != len(spark):
            print(f"FAIL {name}: rows oracle={len(oracle)} spark={len(spark)}")
            failures += 1
            continue
        # dtype-parity gate: the driver hash-compares raw values, so an
        # oracle column that DuckDB types as HUGEINT/DOUBLE (-> float64)
        # against an integer Spark column fails there even though the
        # float-laundered value compare below would pass. Fail loudly
        # here so that class of oracle bug can never ship red again.
        dtype_bad = []
        for c in oracle.columns:
            o_f = pd.api.types.is_float_dtype(oracle[c])
            s_f = pd.api.types.is_float_dtype(spark[c])
            o_i = pd.api.types.is_integer_dtype(oracle[c])
            s_i = pd.api.types.is_integer_dtype(spark[c])
            if (o_f and s_i) or (o_i and s_f):
                dtype_bad.append((c, str(oracle[c].dtype), str(spark[c].dtype)))
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch (oracle vs spark) {dtype_bad}"
                  " — CAST the oracle column (DuckDB HUGEINT/DOUBLE lands as"
                  " float64; the driver's hash compare will flag this)")
            failures += 1
            continue
        # sort rows by all columns for order-insensitive compare
        o = oracle.sort_values(list(oracle.columns)).reset_index(drop=True)
        s = spark.sort_values(list(spark.columns)).reset_index(drop=True)
        bad = []
        for c in o.columns:
            oc, sc = o[c], s[c]
            if pd.api.types.is_float_dtype(oc) or pd.api.types.is_float_dtype(sc):
                eq = np.isclose(oc.astype(float), sc.astype(float),
                                rtol=0, atol=0, equal_nan=True)
                exact = (oc.astype(float).values == sc.astype(float).values) | (oc.isna() & sc.isna())
                if not exact.all():
                    bad.append((c, int((~exact).sum())))
            else:
                eq = (oc.values == sc.values) | (oc.isna().values & sc.isna().values)
                if not eq.all():
                    bad.append((c, int((~eq).sum())))
        if bad:
            print(f"FAIL {name}: value mismatches {bad}")
            for c, _ in bad[:2]:
                m = o[c].values != s[c].values
                idx = np.where(m)[0][:3]
                for i in idx:
                    print(f"   row {i} col {c}: oracle={o[c].iloc[i]!r} spark={s[c].iloc[i]!r}")
            failures += 1
        else:
            print(f"OK   {name} ({len(o)} rows)")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
