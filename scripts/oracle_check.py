#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (development tool only).

Reads the Verify output dir (per-query parquet + oracle_sql.json), runs each
oracle SQL in DuckDB against the same sf parquet tables, and compares:
schema (column names sorted), row count, and values (column-name-sorted,
row-sorted, exact for non-floats, tiny-epsilon report for floats so we can
spot hash-risk before the driver's exact hash compare).

Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    results = {}
    for name in sorted(os.listdir(out_dir)):
        d = os.path.join(out_dir, name)
        if not os.path.isdir(d):
            continue
        spark_df = pd.read_parquet(d)
        if name not in oracle:
            results[name] = f"ROWS_ONLY rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE_SQL_ERROR {e}"
            continue
        s_cols, d_cols = sorted(spark_df.columns), sorted(duck_df.columns)
        if s_cols != d_cols:
            results[name] = f"SCHEMA_MISMATCH spark={s_cols} duck={d_cols}"
            continue
        if len(spark_df) != len(duck_df):
            results[name] = f"ROWCOUNT_MISMATCH spark={len(spark_df)} duck={len(duck_df)}"
            continue
        a = spark_df[s_cols].sort_values(s_cols, na_position="last").reset_index(drop=True)
        b = duck_df[s_cols].sort_values(s_cols, na_position="last").reset_index(drop=True)
        bad = []
        for c in s_cols:
            av, bv = a[c], b[c]
            if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
                av_ = av.astype(float); bv_ = bv.astype(float)
                both_nan = av_.isna() & bv_.isna()
                neq = ~both_nan & ~np.isclose(av_.fillna(np.inf), bv_.fillna(np.inf),
                                              rtol=0, atol=0, equal_nan=True)
                exact_neq = int(neq.sum())
                close_neq = int((~both_nan & ~np.isclose(av_.fillna(np.inf),
                                 bv_.fillna(np.inf), rtol=1e-12, atol=1e-12)).sum())
                if exact_neq:
                    bad.append(f"{c}: {exact_neq} exact-diffs ({close_neq} beyond 1e-12)")
            else:
                av_ = av.astype(object).where(pd.notna(av), None)
                bv_ = bv.astype(object).where(pd.notna(bv), None)
                # normalize numpy scalar types for comparison
                av_ = av_.map(lambda x: x.item() if hasattr(x, "item") else x)
                bv_ = bv_.map(lambda x: x.item() if hasattr(x, "item") else x)
                neq = [i for i, (x, y) in enumerate(zip(av_, bv_)) if x != y]
                if neq:
                    i = neq[0]
                    bad.append(f"{c}: {len(neq)} diffs e.g. row{i}: {av_[i]!r} vs {bv_[i]!r}")
        results[name] = "OK rows=%d" % len(spark_df) if not bad else "VALUE_MISMATCH " + "; ".join(bad)
    n_ok = sum(1 for v in results.values() if v.startswith(("OK", "ROWS_ONLY")))
    for k, v in sorted(results.items()):
        flag = "PASS" if v.startswith(("OK", "ROWS_ONLY")) else "FAIL"
        print(f"[{flag}] {k}: {v}")
    print(f"\n{n_ok}/{len(results)} pass")
    return 0 if n_ok == len(results) else 1

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
