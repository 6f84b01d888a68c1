#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name>/ parquet (written by graft.Verify), runs
the matching SQL from oracle_sql.json in DuckDB over <sfDir>'s tables, and
compares: schema (column names), row count, exact values (column-name-sorted),
and row order. Exit code 1 if any query mismatches.
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    failures = []
    for name in sorted(oracles):
        sql = oracles[name]
        spark_files = sorted(glob.glob(os.path.join(out_dir, name, "*.parquet")))
        if not spark_files:
            failures.append(name); print(f"[FAIL] {name}: no spark output"); continue
        sdf = pd.concat([pq.read_table(f).to_pandas() for f in spark_files],
                        ignore_index=True)
        try:
            ddf = con.execute(sql).df()
        except Exception as e:
            failures.append(name); print(f"[FAIL] {name}: duckdb error: {e}"); continue

        s_cols, d_cols = sorted(sdf.columns), sorted(ddf.columns)
        if s_cols != d_cols:
            failures.append(name)
            print(f"[FAIL] {name}: columns differ spark={s_cols} duckdb={d_cols}")
            continue
        sdf, ddf = sdf[s_cols], ddf[s_cols]
        if len(sdf) != len(ddf):
            failures.append(name)
            print(f"[FAIL] {name}: rows spark={len(sdf)} duckdb={len(ddf)}")
            continue
        ok = True
        for c in s_cols:
            a, b = sdf[c].to_numpy(), ddf[c].to_numpy()
            # the driver's gate hashes typed values: an int64-vs-float64
            # (e.g. DuckDB HUGEINT sum) mismatch fails there even when the
            # numbers are equal — catch it here too
            if a.dtype.kind != b.dtype.kind:
                print(f"[FAIL] {name}: col {c} dtype kind differs "
                      f"spark={a.dtype} duckdb={b.dtype}")
                ok = False
                continue
            if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                eq = (pd.isna(a) & pd.isna(b)) | (a == b)
                if not eq.all():
                    i = int(np.argmin(eq))
                    print(f"[FAIL] {name}: col {c} row {i}: spark={a[i]!r} duckdb={b[i]!r} (diff={a[i]-b[i]!r})")
                    ok = False
            else:
                eq = pd.Series(a).astype(str).eq(pd.Series(b).astype(str)) | (pd.isna(a) & pd.isna(b))
                if not eq.all():
                    i = int(eq.idxmin())
                    print(f"[FAIL] {name}: col {c} row {i}: spark={a[i]!r} duckdb={b[i]!r}")
                    ok = False
        if ok:
            print(f"[ OK ] {name}: {len(sdf)} rows, {len(s_cols)} cols exact match")
        else:
            failures.append(name)
    print(f"\n{len(oracles) - len(failures)}/{len(oracles)} queries match")
    sys.exit(1 if failures else 0)

if __name__ == "__main__":
    main()
