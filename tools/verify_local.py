#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir>
Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables; compares schema (sorted column names), row count, and a
value hash with columns sorted by name and rows sorted.

Tooling only — NOT part of the library (driver-side python is allowed
for local testing).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes: ints -> int64, floats -> float64, rest -> str
    out = {}
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_integer_dtype(s):
            out[c] = s.astype("int64")
        elif pd.api.types.is_float_dtype(s):
            out[c] = s.astype("float64")
        else:
            out[c] = s.astype(str)
    df = pd.DataFrame(out)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"SKIP {name}: no spark output (subset dump)"); continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1; continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1; continue
        mismatch = None
        for c in got.columns:
            a, b = got[c], want[c]
            if pd.api.types.is_float_dtype(a):
                ok = np.allclose(a.fillna(-1e308), b.fillna(-1e308), rtol=0, atol=0)
                exact = ok
                close = np.allclose(a.fillna(-1e308), b.fillna(-1e308), rtol=1e-12)
                if not exact:
                    mismatch = (c, "float-exact" if close else "float", a, b); break
            else:
                if not a.equals(b):
                    mismatch = (c, "value", a, b); break
        if mismatch:
            c, kind, a, b = mismatch
            bad = (a != b) if kind == "value" else ~np.isclose(a, b, rtol=0, atol=0)
            i = int(np.argmax(np.asarray(bad)))
            print(f"FAIL {name}: col {c} ({kind}) row{i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
