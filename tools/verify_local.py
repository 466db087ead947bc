#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness check.

Usage: python3 tools/verify_local.py <sfDir> <verifyOutDir> [--json <path>]
Reads each <outDir>/<name> parquet (Spark result) and runs the matching
oracle SQL from <outDir>/oracle_sql.json in DuckDB against the sfDir
tables; compares schema (sorted column names), row count, and a
value hash with columns sorted by name and rows sorted.

--json writes a CORRECTNESS_r{N}.json-shaped artifact (rows_match /
schema_match / hash_match / spark_rows / oracle_rows / err per query)
so an off-driver-SF pass (e.g. sf0.1) can be committed to the repo and
externally re-checked against the exact code state each round.

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

def main(sf_dir, out_dir, json_path=None):
    con = duckdb.connect()
    for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
        name = os.path.basename(p).replace(".parquet", "")
        # driver testdata ships single-file tables; derived dirs (the
        # sf1 evidence set) are Spark-written DIRECTORIES of part files
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{src}')")
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    n_pass = n_fail = 0
    report = {}
    def record(name, rows=False, schema=False, values=False,
               spark_rows=None, oracle_rows=None, err=None):
        report[name] = {"rows_match": rows, "schema_match": schema,
                        "hash_match": values, "spark_rows": spark_rows,
                        "oracle_rows": oracle_rows, "err": err}
    for name, sql in sorted(oracle.items()):
        spark_path = os.path.join(out_dir, name)
        if not os.path.isdir(spark_path):
            print(f"SKIP {name}: no spark output (subset dump)"); continue
        try:
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df())
            want = canon(con.execute(sql).df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1
            record(name, err=str(e)[:300]); continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: cols {list(got.columns)} != {list(want.columns)}")
            n_fail += 1
            record(name, rows=len(got) == len(want), spark_rows=len(got),
                   oracle_rows=len(want),
                   err=f"schema {list(got.columns)} != {list(want.columns)}")
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows {len(got)} != {len(want)}"); n_fail += 1
            record(name, schema=True, spark_rows=len(got), oracle_rows=len(want))
            continue
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
            record(name, rows=True, schema=True, spark_rows=len(got),
                   oracle_rows=len(want),
                   err=f"col {c} row{i}: spark={a.iloc[i]!r} oracle={b.iloc[i]!r}"[:300])
        else:
            print(f"PASS {name} ({len(got)} rows)"); n_pass += 1
            record(name, rows=True, schema=True, values=True,
                   spark_rows=len(got), oracle_rows=len(want))
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_path:
        with open(json_path, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                       "queries": report}, f, indent=2, sort_keys=True)
        print(f"wrote {json_path}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    args = sys.argv[1:]
    jp = None
    if "--json" in args:
        i = args.index("--json"); jp = args[i + 1]; del args[i:i + 2]
    sys.exit(main(args[0], args[1], jp))
