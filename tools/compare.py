#!/usr/bin/env python3
"""Local oracle-parity checker (mirrors the driver's t2 gate).

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name> parquet (Spark result), runs
<outDir>/oracle_sql.json's SQL in DuckDB over <sfDir>'s parquet tables, and
compares row count, column names, and values (column-name-sorted, like the
driver). Dev tool only — not part of the shipped engine.
"""
import json, sys, math
import duckdb
import pandas as pd

def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    return df.reset_index(drop=True)

def cell_eq(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) and isinstance(b, float):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = norm(pd.read_parquet(f"{out_dir}/{name}"))
            want = norm(con.sql(sql).df())
            problems = []
            if list(got.columns) != list(want.columns):
                problems.append(f"cols spark={list(got.columns)} duck={list(want.columns)}")
            elif len(got) != len(want):
                problems.append(f"rows spark={len(got)} duck={len(want)}")
            else:
                for c in got.columns:
                    gs, ws = got[c].tolist(), want[c].tolist()
                    bad = [(i, gs[i], ws[i]) for i in range(len(gs))
                           if not cell_eq(gs[i], ws[i])]
                    if bad:
                        i, g, w = bad[0]
                        problems.append(
                            f"col {c}: {len(bad)} diffs, first row {i}: "
                            f"spark={g!r} duck={w!r} "
                            f"(types {type(g).__name__}/{type(w).__name__})")
            if problems:
                n_fail += 1
                print(f"FAIL {name}: " + "; ".join(problems))
            else:
                n_pass += 1
                print(f"PASS {name} ({len(got)} rows)")
        except Exception as e:
            n_fail += 1
            print(f"ERROR {name}: {type(e).__name__}: {e}")
    print(f"== {n_pass} pass, {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()
