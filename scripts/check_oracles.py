#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify's parquet
dumps against the DuckDB oracle SQL and compare (rows, schema, values).

Usage: python3 scripts/check_oracles.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb
import pandas as pd


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for comparison
    for c in df.columns:
        if pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_bool_dtype(df[c]):
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for p in glob.glob(f"{sf_dir}/*.parquet"):
        name = p.split("/")[-1].replace(".parquet", "")
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for q, sql in sorted(oracle.items()):
        try:
            exp = canon(con.execute(sql).df())
            got = canon(pd.read_parquet(f"{out_dir}/{q}"))
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {q}: columns {list(got.columns)} != {list(exp.columns)}")
                failures += 1
                continue
            if len(exp) != len(got):
                print(f"FAIL {q}: rows {len(got)} != {len(exp)}")
                failures += 1
                continue
            if not exp.equals(got):
                neq = (exp != got) & ~(exp.isna() & got.isna())
                bad = neq.any(axis=1)
                print(f"FAIL {q}: {int(bad.sum())} mismatched rows; first:")
                print("  got:", got[bad].head(2).to_dict("records"))
                print("  exp:", exp[bad].head(2).to_dict("records"))
                failures += 1
            else:
                print(f"OK   {q}: {len(got)} rows")
        except Exception as e:  # noqa: BLE001
            print(f"ERR  {q}: {e}")
            failures += 1
    # rows-only queries (no oracle): just check non-empty parquet exists
    for d in sorted(glob.glob(f"{out_dir}/q_*")):
        q = d.split("/")[-1]
        if q not in oracle:
            try:
                n = len(pd.read_parquet(d))
                print(f"ROWS {q}: {n} rows")
            except Exception as e:  # noqa: BLE001
                print(f"ERR  {q}: {e}")
                failures += 1
    print(f"{'PASS' if failures == 0 else 'FAIL'}: {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
