#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results + oracle_sql.json:
for each query, executes the oracle SQL in DuckDB over the same sfDir
tables and compares (columns sorted by name, rows sorted, values
hashed). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys
import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_bad = 0
    for name in sorted(oracle):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_bad += 1
            continue
        got = pd.read_parquet(f"{out_dir}/{name}")
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle SQL error: {e}")
            n_bad += 1
            continue
        got_c, exp_c = canon(got), canon(exp)
        if list(got_c.columns) != list(exp_c.columns):
            print(f"FAIL {name}: columns {list(got_c.columns)} vs {list(exp_c.columns)}")
            n_bad += 1
            continue
        if len(got_c) != len(exp_c):
            print(f"FAIL {name}: rows {len(got_c)} vs {len(exp_c)}")
            n_bad += 1
            continue
        # value compare, exact (mimics hash equality)
        mism = []
        for c in got_c.columns:
            a, b = got_c[c], exp_c[c]
            try:
                eq = (a == b) | (a.isna() & b.isna())
            except Exception:
                eq = a.astype(str) == b.astype(str)
            if not eq.all():
                i = int((~eq).idxmax())
                mism.append(f"{c}[row {i}]: {a[i]!r} != {b[i]!r} "
                            f"({int((~eq).sum())} cells)")
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:3]))
            n_bad += 1
        else:
            print(f"OK   {name} ({len(got_c)} rows)")
    # rows-only queries (no oracle)
    for d in sorted(glob.glob(f"{out_dir}/*/")):
        name = d.rstrip("/").split("/")[-1]
        if name not in oracle:
            n = len(pd.read_parquet(d))
            status = "OK  " if n > 0 else "FAIL"
            if n == 0:
                n_bad += 1
            print(f"{status} {name} (rows-only: {n} rows)")
    print(f"{'ALL GREEN' if n_bad == 0 else f'{n_bad} FAILURES'}")
    return 1 if n_bad else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
