#!/usr/bin/env python3
"""Local replica of the driver's correctness gate.

Runs after `graft.Verify` has dumped query results + oracle_sql.json:
for each query, executes the oracle SQL in DuckDB over the same sfDir
tables and compares (columns sorted by name, rows sorted, values
hashed). Usage: check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import os
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


def _cell(v):
    """JSON-safe cell with bit-exact doubles (hex beside repr)."""
    if isinstance(v, float):
        return [repr(v), float.hex(v)]
    try:
        if v is None or pd.isna(v):
            return None
    except (TypeError, ValueError):  # array-valued cell
        pass
    return str(v)


def forensic(out_dir, name, kind, got_c, exp_c, mism_cells, limit=200):
    """On any divergence, dump both engines' canonical frames with
    bit-exact doubles so the differing CELL is readable from the gate
    artifacts alone (two rounds of driver-red/judge-green on q35 had
    no way to see WHICH cell differed — this closes that gap)."""
    art = {
        "query": name,
        "kind": kind,  # columns | rows | cells
        "duckdb_version": duckdb.__version__,
        "pandas_version": pd.__version__,
        "spark_columns": list(got_c.columns),
        "oracle_columns": list(exp_c.columns),
        "spark_rows": len(got_c),
        "oracle_rows": len(exp_c),
        "mismatched_cells": mism_cells[:50],
        "spark_canonical": [[_cell(v) for v in row]
                            for row in got_c.head(limit).itertuples(index=False)],
        "oracle_canonical": [[_cell(v) for v in row]
                             for row in exp_c.head(limit).itertuples(index=False)],
        "truncated_to": limit,
    }
    path = os.path.join(out_dir, f"{name}.forensic.json")
    with open(path, "w") as f:
        json.dump(art, f, indent=1, default=str)
    print(f"     forensic dump -> {path}")


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    # append the oracle side to the engine-environment record Verify wrote
    env_path = f"{out_dir}/oracle_env.json"
    try:
        env = json.load(open(env_path)) if os.path.exists(env_path) else {}
        env["duckdb_version"] = duckdb.__version__
        env["pandas_version"] = pd.__version__
        json.dump(env, open(env_path, "w"), indent=1)
        print("env: " + ", ".join(f"{k}={v}" for k, v in sorted(env.items())))
    except Exception as e:
        print(f"env record skipped: {e}")
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
            forensic(out_dir, name, "columns", got_c, exp_c, [])
            n_bad += 1
            continue
        if len(got_c) != len(exp_c):
            print(f"FAIL {name}: rows {len(got_c)} vs {len(exp_c)}")
            forensic(out_dir, name, "rows", got_c, exp_c, [])
            n_bad += 1
            continue
        # dtype-strict compare: the driver HASHES values, so int64 178
        # vs float64 178.0 (DuckDB HUGEINT -> pandas float64) is a
        # mismatch there even though numeric == passes — the r5-r7 q35
        # false-green mechanism. Only the int-vs-float split is flagged:
        # date columns legitimately differ in pandas dtype (Spark parquet
        # date -> object, DuckDB date -> datetime64) yet pass the driver
        # gate (c01 et al green every round), so non-numeric kind drift
        # falls through to the value compare's string fallback.
        num = set("iuf")
        kind_mism = [
            f"{c}: spark dtype {got_c[c].dtype} vs oracle {exp_c[c].dtype}"
            for c in got_c.columns
            if got_c[c].dtype.kind in num and exp_c[c].dtype.kind in num
            and (got_c[c].dtype.kind == "f") != (exp_c[c].dtype.kind == "f")]
        if kind_mism:
            print(f"FAIL {name}: dtype " + "; ".join(kind_mism))
            forensic(out_dir, name, "dtype", got_c, exp_c,
                     [{"col": m} for m in kind_mism])
            n_bad += 1
            continue
        # value compare, exact (mimics hash equality)
        mism = []
        mism_cells = []
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
                for j in (~eq)[~eq].index[:20]:
                    mism_cells.append({
                        "col": c, "row": int(j),
                        "spark": _cell(a[j]), "oracle": _cell(b[j])})
        if mism:
            print(f"FAIL {name}: " + "; ".join(mism[:3]))
            forensic(out_dir, name, "cells", got_c, exp_c, mism_cells)
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
