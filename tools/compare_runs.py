#!/usr/bin/env python3
"""Partition-count invariance gate: compare two graft.Verify output
dirs key-by-key (same canonicalization as check.py — sorted columns,
row-order-insensitive, exact bit equality for floats).

The engine claims results are identical under ANY partitioning and
thread count (DECIMAL partials, order-free moments, register-max HLL
merges — SURVEY §5). This makes that claim a machine gate: run Verify
once at the default local[32]/32-partition config and once at e.g.
local[8]/SPARK_GRAFT_SHUFFLE_PARTITIONS=256, then diff. No DuckDB —
both sides are the engine under test.

Usage: compare_runs.py <out_dir_a> <out_dir_b> [report.json]
"""
import json, sys, glob, os
import pandas as pd
import numpy as np


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)


def load(pdir: str) -> pd.DataFrame:
    files = sorted(glob.glob(f"{pdir}/*.parquet"))
    return pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)


def compare_key(da: pd.DataFrame, db: pd.DataFrame):
    a, b = canon(da), canon(db)
    if list(a.columns) != list(b.columns):
        return f"schema: {list(a.columns)} vs {list(b.columns)}"
    if len(a) != len(b):
        return f"rows: {len(a)} vs {len(b)}"
    a = a.sort_values(list(a.columns), kind="mergesort").reset_index(drop=True)
    b = b.sort_values(list(b.columns), kind="mergesort").reset_index(drop=True)
    for c in a.columns:
        av, bv = a[c].values, b[c].values
        if np.issubdtype(a[c].dtype, np.floating) or np.issubdtype(b[c].dtype, np.floating):
            aq = pd.to_numeric(a[c]).values.astype(float)
            bq = pd.to_numeric(b[c]).values.astype(float)
            both_nan = np.isnan(aq) & np.isnan(bq)
            if not ((aq == bq) | both_nan).all():
                mx = np.nanmax(np.abs(np.where(both_nan, 0, aq - bq)))
                return f"float col {c} max_abs_diff={mx}"
        else:
            if not (av == bv).all():
                i = int(np.argmax(av != bv))
                return f"col {c} first diff row {i}: {av[i]!r} vs {bv[i]!r}"
    return None


def main(dir_a: str, dir_b: str, out_json=None) -> int:
    keys_a = {os.path.basename(p) for p in glob.glob(f"{dir_a}/*") if os.path.isdir(p)}
    keys_b = {os.path.basename(p) for p in glob.glob(f"{dir_b}/*") if os.path.isdir(p)}
    report, n_pass, n_fail = {}, 0, 0
    for k in sorted(keys_a | keys_b):
        if k not in keys_a or k not in keys_b:
            side = "a" if k not in keys_a else "b"
            print(f"FAIL {k}: missing from side {side}")
            report[k] = {"identical": False, "err": f"missing from {side}"}
            n_fail += 1
            continue
        try:
            err = compare_key(load(f"{dir_a}/{k}"), load(f"{dir_b}/{k}"))
        except Exception as e:
            err = f"compare error: {e}"
        if err:
            print(f"FAIL {k}: {err}")
            report[k] = {"identical": False, "err": err}
            n_fail += 1
        else:
            print(f"PASS {k}")
            report[k] = {"identical": True}
            n_pass += 1
    print(f"== {n_pass} identical, {n_fail} differ ==")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"metric": "partition_count_invariance",
                       "n_keys": n_pass + n_fail, "identical": n_pass,
                       "differ": n_fail, "keys": report}, f, indent=0,
                      sort_keys=True)
    return 1 if n_fail else 0


if __name__ == "__main__":
    out = sys.argv[3] if len(sys.argv) > 3 else None
    sys.exit(main(sys.argv[1], sys.argv[2], out))
