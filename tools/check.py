#!/usr/bin/env python3
"""Local replica of the driver's t2 correctness gate.

Reads the Verify output dir (parquet per query + oracle_sql.json),
runs each oracle SQL in DuckDB over the same sf tables, and compares:
row count, sorted-by-name columns, and a hash of all values. Strict
equality for non-floats; exact bit equality for floats too (graft
engineers determinism — see SURVEY §5), with a reported max-abs-diff
fallback so near-misses are visible.

Dev tool only — the shipped Scala library has no Python dependency.
"""
import json, sys, glob, os
import duckdb
import pandas as pd
import numpy as np

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes for compare
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.reset_index(drop=True)

def oracle_df(con, sf_dir: str, name: str, sql: str) -> pd.DataFrame:
    """DuckDB result, cached on disk keyed by (sf_dir, name, md5(sql)).

    The oracle side depends only on the data dir and the SQL text —
    never on the Scala binaries under test — so re-grading a fresh
    Spark build at a big sf (the DuckDB pass at sf1 runs for an hour)
    should not re-execute DuckDB. Set GRAFT_ORACLE_CACHE=0 to disable.
    """
    import hashlib
    if os.environ.get("GRAFT_ORACLE_CACHE", "1") == "0":
        return con.execute(sql).fetchdf()
    key = hashlib.md5(f"{os.path.abspath(sf_dir)}\n{sql}".encode()).hexdigest()
    cdir = os.environ.get("GRAFT_ORACLE_CACHE_DIR", "/tmp/graft_oracle_cache")
    os.makedirs(cdir, exist_ok=True)
    path = f"{cdir}/{name}_{key}.parquet"
    if os.path.exists(path):
        return pd.read_parquet(path)
    df = con.execute(sql).fetchdf()
    df.to_parquet(path, index=False)
    return df


def main(sf_dir: str, out_dir: str, only=None) -> int:
    con = duckdb.connect()
    # At synthesized sf1+ DuckDB's default memory_limit (80% of RAM)
    # lets the buffer pool collide with the pandas frames this script
    # also holds — cap it and give it a spill dir instead. Fewer
    # threads too: the string-heavy oracles (150 stopword replace()
    # copies per doc in d05/d13) scale their transient memory with
    # thread count, and the checker grades correctness, not speed.
    # Env overrides: d13's 150-replace oracle sits at the memory edge
    # at sf1 even under these caps — re-run stragglers with
    # GRAFT_DUCKDB_THREADS=4 (transient memory scales with threads).
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
    con.execute(f"SET threads TO {int(os.environ.get('GRAFT_DUCKDB_THREADS', '12'))}")
    con.execute("SET temp_directory='/tmp/duckdb_check_spill'")
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        # driver testdata ships single-file tables; synthesized scale
        # dirs (ScaleData) are multi-file directories — glob those
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        oracle = {k: v for k, v in oracle.items() if k in only}
    n_pass = n_fail = 0
    # Optional driver-format artifact (GRAFT_CHECK_JSON=<path>):
    # {key: {rows_match, schema_match, hash_match, spark_rows,
    #        oracle_rows, err}} — what CORRECTNESS_r{N}.json carries,
    # so a committed correctness_sf1.json reads the same way.
    report = {}
    for name in sorted(oracle):
        rec = {"rows_match": False, "schema_match": False,
               "hash_match": False, "spark_rows": None,
               "oracle_rows": None, "err": None}
        report[name] = rec
        pdir = f"{out_dir}/{name}"
        if not os.path.isdir(pdir):
            print(f"FAIL {name}: no spark output"); n_fail += 1
            rec["err"] = "no spark output"; continue
        files = glob.glob(f"{pdir}/*.parquet")
        got = pd.concat([pd.read_parquet(f) for f in sorted(files)], ignore_index=True)
        rec["spark_rows"] = len(got)
        try:
            exp = oracle_df(con, sf_dir, name, oracle[name])
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}"); n_fail += 1
            rec["err"] = f"oracle error {e}"; continue
        rec["oracle_rows"] = len(exp)
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(e.columns)}"); n_fail += 1
            rec["err"] = "schema mismatch"; continue
        rec["schema_match"] = True
        if len(g) != len(e):
            print(f"FAIL {name}: rows {len(g)} vs {len(e)}"); n_fail += 1
            rec["err"] = "row count mismatch"; continue
        rec["rows_match"] = True
        # row-order-insensitive compare (sort by all columns), like a hash of sorted values
        g2 = g.sort_values(list(g.columns), kind="mergesort").reset_index(drop=True)
        e2 = e.sort_values(list(e.columns), kind="mergesort").reset_index(drop=True)
        ok = True
        for c in g2.columns:
            gv, ev = g2[c].values, e2[c].values
            if np.issubdtype(g2[c].dtype, np.floating) or np.issubdtype(e2[c].dtype, np.floating):
                gq = pd.to_numeric(g2[c]).values.astype(float)
                eq = pd.to_numeric(e2[c]).values.astype(float)
                both_nan = np.isnan(gq) & np.isnan(eq)
                exact = (gq == eq) | both_nan
                if not exact.all():
                    mx = np.nanmax(np.abs(np.where(both_nan, 0, gq - eq)))
                    print(f"FAIL {name}: float col {c} max_abs_diff={mx}")
                    rec["err"] = f"float col {c} max_abs_diff={mx}"
                    ok = False; break
            else:
                if not (gv == ev).all():
                    i = int(np.argmax(gv != ev))
                    print(f"FAIL {name}: col {c} first diff row {i}: {gv[i]!r} vs {ev[i]!r}")
                    rec["err"] = f"col {c} first diff row {i}"
                    ok = False; break
        if ok:
            print(f"PASS {name} ({len(g)} rows)"); n_pass += 1
            rec["hash_match"] = True
        else:
            n_fail += 1
    print(f"== {n_pass} pass, {n_fail} fail ==")
    jout = os.environ.get("GRAFT_CHECK_JSON")
    if jout:
        with open(jout, "w") as f:
            json.dump(report, f, indent=0, sort_keys=True)
    return 1 if n_fail else 0

if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sys.exit(main(sf, out, only))
