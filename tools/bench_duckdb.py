#!/usr/bin/env python3
"""bench_vs_duckdb board: makes BASELINE.json's "within 2x of baseline"
gate FALSIFIABLE (VERDICT r17 missing #1 / next-round #2).

The DuckDB oracle already runs the SAME 163 queries on the SAME
parquet tables it grades correctness with — timing that side on the
same box is the only same-shape engine baseline in the image. This
times each oracle SQL in DuckDB (min-of-N, count-over-subquery so
both engines get the same column-pruning/sort-elimination semantics
as Spark's default `count()` board action), pairs it with the Spark
per-key seconds from an existing bench_full.json (same sf, same box),
and writes bench_vs_duckdb.json.

Caveats (documented IN the artifact): DuckDB is a single-node
columnar engine with no scheduler/shuffle overhead — at sf0.1 Spark
pays fixed per-stage costs that amortize away at the scales it
exists for, so the per-key RATIO TREND across sf is the signal, not
one cell; and a handful of oracle twins are written for value-match
fidelity, not speed (e.g. d05/d13's 150-replace language scorer —
the length-diff formulation graft's engine-side r18 rewrite removed).

Usage:
  python3 tools/bench_duckdb.py <sf_dir> <verify_out_dir> <bench_full.json> <out.json>
Env: GRAFT_DUCKDB_THREADS (default 32, matching local[32]),
     GRAFT_DUCKDB_MEM (default 48GB), GRAFT_BENCH_RUNS (default 2).

Dev tool only — the shipped Scala library has no Python dependency.
"""
import json, os, sys, time
import duckdb


def main(sf_dir: str, out_dir: str, bench_json: str, out_path: str) -> int:
    threads = int(os.environ.get("GRAFT_DUCKDB_THREADS", "32"))
    runs = int(os.environ.get("GRAFT_BENCH_RUNS", "2"))
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('GRAFT_DUCKDB_MEM', '48GB')}'")
    con.execute(f"SET threads TO {threads}")
    con.execute("SET temp_directory='/tmp/duckdb_bench_spill'")
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        p = f"{sf_dir}/{t}.parquet"
        src = f"{p}/*.parquet" if os.path.isdir(p) else p
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    bench = json.load(open(bench_json))
    spark_keys = bench.get("queries", {})

    # warmup: touch every table once (footers + page cache on both
    # sides are warm for the Spark board too — its child JVMs re-read
    # the same files run after run)
    for t in ["lineitem", "orders", "events", "documents", "embeddings"]:
        con.execute(f"SELECT count(*) FROM {t}").fetchall()

    keys = {}
    errs = {}
    for name in sorted(oracle):
        sql = oracle[name]
        best = None
        for _ in range(max(1, runs)):
            t0 = time.monotonic()
            try:
                con.execute(f"SELECT count(*) FROM ({sql}) __q").fetchall()
            except Exception as e:  # noqa: BLE001 - record and move on
                errs[name] = f"{type(e).__name__}: {e}"
                best = None
                break
            dt = time.monotonic() - t0
            best = dt if best is None or dt < best else best
        if best is None:
            continue
        rec = {"duck_s": round(best, 4)}
        if name in spark_keys:
            rec["spark_s"] = round(float(spark_keys[name]), 4)
            rec["ratio"] = round(rec["spark_s"] / best, 3) if best > 0 else None
        keys[name] = rec
        print(f"{name}: duck {rec['duck_s']}s"
              + (f" spark {rec['spark_s']}s ratio {rec['ratio']}" if "ratio" in rec else ""))

    paired = {k: v for k, v in keys.items() if "ratio" in v}
    duck_total = sum(v["duck_s"] for v in paired.values())
    spark_total = sum(v["spark_s"] for v in paired.values())
    ratios = sorted(v["ratio"] for v in paired.values())
    median = ratios[len(ratios) // 2] if ratios else None
    within2x = sum(1 for r in ratios if r <= 2.0)
    board = {
        "metric": "bench_vs_duckdb",
        "sf_dir": os.path.abspath(sf_dir),
        "duck_threads": threads,
        "runs_per_key": runs,
        "action": "count-over-subquery (both engines column-prune/sort-eliminate identically; matches the Spark board's default count action)",
        "spark_board": os.path.abspath(bench_json),
        "n_keys_paired": len(paired),
        "spark_total_s": round(spark_total, 2),
        "duck_total_s": round(duck_total, 2),
        "total_ratio_spark_over_duck": round(spark_total / duck_total, 3) if duck_total else None,
        "median_ratio": median,
        "keys_within_2x": within2x,
        "keys": keys,
        "oracle_errors": errs,
        "caveats": ("DuckDB: single-node columnar, zero scheduler/shuffle overhead; "
                    "Spark pays fixed per-stage costs that amortize at scale - the "
                    "ratio TREND across sf is the signal, not one cell. Some oracle "
                    "twins are written for value-match fidelity, not speed "
                    "(generated length-diff language scorers, frame-window winnow "
                    "twins); their duck_s overstates a native DuckDB implementation."),
    }
    with open(out_path, "w") as f:
        json.dump(board, f, indent=1, sort_keys=False)
    print(f"== {len(paired)} keys paired; total ratio "
          f"{board['total_ratio_spark_over_duck']}; median {median}; "
          f"{within2x}/{len(ratios)} within 2x ==")
    return 0


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify"
    bj = sys.argv[3] if len(sys.argv) > 3 else "bench_full.json"
    op = sys.argv[4] if len(sys.argv) > 4 else "bench_vs_duckdb.json"
    sys.exit(main(sf, out, bj, op))
