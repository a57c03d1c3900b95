#!/usr/bin/env python3
"""Assemble bench_zipf.json from the paired run_zipf_board.sh JSONL
sweeps (uncon = 24g child heap, stress = 4g/32thr = 128MB per task),
min over successful samples per key (the assemble_mem_board
discipline, including the ADVICE-r16 fix: an error in one rerun never
discards a valid sample from another, and a key missing from a sweep
is a coverage gap, not an OOM).

Usage: assemble_zipf_board.py <uncon.jsonl> <stress.jsonl> <dirNote> [out]
"""
import json, sys

sys.path.insert(0, __file__.rsplit("/", 1)[0])
from assemble_mem_board import load  # shared min-of-N/error discipline


def main():
    uncon, u_err = load(sys.argv[1])
    stress, s_err = load(sys.argv[2])
    dir_note = sys.argv[3]
    out = sys.argv[4] if len(sys.argv) > 4 else "bench_zipf.json"
    keys, ooms, missing, bad_base = {}, [], [], []
    for k in sorted(set(uncon) | set(stress) | u_err | s_err):
        base = uncon.get(k)
        rec = {"sf3zipf_24g_32thr": round(base, 4) if base is not None else None}
        if base is None:
            bad_base.append(k)
        if k in s_err:
            rec["sf3zipf_4g_32thr"] = None
            rec["ratio"] = None
            ooms.append(k)
        elif k not in stress:
            rec["sf3zipf_4g_32thr"] = None
            rec["ratio"] = None
            missing.append(k)
        else:
            sv = stress[k]
            rec["sf3zipf_4g_32thr"] = round(sv, 4)
            rec["ratio"] = round(sv / base, 2) if base else None
        keys[k] = rec
    board = {
        "metric": "zipf_heterogeneity_rehearsal",
        "unit": "sec",
        "dir": dir_note,
        "action": "SPARK_GRAFT_BENCH_ACTION=noop (forces full materialization; "
                  "count() lets Catalyst prune projection-shaped keys' per-row "
                  "compute, which is exactly what this board measures)",
        "configs": {
            "uncon": "24g heap / 32 threads",
            "stress": "4g heap / 32 threads = 128MB/task",
        },
        "n_keys": len(keys),
        "pass_at_stress": len(keys) - len(ooms) - len(missing),
        "oom_at_stress": sorted(ooms),
        "missing_from_stress": sorted(missing),
        "invalid_baseline": sorted(bad_base),
        "keys": keys,
    }
    with open(out, "w") as f:
        json.dump(board, f, indent=1)
    print(f"wrote {out}: {board['pass_at_stress']}/{board['n_keys']} pass at "
          f"stress; OOM: {board['oom_at_stress']}; errors at uncon: "
          f"{sorted(u_err)}; missing: {board['missing_from_stress']}")


if __name__ == "__main__":
    main()
