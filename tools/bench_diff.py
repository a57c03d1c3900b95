#!/usr/bin/env python3
"""Variance-aware bench-board diff (VERDICT r16 item #5).

Same-binaries headline runs 70 minutes apart measured per-key swings
up to x2.8 on this hardware, so a raw cross-round per-key delta
carries almost no signal. This tool normalizes the comparison: the
keys the round did NOT touch are CONTROLS, their new/old ratio
distribution is the ambient envelope, and only keys landing outside
it are reported as real movement. Verdicts read the normalized
numbers instead of re-deriving the exoneration by hand.

Usage:
  bench_diff.py <old_board.json> <new_board.json>
      [--touched k1,k2,...] [--out report.json]

Boards are bench_full.json-shaped ({"queries": {key: sec, ...}}).
--touched names the keys whose plans changed this round (they are
excluded from the envelope); omitted = all keys are controls (a pure
ambient measurement).
"""
import argparse, json, statistics, sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--touched", default="")
    ap.add_argument("--out", default=None)
    a = ap.parse_args()
    with open(a.old) as f:
        old = json.load(f)
    with open(a.new) as f:
        new = json.load(f)
    touched = {k for k in a.touched.split(",") if k}
    qo, qn = old.get("queries", {}), new.get("queries", {})
    shared = sorted(set(qo) & set(qn))
    ratios = {k: (qn[k] / qo[k] if qo[k] > 0 else None) for k in shared}
    controls = {k: r for k, r in ratios.items()
                if k not in touched and r is not None}
    if len(controls) < 3:
        print("error: need >= 3 control keys for an envelope", file=sys.stderr)
        return 2
    cv = sorted(controls.values())
    env = {
        "n_controls": len(cv),
        "median": round(statistics.median(cv), 3),
        "p90": round(cv[int(0.9 * (len(cv) - 1))], 3),
        "max": round(cv[-1], 3),
        "min": round(cv[0], 3),
    }
    # movement = outside the control envelope's observed range; the
    # envelope IS the measured same-machine noise, so anything inside
    # it is indistinguishable from ambient drift by construction
    out_rows = []
    for k in shared:
        r = ratios[k]
        if r is None:
            continue
        outside = r > env["max"] or r < env["min"]
        if outside or k in touched:
            out_rows.append({
                "key": k, "old_sec": round(qo[k], 3), "new_sec": round(qn[k], 3),
                "ratio": round(r, 3), "touched": k in touched,
                "outside_envelope": outside,
            })
    tot_o = sum(qo[k] for k in shared)
    tot_n = sum(qn[k] for k in shared)
    report = {
        "metric": "bench_board_diff",
        "old": a.old, "new": a.new,
        "n_shared_keys": len(shared),
        "total_ratio": round(tot_n / tot_o, 4) if tot_o else None,
        "ambient_envelope_controls": env,
        "touched_declared": sorted(touched & set(shared)),
        "rows": sorted(out_rows, key=lambda r: -r["ratio"]),
    }
    print(f"total: {tot_o:.1f}s -> {tot_n:.1f}s (x{report['total_ratio']})")
    print(f"ambient envelope over {env['n_controls']} controls: "
          f"median x{env['median']}, p90 x{env['p90']}, "
          f"range [x{env['min']}, x{env['max']}]")
    for r in report["rows"]:
        tag = "TOUCHED " if r["touched"] else ""
        tag += "OUTSIDE-ENVELOPE" if r["outside_envelope"] else "within envelope"
        print(f"  {r['key']:<28} {r['old_sec']:>8.2f} -> {r['new_sec']:>8.2f} "
              f"x{r['ratio']:<6} {tag}")
    if a.out:
        with open(a.out, "w") as f:
            json.dump(report, f, indent=1)
        print(f"wrote {a.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
