#!/usr/bin/env python3
"""Parallelism audit of a Spark event log (the round-14 method that
caught d39's AQE-coalesced single-task stage and the synthesis
file-count cap).

For every completed stage: wall time, task count, max task runtime,
sum of task runtimes, and effective parallelism (sum / max). A heavy
stage (wall > threshold) whose effective parallelism is far below the
core count is either AQE byte-based coalescing hiding compute-heavy
work behind a tiny shuffle, a skewed straggler, or a file layout
capping scan splits -- all three look identical in wall-clock and
only this breakdown tells them apart (check task input/shuffle-read
records to distinguish: even records per task = layout cap, one fat
task = skew/coalesce).

Usage:
  SPARK_GRAFT_SF_DIR=... java -Dspark.eventLog.enabled=true \
      -Dspark.eventLog.dir=file:///tmp/evt ... graft.Bench --one <key>
  python3 tools/stage_audit.py /tmp/evt/eventlog_v2_local-*/ [--flag-par 8]
"""
import json
import subprocess
import sys
import glob
import os


def load_events(d):
    files = sorted(glob.glob(os.path.join(d, "events_*")))
    if not files:
        sys.exit(f"no events_* file under {d}")
    raw = b""
    for f in files:
        if f.endswith(".zstd"):
            raw += subprocess.run(["zstd", "-d", "-c", f],
                                  capture_output=True, check=True).stdout
        else:
            raw += open(f, "rb").read()
    for line in raw.decode("utf-8").splitlines():
        if line.strip():
            yield json.loads(line)


def audit(d, flag_par):
    stages, tasks = {}, {}
    for e in load_events(d):
        ev = e.get("Event")
        if ev == "SparkListenerStageCompleted":
            si = e["Stage Info"]
            # Resubmitted/skipped stages can lack a Submission Time;
            # defaulting it to 0 would compute wall = epoch-millis/1000
            # and guarantee a spurious LOW-PAR flag — skip such stages.
            if "Submission Time" not in si or "Completion Time" not in si:
                continue
            wall = (si["Completion Time"] - si["Submission Time"]) / 1000
            stages[si["Stage ID"]] = (wall, si["Number of Tasks"])
        elif ev == "SparkListenerTaskEnd":
            m = e.get("Task Metrics") or {}
            sr = m.get("Shuffle Read Metrics") or {}
            im = m.get("Input Metrics") or {}
            tasks.setdefault(e["Stage ID"], []).append(
                (m.get("Executor Run Time", 0) / 1000,
                 sr.get("Total Records Read", 0),
                 im.get("Records Read", 0)))
    flagged = 0
    print(f"{'stage':>5} {'wall_s':>8} {'tasks':>5} {'max_s':>7} "
          f"{'sum_s':>8} {'eff_par':>7}  note")
    for sid, (wall, nt) in sorted(stages.items(), key=lambda x: -x[1][0]):
        ts = sorted(t[0] for t in tasks.get(sid, []))
        mx = ts[-1] if ts else 0.0
        s = sum(ts)
        par = s / mx if mx > 0 else 0.0
        note = ""
        if wall > 2.0 and par < flag_par:
            nonzero = [t for t in tasks.get(sid, []) if t[1] + t[2] > 0]
            note = (f"<== LOW-PAR ({len(nonzero)}/{nt} tasks carry "
                    f"records: layout cap)" if nonzero and
                    len(nonzero) < nt * 0.6 else "<== LOW-PAR (skew or "
                    "AQE byte-coalesce over compute-heavy work)")
            flagged += 1
        print(f"{sid:5d} {wall:8.2f} {nt:5d} {mx:7.2f} {s:8.1f} "
              f"{par:7.1f}  {note}")
    return flagged


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser(
        description="Parallelism audit of Spark event logs")
    ap.add_argument("dirs", nargs="+",
                    help="eventlog_v2_local-* directories")
    ap.add_argument("--flag-par", type=float, default=8.0,
                    help="flag heavy stages below this effective "
                         "parallelism (default 8)")
    ns = ap.parse_args()
    total = 0
    for d in ns.dirs:
        print(f"== {d}")
        total += audit(d, ns.flag_par)
    sys.exit(1 if total else 0)
