#!/usr/bin/env python3
"""Assemble a committed BENCH_SF{1,10}_r{N}.json scale record from raw
ScaleBench output lines.

Usage:
  make_scale_record.py OUT.json ROUND SCALE WHAT PASS_BAR RUN1.json [RUN2.json]
       [--notes NOTES.json] [--streaming STREAMING.json]

RUN*.json are the one-line ScaleBench outputs (optionally still carrying a
leading "[info] "). Every note key must name a query in the run's `timed`
list (the r10 verdict's 1:1 hygiene rule) — violations are fatal.
"""
import json
import sys


def load_line(path):
    with open(path) as f:
        s = f.read().strip()
    if s.startswith("[info]"):
        s = s[len("[info]"):].strip()
    return json.loads(s)


def main():
    args = sys.argv[1:]
    notes, streaming = {}, None
    if "--streaming" in args:
        i = args.index("--streaming")
        streaming = json.load(open(args[i + 1]))
        del args[i:i + 2]
    if "--notes" in args:
        i = args.index("--notes")
        notes = json.load(open(args[i + 1]))
        del args[i:i + 2]
    out, rnd, scale, what, pass_bar, run1 = args[:6]
    run2 = args[6] if len(args) > 6 else None

    r1 = load_line(run1)
    timed = r1.get("timed", list(r1["queries"].keys()))
    stray = sorted(set(notes) - set(timed) - {"config"})
    if stray:
        sys.exit(f"FATAL: notes for queries not timed this run: {stray}")

    # -1.0 failure sentinels must not skew the headline stats (failures are
    # already named in `failed`; ScaleBench's own contract keeps sentinels
    # out of every summary)
    ratios = sorted(v["ratio"] for v in r1["queries"].values() if v["ratio"] > 0)
    if not ratios:
        sys.exit("FATAL: no successful queries in the run")
    rec = {
        "round": int(rnd),
        "what": what,
        "scale_factor": float(scale),
        "median_ratio": ratios[len(ratios) // 2],
        "max_ratio": max(ratios),
        "driver_heap_gb": r1.get("driver_heap_gb"),
        "failed": r1.get("failed", []),
        "pass_bar": pass_bar,
        "timed": timed,
        "queries": r1["queries"],
    }
    if run2:
        r2 = load_line(run2)
        if sorted(r2["queries"]) != sorted(r1["queries"]):
            sys.exit("FATAL: run membership differs between the two runs")
        rs2 = sorted(v["ratio"] for v in r2["queries"].values() if v["ratio"] > 0)
        rec["second_run"] = {
            "median_ratio": rs2[len(rs2) // 2] if rs2 else -1.0,
            "failed": r2.get("failed", []),
            "queries": r2["queries"],
        }
    if notes:
        rec["notes"] = notes
    if streaming:
        rec["streaming"] = streaming
    with open(out, "w") as f:
        json.dump(rec, f, indent=1)
        f.write("\n")
    print(f"wrote {out}: {len(timed)} queries, median {rec['median_ratio']}x, "
          f"max {rec['max_ratio']}x, failed={rec['failed']}")


if __name__ == "__main__":
    main()
