#!/usr/bin/env python3
"""Round-over-round bench regression check.

Usage: bench_diff.py <current_bench_json_line_or_file> [threshold]

Compares per-query seconds of the current bench run against the NEWEST
BENCH_r*.json in the repo root (the driver's record of the previous round)
and exits 1 if any query regressed by more than `threshold` x (default 1.5)
while costing more than 0.5 s absolute — sub-half-second queries at
local[32] are dominated by scheduling noise (a concurrent build inflates
them 1.5-2x with no code change), so only material costs gate.
New queries (no baseline entry) are reported, never failed. Queries whose
SEMANTICS intentionally changed this round (doing strictly more work, e.g.
a new in-plan correctness gate) can be exempted by listing their names in
the BENCH_ALLOW env var (comma-separated); they are reported, not failed.
"""
import glob
import json
import os
import re
import sys


def load_current(arg):
    text = open(arg).read() if os.path.exists(arg) else arg
    # accept either the bare Bench JSON line (queries-first or metric-first
    # field order) or a driver BENCH_r file
    m = (re.search(r'\{"spread":\{.*\}', text)
         or re.search(r'\{"queries":\{.*\}', text)
         or re.search(r'\{"metric":"total".*\}', text))
    if m:
        return json.loads(m.group(0))
    return json.loads(text)


def load_baseline():
    files = glob.glob(os.path.join(os.path.dirname(__file__), "..", "BENCH_r*.json"))
    if not files:
        return None, None

    def round_of(p):
        # numeric round order, NOT lexicographic: BENCH_r100 must beat
        # BENCH_r99 once the counter outgrows its zero-padding
        m = re.search(r"BENCH_r(\d+)\.json$", os.path.basename(p))
        return int(m.group(1)) if m else -1

    latest = max(files, key=round_of)
    data = json.load(open(latest))
    tail = data.get("tail", "")
    m = re.search(r'\{\\?"metric\\?":\\?"total\\?".*', tail)
    if m:
        # the driver embeds the bench line inside a log tail string
        line = m.group(0)
        line = line.split("\\n")[0] if "\\n" in line else line
        try:
            return json.loads(line), latest
        except json.JSONDecodeError:
            pass
    if "queries" in data:
        return data, latest
    # the driver keeps only the LAST N bytes of bench output, which can chop
    # the head off the JSON line — reconstruct per-query seconds from the
    # surviving `"name":float` pairs (queries cut off at the head simply
    # appear as NEW this round; better a partial baseline than none)
    pairs = re.findall(r'"([A-Za-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
    meta = {"metric", "value", "unit", "sf", "total", "s1", "sN", "e1", "eN", "threads"}
    queries = {k: float(v) for k, v in pairs if k not in meta}
    if queries:
        rec = {"queries": queries, "value": None}
        cm = re.search(r'"calib":(\{[^}]*\})', tail.replace("\\\"", "\""))
        if cm:
            try:
                rec["calib"] = json.loads(cm.group(1))
            except json.JSONDecodeError:
                pass
        return rec, latest
    return None, latest


def calib_factor(cur, base):
    """Host-speed ratio current/baseline from the fixed-work CPU probes
    (mean of the start/end multi-thread samples — the shape the queries run
    in). > 1 means the host is SLOWER now; per-query ratios are divided by
    it before the regression bar. Returns (factor, note)."""
    def nt(rec):
        c = rec.get("calib") or {}
        vals = [c.get("sN"), c.get("eN")]
        vals = [v for v in vals if isinstance(v, (int, float)) and v > 0]
        return sum(vals) / len(vals) if vals else None
    c, b = nt(cur), nt(base)
    if c is None or b is None:
        return 1.0, "no calibration in current run" if c is None else \
            "baseline has no calibration"
    # the probe runs `threads` copies of fixed work, so its seconds are only
    # comparable at the SAME thread count — an 8-cpu rerun against a 32-cpu
    # baseline would otherwise inflate every normalized ratio 4x
    ct = (cur.get("calib") or {}).get("threads")
    bt = (base.get("calib") or {}).get("threads")
    if str(ct) != str(bt):
        return 1.0, f"thread counts differ ({bt} -> {ct}); not normalizing"
    return c / b, f"host probe {b:.2f}s -> {c:.2f}s"


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        return 2
    threshold = float(sys.argv[2]) if len(sys.argv) > 2 else 1.5
    allow = {n.strip() for n in os.environ.get("BENCH_ALLOW", "").split(",") if n.strip()}
    cur = load_current(sys.argv[1])
    base, src = load_baseline()
    if base is None:
        print("[bench-diff] no previous BENCH_r*.json baseline - skipping")
        return 0
    prev_q = base.get("queries", {})
    cur_q = cur.get("queries", {})
    factor, note = calib_factor(cur, base)
    print(f"[bench-diff] calibration: {note}; normalizing ratios by {factor:.3f}x")
    bad = []
    for name, now in sorted(cur_q.items()):
        was = prev_q.get(name)
        if was is None:
            print(f"[bench-diff] NEW      {name}: {now:.2f}s")
            continue
        if now <= 0:
            # Bench records -1.0 for a query that crashed — at sf0.1 only, so
            # the sf0.01 correctness dump never sees it; this must FAIL
            if was > 0:
                print(f"[bench-diff] CRASHED  {name}: {was:.2f}s -> failed")
                bad.append((name, was, now, float("inf")))
            continue
        if was <= 0:
            print(f"[bench-diff] RECOVERED {name}: failed -> {now:.2f}s")
            continue
        # the regression bar applies to the host-normalized ratio; raw stays
        # in the printout so uniform host shifts are visible, not hidden
        ratio = now / was
        norm = ratio / factor
        marker = ""
        if norm > threshold and now > 0.5:
            if name in allow:
                marker = "  (allowed: semantics changed)"
            else:
                marker = "  << REGRESSION"
                bad.append((name, was, now, norm))
        if marker or norm > 1.2 or norm < 0.8:
            # current run's two-sample spread, when the record carries it:
            # a mover whose own samples disagree by a similar margin is
            # Spark-internal noise, not a regression (round-15 verdict #2)
            sp = cur.get("spread", {}).get(name)
            sptxt = f"  [spread {sp:.0%}]" if isinstance(sp, (int, float)) and sp >= 0 else ""
            print(f"[bench-diff] {ratio:5.2f}x raw / {norm:5.2f}x norm  "
                  f"{name}: {was:.2f}s -> {now:.2f}s{sptxt}{marker}")
    tot_was, tot_now = base.get("value"), cur.get("value")
    if tot_was and tot_now:
        print(f"[bench-diff] total: {tot_was:.2f}s -> {tot_now:.2f}s "
              f"({tot_now / tot_was:.2f}x raw / {tot_now / tot_was / factor:.2f}x norm) "
              f"vs {os.path.basename(src)}")
    if bad:
        print(f"[bench-diff] FAIL: {len(bad)} quer{'y' if len(bad) == 1 else 'ies'} regressed "
              f">{threshold}x: " + ", ".join(n for n, *_ in bad))
        return 1
    print("[bench-diff] OK")
    return 0


if __name__ == "__main__":
    sys.exit(main())
