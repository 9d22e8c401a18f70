#!/usr/bin/env python3
"""Emit the round's SURVEY-ready closing-numbers block from COMMITTED
records only (BENCH_LOCAL_r{N}, BENCH_SF1_r{N}, BENCH_SF10_r{N},
BENCH_META_r{N} when present) — the r11 verdict's transcription-discipline
ask: SURVEY prose quotes these lines verbatim instead of hand-typed
numbers that can drift from the records.

Usage: survey_numbers.py [round]   (default: newest BENCH_LOCAL on disk)
"""
import glob
import json
import sys


def load(path):
    try:
        with open(path) as f:
            return json.load(f)
    except FileNotFoundError:
        return None


def main():
    if len(sys.argv) > 1:
        rnd = int(sys.argv[1])
    else:
        files = sorted(glob.glob("BENCH_LOCAL_r*.json"))
        if not files:
            sys.exit("no BENCH_LOCAL_r*.json found")
        rnd = int(files[-1].rsplit("_r", 1)[1].split(".")[0])
    tag = f"r{rnd:02d}"

    local = load(f"BENCH_LOCAL_{tag}.json")
    if local:
        qs = local.get("queries", {})
        total = sum(qs.values()) if qs and all(
            isinstance(v, (int, float)) for v in qs.values()) else local.get("value")
        if total is None or not qs:
            print(f"BENCH_LOCAL_{tag}: SKIPPED (non-numeric queries and no "
                  "top-level 'value' — record malformed?)")
        else:
            print(f"BENCH_LOCAL_{tag}: {total:.1f} s / {len(qs)} queries "
                  f"(max {max(qs, key=qs.get)} {max(qs.values()):.2f} s)")
    for name, label in ((f"BENCH_SF1_{tag}.json", "SF1 (10x)"),
                        (f"BENCH_SF10_{tag}.json", "SF10 (100x)")):
        rec = load(name)
        if not rec:
            continue
        if not all(k in rec for k in ("timed", "median_ratio", "max_ratio")):
            print(f"{label}: SKIPPED (record missing timed/ratio keys)")
            continue
        line = (f"{label}: {len(rec['timed'])} queries, median "
                f"{rec['median_ratio']}x, max {rec['max_ratio']}x, "
                f"failed={rec.get('failed', '?')}")
        second = rec.get("second_run")
        if second:
            line += (f"; run-2 median {second.get('median_ratio', '?')}x, "
                     f"failed={second.get('failed', '?')}")
        print(line)
        stream = rec.get("streaming")
        if stream and "trigger_points" in stream:
            pts = ", ".join(
                f"mft={p['max_files_per_trigger']}: {p['stream_sec']:.1f} s "
                f"({p['stream_over_batch']:.2f}x batch)"
                for p in stream["trigger_points"])
            print(f"  streaming {stream.get('rows', '?')} rows / "
                  f"{stream.get('commits', '?')} commits, batch "
                  f"{stream.get('batch_sec', float('nan')):.1f} s; {pts}; "
                  f"drain-equals-batch "
                  f"{all(p.get('drain_equals_batch') for p in stream['trigger_points'])}")
    for meta_name in sorted(glob.glob(f"BENCH_META*_{tag}.json")):
        meta = load(meta_name)
        if not meta:
            continue
        if "n_tables" in meta:  # the multi-table record has its own shape
            try:
                print(f"{meta_name[:-5]}: {meta['n_tables']} tables x "
                      f"{meta['blobs_per_table']} blobs over ONE shared store, "
                      f"E2E {meta['value']:.1f} s, all-mirrors snapshot "
                      f"{meta['snapshot_all_sec']:.1f} s, shared state "
                      f"{meta['shared_state_mb']:.0f} MB / {meta['state_live_rows']} live rows")
            except (KeyError, TypeError):
                print(f"{meta_name[:-5]}: SKIPPED (multi record missing keys)")
            continue
        if meta.get("metric") == "meta_steady_sec":  # r15 steady-state record
            try:
                g, c = meta["gated"], meta["control_r14_policy"]
                print(f"{meta_name[:-5]}: {meta['ballast_rows']} ballast rows "
                      f"({meta['base_mb']:.0f} MB base), {g['batches']} small batches: "
                      f"gated median batch {g['median_batch_sec']:.2f} s / store "
                      f"{g['median_store_sec']:.3f} s, {g['compactions']} compaction(s); "
                      f"forced-compact control median batch {c['median_batch_sec']:.2f} s / "
                      f"store {c['median_store_sec']:.2f} s, {c['compactions']} compactions")
            except (KeyError, TypeError):
                print(f"{meta_name[:-5]}: SKIPPED (steady record missing keys)")
            continue
        if meta.get("metric") == "stage_floor_sec":  # r15 staged-read floor
            try:
                at = meta["attribution"]
                print(f"{meta_name[:-5]}: {meta['n_blobs']} blobs staged-read floor "
                      f"{meta['value']:.1f} s = open+footer {at['open_footer']:.1f} s + "
                      f"decode {at['page_decode_materialize']:.1f} s + decoration "
                      f"{at['lineage_decoration']:.1f} s + write {at['output_write']:.1f} s")
            except (KeyError, TypeError):
                print(f"{meta_name[:-5]}: SKIPPED (stage record missing keys)")
            continue
        if "rep1" in meta and "e2e_reps_sec" in meta:
            # r17 two-rep SELF-NORMALIZING record: full per-rep records under
            # rep1/rep2, each carrying its own in-record io_floor block
            try:
                reps = [meta["rep1"], meta["rep2"]]
                e2e = "/".join(
                    f"{r['phases']['e2e_first_mirror_batch']['sec']:.1f}" for r in reps)
                floors = "/".join(
                    f"{r['io_floor']['pre_sec']:.1f}+{r['io_floor']['post_sec']:.1f}"
                    for r in reps)
                norm = "/".join(
                    f"{r['io_floor']['e2e_per_file_over_floor']:.2f}" for r in reps)
                app = "/".join(
                    f"{r['io_floor']['store_append_in_window_sec']:.1f}" for r in reps)
                print(f"{meta_name[:-5]}: E2E {meta['n_blobs']} blobs {e2e} s (2 reps); "
                      f"in-record IO floors {floors} s per "
                      f"{reps[0]['io_floor']['n_files']} files; "
                      f"normalized-to-floor {norm}x per-file; "
                      f"store.append in-window {app} s")
            except (KeyError, TypeError):
                print(f"{meta_name[:-5]}: SKIPPED (two-rep record missing keys)")
            continue
        # same missing-key tolerance as the BENCH_LOCAL/BENCH_SF records: one
        # malformed or partial BENCH_META file must skip, not crash the survey
        try:
            ph = meta["phases"]
            print(f"{meta_name[:-5]}: bootstrap {ph['bootstrap_full_snapshot']['adds']} adds "
                  f"{ph['bootstrap_full_snapshot']['sec']:.1f} s "
                  f"({ph['bootstrap_full_snapshot']['heap_after_gb']:.2f} GB after GC), "
                  f"delta {ph['delta_vs_90pct_applied']:.1f} s, "
                  f"coalesce {ph['coalesce_10_slices']:.1f} s, "
                  f"E2E {meta['n_blobs']} blobs {ph['e2e_first_mirror_batch']['sec']:.1f} s, "
                  f"heap peak {meta['heap_peak_gb']:.2f} GB / {meta['driver_heap_gb']:.0f} GB")
        except (KeyError, TypeError):
            print(f"{meta_name[:-5]}: SKIPPED (record missing phase keys)")
            continue
        try:
            fl = meta.get("io_floor")
            if fl:
                print(f"  in-record IO floor ({fl['n_files']} files): pre "
                      f"{fl['pre_sec']:.1f} s / post {fl['post_sec']:.1f} s; "
                      f"E2E normalized to floor: {fl['e2e_per_file_over_floor']:.2f}x "
                      f"per-file; store.append in window {fl['store_append_in_window_sec']:.1f} s")
            bd = meta.get("e2e_breakdown")
            if bd:
                top = sorted(bd.items(), key=lambda kv: -kv[1]["sec"])[:4]
                print("  E2E breakdown (innermost-label attribution, same-thread "
                      "phases disjoint; concurrent workers still sum across threads): "
                      + ", ".join(f"{k} {v['sec']:.1f} s/{v['calls']}x" for k, v in top))
            sc = meta.get("store_compaction")
            if sc:
                print(f"  store compaction: {sc['raw_rows']} raw rows "
                      f"({sc['raw_mb']:.0f} MB) -> {sc['live_rows']} live "
                      f"({sc['compact_mb']:.0f} MB) in {sc['compact_sec']:.1f} s, "
                      f"reload {sc['reload_sec']:.1f} s")
        except (KeyError, TypeError):
            print("  (breakdown/compaction keys malformed — SKIPPED)")


if __name__ == "__main__":
    main()
