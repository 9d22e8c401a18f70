#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run each oracle SQL in
DuckDB over the testdata tables and compare (rows, schema-names, values)
against the Spark result parquet dumped by graft.Verify."""
import sys, json, glob, os
import duckdb
import pandas as pd

args = sys.argv[1:]
record_path = None
if "--record" in args:
    i = args.index("--record")
    if i + 1 >= len(args):
        sys.exit("usage: check_oracle.py [sf_dir] [out_dir] [--record FILE]")
    record_path = args[i + 1]
    del args[i:i + 2]
sf_dir = args[0] if len(args) > 0 else "/root/testdata/sf0.01"
out_dir = args[1] if len(args) > 1 else "/tmp/verify_out"
record = {}

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = []
# a query whose Spark dump is MISSING (Verify caught its exception and moved
# on) must fail the gate — silently skipping it makes ALL MATCH vacuous
for name in sorted(oracles):
    if not os.path.isdir(os.path.join(out_dir, name)):
        print(f"{name:28s} NO-SPARK-DUMP (query failed in Verify?)")
        record[name] = "NO-SPARK-DUMP"
        fails.append(name)
for name in sorted(os.listdir(out_dir)):
    d = os.path.join(out_dir, name)
    if not os.path.isdir(d):
        continue
    spark_df = pd.concat([pd.read_parquet(f) for f in glob.glob(f"{d}/*.parquet")])
    if name not in oracles:
        if len(spark_df) == 0:
            print(f"{name:28s} VACUOUS (rows-only query returned 0 rows)")
            record[name] = "VACUOUS:rows-only:0"
            fails.append(name)
        else:
            print(f"{name:28s} rows-only: {len(spark_df)} rows")
            record[name] = f"rows-only:{len(spark_df)}"
        continue
    try:
        oracle_df = con.execute(oracles[name]).fetchdf()
    except Exception as e:
        print(f"{name:28s} ORACLE-ERROR: {e}")
        record[name] = f"ORACLE-ERROR: {str(e)[:200]}"
        fails.append(name); continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"{name:28s} SCHEMA-MISMATCH spark={list(a.columns)} oracle={list(b.columns)}")
        record[name] = "SCHEMA-MISMATCH"
        fails.append(name); continue
    # normalize dtypes the way a value-hash would see them
    for c in a.columns:
        if str(a[c].dtype).startswith("datetime") or str(b[c].dtype).startswith("datetime"):
            a[c] = pd.to_datetime(a[c]).astype("datetime64[us]")
            b[c] = pd.to_datetime(b[c]).astype("datetime64[us]")
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    if len(a) != len(b):
        print(f"{name:28s} ROWCOUNT spark={len(a)} oracle={len(b)}")
        record[name] = f"ROWCOUNT spark={len(a)} oracle={len(b)}"
        fails.append(name); continue
    if len(a) == 0:
        # both engines agree on empty — but an empty result verifies NOTHING
        # about the operator, so a 0-row pass is a FAILURE at every recorded
        # scale (the CLAUDE.md no-0-row registration rule, extended to sweeps
        # after two sf0.1 rows went silently vacuous in round 12)
        print(f"{name:28s} VACUOUS (0 rows in both engines)")
        record[name] = "VACUOUS:0"
        fails.append(name); continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
    except AssertionError as e:
        print(f"{name:28s} VALUE-MISMATCH: {str(e).splitlines()[-1][:160]}")
        record[name] = f"VALUE-MISMATCH: {str(e).splitlines()[-1][:160]}"
        fails.append(name); continue
    # dtype-kind check: the driver's value hash is dtype-sensitive (int64 vs
    # float64 from e.g. DuckDB HUGEINT diverge even when values match), so a
    # kind mismatch here would pass check_dtype=False but fail the real gate.
    kind_bad = [c for c in a.columns
                if a[c].dtype.kind != b[c].dtype.kind
                and {a[c].dtype.kind, b[c].dtype.kind} != {"i", "u"}]
    if kind_bad:
        detail = {c: f"spark={a[c].dtype} oracle={b[c].dtype}" for c in kind_bad}
        print(f"{name:28s} DTYPE-MISMATCH {detail}")
        record[name] = f"DTYPE-MISMATCH {detail}"
        fails.append(name); continue
    print(f"{name:28s} OK ({len(a)} rows)")
    record[name] = f"OK:{len(a)}"

if record_path:
    ok = sum(1 for v in record.values() if v.startswith("OK:"))
    with open(record_path, "w") as f:
        json.dump({"sf_dir": sf_dir, "queries": len(record), "ok": ok,
                   "failures": fails, "per_query": record}, f, indent=1)
        f.write("\n")
    print(f"record written to {record_path}")

print(f"\n{len(fails)} failures: {fails}" if fails else "\nALL MATCH")
sys.exit(1 if fails else 0)
