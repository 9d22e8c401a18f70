#!/usr/bin/env python3
"""DuckDB referee for the scalar differential fuzz.

Usage: check_fuzz.py <fuzz_dump.jsonl>

Reads the case list written by `graft.tools.FuzzDump` (one JSON object per
line: kql / spark_sql / duck_sql / expected) and executes every non-null
duck_sql in DuckDB, comparing the result against the in-repo evaluator's
`expected` value. The evaluator and the KQL rewriter share authorship; the
fuzz spec (Spark vs evaluator) plus this script (DuckDB vs evaluator)
complete the three-way diff — a semantic bug would have to fool two
independent engines identically to slip through.

Doubles compare with 1e-9 relative tolerance (three engines, three libm
builds); timestamps compare on the instant; everything else exactly.
Exits 1 on any mismatch, 2 on an empty/missing dump.
"""
import datetime
import json
import math
import sys

import duckdb


class Bag:
    """Expected bag value: ORDERED (key, value) pairs — key order is part of
    the engine contract (insertion order for bag_pack, sorted keys for
    merge/set/remove) and the DuckDB twins reproduce it, so the compare is
    exact, not set-wise."""

    def __init__(self, pairs):
        self.pairs = pairs

    def __repr__(self):
        return f"Bag({self.pairs!r})"


def from_typed(e):
    t = e["t"]
    if t == "str":
        return e["v"]
    if t == "int":
        return int(e["v"])
    if t == "dbl":
        return float("nan") if e["v"] == "NaN" else float(e["v"])
    if t == "bool":
        return bool(e["v"])
    if t == "dt":
        return datetime.datetime.fromisoformat(e["v"].replace("Z", "+00:00"))
    if t == "arr":
        return [from_typed(x) for x in e["v"]]
    if t == "bag":
        return Bag([(k, from_typed(x)) for k, x in e["v"]])
    if t == "null":
        return None
    raise ValueError(f"unexpected expected-type {t} in a duck-twinned case")


def agree(exp, got):
    if exp is None or got is None:
        # a NULL on either side must report as a per-case mismatch (unless
        # both are NULL), never crash the comparator mid-run
        return exp is None and got is None
    if isinstance(exp, Bag):
        # DuckDB returns the bag as JSON text; parse preserves document
        # order (py dicts are insertion-ordered), compare pairs IN ORDER
        if not isinstance(got, str):
            return False
        try:
            d = json.loads(got)
        except ValueError:
            return False
        if not isinstance(d, dict) or len(d) != len(exp.pairs):
            return False
        return all(gk == ek and agree(ev, gv)
                   for (gk, gv), (ek, ev) in zip(d.items(), exp.pairs))
    if isinstance(exp, float):
        g = float(got)
        if math.isnan(exp) and math.isnan(g):
            return True
        return abs(exp - g) <= 1e-9 * max(1.0, abs(exp), abs(g))
    if isinstance(exp, datetime.datetime):
        if not isinstance(got, datetime.datetime):
            return False
        g = got if got.tzinfo else got.replace(tzinfo=datetime.timezone.utc)
        return exp == g
    if isinstance(exp, list):
        return (isinstance(got, list) and len(exp) == len(got)
                and all(agree(a, b) for a, b in zip(exp, got)))
    if isinstance(exp, bool):
        return isinstance(got, bool) and exp == got
    if isinstance(exp, int):
        # require the DuckDB value to be integral before comparing: int(3.7)
        # truncates to 3 and would falsely match an expected 3
        if isinstance(got, bool):
            return False
        if isinstance(got, float) and not got.is_integer():
            return False
        return int(got) == exp
    return exp == got


def main():
    if len(sys.argv) != 2:
        print(__doc__)
        return 2
    cases = [json.loads(line) for line in open(sys.argv[1]) if line.strip()]
    if not cases:
        print("[check-fuzz] EMPTY dump")
        return 2
    con = duckdb.connect()
    # bag-contract macros the twins call (r16 verdict #4): sorted-key
    # rebuild of a JSON object (the engine's bag_merge/bag_set_key/
    # bag_remove_keys contracts emit SORTED keys; json_merge_patch alone
    # does not). Lambda-style on purpose — a subquery form breaks when the
    # macro lands inside another lambda (countof's positional scan).
    # COALESCE covers array_to_string([]) -> NULL (a bag emptied by
    # bag_remove_keys must render '{}').
    con.execute("""CREATE MACRO bag_sort(j) AS
        '{' || COALESCE(array_to_string(
            list_transform(list_sort(CAST(json_keys(j) AS VARCHAR[])),
                k -> to_json(k) || ':' || json_extract(j, '$.' || k)),
            ','), '') || '}'""")
    con.execute("""CREATE MACRO bag_remove(j, ks) AS
        '{' || COALESCE(array_to_string(
            list_transform(
                list_sort(list_filter(CAST(json_keys(j) AS VARCHAR[]),
                    k -> NOT list_contains(ks, k))),
                k -> to_json(k) || ':' || json_extract(j, '$.' || k)),
            ','), '') || '}'""")
    ran, skipped, bad = 0, 0, []
    skip_census = {}
    for c in cases:
        if c["duck_sql"] is None:
            skipped += 1
            # `or` (not a dict default): an EMPTY skip_ops list means the
            # duck renderer refused for a reason unduckableOps doesn't name —
            # exactly the desync this census exists to flag
            for op in (c.get("skip_ops") or ["<unattributed>"]):
                skip_census[op] = skip_census.get(op, 0) + 1
            continue
        ran += 1
        try:
            got = con.execute(f"SELECT {c['duck_sql']}").fetchone()[0]
        except Exception as e:  # a twin DuckDB cannot parse is itself a finding
            bad.append(f"#{c['id']} DUCK ERROR: {e}\n  duck: {c['duck_sql']}")
            continue
        exp = from_typed(c["expected"])
        if not agree(exp, got):
            bad.append(
                f"#{c['id']} MISMATCH\n  kql:  {c['kql']}\n"
                f"  duck: {c['duck_sql']}\n  expected: {exp!r}\n  got:      {got!r}")
    print(f"[check-fuzz] {ran} DuckDB twins executed, {skipped} cases skipped "
          f"({ran / max(len(cases), 1):.0%} portable)")
    # per-op skip census: every untwinned case names the ops that made it
    # unportable — a silent-shrink of the DuckDB lane shows up here as a
    # new op name or a jump in an existing count
    for op, n in sorted(skip_census.items(), key=lambda kv: -kv[1]):
        print(f"[check-fuzz]   skip census: {op:<18} {n}")
    if bad:
        print(f"[check-fuzz] {len(bad)} divergences:")
        print("\n".join(bad[:12]))
        return 1
    print("[check-fuzz] ALL MATCH")
    return 0


if __name__ == "__main__":
    sys.exit(main())
