#!/usr/bin/env python3
"""Merge N full-suite bench recordings into bench_reference.json.

Per-query MIN across clean runs (the steady-state protocol from
BASELINE §7), written in the same compact one-line JSON shape Bench
itself emits (short query keys, no whitespace) so the file format can
never again drift away from Bench.parseReference.

Usage: python3 scripts/merge_bench_recordings.py run1.json run2.json ...
"""
import json
import sys

runs = []
for path in sys.argv[1:]:
    with open(path) as f:
        d = json.load(f)
    if d.get("failed"):
        sys.exit(f"{path} has failed queries: {d['failed']}")
    if d.get("contended"):
        sys.exit(f"{path} is a contention-polluted run "
                 f"(contended: {d['contended']}) — a flagged query's "
                 "inflated min must never become a reference band")
    runs.append(d)
if not runs:
    sys.exit("no recordings given")
sfs = {d["sf"] for d in runs}
if len(sfs) != 1:
    sys.exit(f"recordings at different sf: {sfs}")
keys = set()
for d in runs:
    keys |= set(d["queries"])
for d in runs:
    missing = keys - set(d["queries"])
    if missing:
        sys.exit(f"recording missing queries: {sorted(missing)}")
merged = {k: min(d["queries"][k] for d in runs) for k in sorted(keys)}
total = round(sum(merged.values()), 3)
qs = ",".join(f'"{k}":{v}' for k, v in merged.items())
line = (f'{{"metric":"total","value":{total},"unit":"sec",'
        f'"failed":[],"contended":[],"queries":{{{qs}}},'
        f'"sf":{runs[0]["sf"]}}}')
with open("bench_reference.json", "w") as f:
    f.write(line + "\n")
print(f"merged {len(runs)} runs, {len(merged)} queries, total {total}s")
