#!/usr/bin/env python3
"""Rebuild BENCH_SFSCALE.json from BenchScale stderr log lines
(`[scale] <query> <sf>: <t>s` — each line is already the min of the
run's nRuns timings) plus optional partial JSON outputs from
re-probed queries (SPARK_GRAFT_SCALE_OUT files), which take
precedence. Keeps the exact JSON shape BenchScale.main emits.

Usage: merge_sfscale.py LOG [PARTIAL_JSON...] > BENCH_SFSCALE.json
"""
import json
import math
import re
import sys

times = {}  # query -> {sf: t}
pat = re.compile(r"\[scale\] (\S+) ([0-9.]+): ([0-9.]+)s")
with open(sys.argv[1]) as f:
    for line in f:
        m = pat.search(line)
        if m:
            times.setdefault(m.group(1), {})[float(m.group(2))] = \
                float(m.group(3))

runs_seen = set()
for p in sys.argv[2:]:
    d = json.load(open(p))
    if "runs" in d:
        runs_seen.add(d["runs"])
    for q, row in d["queries"].items():
        times[q] = {float(k[2:]): v for k, v in row.items()
                    if k.startswith("sf")}

out = {}
for q, perSf in times.items():
    if len(perSf) < 4:   # incomplete probe rows are dropped, loudly
        print(f"DROP {q}: only {sorted(perSf)} probed", file=sys.stderr)
        continue
    sfs = sorted(perSf)
    lo, hi = sfs[-2], sfs[-1]
    exp = math.log(perSf[hi] / perSf[lo]) / math.log(hi / lo)
    row = {f"sf{sf}": round(perSf[sf], 6) for sf in sfs}
    row["top_decade_exponent"] = round(exp, 6)
    out[q] = row

# provenance: carry runs through from the partial JSONs when they all
# agree; otherwise emit null rather than misrepresenting the merge
runs = runs_seen.pop() if len(runs_seen) == 1 else None
print(json.dumps({"metric": "scaling", "runs": runs, "queries": out}))
