#!/usr/bin/env python3
"""Gate-tier parameter census (r19 verdict item 3).

Mechanically extracts load-bearing-looking runtime constants per query
row from the Scala query sources: selector-class literals (filters,
limits, caps, thresholds, windows, durations, named numeric params)
whose effect can be INVISIBLE at a degenerate gate SF. Output is a
skeleton (row -> [param lines]) that the builder triages into
tools/adjudications/r19_gate_tiers.json with per-parameter tier
ownership stamps.

Heuristics, not a parser: a "query block" is the source between
'"name" -> ((s, d)' markers inside the queries Map of each file under
queries/ (oracle maps are skipped by requiring the arrow form).
"""
import json
import re
import sys
from pathlib import Path

QDIR = Path(__file__).resolve().parent.parent / "src/main/scala/graft/queries"

START = re.compile(r'"([a-z0-9_]+)"\s*->\s*\(\(s,\s*d\)')

# selector-class literal patterns worth a tier stamp
PATTERNS = [
    ("limit", re.compile(r"\.limit\((\d+)\)")),
    ("cmp_ge", re.compile(r">=\s*(?:lit\()?(\d+(?:\.\d+)?)")),
    ("cmp_le", re.compile(r"<=\s*(?:lit\()?(\d+(?:\.\d+)?)")),
    ("cmp_gt", re.compile(r">\s*(?:lit\()?(\d+(?:\.\d+)?)")),
    ("cmp_lt", re.compile(r"<\s*(?:lit\()?(\d+(?:\.\d+)?)")),
    ("cmp_eq", re.compile(r"===\s*(?:lit\()?\"?([A-Za-z0-9_.-]+)")),
    ("named", re.compile(
        r"\b(maxDelay|maxDepth|maxHops|minSupport|threshold|targetBytes|"
        r"compression|numFiles|bands|rows|k|topK|nProbe|cap|budgetElems|"
        r"width|depth|seed|tol|eps|decay|halfLife|window|gap|stride|"
        r"keepNum|keepDen|nBits|shingleK|maxIter)\s*=\s*([0-9][0-9a-zA-Z_*. ]*)")),
    ("duration", re.compile(r'"(\d+\s+(?:minutes?|hours?|days?|seconds?))"')),
    ("ntile", re.compile(r"ntile\((\d+)\)")),
    ("approx_rsd", re.compile(r"approx_count_distinct\([^,]+,\s*([0-9.]+)")),
]

# noise suppressors: pure formatting / fixed-point scales / cent rounding
NOISE = re.compile(
    r"(lit\(100\)|\* 100\b|100, 0\)|1000000\.0|lit\(1e|cast\(|"
    r"decimal\(|DecimalType|getOrElse|sequence\(lit\(0\)|substring\(|"
    r"conv\(|, 16, 10\)|spark\.sql\.|partitions)")


def blocks(path: Path):
    src = path.read_text()
    marks = [(m.start(), m.group(1)) for m in START.finditer(src)]
    for i, (pos, name) in enumerate(marks):
        end = marks[i + 1][0] if i + 1 < len(marks) else len(src)
        yield name, src[pos:end]


def main():
    out = {}
    for f in sorted(QDIR.glob("*.scala")):
        for name, body in blocks(f):
            hits = []
            for line in body.splitlines():
                ls = line.strip()
                if ls.startswith("//") or NOISE.search(ls):
                    continue
                for kind, rx in PATTERNS:
                    for m in rx.finditer(ls):
                        hits.append({"kind": kind, "value": m.group(1),
                                     "line": ls[:110]})
            if hits:
                # dedup identical (kind, value, line) triples
                seen, uniq = set(), []
                for h in hits:
                    key = (h["kind"], h["value"], h["line"])
                    if key not in seen:
                        seen.add(key)
                        uniq.append(h)
                out[name] = {"file": f.name, "params": uniq}
    json.dump(out, sys.stdout, indent=1)
    print(file=sys.stderr)
    print(f"{len(out)} rows with selector-class constants", file=sys.stderr)


if __name__ == "__main__":
    main()
