"""Round-over-round bench trend, normalized where possible.

Reads every BENCH_r*.json in the repo root and prints a per-query table
of min-of-N seconds across rounds, plus totals. Rounds that carry a
calibration probe (r8+) also get probe-normalized columns — divide any
raw number by that round's ``calibration.factor`` to express it in
reference-box seconds (PROBE_REF_SEC pinned in bench.py).

For rounds WITHOUT a probe (r1-r7), the tool estimates a drift factor
from anchor queries: the median ratio of each query's min to its value
in the latest probed round, computed over queries present in both (the
same adjudication arithmetic used to clear the r7 simhash weak mark —
diff-identical anchors moved uniformly with box state, so their median
ratio IS the box-state ratio).

CAVEAT on pre-probe factors: anchor normalization assumes the anchors
themselves are diff-identical between the rounds compared. Round 8
shipped ENGINE-WIDE speedups (codegen cache sizing, constraint
propagation off) that genuinely moved every query, so anchor factors
for r1-r7 vs r8+ mix box state WITH that real improvement — they
UNDERSTATE r8's gain rather than overstating anything. Within r1-r7,
and within r8+, the comparisons are clean; across the boundary, read
the raw row too.

Usage: python bench_trend.py [queryname ...]
"""

from __future__ import annotations

import glob
import json
import os
import re
import statistics
import sys


def _load(path: str) -> dict:
    d = json.load(open(path))
    return d.get("parsed", d)


def main() -> int:
    root = os.path.dirname(os.path.abspath(__file__))
    rounds: dict[int, dict] = {}
    for path in sorted(glob.glob(os.path.join(root, "BENCH_r*.json"))):
        m = re.search(r"BENCH_r(\d+)\.json$", path)
        if not m:
            continue
        d = _load(path)
        if d.get("queries"):
            rounds[int(m.group(1))] = d
    if not rounds:
        print("no BENCH_r*.json found")
        return 1
    latest = rounds[max(rounds)]
    ref_mins = latest.get("queries_min") or latest["queries"]

    # drift factor per round: probe-based when present, anchor-median else
    factors: dict[int, float] = {}
    for n, d in rounds.items():
        cal = d.get("calibration")
        if cal:
            factors[n] = cal["factor"]
            continue
        mins = d.get("queries_min") or d["queries"]
        ratios = [
            mins[q] / ref_mins[q]
            for q in mins
            if q in ref_mins and ref_mins[q] > 0
        ]
        factors[n] = statistics.median(ratios) if ratios else 1.0

    names = sys.argv[1:] or sorted(
        {q for d in rounds.values() for q in (d.get("queries_min") or d["queries"])}
    )
    cols = sorted(rounds)
    hdr = f"{'query':28s}" + "".join(f"  r{n:<6d}" for n in cols)
    print(hdr)
    print(f"{'(normalized min sec; - = absent)':28s}"
          + "".join(f"  f={factors[n]:<4.2f}" for n in cols))
    for q in names:
        row = f"{q:28s}"
        for n in cols:
            mins = rounds[n].get("queries_min") or rounds[n]["queries"]
            v = mins.get(q)
            row += f"  {v / factors[n]:<7.3f}" if v is not None else f"  {'-':<7s}"
        print(row)
    print(f"{'TOTAL (common queries)':28s}", end="")
    common = set(ref_mins)
    for n in cols:
        mins = rounds[n].get("queries_min") or rounds[n]["queries"]
        common &= set(mins)
    for n in cols:
        mins = rounds[n].get("queries_min") or rounds[n]["queries"]
        print(f"  {sum(mins[q] for q in common) / factors[n]:<7.3f}", end="")
    print(f"\n  ({len(common)} queries present in every round)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
