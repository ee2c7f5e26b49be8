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


def _reconstruct(tail: str) -> dict:
    """Best-effort recovery of a bench record from a TRUNCATED stdout
    tail (the r8 failure mode: the final JSON line was ~3.5 KB, the
    driver keeps 2000 bytes, so the line's head is gone and json.loads
    fails). Scalar keys regex out directly; object-valued keys recover
    via a brace-matching scan when their opening brace survived. A
    PARTIAL object (head cut mid-block, like r8's queries_min) is
    salvaged entry-by-entry into ``queries`` only when nothing better
    exists — numbers are trustworthy, membership is not."""
    out: dict = {}
    for m in re.finditer(r'"(\w+)":\s*(-?\d+(?:\.\d+)?)(?=[,}])', tail):
        k, v = m.group(1), float(m.group(2))
        # top-level scalars of interest only; per-query entries inside
        # blocks are picked up by the object scan below
        if k in ("value", "min_total_sec", "runs_per_query", "sf",
                 "normalized_total_sec", "normalized_min_total_sec"):
            out.setdefault(k, v)
    for key in ("queries", "queries_min", "calibration", "extended_queries",
                "queries_normalized", "queries_min_normalized"):
        m = re.search(r'"%s":\s*\{' % key, tail)
        if not m:
            continue
        start = m.end() - 1
        depth = 0
        for i in range(start, len(tail)):
            depth += {"{": 1, "}": -1}.get(tail[i], 0)
            if depth == 0:
                try:
                    out[key] = json.loads(tail[start : i + 1])
                except ValueError:
                    pass
                break
    if "queries" not in out and "queries_min" not in out:
        # head-truncated block: salvage whatever complete entries remain
        # before the first '}' (r8: the back half of queries_min)
        frag = tail.split("}", 1)[0]
        entries = dict(
            (m.group(1), float(m.group(2)))
            for m in re.finditer(r'"([\w.]+)":\s*(-?\d+(?:\.\d+)?)', frag)
        )
        if entries:
            out["queries"] = entries
            out["partial"] = True
    return out


def _load(path: str) -> dict:
    d = json.load(open(path))
    if "parsed" not in d and "tail" not in d:
        return d  # already a bare bench record
    parsed = d.get("parsed") or _reconstruct(d.get("tail", ""))
    # compact records (r9+) point at the full file; merge it back in when
    # it is present AND matches this round (bench_full.json is overwritten
    # every run, so it only ever corresponds to the latest round)
    full_name = parsed.get("full") if isinstance(parsed, dict) else None
    if full_name:
        full_path = os.path.join(os.path.dirname(os.path.abspath(path)), full_name)
        try:
            full = json.load(open(full_path))
            if full.get("value") == parsed.get("value") and full.get(
                "sf"
            ) == parsed.get("sf"):
                parsed = {**full, **{k: v for k, v in parsed.items() if k != "full"}}
        except (OSError, ValueError):
            pass
    return parsed


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
    common = set(ref_mins)
    for n in cols:
        mins = rounds[n].get("queries_min") or rounds[n]["queries"]
        common &= set(mins)

    def table(divisors: dict[int, float], note: str) -> None:
        print(f"{'query':28s}" + "".join(f"  r{n:<6d}" for n in cols))
        print(f"{note:28s}"
              + "".join(f"  f={factors[n]:<4.2f}" for n in cols))
        for q in names:
            row = f"{q:28s}"
            for n in cols:
                mins = rounds[n].get("queries_min") or rounds[n]["queries"]
                v = mins.get(q)
                row += (f"  {v / divisors[n]:<7.3f}" if v is not None
                        else f"  {'-':<7s}")
            print(row)
        print(f"{'TOTAL (common queries)':28s}", end="")
        for n in cols:
            mins = rounds[n].get("queries_min") or rounds[n]["queries"]
            print(f"  {sum(mins[q] for q in common) / divisors[n]:<7.3f}",
                  end="")
        print(f"\n  ({len(common)} queries present in every round)")

    # the r10 adjudication: RAW min-over-min is the honest cross-round
    # figure and the driver's 2x bar applies to the RAW table; the
    # normalized table is a diagnostic (it inflates whenever the cpu and
    # io probes disagree in sign, as they did in r10: cpu 0.83 / io 1.19)
    print("== RAW min-of-N seconds — the 2x bar and round-over-round "
          "verdicts apply to THIS table ==")
    table({n: 1.0 for n in cols}, "(raw min sec; - = absent)")
    print()
    print("== probe-normalized (raw / calibration factor; reference-box "
          "seconds) — DIAGNOSTIC ONLY ==")
    table(factors, "(normalized min sec)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
