"""Benchmark harness (driver contract).

Runs the headline queries from __spark_entry__ at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {...}, "sf": ...}.

Mirrors the reference's benchmark shape (/root/reference/integrations/
benchmark_test.go: filter / windowed-count / alert / join pipelines) plus
the analytic + dataprep headliners. Each query is executed to completion
with a noop write (full pipeline runs distributed; no driver collect cost,
matching "all points processed" in the reference harness, benchmark_test.go:271).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: the reference-benchmark shapes first (filter, windowed
# count, alert, join), then the heavy analytic queries, then dataprep.
HEADLINE = [
    "lambda_where_regex",  # pass-through filter (BenchmarkSimpleTask)
    "window_mean_1h",      # windowed agg (BenchmarkCountTask)
    "alert_state_changes", # alert lambda (BenchmarkAlertTask)
    "join_tolerance",      # two-stream join (BenchmarkJoinTask)
    "tpch_q1_pricing",
    "tpch_q3_topk",
    "state_tracking",
    "moving_avg5",
    "flatten_daily",
    "window_count_agg",
    "sigma_outliers",
    "tickscript_e2e",
    "lineprotocol_roundtrip",
    "dedup_exact_fp",
    "minhash_near_dup",
    "simhash_near_dup",
    "span_dedup_stats",    # substring-level dedup (r6)
    "image_dhash_near_dup",  # image perceptual-hash dedup (r7)
    "text_analysis",
    "boilerplate_removal",
    "decontamination",
    "ann_cosine_topk",
    "stream_window_mean",  # Structured Streaming replay throughput
]


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def main() -> int:
    import __spark_entry__ as entry_mod
    from kapacitor_spark import get_spark

    spark = get_spark("kapacitor-spark-bench")
    qs = entry_mod.queries()
    names = [n for n in (sys.argv[1:] or HEADLINE) if n in qs]

    # Warm the JVM + parquet footer caches once so per-query numbers measure
    # execution, not first-touch JIT (the reference harness likewise runs
    # inside an already-warm process under go test -bench).
    qs["lambda_where_regex"](spark, SF_DIR).write.format("noop").mode("overwrite").save()

    # Median-of-3 per query (after the process-wide warmup above): the
    # reference harness (go test -bench) loops b.N iterations and reports
    # steady-state per-op time. Single-run numbers on a shared box moved
    # ±30-45% round-over-round on diff-identical code; the median absorbs
    # one bad run per query while staying honest about steady-state cost
    # (min is reported alongside for the optimistic bound).
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))

    def run_once(name: str) -> float:
        t0 = time.time()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    # METHODOLOGY NOTE (deliberate, measured): queries that persist an
    # intermediate (minhash/simhash signatures, rendered lines, decoded
    # image hashes) get CROSS-SAMPLE reuse — each sample builds fresh
    # DataFrames, but Spark's CacheManager dedups by canonical plan, so
    # samples after the first reuse the materialized blocks. Every round
    # of this series has measured that way, so the numbers are
    # comparable round-over-round; they represent the warm/iterative
    # cost. TRUE COLD per-run cost is higher for those queries (measured
    # at sf0.1: minhash 2.6s cold vs 1.0s warm) — clearing the cache
    # between samples was tried and reverted because it silently redefines
    # the whole series' metric mid-flight. SCALE.md records both numbers.

    # one untimed warmup iteration per query: go test -bench discards
    # warm-up iterations the same way, so the samples measure
    # steady-state execution, not each plan's one-time janino/codegen
    # compile (which dominates run 1 for the widest generated
    # expressions, e.g. simhash's 64-term packing)
    warm = {name: run_once(name) for name in names}

    # INTERLEAVED sampling (round-robin over queries, not consecutive
    # runs of one query): ambient load on a shared box arrives in
    # multi-second windows, and consecutive sampling lets one window
    # poison every sample of whichever query it lands on — medians of
    # diff-identical queries moved ±25-45% between benches. Spreading
    # each query's samples across the whole wall-clock span turns a
    # noise window into one bad sample per query, which the median
    # drops. Sub-second queries get 2 extra passes (jitter is a large
    # FRACTION of a 0.3s query, a small one of a 1.5s query).
    samples: dict[str, list[float]] = {name: [] for name in names}
    for _ in range(runs):
        for name in names:
            samples[name].append(run_once(name))
    extra = [n for n in names if warm[n] < 1.0]
    for _ in range(max(0, 5 - runs)):
        for name in extra:
            samples[name].append(run_once(name))

    timings: dict[str, float] = {}
    mins: dict[str, float] = {}
    for name in names:
        ss = sorted(samples[name])
        timings[name] = round(ss[len(ss) // 2], 3)
        mins[name] = round(ss[0], 3)
    total = round(sum(timings.values()), 3)

    print(
        json.dumps(
            {
                "metric": "headline_queries_total_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "queries_min": mins,
                "min_total_sec": round(sum(mins.values()), 3),
                "runs_per_query": runs,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
