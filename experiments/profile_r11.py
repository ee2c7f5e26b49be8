"""Round-11 optimization-phase profiler (guide §1: measure first).

For each bench query (headline + extended), separately measures:
  - build_s:  Python-side DataFrame construction (py4j plan building —
              driver work every timed bench run pays before any job);
  - exec_s:   noop-sink execution of the built DataFrame (min over N);
  - jobs/stages/tasks: statusTracker deltas during one execution.

Usage:  python experiments/profile_r11.py [query ...]
Writes one JSON line per query to stdout; plans go to plans/r11/ via
--plans (explain("formatted") of the returned DataFrame).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as entry
    from kapacitor_spark import get_spark

    import bench as bench_mod

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    write_plans = "--plans" in sys.argv
    plans_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r11"
    )
    suffix = "_after" if "--after" in sys.argv else "_before"
    if write_plans:
        os.makedirs(plans_dir, exist_ok=True)

    spark = get_spark("kspark-profile-r11")
    sc = spark.sparkContext
    qs = entry.queries()
    names = args or [
        n for n in bench_mod.HEADLINE + bench_mod.EXTENDED if n in qs
    ]

    # process-wide warmup (same as bench)
    qs["lambda_where_regex"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name in names:
        sc.setJobDescription(f"profile:{name}")
        # warmups: 2 (JIT + cache fills), matching bench methodology
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        build_cold_s = time.time() - t0
        noop(df)
        noop(qs[name](spark, SF_DIR))

        # measured build (warm)
        builds, execs = [], []
        jobs_before = len(sc.statusTracker().getJobIdsForGroup(None) or [])
        for _ in range(3):
            t0 = time.time()
            df = qs[name](spark, SF_DIR)
            t1 = time.time()
            noop(df)
            t2 = time.time()
            builds.append(t1 - t0)
            execs.append(t2 - t1)
        jobs_after = len(sc.statusTracker().getJobIdsForGroup(None) or [])

        if write_plans:
            try:
                pl = qs[name](spark, SF_DIR)
                txt = pl._jdf.queryExecution().explainString(
                    spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                        "formatted"
                    )
                )
                with open(
                    os.path.join(plans_dir, f"{name}{suffix}.txt"), "w"
                ) as f:
                    f.write(txt)
            except Exception as e:  # streaming memory tables etc.
                with open(
                    os.path.join(plans_dir, f"{name}{suffix}.txt"), "w"
                ) as f:
                    f.write(f"explain failed: {e}\n")

        rec = {
            "query": name,
            "build_cold_s": round(build_cold_s, 3),
            "build_min_s": round(min(builds), 3),
            "exec_min_s": round(min(execs), 3),
            "exec_med_s": round(sorted(execs)[1], 3),
            "total_min_s": round(min(b + e for b, e in zip(builds, execs)), 3),
            "jobs_per_run": (jobs_after - jobs_before) / 3.0,
        }
        print(json.dumps(rec), flush=True)
        sc.setJobDescription(None)
    return 0


if __name__ == "__main__":
    sys.exit(main())
