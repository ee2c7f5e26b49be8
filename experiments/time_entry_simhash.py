"""Time the ACTUAL bench entry callables (simhash/minhash/image_dhash)
bench-style on this box, to reproduce BENCH_r09's numbers and attribute
the regression inside the full query (sig fill + blocked + brute +
union-agg), which experiments/stage_time_dedup.py's shared-persist
harness deliberately excludes."""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entry_mod  # noqa: E402
from kapacitor_spark import get_spark  # noqa: E402

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
spark = get_spark("time-entry")
qs = entry_mod.queries()

names = sys.argv[1:] or ["simhash_near_dup", "minhash_near_dup", "image_dhash_near_dup"]
for name in names:
    def once():
        t0 = time.time()
        qs[name](spark, SF).write.format("noop").mode("overwrite").save()
        return time.time() - t0

    once(); once()
    ts = sorted(once() for _ in range(5))
    print(f"{name:28s} min={ts[0]:6.3f} med={ts[len(ts) // 2]:6.3f}", flush=True)
