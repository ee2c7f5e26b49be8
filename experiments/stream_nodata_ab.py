"""VERDICT r11 #4: attack the streaming per-run floor.

Decomposes stream_window_mean's availableNow replay (fresh checkpoint
per run, exactly like the bench) and A/Bs
spark.sql.streaming.noDataMicroBatches.enabled for the no-watermark,
complete-mode shape: the trailing NO-DATA batch performs no semantic
work there (no watermark to advance, no processing-time timers;
complete mode re-emits on data batches), but costs a full batch cycle
(planning + state read/commit + memory-sink write).

Usage: python experiments/stream_nodata_ab.py on|off N
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    variant = sys.argv[1]
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from kapacitor_spark import get_spark

    spark = get_spark("stream-nodata-ab")
    if variant == "off":
        spark.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    qs = entry.queries()
    qs["lambda_where_regex"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    times = []
    for i in range(n + 1):
        t0 = time.time()
        out = qs["stream_window_mean"](spark, SF_DIR)
        out.write.format("noop").mode("overwrite").save()
        dt = time.time() - t0
        if i:
            times.append(dt)
    # decompose one run with progress
    from __spark_entry__ import _ckpt, _mem_name, _stream_t
    from kapacitor_spark.streaming import run_available_now

    sdf = _stream_t(spark, SF_DIR, "events")
    s = F.sum(F.col("value").cast("decimal(20,4)")).cast("double")
    agg = (
        sdf.groupBy(F.window("ts", "1 hour"), "event_type")
        .agg(F.count("value").alias("n"), s.alias("sum_value"),
             (s / F.count("value")).alias("mean_value"))
        .select(F.col("window.start").alias("ts"), "event_type", "n",
                "sum_value", "mean_value")
    )
    name = _mem_name("ndab")
    q = (
        agg.writeStream.format("memory").queryName(name)
        .outputMode("complete").option("checkpointLocation", _ckpt())
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    batches = [
        (json.loads(p.json).get("batchId"),
         json.loads(p.json).get("numInputRows"),
         json.loads(p.json).get("durationMs"))
        for p in q.recentProgress
    ]
    print(f"{variant}: min={min(times):.3f} all={[round(t,3) for t in times]}")
    for b in batches:
        print("   batch", b)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
