"""Where does a deterministic availableNow replay spend its time?

Runs stream_window_mean's exact body N times on a warm session and prints
per-batch durationMs from the StreamingQuery progress, plus wall splits
(start→first-progress, awaitTermination, table read). Guide §1: measure
before touching the streaming machinery.
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
    from pyspark.sql import functions as F

    from kapacitor_spark import get_spark

    spark = get_spark("stream-floor")
    qs = entry.queries()
    qs["lambda_where_regex"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    from __spark_entry__ import _ckpt, _mem_name, _stream_t

    def one_run(tag: str):
        t0 = time.time()
        sdf = _stream_t(spark, SF_DIR, "events")
        s = F.sum(F.col("value").cast("decimal(20,4)")).cast("double")
        agg = (
            sdf.groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(
                F.count("value").alias("n"),
                s.alias("sum_value"),
                (s / F.count("value")).alias("mean_value"),
            )
            .select(
                F.col("window.start").alias("ts"), "event_type",
                "n", "sum_value", "mean_value",
            )
        )
        t_build = time.time()
        name = _mem_name("floor")
        q = (
            agg.writeStream.format("memory")
            .queryName(name)
            .outputMode("complete")
            .option("checkpointLocation", _ckpt())
            .trigger(availableNow=True)
            .start()
        )
        t_start = time.time()
        q.awaitTermination()
        t_await = time.time()
        n = spark.table(name).count()
        t_read = time.time()
        prog = [json.loads(p.json) for p in q.recentProgress]
        print(
            f"[{tag}] total={t_read - t0:.3f} build={t_build - t0:.3f} "
            f"start()={t_start - t_build:.3f} await={t_await - t_start:.3f} "
            f"read={t_read - t_await:.3f} rows={n} batches={len(prog)}"
        )
        for p in prog:
            d = p.get("durationMs", {})
            print(f"    batch {p.get('batchId')}: {d}")
        spark.catalog.dropTempView(name)

    for i in range(int(os.environ.get("N", "4"))):
        one_run(f"run{i}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
