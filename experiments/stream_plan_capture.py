"""Capture the EXECUTED streaming plan of stream_window_mean for the
plans/r11 evidence files: the Exchange hashpartitioning(..., N) and
StateStoreSave operators show the state partition count the replay
actually ran with.

Usage: python experiments/stream_plan_capture.py before|after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    from pyspark.sql import functions as F

    from kapacitor_spark import get_spark

    tag = sys.argv[1]
    spark = get_spark("stream-plan")
    from __spark_entry__ import _ckpt, _mem_name, _state_parts, _stream_t

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
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if tag == "after":
        spark.conf.set(
            "spark.sql.shuffle.partitions", str(_state_parts(spark, 3600))
        )
    q = (
        agg.writeStream.format("memory")
        .queryName(_mem_name("plancap"))
        .outputMode("complete")
        .option("checkpointLocation", _ckpt())
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    spark.conf.set("spark.sql.shuffle.partitions", prev)
    plan = q._jsq.explainInternal(False)
    out = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "plans", "r11", f"stream_window_mean_{tag}.txt",
    )
    with open(out, "w") as f:
        f.write(
            f"# Executed streaming plan (availableNow replay), {tag} the r11\n"
            f"# state_partitions change — see Exchange hashpartitioning(..., N)\n"
            f"# and StateStoreSave below for the state partition count.\n"
        )
        f.write(plan)
    print("wrote", out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
