"""Sensitivity of the availableNow replay to state-partition count.

Same body as stream_floor.py, but sets spark.sql.shuffle.partitions (the
knob that fixes a NEW checkpoint's state partition count) per run.
Also A/Bs the RocksDB state store and unsafe-row checks off.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> int:
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    from kapacitor_spark import get_spark

    spark = get_spark("stream-floor2")
    qs = entry.queries()
    qs["lambda_where_regex"](spark, SF_DIR).write.format("noop").mode(
        "overwrite"
    ).save()

    from __spark_entry__ import _ckpt, _mem_name, _stream_t

    def one_run(tag: str, parts: int | None):
        old = spark.conf.get("spark.sql.shuffle.partitions")
        if parts is not None:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        try:
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
            name = _mem_name("floor2")
            q = (
                agg.writeStream.format("memory")
                .queryName(name)
                .outputMode("complete")
                .option("checkpointLocation", _ckpt())
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            n = spark.table(name).count()
            total = time.time() - t0
            d = q.recentProgress[-1].durationMs if q.recentProgress else {}
            print(f"[{tag}] total={total:.3f} rows={n} durationMs={dict(d)}")
            spark.catalog.dropTempView(name)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

    # warm the streaming machinery once
    one_run("warmup/32", None)
    for parts in (32, 16, 8, 4, 8, 32, 16, 4):
        one_run(f"parts={parts}", parts)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
