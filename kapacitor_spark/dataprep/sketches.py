"""Re-aggregatable sketch rollups — the downsampling pattern the
reference serves with continuous queries + influxDBOut() retention
tiers, upgraded for questions plain rollups cannot answer: DISTINCT
counts over arbitrary window unions.

A count/sum rollup re-aggregates (hourly → daily is a sum), but
distinct users per hour do NOT sum to distinct users per day. The HLL
sketch column fixes that: store one small binary sketch per (bucket,
dims) — Spark's Datasketches-backed ``hll_sketch_agg`` — and ANY
coarser question (daily, weekly, whole-corpus, any subset of buckets)
is ``hll_union_agg`` over the stored sketches, never a rescan of the
raw 100 TB. Error is the standard HLL bound (~1.04/sqrt(2^lgk); ~1.6%
at the lgConfigK=12 default), and the estimate is DETERMINISTIC — the
sketch hashes values, so the result is a pure function of the value
SET, independent of partitioning, row order, or cluster size.

Shuffle shape at 100 TB: the rollup is one hash-aggregate with
map-side partial sketches (each task sketches locally; only kilobyte
sketch states shuffle, never values), and every re-aggregation reads
the rollup table — bytes proportional to buckets, not events.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["hll_rollup", "hll_distinct_over"]


def hll_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 hour",
    dims: tuple = (),
    value_col: str = "user_id",
    lgk: int = 12,
) -> DataFrame:
    """Bucketed HLL rollup: (bucket_start, *dims, n_rows, hll binary).

    One hash-aggregate over the raw table — the write-side of the
    retention tier. ``n_rows`` rides along so plain additive rollups
    come from the same table."""
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    return (
        df.groupBy(bucket, *[F.col(d) for d in dims])
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("hll"),
        )
    )


def hll_distinct_over(
    rollup: DataFrame,
    dims: tuple = (),
) -> DataFrame:
    """Distinct-count estimate over ANY grouping of stored sketches:
    union the sketch column per group, estimate once. Reads the rollup
    table only — the raw corpus is never rescanned."""
    g = rollup.groupBy(*[F.col(d) for d in dims]) if dims else rollup.groupBy()
    return g.agg(
        F.sum("n_rows").alias("n_rows"),
        F.hll_sketch_estimate(F.hll_union_agg(F.col("hll"))).alias("approx_distinct"),
    )
