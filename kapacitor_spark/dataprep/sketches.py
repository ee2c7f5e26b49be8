"""Re-aggregatable sketch rollups — the downsampling pattern the
reference serves with continuous queries + influxDBOut() retention
tiers, upgraded for questions plain rollups cannot answer: DISTINCT
counts over arbitrary window unions, distinct-set ALGEBRA
(intersection/difference — retention and churn), and mergeable
QUANTILES.

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

HLL unions only. Two sibling sketch families round out the algebra:

* **Theta sketches** (``theta_sketch_agg`` / ``theta_union_agg`` /
  ``theta_intersection`` / ``theta_difference``) support set
  INTERSECTION and DIFFERENCE — "users active on day d AND d+1"
  (retention), "on d but not d+1" (churn), "on d+1 but not d" (new) —
  questions no union-only sketch can answer without a rescan. While a
  sketch holds ≤ 2^lgNomEntries hashed keys it is in EXACT mode (it IS
  the hashed set), so estimates — including intersections and
  differences of exact sketches — are exactly the true distinct
  counts; past that they degrade to the published theta bounds. Either
  way the result is a pure function of the value set (keys are hashed,
  order- and partitioning-independent).

* **KLL quantile sketches** (``kll_sketch_agg_double`` /
  ``kll_merge_agg_double`` / ``kll_sketch_get_quantile_double``):
  quantiles do not re-aggregate at all (the p90 of hourly p90s is not
  the daily p90), so plain rollups simply cannot serve them. A KLL
  column per bucket makes any union of buckets answerable by merging
  kilobyte sketches. While the merged item count stays ≤ k the sketch
  retains every item and ``get_quantile`` is the EXACT inclusive order
  statistic (bit-for-bit ``percentile_disc``); beyond k, compaction
  samples (randomized) and answers carry the ~1.65%·(200/k)-scaled
  rank-error bound — callers that need determinism at 100 TB size k to
  the bucket, not the union.

Shuffle shape at 100 TB: the rollup is one hash-aggregate with
map-side partial sketches (each task sketches locally; only kilobyte
sketch states shuffle, never values), and every re-aggregation reads
the rollup table — bytes proportional to buckets, not events.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = [
    "hll_rollup",
    "hll_distinct_over",
    "theta_rollup",
    "theta_retention",
    "kll_rollup",
    "kll_quantiles_over",
]


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


def theta_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 day",
    dims: tuple = (),
    value_col: str = "user_id",
    lgk: int = 14,
) -> DataFrame:
    """Bucketed theta-sketch rollup: (bucket, *dims, n_rows, theta
    binary). Same one-hash-aggregate shape as :func:`hll_rollup`, but
    the stored sketch supports intersection/difference downstream.
    lgk=14 (16384 nominal entries) keeps the sketch in exact mode for
    dimensions-style key spaces; raise it when a single bucket can see
    more distinct keys than that and the consumer needs exactness."""
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    return df.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.theta_sketch_agg(F.col(value_col), F.lit(lgk)).alias("theta"),
    )


def _theta_est(col: Column) -> Column:
    # Exact-mode estimates are integral-valued doubles; round() guards
    # the (estimation-mode) fractional case before the long cast.
    return F.round(F.theta_sketch_estimate(col)).cast("long")


def theta_retention(
    rollup: DataFrame,
    step: str = "1 day",
    dims: tuple = (),
) -> DataFrame:
    """Consecutive-bucket set algebra over a stored theta rollup:
    for every bucket pair (b, b+step) present in the rollup, the
    distinct keys RETAINED (in both), CHURNED (in b, gone from
    b+step) and NEW (in b+step only) — the retention/churn triple a
    union-only sketch cannot produce. Reads ONLY the rollup table: a
    self-equi-join on (bucket+step, *dims) — broadcastable, since the
    rollup has one row per bucket — then three pure sketch
    expressions per row; the raw corpus is never rescanned.

    Output: (bucket, *dims, n_rows, retained, churned, new_keys)
    where `bucket` is the EARLIER bucket of each pair."""
    a = rollup.alias("a")
    b = rollup.alias("b")
    cond = F.col("b.bucket") == F.col("a.bucket") + F.expr(f"INTERVAL {step}")
    for d in dims:
        cond = cond & (F.col(f"b.{d}") == F.col(f"a.{d}"))
    inter = F.theta_intersection(F.col("a.theta"), F.col("b.theta"))
    return (
        a.join(b, cond)
        .select(
            F.col("a.bucket").alias("bucket"),
            *[F.col(f"a.{d}").alias(d) for d in dims],
            F.col("a.n_rows").alias("n_rows"),
            _theta_est(inter).alias("retained"),
            _theta_est(
                F.theta_difference(F.col("a.theta"), F.col("b.theta"))
            ).alias("churned"),
            _theta_est(
                F.theta_difference(F.col("b.theta"), F.col("a.theta"))
            ).alias("new_keys"),
        )
    )


def kll_rollup(
    df: DataFrame,
    time_col: str = "ts",
    every: str = "1 hour",
    dims: tuple = (),
    value_col: str = "value",
    k: int = 8192,
) -> DataFrame:
    """Bucketed KLL quantile rollup: (bucket, *dims, n_rows, kll
    binary) over a DOUBLE value column. One hash-aggregate with
    map-side partial sketches; only the ~k-item sketch states shuffle.
    While a bucket holds ≤ k items the sketch is exact (see module
    docstring); k=8192 costs ≤ 64 KiB per bucket worst-case."""
    bucket = F.window(F.col(time_col), every).start.alias("bucket")
    return df.groupBy(bucket, *[F.col(d) for d in dims]).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.kll_sketch_agg_double(F.col(value_col), F.lit(k)).alias("kll"),
    )


def kll_quantiles_over(
    rollup: DataFrame,
    dims: tuple = (),
    quantiles: tuple = (0.5, 0.9),
) -> DataFrame:
    """Quantiles over ANY grouping of stored KLL sketches: merge the
    sketch column per group (kilobytes per bucket, never raw values),
    query once per requested quantile. `pNN` columns are the inclusive
    order statistic — exact while the merged item count stays ≤ k,
    within the KLL rank bound beyond."""
    g = rollup.groupBy(*[F.col(d) for d in dims]) if dims else rollup.groupBy()
    merged = g.agg(
        F.sum("n_rows").alias("n_rows"),
        F.kll_merge_agg_double(F.col("kll")).alias("kll"),
    )
    qcols = [
        F.kll_sketch_get_quantile_double(F.col("kll"), F.lit(float(q))).alias(
            "p" + str(q).replace("0.", "").ljust(2, "0")
        )
        for q in quantiles
    ]
    return merged.select(*[F.col(d) for d in dims], F.col("n_rows"), *qcols)
