"""Bucketed-storage helpers: the co-located-join layout for cluster scale.

At 100 TB the dominant cost of repeated joins/aggregations on the same key
(user_id, doc_id, series key) is the shuffle. Spark's bucketed tables
pre-hash-partition data on disk so that joins and aggregations between
tables bucketed on the same key with the same bucket count run with NO
exchange — each task reads matching buckets from both sides. This module
wraps that layout for the engine's tables.

The reference has no storage layer (it processes in-flight streams); this
is the Spark-native answer to its per-group goroutine pinning
(/root/reference/edge/grouped.go) — group locality comes from the table
layout instead of a scheduler.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession

__all__ = [
    "write_bucketed",
    "read_table_catalog",
    "co_partition",
    "write_time_partitioned",
]


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a DataFrame as a bucketed (and optionally sort-ordered)
    parquet table. Joins/groupBys between tables bucketed on the same
    columns with the same ``num_buckets`` skip the shuffle entirely;
    ``sort_cols`` additionally removes the sort from sort-merge joins and
    ordered-window operators keyed on the bucket columns.

    Size ``num_buckets`` so each bucket is a few hundred MB at the target
    scale (buckets are the parallelism floor for bucket-local reads)."""
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_table_catalog(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog (bucketed) table — bucket metadata flows into the
    plan so Catalyst can elide exchanges."""
    return spark.table(table)


def write_time_partitioned(
    df: DataFrame,
    path: str,
    time_col: str = "time",
    granularity: str = "day",
    mode: str = "append",
) -> None:
    """Write a time-series table partitioned by a date-derived directory
    column (``__pdate``). Time-range queries then prune whole partitions
    at plan time (PartitionFilters in the scan) — the on-disk analog of
    the reference's shard-by-time retention layout. ``granularity``:
    'day' | 'month' | 'hour'."""
    from pyspark.sql import functions as F

    fmt = {"day": "yyyy-MM-dd", "month": "yyyy-MM", "hour": "yyyy-MM-dd-HH"}[granularity]
    out = df.withColumn("__pdate", F.date_format(F.col(time_col), fmt))
    out.write.mode(mode).partitionBy("__pdate").parquet(path)


def co_partition(
    left: DataFrame,
    right: DataFrame,
    keys: Sequence[str],
    num_partitions: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Session-lifetime alternative to bucketing: repartition both sides
    identically on the join keys ONCE, so every subsequent join/agg
    between them on those keys reuses the exchange (Catalyst's
    ReuseExchange + AQE leave the data where it is). Use when the tables
    are derived mid-pipeline and writing a bucketed copy isn't worth it."""
    n = num_partitions or left.sparkSession.sparkContext.defaultParallelism
    cols = list(keys)
    return left.repartition(n, *cols), right.repartition(n, *cols)
