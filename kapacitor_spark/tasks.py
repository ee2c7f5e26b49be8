"""Batch task scheduling — the ``batch|query()`` analog (SURVEY §2.1, §3.3).

Reference: a BatchTask periodically (every/cron + offset + align) runs a
SELECT against InfluxDB with injected ``time >= start AND time < stop``
bounds (/root/reference/batch.go:168-566 tickers + doQuery;
/root/reference/query.go:21-112 time-bound injection), and can enumerate
historical windows for replay/backfill (/root/reference/task.go:278-292
Queries()).

Spark mapping: the "query" is any Pipeline-producing function over a source
table; scheduling enumerates [start, stop) windows (pure event-time
arithmetic — deterministic and testable without a wall clock) and each
window's run applies the time predicate, which Catalyst pushes into the
parquet/source scan. A live deployment drives ``run_window`` from any
scheduler (cron, Airflow, a Structured Streaming ProcessingTime trigger);
the engine itself stays clock-free.
"""

from __future__ import annotations

from dataclasses import dataclass
from datetime import datetime, timedelta, timezone
from typing import Callable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kapacitor_spark.durations import parse_duration

__all__ = ["BatchQuery", "batch_envelope", "batch_reduce"]


def _floor_to(t: datetime, seconds: float) -> datetime:
    epoch = t.timestamp()
    return datetime.fromtimestamp(epoch - epoch % seconds, tz=timezone.utc)


@dataclass(frozen=True)
class BatchQuery:
    """query(q).period(p).every(e).offset(o).align() —
    /root/reference/pipeline/batch.go:53-200.

    period: window length; every: schedule interval; offset: shift the
    window back from the trigger time; align: truncate trigger times to
    multiples of ``every`` (/root/reference/batch.go:439-517 timeTicker).
    """

    period: str | float
    every: str | float | None = None
    offset: str | float = 0.0
    align: bool = True

    def windows(
        self, start: datetime | str, stop: datetime | str
    ) -> Iterator[tuple[datetime, datetime]]:
        """Enumerate [qstart, qstop) pairs covering [start, stop) — the
        Queries() replay/backfill surface (/root/reference/batch.go:124-158)."""
        p = parse_duration(self.period)
        e = parse_duration(self.every) if self.every is not None else p
        off = parse_duration(self.offset) if self.offset else 0.0
        t0 = datetime.fromisoformat(start).replace(tzinfo=timezone.utc) if isinstance(start, str) else start
        t1 = datetime.fromisoformat(stop).replace(tzinfo=timezone.utc) if isinstance(stop, str) else stop
        # a tick at T queries [T-period, T): ticks lie in (start, stop] so
        # the yielded windows exactly tile the data range
        tick = (_floor_to(t0, e) if self.align else t0) + timedelta(seconds=e)
        while tick <= t1:
            qstop = tick - timedelta(seconds=off)
            qstart = qstop - timedelta(seconds=p)
            yield (qstart, qstop)
            tick += timedelta(seconds=e)

    def run_window(
        self,
        source: DataFrame,
        window: tuple[datetime, datetime],
        time_col: str = "time",
    ) -> DataFrame:
        """Apply the injected time bounds for one window — the analog of
        SetStartTime/SetStopTime (/root/reference/query.go:37-60). The
        [start, stop) predicate reaches the source scan via pushdown."""
        qstart, qstop = window
        return source.filter(
            (F.col(time_col) >= F.lit(qstart.replace(tzinfo=None)))
            & (F.col(time_col) < F.lit(qstop.replace(tzinfo=None)))
        )

    def backfill(
        self,
        source: DataFrame,
        start: datetime | str,
        stop: datetime | str,
        fn: Callable[[DataFrame], DataFrame] | None = None,
        time_col: str = "time",
    ) -> DataFrame:
        """Run every window in [start, stop) and union the results, tagging
        each with its window start — replay/backfill in one declarative
        plan (each window's filter still pushes down; Catalyst unions the
        scans)."""
        outs = []
        for w in self.windows(start, stop):
            df = self.run_window(source, w, time_col)
            if fn is not None:
                df = fn(df)
            outs.append(df.withColumn("query_start", F.lit(w[0].replace(tzinfo=None))))
        if not outs:
            raise ValueError("no windows in range")
        out = outs[0]
        for o in outs[1:]:
            out = out.unionByName(o)
        return out


def batch_envelope(
    points: DataFrame, keys: list[str], time_col: str = "time"
) -> DataFrame:
    """One row per (batch, group) key with the batch time = max point time
    (/root/reference/edge/messages.go:376) — captured BEFORE any filter so
    a batch whose points are all filtered away still exists as an edge
    message (the reference's where() forwards the empty batch envelope)."""
    return points.groupBy(*keys).agg(F.max(time_col).alias(time_col))


def batch_reduce(
    points: DataFrame,
    envelope: DataFrame,
    keys: list[str],
    aggs: list,
    fill: dict | None = None,
) -> DataFrame:
    """Reduce each batch to one point per (batch, group) — batch-edge
    aggregation (SURVEY §2.5: on a batch edge the whole batch reduces to
    one point). Joining back onto the envelope preserves the reference's
    EMPTY-batch emission: count and sum over a fully-filtered batch emit
    0 (golden TestBatch_CountEmptyBatch / _SumEmptyBatch,
    /root/reference/integrations/batcher_test.go:765,816); ``fill`` maps
    output columns to their empty-batch value. Both sides group on the
    same keys — one shuffle, broadcast-friendly envelope."""
    agg_df = points.groupBy(*keys).agg(*aggs)
    out = envelope.join(agg_df, keys, "left")
    for c, v in (fill or {}).items():
        out = out.withColumn(c, F.coalesce(F.col(c), F.lit(v)))
    return out
