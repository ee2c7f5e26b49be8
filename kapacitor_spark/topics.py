"""Alert topics: named event buses with per-topic handler subscriptions and
queryable per-topic state (/root/reference/alert/topics.go,
/root/reference/services/alert/ — Topics.Collect routes events to a topic's
handlers; EventState persists last level/time per event ID).

Spark mapping: an alert event DataFrame carries a ``topic`` column
(``Pipeline.alert(..., topic=...)`` or ``.with_topic()``); a
``TopicRegistry`` holds handler subscriptions and dispatches a batch of
events executor-side (``foreachPartition`` — the driver never collects the
event stream; handlers see only their topic's rows). Topic state — the
reference's persisted ``EventState`` map — is a declarative aggregation:
latest level per (topic, event id), one hash-aggregate.
"""

from __future__ import annotations

from typing import Callable, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["TopicRegistry", "topic_state", "save_topic_state", "load_topic_state"]


class TopicRegistry:
    """Handler subscriptions per topic (/root/reference/alert/topics.go
    Topics/Topic.AddHandler). ``"*"`` subscribes to every topic."""

    def __init__(self) -> None:
        self._subs: list[tuple[str, Callable]] = []

    def subscribe(self, topic: str, handler: Callable) -> "TopicRegistry":
        """handler(rows: list[Row]) is invoked with the subset of a
        partition's events whose topic matches."""
        self._subs.append((topic, handler))
        return self

    def dispatch(self, events: DataFrame, topic_col: str = "topic") -> None:
        """Route an event DataFrame to subscribed handlers, executor-side.

        One pass over the data: each partition buckets its rows by topic
        and invokes each matching handler once per partition (mirrors the
        reference's Topic.collect fan-out, alert/topics.go, without a
        driver collect)."""
        subs = list(self._subs)  # closure-captured, shipped to executors

        def per_partition(rows) -> None:
            by_topic: dict[str, list] = {}
            for r in rows:
                by_topic.setdefault(r[topic_col], []).append(r)
            if not by_topic:
                return
            for topic, handler in subs:
                if topic == "*":
                    matched = [r for rs in by_topic.values() for r in rs]
                else:
                    matched = by_topic.get(topic, [])
                if matched:
                    handler(matched)

        events.foreachPartition(per_partition)


def topic_state(
    events: DataFrame,
    dims: Sequence[str],
    topic_col: str = "topic",
    time_col: str = "ts",
    level_col: str = "level",
) -> DataFrame:
    """Current state per (topic, group): the latest event's level, as the
    reference persists per-topic EventState (services/alert/ store). One
    max_by hash-aggregate — no window, no shuffle beyond the group keys."""
    key = F.struct(F.col(time_col), *[F.col(d) for d in dims])
    return events.groupBy(topic_col, *dims).agg(
        F.max_by(level_col, key).alias(level_col),
        F.max(time_col).alias("last_" + time_col),
        F.count(F.lit(1)).alias("n_events"),
    )


def save_topic_state(
    state: DataFrame, path: str, topic_col: str = "topic"
) -> None:
    """Persist topic state, partitioned by topic — the reference's
    persisted EventState store (services/alert/ + alert/topics.go restore
    on startup). Partitioning by topic makes per-topic restore a
    partition-pruned scan."""
    state.write.mode("overwrite").partitionBy(topic_col).parquet(path)


def load_topic_state(spark, path: str) -> DataFrame:
    """Restore persisted topic state (see save_topic_state). Filters on
    the topic column prune to single partitions."""
    return spark.read.parquet(path)
