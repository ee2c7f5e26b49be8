"""Autoscale decision state machine — the reference's k8sAutoscale /
swarmAutoscale / ec2Autoscale nodes (/root/reference/autoscale.go:1-315)
re-expressed Spark-first.

The reference runs one `handlePoint` per arriving point against a
node-level per-resource state map (`resourceStates`,
/root/reference/autoscale.go:56): evaluate the replicas lambda, clamp to
[min, max], emit an `{old, new}` event when the desired count changes and
the per-direction cooldown has elapsed, and call the orchestrator client
(`SetReplicas`). The state is keyed by RESOURCE, not by group — multiple
group-by groups can map onto one resource and share its cooldown state
(golden: TestStream_K8sAutoscaleCardinality,
/root/reference/integrations/streamer_test.go:13293).

Spark mapping (three-layer split):

1. **Distributed pre-eval** — the replicas lambda and the resource-id tag
   lookup are pure column expressions, evaluated JVM-side (codegen) before
   any Python runs.
2. **Distributed per-resource walk** — the sequential decide/clamp/cooldown
   machine runs in one Arrow-batched ``applyInPandas`` task per resource
   (shuffle key = resource id). Points per resource can be large; resources
   are the natural parallelism unit, exactly like the reference's one state
   map entry per resource. Points are walked in event-time order (+
   tiebreak) — the deterministic substitute for the reference's arrival
   order.
3. **Driver-side apply** — scaling EVENTS are control-plane tiny (bounded
   by decisions, not points), so they collect to the driver where the
   orchestrator client is called once per event in time order — the same
   seam as alert handlers (sinks.apply_sink). At 100 TB the data plane
   never funnels through the driver; only the decisions do.

Divergence (documented): the reference re-enters the state machine when
`SetReplicas` fails (the failed event's state is not saved,
autoscale.go:252-257); here the walk is computed first and a failing
client raises at apply time. Orchestrator mocks in tests never fail; a
real deployment would wrap the client with retries at this seam.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "AutoscaleStats",
    "K8sAutoscaler",
    "SwarmAutoscaler",
    "Ec2Autoscaler",
    "autoscale_events",
    "decision_step",
]

#: "never" for the cooldown clocks (Go zero time: the first event in each
#: direction always passes, autoscale.go:234-249)
NEVER = -(1 << 62)


def decision_step(
    current: int,
    want: int,
    lo: int,
    hi: int,
    t: int,
    last_inc: int,
    last_dec: int,
    inc_us: int,
    dec_us: int,
) -> tuple[str | None, int, int, int, int]:
    """ONE point through the reference's decide/clamp/cooldown machine
    (autoscale.go:199-249) — the pure core shared by the batch walk and
    the streaming state machine so their semantics cannot drift.

    Returns (action, current, last_inc, last_dec, new) with action in
    (None = no change, 'inc', 'dec', 'drop'); state advances only on
    inc/dec, exactly like the reference's save-on-success."""
    new = int(want)
    if hi > 0 and new > hi:
        new = hi
    if new < lo:
        new = lo
    if new == current:
        return None, current, last_inc, last_dec, new
    if new > current:
        if t < last_inc + inc_us:
            return "drop", current, last_inc, last_dec, new
        return "inc", new, t, last_dec, new
    if t < last_dec + dec_us:
        return "drop", current, last_inc, last_dec, new
    return "dec", new, last_inc, t, new


@dataclass
class AutoscaleStats:
    """The reference's node stat counters (autoscale.go:19-23):
    increase_events / decrease_events / cooldown_drops."""

    increase_events: int = 0
    decrease_events: int = 0
    cooldown_drops: int = 0


class _BaseAutoscaler:
    """Shared resource-id plumbing: a fixed resource name or a tag lookup
    (the reference's ResourceIDFromTags switch, autoscale.go:378-404)."""

    def __init__(self, client, name: str | None, name_tag: str | None):
        if name is None and name_tag is None:
            raise ValueError(
                "expected one of resource name or resource name tag to be set"
            )
        self.client = client
        self._name = name
        self._name_tag = name_tag
        self.stats = AutoscaleStats()

    def resource_id_column(self) -> Column:
        if self._name is not None:
            return F.lit(self._name)
        return F.col(self._name_tag)

    # subclasses: replicas(rid) -> int; set_replicas(rid, n); output_tags(rid)


class K8sAutoscaler(_BaseAutoscaler):
    """k8sAutoscale (/root/reference/autoscale.go:320-447;
    pipeline/k8s_autoscale.go defaults: kind='deployments',
    namespaceTag/kindTag/resourceTag = namespace/kind/resource).

    ``client`` mirrors the reference's mock seam
    (integrations k8stest.Client): ``scales_get(kind, name) -> int`` and
    ``scales_update(kind, name, replicas)``.
    """

    def __init__(
        self,
        client,
        resource_name: str | None = None,
        resource_name_tag: str | None = None,
        namespace: str | None = None,
        kind: str = "deployments",
        namespace_tag: str = "namespace",
        kind_tag: str = "kind",
        resource_tag: str = "resource",
    ):
        super().__init__(client, resource_name, resource_name_tag)
        self.namespace = namespace or "default"
        self.kind = kind
        self.namespace_tag = namespace_tag
        self.kind_tag = kind_tag
        self.resource_tag = resource_tag

    def replicas(self, rid: str) -> int:
        return int(self.client.scales_get(self.kind, rid))

    def set_replicas(self, rid: str, n: int) -> None:
        self.client.scales_update(self.kind, rid, int(n))

    def output_tags(self, rid: str) -> dict:
        tags = {}
        if self.namespace_tag:
            tags[self.namespace_tag] = self.namespace
        if self.kind_tag:
            tags[self.kind_tag] = self.kind
        if self.resource_tag:
            tags[self.resource_tag] = rid
        return tags


class SwarmAutoscaler(_BaseAutoscaler):
    """swarmAutoscale (/root/reference/autoscale.go:452-540).
    ``client``: ``service_replicas(name) -> int``;
    ``update_service(name, replicas)``."""

    def __init__(
        self,
        client,
        service_name: str | None = None,
        service_name_tag: str | None = None,
        output_service_name_tag: str | None = None,
    ):
        super().__init__(client, service_name, service_name_tag)
        # default output tag = the input tag (autoscale.go:465-468)
        self.output_tag = output_service_name_tag or service_name_tag

    def replicas(self, rid: str) -> int:
        return int(self.client.service_replicas(rid))

    def set_replicas(self, rid: str, n: int) -> None:
        self.client.update_service(rid, int(n))

    def output_tags(self, rid: str) -> dict:
        return {self.output_tag: rid} if self.output_tag else {}


class Ec2Autoscaler(_BaseAutoscaler):
    """ec2Autoscale (/root/reference/autoscale.go:545-627).
    ``client``: ``group_capacity(name) -> int``; ``update_group(name, n)``."""

    def __init__(
        self,
        client,
        group_name: str | None = None,
        group_name_tag: str | None = None,
        output_group_name_tag: str | None = None,
    ):
        super().__init__(client, group_name, group_name_tag)
        self.output_tag = output_group_name_tag or group_name_tag

    def replicas(self, rid: str) -> int:
        return int(self.client.group_capacity(rid))

    def set_replicas(self, rid: str, n: int) -> None:
        self.client.update_group(rid, int(n))

    def output_tags(self, rid: str) -> dict:
        return {self.output_tag: rid} if self.output_tag else {}


def autoscale_events(
    df: DataFrame,
    time_col: str,
    dims: tuple[str, ...],
    tiebreak: tuple[str, ...],
    autoscaler,
    replicas: Column,
    *,
    min: int = 1,
    max: int = 0,
    increase_cooldown: float = 0.0,
    decrease_cooldown: float = 0.0,
    current_fn: Callable[[dict, int], int] | None = None,
    apply: bool = True,
) -> DataFrame:
    """Run the decision machine; return the events DataFrame
    (time, dims..., output tags..., new, old) and — when ``apply`` — call
    the orchestrator client once per event in time order, accumulating
    ``autoscaler.stats``.

    ``replicas`` is the pre-compiled desired-count Column (stateless
    lambda, the reference's common case). ``current_fn(fields, current)``
    is the `.currentField()` path — the desired count depends on the
    CURRENT replica value, which only exists inside the walk, so it must
    be a Python callable evaluated per point (the reference injects
    `current` into the lambda scope the same way, autoscale.go:299-301).
    """
    if min < 1:
        # newAutoscaleNode validation (autoscale.go:84-86)
        raise ValueError(f"minimum count must be >= 1, got {min}")
    spark = df.sparkSession
    work = df.withColumn("__rid", autoscaler.resource_id_column())
    # a point whose tags produce no resource name is an error in the
    # reference (logged, point dropped) — same drop here
    work = work.filter(F.col("__rid").isNotNull() & (F.col("__rid") != ""))
    if current_fn is None:
        work = work.withColumn("__want", replicas.cast("long"))
    # two actions read work (distinct rids, then the decision walk) — one
    # materialization instead of two full scans + lambda evaluations
    work = work.persist()

    # -- driver: fetch initial replica counts (one client call per
    #    resource; resources are control-plane small) -------------------
    rids = [r[0] for r in work.select("__rid").distinct().collect()]
    initial = {rid: int(autoscaler.replicas(rid)) for rid in rids}

    dims = tuple(dims)
    order = [time_col, *tiebreak]
    lo, hi = int(min), int(max)
    inc_us = round(increase_cooldown * 1_000_000)
    dec_us = round(decrease_cooldown * 1_000_000)
    fields_cols = (
        [c for c in df.columns if c not in (time_col, *dims)]
        if current_fn is not None
        else []
    )

    out_schema = T.StructType(
        [
            T.StructField("__rid", T.StringType()),
            T.StructField(time_col, work.schema[time_col].dataType),
            *[T.StructField(d, work.schema[d].dataType) for d in dims],
            T.StructField("old", T.LongType()),
            T.StructField("new", T.LongType()),
            T.StructField("__action", T.StringType()),
            # per-resource decision sequence: same-timestamp decisions must
            # replay against the client in walk order (Spark sorts are not
            # stable, so (time, rid) alone could swap them)
            T.StructField("__seq", T.LongType()),
        ]
    )
    out_cols = [f.name for f in out_schema.fields]

    def walk_vectorized(pdf: pd.DataFrame) -> pd.DataFrame:
        """Zero-cooldown fast path, pure numpy: with no cooldown clock the
        machine's state after EVERY point equals that point's clamped
        desired count (a blocked change is impossible, so current always
        catches up), hence events are exactly "clamped value != previous
        clamped value, seeded with the initial count" — one shift+compare
        instead of a per-row Python walk. Equality with the sequential
        core is pinned by test_autoscale_vectorized_matches_walk."""
        import numpy as np

        pdf = pdf.sort_values(order, kind="stable")
        rid = pdf["__rid"].iat[0]
        want = pd.to_numeric(pdf["__want"], errors="coerce").to_numpy(
            dtype="float64"
        )
        keep = ~np.isnan(want)
        sub = pdf.loc[keep]
        cl = want[keep]
        if hi > 0:
            cl = np.minimum(cl, hi)
        cl = np.maximum(cl, lo).astype("int64")
        prev = np.concatenate(([initial[rid]], cl[:-1]))
        mask = cl != prev
        ev = sub.loc[mask]
        out = pd.DataFrame(
            {
                "__rid": rid,
                time_col: ev[time_col].to_numpy(),
                **{d: ev[d].to_numpy() for d in dims},
                "old": prev[mask],
                "new": cl[mask],
                "__action": np.where(cl[mask] > prev[mask], "inc", "dec"),
                "__seq": np.arange(int(mask.sum()), dtype="int64"),
            },
            columns=out_cols,
        )
        return out

    def walk(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="stable")
        rid = pdf["__rid"].iat[0]
        current = initial[rid]
        last_inc = last_dec = NEVER
        times_us = pdf[time_col].to_numpy(dtype="datetime64[us]").astype("int64")
        if current_fn is None:
            want = pdf["__want"].to_numpy(dtype=object)
        rows = []
        for i in range(len(pdf)):
            if current_fn is not None:
                fields = {c: pdf[c].iat[i] for c in fields_cols}
                try:
                    w = current_fn(fields, current)
                except Exception:
                    continue  # EvalInt error → point dropped (diag'd)
            else:
                w = want[i]
            if w is None or pd.isna(w):
                continue
            old = current
            action, current, last_inc, last_dec, new = decision_step(
                current, w, lo, hi, int(times_us[i]),
                last_inc, last_dec, inc_us, dec_us,
            )
            if action is None:
                continue
            rows.append(
                (
                    rid,
                    pdf[time_col].iat[i],
                    *[pdf[d].iat[i] for d in dims],
                    old,
                    new,
                    action,
                    len(rows),
                )
            )
        return pd.DataFrame(rows, columns=out_cols)

    fast = current_fn is None and inc_us == 0 and dec_us == 0
    decisions = work.groupBy("__rid").applyInPandas(
        walk_vectorized if fast else walk, schema=out_schema
    ).persist()

    # -- driver: stats from ONE tiny aggregate, client replay over a
    #    NARROW projection (rid, new) — the event rows themselves never
    #    round-trip through the driver (they used to be collected AND
    #    re-shipped via createDataFrame: 2x the event volume moved for
    #    nothing; at sf0.1 that was ~85k rows each way) ------------------
    st = autoscaler.stats
    counts = {
        r["__action"]: r["cnt"]
        for r in decisions.groupBy("__action")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    }
    st.cooldown_drops += counts.get("drop", 0)
    st.increase_events += counts.get("inc", 0)
    st.decrease_events += counts.get("dec", 0)
    if apply:
        # orchestrator calls happen once per event in time order — the
        # control-plane seam; only (time, rid, new) collects
        for r in (
            decisions.filter(F.col("__action") != "drop")
            .select(time_col, "__rid", "__seq", "new")
            .orderBy(time_col, "__rid", "__seq")
            .collect()
        ):
            autoscaler.set_replicas(r["__rid"], int(r["new"]))
    work.unpersist()

    # -- distributed event construction: broadcast the (control-plane
    #    small) rid → output-tags map and join it onto the decisions -----
    tag_names: list[str] = []
    dim_overrides: list[str] = []
    for rid in rids:
        for k in autoscaler.output_tags(rid):
            if k in dims:
                if k not in dim_overrides:
                    dim_overrides.append(k)
            elif k not in tag_names:
                tag_names.append(k)
    tags_schema = T.StructType(
        [
            T.StructField("__rid", T.StringType()),
            *[T.StructField(f"__dtag_{d}", T.StringType()) for d in dim_overrides],
            *[T.StructField(f"__tag_{k}", T.StringType()) for k in tag_names],
        ]
    )
    tags_rows = [
        (
            rid,
            *[autoscaler.output_tags(rid).get(d) for d in dim_overrides],
            *[autoscaler.output_tags(rid).get(k) for k in tag_names],
        )
        for rid in rids
    ]
    from kapacitor_spark.session import local_df

    tags_df = local_df(spark, tags_rows, tags_schema)  # tiny broadcast side (r12)
    ev = decisions.filter(F.col("__action") != "drop").join(
        F.broadcast(tags_df), "__rid"
    )
    dim_cols = [
        (
            F.coalesce(
                F.col(f"__dtag_{d}").cast(work.schema[d].dataType), F.col(d)
            ).alias(d)
            if d in dim_overrides
            else F.col(d)
        )
        for d in dims
    ]
    out = ev.orderBy(time_col, "__rid", "__seq").select(
        F.col(time_col),
        *dim_cols,
        *[F.col(f"__tag_{k}").alias(k) for k in tag_names],
        F.col("new").cast("long"),
        F.col("old").cast("long"),
    )
    # events are control-plane small (decisions, not points): materialize
    # them eagerly so the persisted `decisions` walk output can be released
    # NOW — returning a lazy view over it would leak the cache entry for
    # the caller's lifetime (repeated autoscale batches would accumulate
    # cached partitions until LRU eviction thrashes other caches). The
    # orderBy restores the global (time, resource, walk-seq) event order
    # the pre-r7 collect-and-rebuild output had.
    out = out.localCheckpoint(eager=True)
    decisions.unpersist()
    return out
