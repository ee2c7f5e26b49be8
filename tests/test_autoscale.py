"""Autoscale decision state machine — golden parity with the reference's
own integration tests:

* TestStream_Autoscale (/root/reference/integrations/streamer_test.go:11697)
  — k8s + swarm, default and .min(3).max(500) variants, replaying
  TestStream_Autoscale.srpl; asserts the reference's inline expected
  httpOut rows AND the exact per-service SetReplicas call sequences
  (expUpdatesByService / expMinMaxUpdatesByService).
* TestStream_K8sAutoscaleCardinality (streamer_test.go:13293) — many
  group-by groups sharing ONE resource share its state: exactly one
  increase event, zero decreases, zero cooldown drops.

Plus unit coverage the reference keeps in autoscale.go semantics:
cooldown drops, min validation, ec2 client seam.
"""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kapacitor_spark import Pipeline
from kapacitor_spark.operators.autoscale import (
    Ec2Autoscaler,
    K8sAutoscaler,
    SwarmAutoscaler,
)
from kapacitor_spark.sources.line_protocol import promote, replay_srpl
from kapacitor_spark.tick import run_tickscript

FIXTURES = "/root/reference/integrations/testdata"
Z = dt.timezone.utc


def _ts(second: int) -> dt.datetime:
    return dt.datetime(1971, 1, 1, 0, 0, second, tzinfo=Z)


class MockK8s:
    """integrations k8stest.Client: serviceA starts at 1 replica,
    serviceB at 10 (streamer_test.go TestStream_Autoscale setup)."""

    def __init__(self):
        self.updates = []

    def scales_get(self, kind, name):
        return {"serviceA": 1, "serviceB": 10}.get(name, 0)

    def scales_update(self, kind, name, replicas):
        self.updates.append((name, replicas))

    def by_service(self):
        out = {}
        for name, n in self.updates:
            out.setdefault(name, []).append(n)
        return out


class MockSwarm:
    def __init__(self):
        self.updates = []

    def service_replicas(self, name):
        return {"serviceA": 1, "serviceB": 10}.get(name, 0)

    def update_service(self, name, replicas):
        self.updates.append((name, replicas))

    def by_service(self):
        out = {}
        for name, n in self.updates:
            out.setdefault(name, []).append(n)
        return out


class MockEc2:
    def __init__(self, initial):
        self.initial = initial
        self.updates = []

    def group_capacity(self, name):
        return self.initial.get(name, 0)

    def update_group(self, name, n):
        self.updates.append((name, n))


@pytest.fixture(scope="module")
def scale_df(spark):
    raw = replay_srpl(spark, f"{FIXTURES}/TestStream_Autoscale.srpl")
    return promote(
        raw.filter("name = 'scale'"), "scale",
        float_fields=["replicas"], tag_cols=["deployment"],
    )


EXP_UPDATES = {"serviceA": [2, 1, 1000, 2], "serviceB": [20, 1, 1000, 20]}
EXP_MINMAX_UPDATES = {"serviceA": [3, 500, 3], "serviceB": [20, 3, 500, 20]}
# httpOut snapshot = the LAST event per group (streamer_test.go inline
# expected: time 00:00:04, new/old per service)
EXP_LAST = {"serviceA": (_ts(4), 2, 1000), "serviceB": (_ts(4), 20, 1000)}
EXP_MINMAX_LAST = {"serviceA": (_ts(4), 3, 500), "serviceB": (_ts(4), 20, 500)}


def _last_events(df, tag):
    rows = df.orderBy("time").collect()
    out = {}
    for r in rows:
        out[r[tag]] = (r["time"].replace(tzinfo=Z), r["new"], r["old"])
    return out, rows


def test_k8s_autoscale_golden(spark, scale_df):
    client = MockK8s()
    scaler = K8sAutoscaler(client, resource_name_tag="deployment")
    out = (
        Pipeline.from_df(scale_df, time_col="time")
        .group_by("deployment")
        .autoscale(scaler, 'lambda: int("replicas")')
    )
    last, rows = _last_events(out.df, "deployment")
    assert client.by_service() == EXP_UPDATES
    assert last == EXP_LAST
    # emitted points carry the k8s resource tags (autoscale.go:262-270 +
    # SetResourceIDOnTags with default namespace/kind/resource tags)
    for r in rows:
        assert r["namespace"] == "default"
        assert r["kind"] == "deployments"
        assert r["resource"] == r["deployment"]
    assert scaler.stats.increase_events + scaler.stats.decrease_events == 8
    assert scaler.stats.cooldown_drops == 0


def test_k8s_autoscale_minmax_golden(spark, scale_df):
    client = MockK8s()
    scaler = K8sAutoscaler(client, resource_name_tag="deployment")
    out = (
        Pipeline.from_df(scale_df, time_col="time")
        .group_by("deployment")
        .autoscale(scaler, 'lambda: int("replicas")', min=3, max=500)
    )
    last, _ = _last_events(out.df, "deployment")
    assert client.by_service() == EXP_MINMAX_UPDATES
    assert last == EXP_MINMAX_LAST


def test_swarm_autoscale_golden_tickscript(spark, scale_df):
    """Swarm variant through the TICKscript front-end — the exact
    reference script template (scriptTmpl, streamer_test.go:11922)."""
    script = """
stream
    |from()
        .measurement('scale')
        .groupBy('deployment')
    |swarmAutoscale()
        .serviceNameTag('deployment')
        .replicas(lambda: int("replicas"))
    |httpOut('TestStream_Autoscale')
"""
    client = MockSwarm()
    outputs = run_tickscript(
        script, {"scale": scale_df}, autoscale_clients={"swarm": client}
    )
    last, rows = _last_events(outputs["TestStream_Autoscale"], "deployment")
    assert client.by_service() == EXP_UPDATES
    assert last == EXP_LAST
    # swarm output tags: just the service-name tag (autoscale.go:536-540)
    assert set(rows[0].asDict()) == {"time", "deployment", "new", "old"}


def test_swarm_autoscale_minmax_golden_tickscript(spark, scale_df):
    script = """
stream
    |from()
        .measurement('scale')
        .groupBy('deployment')
    |swarmAutoscale()
        .serviceNameTag('deployment')
        .replicas(lambda: int("replicas"))
        .min(3)
        .max(500)
    |httpOut('TestStream_Autoscale')
"""
    client = MockSwarm()
    outputs = run_tickscript(
        script, {"scale": scale_df}, autoscale_clients={"swarm": client}
    )
    last, _ = _last_events(outputs["TestStream_Autoscale"], "deployment")
    assert client.by_service() == EXP_MINMAX_UPDATES
    assert last == EXP_MINMAX_LAST


def test_k8s_autoscale_cardinality(spark):
    """TestStream_K8sAutoscaleCardinality: 90 cpu points in 9 host×cpu
    groups, ONE fixed resource 'a' (initial 0 replicas), replicas
    lambda: int(0) → clamped to min 1 → exactly one increase event; every
    later point (any group) sees current=1 and emits nothing. State is
    per-resource, not per-group (autoscale.go:56 resourceStates)."""
    raw = replay_srpl(spark, f"{FIXTURES}/TestStream_Cardinality.srpl")
    cpu = promote(
        raw.filter("name = 'cpu'"), "cpu",
        float_fields=["value"], tag_cols=["host", "cpu"],
    )
    client = MockK8s()
    scaler = K8sAutoscaler(client, resource_name="a")
    p = Pipeline.from_df(cpu, time_col="time").group_by("host", "cpu")
    assert p.cardinality() == 9  # working_cardinality golden
    out = p.autoscale(scaler, "lambda: int(0)")
    assert out.df.count() == 1
    assert scaler.stats.increase_events == 1
    assert scaler.stats.decrease_events == 0
    assert scaler.stats.cooldown_drops == 0
    assert client.updates == [("a", 1)]


def test_autoscale_cooldown_drops(spark):
    """Cooldown semantics (autoscale.go:229-249): a change in the same
    direction within the cooldown is DROPPED and state is not saved, so
    the desired count re-triggers once the window opens."""
    rows = [
        (_ts(0), "g", 5.0),
        (_ts(2), "g", 8.0),   # +: within 10s of t0 increase → drop
        (_ts(12), "g", 8.0),  # +: cooldown open → event 5→8
        (_ts(13), "g", 2.0),  # -: first decrease → event 8→2
        (_ts(14), "g", 1.0),  # -: within decrease cooldown → drop
    ]
    df = spark.createDataFrame(rows, ["time", "svc", "replicas"])
    client = MockSwarm()
    scaler = SwarmAutoscaler(client, service_name_tag="svc")
    out = (
        Pipeline.from_df(df, time_col="time")
        .group_by("svc")
        .autoscale(
            scaler, F.col("replicas"),
            increase_cooldown="10s", decrease_cooldown="10s",
        )
    )
    got = [(r["old"], r["new"]) for r in out.df.orderBy("time").collect()]
    # t0: initial 0 → 5 is an increase (first event always passes)
    assert got == [(0, 5), (5, 8), (8, 2)]
    assert scaler.stats.cooldown_drops == 2
    assert client.updates == [("g", 5), ("g", 8), ("g", 2)]


def test_autoscale_min_validation(spark):
    df = spark.createDataFrame([(_ts(0), "g", 1.0)], ["time", "svc", "replicas"])
    scaler = SwarmAutoscaler(MockSwarm(), service_name_tag="svc")
    with pytest.raises(ValueError, match="minimum count must be >= 1"):
        Pipeline.from_df(df, time_col="time").group_by("svc").autoscale(
            scaler, F.col("replicas"), min=0
        )


def test_ec2_autoscale_basic(spark):
    """ec2Autoscale: same machine, group-capacity client seam
    (autoscale.go:545-627); output tag defaults to the input tag."""
    rows = [(_ts(0), "asg1", 4.0), (_ts(1), "asg1", 9.0)]
    df = spark.createDataFrame(rows, ["time", "group", "replicas"])
    client = MockEc2({"asg1": 4})
    scaler = Ec2Autoscaler(client, group_name_tag="group")
    out = (
        Pipeline.from_df(df, time_col="time")
        .group_by("group")
        .autoscale(scaler, F.col("replicas"))
    )
    got = out.df.collect()
    assert [(r["group"], r["old"], r["new"]) for r in got] == [("asg1", 4, 9)]
    assert client.updates == [("asg1", 9)]


def test_autoscale_current_fn(spark):
    """.currentField path: the desired count depends on the CURRENT
    replica value (reference injects `current` into the lambda scope,
    autoscale.go:299-301) — here a Python callable evaluated inside the
    per-resource walk. Doubling with max: 2 → 4 → 8, capped at 8."""
    rows = [(_ts(i), "g", 1.0) for i in range(4)]
    df = spark.createDataFrame(rows, ["time", "svc", "load"])
    client = MockSwarm()
    client.initial = {"g": 2}
    scaler = SwarmAutoscaler(client, service_name_tag="svc")
    client.service_replicas = lambda name: 2
    out = (
        Pipeline.from_df(df, time_col="time")
        .group_by("svc")
        .autoscale(
            scaler, None, max=8,
            current_fn=lambda fields, current: current * 2,
        )
    )
    got = [(r["old"], r["new"]) for r in out.df.orderBy("time").collect()]
    assert got == [(2, 4), (4, 8)]
    assert client.updates == [("g", 4), ("g", 8)]


def test_autoscale_vectorized_matches_walk(spark):
    """The zero-cooldown numpy fast path must emit EXACTLY the sequential
    walk's events: run the same random stream through both — vectorized
    (stateless lambda, no cooldowns) and the per-row loop (forced via
    current_fn, which always walks) — and compare event-for-event.
    Includes nulls (dropped points) and values clamping at both rails."""
    import random

    rng = random.Random(42)
    t0 = dt.datetime(1971, 1, 1, tzinfo=Z)
    rows = []
    for i in range(600):
        svc = f"s{i % 3}"
        v = rng.choice([None, float(rng.randint(-5, 60))])
        rows.append((t0 + dt.timedelta(seconds=i), svc, v))
    df = spark.createDataFrame(rows, "time timestamp, svc string, v double")

    def run(current_fn=None):
        client = MockSwarm()
        client.service_replicas = lambda name: 5
        scaler = SwarmAutoscaler(client, service_name_tag="svc")
        out = (
            Pipeline.from_df(df, time_col="time")
            .group_by("svc")
            .autoscale(
                scaler,
                None if current_fn else F.col("v"),
                min=2,
                max=40,
                current_fn=current_fn,
            )
        )
        return [
            (r["time"], r["svc"], r["old"], r["new"])
            for r in out.df.orderBy("time", "svc").collect()
        ]

    fast = run()
    slow = run(current_fn=lambda fields, current: fields["v"])
    assert fast == slow
    assert len(fast) > 100  # the stream actually exercises the machine


def test_decision_step_matches_naive_reference():
    """Fuzz the shared decide/clamp/cooldown core against a straight
    re-implementation of autoscale.go:199-249 (independent of the
    operator code): random desired-count streams, random clamps and
    cooldowns — event sequences and final state must agree exactly."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from kapacitor_spark.operators.autoscale import NEVER, decision_step

    @settings(max_examples=200, deadline=None)
    @given(
        st.lists(st.tuples(st.integers(0, 30), st.integers(0, 20)),
                 min_size=1, max_size=30),
        st.integers(1, 5),
        st.integers(0, 8),
        st.integers(0, 6),
        st.integers(0, 6),
        st.integers(1, 10),
    )
    def run(stream, lo, hi, inc_cd, dec_cd, initial):
        # naive reference walk (transcribed from the Go source, not from
        # the operator): clamp, compare, per-direction cooldown, save on
        # success
        cur, li, ld = initial, None, None
        expected = []
        t = 0
        for dt, want in stream:
            t += dt
            new = want
            if hi > 0 and new > hi:
                new = hi
            if new < lo:
                new = lo
            if new == cur:
                continue
            if new > cur:
                if li is not None and t < li + inc_cd:
                    expected.append(("drop", cur, new))
                    continue
                li = t
            else:
                if ld is not None and t < ld + dec_cd:
                    expected.append(("drop", cur, new))
                    continue
                ld = t
            expected.append(("event", cur, new))
            cur = new

        got = []
        c, gli, gld = initial, NEVER, NEVER
        t = 0
        for dt, want in stream:
            t += dt
            old = c
            action, c, gli, gld, new = decision_step(
                c, want, lo, hi, t, gli, gld, inc_cd, dec_cd
            )
            if action == "drop":
                got.append(("drop", old, new))
            elif action in ("inc", "dec"):
                got.append(("event", old, new))
        assert got == expected and c == cur

    run()


def test_autoscale_all_null_resource(spark):
    """A resource whose every point has a null desired count emits no
    events and must not break the vectorized walk (degenerate empty-
    array group)."""
    rows = [
        (dt.datetime(1971, 1, 1, 0, 0, i, tzinfo=Z), "dead", None)
        for i in range(3)
    ] + [(dt.datetime(1971, 1, 1, 0, 0, 5, tzinfo=Z), "live", 9.0)]
    df = spark.createDataFrame(rows, "time timestamp, svc string, v double")
    client = MockSwarm()
    client.service_replicas = lambda name: 5
    scaler = SwarmAutoscaler(client, service_name_tag="svc")
    out = (
        Pipeline.from_df(df, time_col="time")
        .group_by("svc")
        .autoscale(scaler, F.col("v"))
    )
    got = [(r["svc"], r["old"], r["new"]) for r in out.df.collect()]
    assert got == [("live", 5, 9)]
