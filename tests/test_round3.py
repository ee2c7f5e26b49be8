"""Feature tests spanning builds: flapping golden values, alert topics
(+ the round-4 topic handler actions: aggregate/publish/match and
define-topic-handler specs), hierarchical sideload, k-combination
combine, multi-probe LSH, vectorized count window."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from kapacitor_spark import Pipeline
from kapacitor_spark.streaming.state import (
    LEVEL_IDX, new_state, percent_change, walk_levels,
)
from kapacitor_spark.topics import TopicRegistry, topic_state


# ------------------------------------------------------------------ #
# flapping golden test (/root/reference/alert.go:1232-1286)
# ------------------------------------------------------------------ #


class _GoAlertState:
    """Independent 1:1 port of the reference's alertState (alert.go:
    1232-1286: addEvent / percentChange / updateFlapping), used as the
    golden model for walk_levels."""

    MAX_WEIGHT = 1.2   # alert.go:59
    WEIGHT_DIFF = 1.5  # alert.go:56

    def __init__(self, history_len, flap_low, flap_high):
        self.history = [0] * history_len
        self.idx = 0
        self.flapping = False
        self.low, self.high = flap_low, flap_high

    def add_event(self, level):
        changed = self.history[self.idx] != level
        self.idx = (self.idx + 1) % len(self.history)
        self.history[self.idx] = level
        p = self.percent_change()
        if self.flapping and p < self.low:
            self.flapping = False
        elif not self.flapping and p > self.high:
            self.flapping = True
        return changed

    def percent_change(self):
        l = len(self.history)
        changes = 0.0
        weight = self.MAX_WEIGHT / self.WEIGHT_DIFF
        step = (self.MAX_WEIGHT - weight) / float(l - 1)
        for i in range(l - 1):
            c = (i + self.idx) % l
            p = c - 1 if c - 1 >= 0 else l - 1
            if self.history[c] != self.history[p]:
                changes += weight
            weight += step
        return changes / float(l - 1)


def test_percent_change_hand_computed():
    # history_len=3: weights [0.8, 1.0], denominator 2
    # (maxWeight/weightDiff = 1.2/1.5 = 0.8; step = (1.2-0.8)/2 = 0.2)
    # ring [0,3,0], idx=2 → pairs (h[2],h[1]) changed @0.8, (h[0],h[2]) same
    assert percent_change([0, 3, 0], 2) == pytest.approx(0.8 / 2)
    # constant ring → no changes
    assert percent_change([2, 2, 2], 1) == 0.0
    # ring [3,3,0], idx=1 → pairs (h[1],h[0]) same, (h[2],h[1]) changed @1.0
    assert percent_change([3, 3, 0], 1) == pytest.approx(1.0 / 2)


def test_walk_levels_matches_reference_model():
    rng = np.random.RandomState(7)
    seq = rng.choice([0, 0, 0, 2, 3], size=300)  # flappy mix
    for low, high, hist in [(0.25, 0.5, 21), (0.1, 0.3, 5)]:
        golden = _GoAlertState(hist, low, high)
        expect = []
        for lv in seq:
            changed = golden.add_event(int(lv))
            expect.append(changed and not golden.flapping)
        emit, _ = walk_levels(
            seq, new_state(hist), state_changes_only=True,
            flap_low=low, flap_high=high,
        )
        assert emit.tolist() == expect, f"divergence at cfg {(low, high, hist)}"


def test_walk_levels_hysteresis_suppresses_flapping():
    # alternate OK/CRITICAL: percent change saturates → suppression kicks in
    seq = np.array([0, 3] * 30)
    emit, st = walk_levels(
        seq, new_state(21), state_changes_only=True, flap_low=0.25, flap_high=0.5
    )
    assert st["flapping"] is True
    # first event is OK→OK (no transition); the next few transitions emit
    assert emit[1:4].all()
    assert not emit[-20:].any()    # steady flapping suppressed


# ------------------------------------------------------------------ #
# alert topics
# ------------------------------------------------------------------ #


def test_alert_topic_column_and_state(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "h1", 200.0),
            ("2024-01-01 00:01:00", "h1", 10.0),
            ("2024-01-01 00:02:00", "h2", 250.0),
        ],
        "ts string, host string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    p = Pipeline.from_df(df, time_col="ts", dims=("host",)).alert(
        crit="value > 150", topic="cpu"
    )
    rows = p.result().collect()
    assert all(r.topic == "cpu" for r in rows)
    st = {
        (r.topic, r.host): r.level
        for r in topic_state(p.result(), dims=["host"]).collect()
    }
    assert st[("cpu", "h1")] == "OK"        # latest h1 event is OK
    assert st[("cpu", "h2")] == "CRITICAL"


def test_topic_state_persist_roundtrip(spark, tmp_path):
    from kapacitor_spark.topics import load_topic_state, save_topic_state

    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:00", "cpu", "h1", "CRITICAL"),
            ("2024-01-01 00:01:00", "cpu", "h1", "OK"),
            ("2024-01-01 00:00:30", "disk", "h2", "WARNING"),
        ],
        "ts string, topic string, host string, level string",
    ).withColumn("ts", F.to_timestamp("ts"))
    st = topic_state(df, dims=["host"])
    path = str(tmp_path / "topic_state")
    save_topic_state(st, path)
    back = load_topic_state(spark, path)
    got = {(r.topic, r.host): (r.level, r.n_events) for r in back.collect()}
    assert got == {("cpu", "h1"): ("OK", 2), ("disk", "h2"): ("WARNING", 1)}
    # restore of one topic prunes partitions
    assert back.filter("topic = 'disk'").count() == 1


def test_state_count_stream_idle_timeout(spark, tmp_path):
    from kapacitor_spark.streaming import (
        barrier, run_available_now, state_count_stream,
    )

    rows = [
        [("2024-01-01 00:00:00", "a", 200.0), ("2024-01-01 00:00:01", "a", 200.0)],
        [("2024-01-01 02:00:00", "b", 200.0)],   # watermark passes a+1h
        [("2024-01-01 02:01:00", "b", 200.0)],   # a times out here
        [("2024-01-01 02:02:00", "a", 200.0)],   # fresh state → streak 1
    ]
    path = str(tmp_path / "in_sct")
    for batch in rows:
        spark.createDataFrame(batch, "t string, host string, value double").withColumn(
            "t", F.to_timestamp("t")
        ).coalesce(1).write.mode("append").parquet(path)
    src = (
        spark.readStream.schema("t timestamp, host string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = state_count_stream(
        barrier(src, "t", "1s"), "t", ["host"], cond="value > 100",
        as_="n", idle_timeout="1h",
    )
    got = run_available_now(out, "sct_to", str(tmp_path / "cp_sct")).orderBy("t")
    rows_out = [(r.host, r.n) for r in got.collect()]
    # a's final event restarts at 1 — without DeleteGroup it would be 3
    assert rows_out == [("a", 1), ("a", 2), ("b", 1), ("b", 2), ("a", 1)]


def test_topic_registry_dispatch(spark, tmp_path):
    import glob
    import json
    import os

    df = spark.createDataFrame(
        [("e1", "ops", "CRITICAL"), ("e2", "db", "WARNING"), ("e3", "ops", "OK")],
        "id string, topic string, level string",
    )
    out_dir = str(tmp_path)
    reg = TopicRegistry()

    def mk(name):
        path = os.path.join(out_dir, name)

        def handler(rows):
            with open(f"{path}_{os.getpid()}_{id(rows)}.jsonl", "a") as fh:
                for r in rows:
                    fh.write(json.dumps({"id": r["id"], "topic": r["topic"]}) + "\n")

        return handler

    reg.subscribe("ops", mk("ops")).subscribe("*", mk("all"))
    reg.dispatch(df.coalesce(1), topic_col="topic")

    def read(prefix):
        ids = set()
        for f in glob.glob(f"{out_dir}/{prefix}_*.jsonl"):
            with open(f) as fh:
                ids |= {json.loads(line)["id"] for line in fh}
        return ids

    assert read("ops") == {"e1", "e3"}
    assert read("all") == {"e1", "e2", "e3"}


# ------------------------------------------------------------------ #
# hierarchical sideload + k-combination combine
# ------------------------------------------------------------------ #


def test_sideload_first_match_wins(spark):
    pts = spark.createDataFrame(
        [("a", 1.0), ("b", 2.0), ("c", 3.0)], "k string, v double"
    )
    lvl0 = spark.createDataFrame([("a", "specific")], "k string, label string")
    lvl1 = spark.createDataFrame(
        [("a", "generic"), ("b", "generic")], "k string, label string"
    )
    out = {
        r.k: r.label
        for r in Pipeline.from_df(pts)
        .sideload([lvl0, lvl1], on=["k"], fields=["label"], defaults={"label": "dflt"})
        .result()
        .collect()
    }
    assert out == {"a": "specific", "b": "generic", "c": "dflt"}


def test_combine_three_slots(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:01", "u1", "x", 1.0, 1),
            ("2024-01-01 00:00:02", "u1", "y", 2.0, 2),
            ("2024-01-01 00:00:03", "u1", "z", 3.0, 3),
            ("2024-01-01 00:00:04", "u1", "x", 4.0, 4),  # second x
            ("2024-01-01 00:00:05", "u2", "x", 5.0, 5),  # other group: no y/z
        ],
        "ts string, user string, kind string, v double, id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    p = Pipeline.from_df(df, time_col="ts", dims=("user",))
    out = p.combine(
        "kind = 'x'", "kind = 'y'", "kind = 'z'",
        as_=("a", "b", "c"), tolerance="1h", id_col="id",
    ).result()
    rows = sorted((r.a_v, r.b_v, r.c_v) for r in out.collect())
    assert rows == [(1.0, 2.0, 3.0), (4.0, 2.0, 3.0)]


def test_combine_same_predicate_unordered_pairs(spark):
    df = spark.createDataFrame(
        [
            ("2024-01-01 00:00:01", "u1", 1.0, 1),
            ("2024-01-01 00:00:02", "u1", 2.0, 2),
            ("2024-01-01 00:00:03", "u1", 3.0, 3),
        ],
        "ts string, user string, v double, id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    p = Pipeline.from_df(df, time_col="ts", dims=("user",))
    out = p.combine(
        "v > 0", "v > 0", as_=("a", "b"), tolerance="1h", id_col="id"
    ).result()
    pairs = sorted((r.a_v, r.b_v) for r in out.collect())
    # strict id ordering → each unordered pair once, no self-pairs
    assert pairs == [(1.0, 2.0), (1.0, 3.0), (2.0, 3.0)]


# ------------------------------------------------------------------ #
# multi-probe LSH
# ------------------------------------------------------------------ #


def test_multi_probe_lsh_recall_not_worse(spark):
    from kapacitor_spark.dataprep.similarity import brute_force_topk, rp_lsh_topk

    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(8)]) for i in range(120)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter("vec_id < 5")
    bf = {(r.query_id, r.neighbor_id) for r in brute_force_topk(emb, q, k=3).collect()}
    single = {
        (r.query_id, r.neighbor_id)
        for r in rp_lsh_topk(emb, q, k=3, num_planes=4, multi_probe=0).collect()
    }
    multi = {
        (r.query_id, r.neighbor_id)
        for r in rp_lsh_topk(emb, q, k=3, num_planes=4, multi_probe=1).collect()
    }
    assert len(multi & bf) >= len(single & bf)
    assert len(multi & bf) / len(bf) >= 0.4


# ------------------------------------------------------------------ #
# UDF example ports (/root/reference/udf/agent/examples)
# ------------------------------------------------------------------ #


def test_udf_example_moving_avg(spark):
    from kapacitor_spark.udf_examples import moving_avg_udf

    df = spark.createDataFrame(
        [(f"2024-01-01 00:00:{i:02d}", "h", float(v))
         for i, v in enumerate([2, 4, 6, 8, 10])],
        "t string, host string, value double",
    ).withColumn("t", F.to_timestamp("t"))
    p = Pipeline.from_df(df, time_col="t", dims=("host",))
    ma = moving_avg_udf("t timestamp, host string, avg double", size=3)
    out = [r.avg for r in p.udf(ma).result().orderBy("t").collect()]
    # cumulative while filling (2, 3, 4), then trailing-3 (6, 8)
    assert out == [2.0, 3.0, 4.0, 6.0, 8.0]


def test_udf_example_outliers(spark):
    from kapacitor_spark.udf_examples import outliers_udf, tukey_bounds

    vals = [10.0, 11.0, 12.0, 11.5, 10.5, 11.2, 60.0, -40.0]
    df = spark.createDataFrame(
        [(f"2024-01-01 00:00:{i:02d}", "h", v) for i, v in enumerate(vals)],
        "t string, host string, value double",
    ).withColumn("t", F.to_timestamp("t"))
    p = Pipeline.from_df(df, time_col="t", dims=("host",))
    ou = outliers_udf("t timestamp, host string, value double", scale=1.5)
    got = sorted(r.value for r in p.udf(ou).result().collect())
    assert got == [-40.0, 60.0]
    lower, upper = tukey_bounds(np.array(vals), 1.5)
    assert lower > -40.0 and upper < 60.0


def test_udf_example_mirror(spark):
    from kapacitor_spark.udf_examples import mirror_udf

    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "h", 1.0)], "t string, host string, value double"
    ).withColumn("t", F.to_timestamp("t"))
    p = Pipeline.from_df(df, time_col="t", dims=("host",))
    mi = mirror_udf("t timestamp, host string, value double")
    assert p.udf(mi).result().collect() == df.collect()


# ------------------------------------------------------------------ #
# join stream_name / per-field fill; groupBy('*') / byMeasurement
# ------------------------------------------------------------------ #


def test_join_per_field_fill_and_stream_name(spark):
    mk = lambda rows: spark.createDataFrame(
        rows, "ts string, host string, value double"
    ).withColumn("ts", F.to_timestamp("ts"))
    a = Pipeline.from_df(
        mk([("2024-01-01 00:00:00", "h1", 1.0), ("2024-01-01 00:01:00", "h1", 2.0)]),
        time_col="ts", dims=("host",),
    )
    b = Pipeline.from_df(
        mk([("2024-01-01 00:00:00", "h1", 10.0)]), time_col="ts", dims=("host",)
    )
    j = a.join(
        b, prefixes=("l", "r"), tolerance="1m",
        fill={"r_value": -1.0}, stream_name="joined",
    ).result()
    rows = {r.ts.minute: r for r in j.collect()}
    assert rows[0].r_value == 10.0
    assert rows[1].r_value == -1.0   # per-field fill on the missing side
    assert all(r.name == "joined" for r in rows.values())


def test_group_by_star_and_by_measurement(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", "cpu", "h1", "us", 1.0, 7)],
        "ts string, name string, host string, region string, value double, event_id long",
    ).withColumn("ts", F.to_timestamp("ts"))
    p = Pipeline.from_df(df, time_col="ts", tiebreak=("event_id",))
    assert set(p.group_by("*").dims) == {"host", "region"}
    assert set(p.group_by("*", by_measurement=True).dims) == {"host", "region", "name"}
    assert set(p.group_by("*", exclude=["region"]).dims) == {"host"}


# ------------------------------------------------------------------ #
# bucketed storage: co-located joins skip the shuffle
# ------------------------------------------------------------------ #


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    from kapacitor_spark.storage import read_table_catalog, write_bucketed

    a = spark.createDataFrame(
        [(i, float(i)) for i in range(100)], "k long, va double"
    )
    b = spark.createDataFrame(
        [(i, float(i * 2)) for i in range(100)], "k long, vb double"
    )
    write_bucketed(a, "bk_a", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "bk_a"))
    write_bucketed(b, "bk_b", ["k"], 4, sort_cols=["k"],
                   path=str(tmp_path / "bk_b"))
    # small tables would broadcast (also shuffle-free, but trivially so);
    # force the sort-merge path to prove bucket co-location elides the
    # hash-partitioning exchange a big-table join would otherwise pay
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_table_catalog(spark, "bk_a").join(
            read_table_catalog(spark, "bk_b"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, (
            f"bucketed join should not shuffle:\n{plan}"
        )
        assert "SortMergeJoin" in plan
        assert j.count() == 100
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_write_time_partitioned_prunes(spark, tmp_path):
    from kapacitor_spark.storage import write_time_partitioned

    df = spark.createDataFrame(
        [(f"2024-01-{d:02d} 10:00:00", float(d)) for d in range(1, 6)],
        "time string, value double",
    ).withColumn("time", F.to_timestamp("time"))
    path = str(tmp_path / "tp")
    write_time_partitioned(df, path, granularity="day")
    back = spark.read.parquet(path).filter("__pdate = '2024-01-03'")
    plan = back._jdf.queryExecution().executedPlan().toString()
    # the EQUALITY must reach PartitionFilters (that's what prunes the
    # scan to one directory); the isnotnull companion was only inferred
    # by constraint propagation, which session.py disables engine-wide
    assert "PartitionFilters: [" in plan and "= 2024-01-03" in plan
    assert "__pdate" in plan.split("PartitionFilters", 1)[1][:120]
    assert back.count() == 1


def test_sigma_stream_matches_batch(spark, tmp_path):
    from kapacitor_spark.streaming import run_available_now, sigma_stream

    rng = np.random.RandomState(11)
    rows = [
        (f"2024-01-01 00:00:{i:02d}", "h", float(v))
        for i, v in enumerate(rng.randn(40) * 10 + 50)
    ]
    df = spark.createDataFrame(rows, "t string, host string, value double").withColumn(
        "t", F.to_timestamp("t")
    )
    # batch reference: Pipeline.sigma running-window formulation
    batch = {
        r.t: r.sigma
        for r in Pipeline.from_df(df, time_col="t", dims=("host",))
        .sigma("value")
        .result()
        .collect()
    }
    # streaming: two micro-batches, Welford state carried across
    path = str(tmp_path / "in_sig")
    df.filter("second(t) < 20").coalesce(1).write.mode("append").parquet(path)
    df.filter("second(t) >= 20").coalesce(1).write.mode("append").parquet(path)
    src = (
        spark.readStream.schema("t timestamp, host string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = run_available_now(
        sigma_stream(src, "t", ["host"], "value"),
        "sig_stream", str(tmp_path / "cp_sig"),
    )
    stream = {r.t: r.sigma for r in out.collect()}
    assert set(stream) == set(batch)
    for t, v in batch.items():
        assert stream[t] == pytest.approx(v, rel=1e-9), t


# ------------------------------------------------------------------ #
# Holt-Winters golden fixture (pins the deterministic fit)
# ------------------------------------------------------------------ #


def test_holt_winters_golden():
    from kapacitor_spark.operators.holt_winters import _forecast

    # linear trend x multiplicative season, period 4 — fully deterministic
    # (hash-free Nelder-Mead); golden values pin the implementation
    i = np.arange(24)
    y = (10.0 + 0.5 * i) * np.array([1.0, 1.2, 0.8, 1.0] * 6)
    _, fc = _forecast(y, h=8, m=4)
    assert [round(v, 6) for v in fc] == [
        21.97484, 26.963095, 18.365466, 23.444372,
        23.918222, 29.296041, 19.920869, 25.388749,
    ]
    # pure linear series, no season: exact extrapolation
    _, fc2 = _forecast(np.arange(1.0, 9.0), h=3, m=0)
    assert [round(v, 6) for v in fc2] == [9.0, 10.0, 11.0]


# ------------------------------------------------------------------ #
# vectorized streaming count window (regression vs per-row reference)
# ------------------------------------------------------------------ #


@pytest.mark.parametrize("agg", ["mean", "sum", "count", "min", "max"])
def test_window_count_stream_vectorized(spark, tmp_path, agg):
    from kapacitor_spark.streaming import run_available_now, window_count_stream

    vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0, 6.0]
    rows = [
        (f"2024-01-01 00:00:{i:02d}", "h", v) for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows, "t string, host string, value double").withColumn(
        "t", F.to_timestamp("t")
    )
    # two files → two micro-batches → ring state must carry across
    path = str(tmp_path / f"in_{agg}")
    df.filter("second(t) < 4").coalesce(1).write.mode("append").parquet(path)
    df.filter("second(t) >= 4").coalesce(1).write.mode("append").parquet(path)
    src = (
        spark.readStream.schema("t timestamp, host string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )
    out = window_count_stream(
        src, "t", ["host"], "value", period_count=3, every_count=2, agg=agg
    )
    got = run_available_now(out, f"wcs_{agg}", str(tmp_path / f"cp_{agg}"))
    got = sorted((r.t.second, r.value) for r in got.collect())

    # reference: per-row ring walk
    fns = {"mean": np.mean, "sum": np.sum, "count": len, "min": np.min, "max": np.max}
    ring, since, expect = [], 0, []
    for i, v in enumerate(vals):
        ring.append(v)
        ring = ring[-3:]
        since += 1
        if since >= 2:
            since = 0
            expect.append((i, float(fns[agg](ring))))
    assert got == expect


# ------------------------------------------------------------------ #
# topic handler actions (services/alert/handlers.go)
# ------------------------------------------------------------------ #


def _events_df(spark):
    import datetime as dt

    Z = dt.timezone.utc
    rows = [
        (dt.datetime(2024, 1, 1, 0, 0, 5, tzinfo=Z), "cpu", "CRITICAL", "OK", "c1", 5_000_000_000),
        (dt.datetime(2024, 1, 1, 0, 0, 20, tzinfo=Z), "cpu", "WARNING", "CRITICAL", "w1", 1_000_000_000),
        (dt.datetime(2024, 1, 1, 0, 0, 40, tzinfo=Z), "mem", "OK", "WARNING", "ok1", 0),
        (dt.datetime(2024, 1, 1, 0, 1, 10, tzinfo=Z), "cpu", "INFO", "INFO", "i1", 0),
    ]
    return spark.createDataFrame(
        rows,
        "ts timestamp, name string, level string, prev string, "
        "message string, duration long",
    )


def test_aggregate_topic_events(spark):
    """Aggregate handler (services/alert/handlers.go:199-306): one event
    per interval with max level/time/duration, count-templated message,
    newline-joined member messages as details."""
    from kapacitor_spark.topics import aggregate_topic_events

    out = {
        r["count"]: r
        for r in aggregate_topic_events(
            _events_df(spark), "1m", time_col="ts",
            message_col="message", duration_col="duration",
            out_topic="agg",
        ).collect()
    }
    first = out[3]  # minute 0: CRITICAL+WARNING+OK
    assert first["level"] == "CRITICAL"
    assert first["ts"].second == 40  # max member time
    assert first["duration"] == 5_000_000_000
    assert first["message"] == "Received 3 events in the last 1m."
    assert first["details"].split("\n") == ["c1", "w1", "ok1"]
    assert first["topic"] == "agg"
    assert out[1]["level"] == "INFO"


def test_publish_and_match_handlers(spark):
    """Publish handler re-routes events to every listed topic; match
    conditions (level()/changed()/name() with level identifiers) gate
    handler delivery — services/alert/handlers.go:313-345,386-460."""
    from kapacitor_spark.topics import match_filter, publish_to_topics

    ev = _events_df(spark).withColumn("topic", F.lit("src"))
    pub = publish_to_topics(ev, ["a", "b"])
    assert pub.count() == 8
    assert set(r["topic"] for r in pub.select("topic").distinct().collect()) == {"a", "b"}

    crit = match_filter(ev, "level() == CRITICAL")
    assert [r["message"] for r in crit.collect()] == ["c1"]
    ge_warn = match_filter(ev, "level() >= WARNING")
    assert sorted(r["message"] for r in ge_warn.collect()) == ["c1", "w1"]
    changed = match_filter(ev, "changed() == TRUE", prev_level_col="prev")
    assert sorted(r["message"] for r in changed.collect()) == ["c1", "ok1", "w1"]
    named = match_filter(ev, "name() == 'mem'")
    assert [r["message"] for r in named.collect()] == ["ok1"]
    import pytest as _pytest

    with _pytest.raises(ValueError, match="changed"):
        match_filter(ev, "changed() == TRUE")


def test_register_handler_spec_end_to_end(spark, tmp_path):
    """define-topic-handler parity (services/alert/types.go HandlerSpec +
    api.go): a spec dict {id, topic, kind, options, match} validates,
    builds its delivery callable, honors the match condition, and routes
    through TopicRegistry.dispatch — here a log handler receiving only
    the CRITICAL events of its topic."""
    import json as _json

    import pytest as _pytest

    from kapacitor_spark.topics import TopicRegistry, register_handler_spec

    ev = _events_df(spark).withColumn(
        "topic",
        F.when(F.col("name") == "cpu", "cpu-alerts").otherwise("other"),
    )
    log_path = tmp_path / "spec_log.jsonl"
    reg = TopicRegistry()
    register_handler_spec(
        reg,
        {
            "id": "crit-log",
            "topic": "cpu-alerts",
            "kind": "log",
            "options": {"path": str(log_path)},
            "match": "level() == CRITICAL",
        },
    )
    reg.dispatch(ev)
    lines = [_json.loads(l) for l in log_path.read_text().splitlines()]
    assert [l["message"] for l in lines] == ["c1"]

    # spec validation mirrors the reference's ID/topic character rules
    with _pytest.raises(ValueError, match="topic"):
        register_handler_spec(
            TopicRegistry(),
            {"id": "x", "topic": "bad topic!", "kind": "log",
             "options": {"path": "/tmp/x"}},
        )
    with _pytest.raises(ValueError, match="kind"):
        register_handler_spec(
            TopicRegistry(),
            {"id": "x", "topic": "t", "kind": "nosuch", "options": {}},
        )


def test_alert_history_persistence_golden(tmp_path):
    """TestAlertHistory_Persistence (integrations/history_clean_test.go:13)
    step for step: reset-to-OK deletes the on-disk event state but not the
    in-memory one; close drops memory; restore reloads exactly what disk
    holds; topic level is the max over current states."""
    from kapacitor_spark.topics import TopicStore

    topic = "Big Alert Topic"
    aid = "The special ID"
    store = TopicStore(str(tmp_path / "alerts"))

    def check(ok_status, level, count_states):
        exists, lv = store.topic_state(topic)
        assert exists == ok_status
        assert lv == level
        if exists:
            assert len(store.event_states(topic, "OK")) == count_states

    store.collect(topic, aid, "CRITICAL", "Critical Message", "Critical details")
    check(True, "CRITICAL", 1)

    store.collect(topic, aid, "OK", "Reset to OK message", "Reset to OK details")
    # still one event state in memory; the on-disk copy was deleted
    check(True, "OK", 1)

    store.close_topic(topic)
    check(False, "OK", 0)
    store.restore_topic(topic)
    # restoration from disk has zero states: OK states are not persisted
    check(True, "OK", 0)

    store.collect(topic, aid + " new ID", "WARNING", "New Alert ID",
                  "Second alert ID details")
    check(True, "WARNING", 1)
    store.collect(topic, aid, "CRITICAL", "Critical Message", "Critical details")
    check(True, "CRITICAL", 2)

    store.close_topic(topic)
    check(False, "OK", 0)
    store.restore_topic(topic)
    # both non-OK states survived the round trip
    check(True, "CRITICAL", 2)


def test_topic_store_min_level_filter(tmp_path):
    from kapacitor_spark.topics import TopicStore

    store = TopicStore(str(tmp_path / "a2"))
    store.collect("t", "a", "INFO")
    store.collect("t", "b", "CRITICAL")
    store.collect("t", "c", "OK")
    assert set(store.event_states("t", "OK")) == {"a", "b", "c"}
    assert set(store.event_states("t", "WARNING")) == {"b"}
    # a second store instance restores from the same directory
    other = TopicStore(str(tmp_path / "a2"))
    other.restore_topic("t")
    assert set(other.event_states("t", "OK")) == {"a", "b"}  # OK not on disk


def test_topic_store_persist_is_crash_atomic(tmp_path):
    """Writers persist via temp-file + os.replace (the reference's topic
    store is BoltDB — atomic commits), so a concurrent reader NEVER sees
    a truncated/partial JSON file, and no temp droppings survive."""
    import json
    import os
    import threading

    from kapacitor_spark.topics import TopicStore

    store = TopicStore(str(tmp_path / "a3"))
    store.collect("t", "seed", "WARNING")
    path = store._file("t")
    stop = threading.Event()
    errs = []

    def writer():
        i = 0
        while not stop.is_set():
            store.collect("t", f"e{i % 7}", "CRITICAL")
            i += 1

    def reader():
        while not stop.is_set():
            try:
                with open(path) as fh:
                    json.load(fh)
            except FileNotFoundError:
                pass  # a replace in flight — never a partial file
            except json.JSONDecodeError as e:  # pragma: no cover
                errs.append(e)
                return

    ts = [threading.Thread(target=writer) for _ in range(3)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    for t in ts:
        t.start()
    import time

    time.sleep(1.0)
    stop.set()
    for t in ts:
        t.join()
    assert not errs, errs
    assert not [f for f in os.listdir(store._dir) if f.endswith(".tmp")]
    # the final file still round-trips
    fresh = TopicStore(str(tmp_path / "a3"))
    fresh.restore_topic("t")
    assert fresh.event_states("t", "CRITICAL")


def test_task_store_flush_is_crash_atomic(tmp_path):
    """Task-store JSON persistence uses the same temp+replace pattern;
    a reader mid-hammer always parses complete definitions."""
    import json
    import threading
    import time

    from kapacitor_spark.server import TaskStore

    store = TaskStore(str(tmp_path / "ts"))
    store.put("tasks", {"id": "seed", "script": "stream|from()"})
    f = tmp_path / "ts" / "tasks.json"
    stop = threading.Event()
    errs = []

    def writer():
        i = 0
        while not stop.is_set():
            store.put("tasks", {"id": f"t{i % 5}", "script": "x" * 100})
            i += 1

    def reader():
        while not stop.is_set():
            try:
                json.loads(f.read_text())
            except FileNotFoundError:
                pass
            except json.JSONDecodeError as e:  # pragma: no cover
                errs.append(e)
                return

    ts = [threading.Thread(target=writer) for _ in range(2)] + [
        threading.Thread(target=reader) for _ in range(2)
    ]
    for t in ts:
        t.start()
    time.sleep(1.0)
    stop.set()
    for t in ts:
        t.join()
    assert not errs, errs
    assert json.loads(f.read_text())["seed"]["id"] == "seed"
