"""Core Pipeline operator tests on tiny in-memory fixtures mirroring the
reference's replay-file shapes (FIXTURES.md tables 1-5)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from kapacitor_spark import Pipeline

T0 = dt.datetime(1971, 1, 1)


def ts(i):
    return T0 + dt.timedelta(seconds=i)


@pytest.fixture(scope="module")
def cpu(spark):
    # FIXTURES.md table 1: cpu,type=idle,host=serverX value=...
    rows = []
    for i in range(10):
        for h, base in [("serverA", 90.0), ("serverB", 80.0)]:
            rows.append((ts(i), h, "idle", base + i))
    return spark.createDataFrame(rows, "time timestamp, host string, type string, value double")


def test_where_filters(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).where("value > 95")
    rows = p.result().collect()
    assert all(r.value > 95 for r in rows)
    assert len(rows) == 4  # serverA values 96..99


def test_window_mean(cpu):
    # TestStream_Window / TestStream_SimpleMR analog: 5s tumbling mean per host
    p = (
        Pipeline.from_df(cpu, dims=("host",))
        .window_time("5s")
        .mean("value", as_="mean_value")
    )
    rows = {(r.host, r.time.second): r.mean_value for r in p.result().collect()}
    assert rows[("serverA", 0)] == pytest.approx(92.0)  # 90..94 mean
    assert rows[("serverA", 5)] == pytest.approx(97.0)
    assert rows[("serverB", 0)] == pytest.approx(82.0)


def test_sliding_window(cpu):
    p = (
        Pipeline.from_df(cpu, dims=("host",))
        .window_time("4s", "2s")
        .count("value", as_="n")
    )
    rows = [(r.host, r.time, r.n) for r in p.result().collect()]
    # sliding windows: each point in 2 windows
    total = sum(n for _, _, n in rows if _ is not None)
    assert total == 2 * 20


def test_eval_chained(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).eval(
        keep=False, doubled="value * 2", plus1="doubled + 1"
    )
    row = p.result().orderBy("time", "host").first()
    assert row.doubled == 180.0 and row.plus1 == 181.0
    assert set(p.result().columns) == {"time", "host", "doubled", "plus1"}


def test_default_and_delete(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).default(dc="east", value=0.0).delete("type")
    df = p.result()
    assert "type" not in df.columns
    assert df.select("dc").distinct().collect()[0].dc == "east"


def test_shift(cpu):
    p = Pipeline.from_df(cpu).shift("1h")
    assert p.result().agg(F.min("time")).collect()[0][0] == T0 + dt.timedelta(hours=1)
    p2 = Pipeline.from_df(cpu).shift("-30s")
    assert p2.result().agg(F.min("time")).collect()[0][0] == T0 - dt.timedelta(seconds=30)


def test_sample_n(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).sample(n=3)
    rows = p.result().collect()
    # per host: rows at offsets 0,3,6,9 → 4 each
    assert len(rows) == 8
    assert all(r.time.second % 3 == 0 for r in rows)


def test_derivative(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).derivative("value", unit="1s")
    rows = p.result().collect()
    assert len(rows) == 18  # first point per host dropped
    assert all(r.value == pytest.approx(1.0) for r in rows)


def test_difference_and_elapsed(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).difference("value", as_="diff")
    assert all(r.diff == 1.0 for r in p.result().collect())
    p2 = Pipeline.from_df(cpu, dims=("host",)).elapsed(unit="1s")
    assert all(r.elapsed == 1 for r in p2.result().collect())


def test_moving_average(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).moving_average("value", 3, as_="ma")
    rows = sorted(
        [(r.host, r.time, r.ma) for r in p.result().collect() if r.host == "serverA"],
        key=lambda r: r[1],
    )
    assert len(rows) == 8  # 10 - (3-1) warmup
    assert rows[0][2] == pytest.approx(91.0)  # mean(90,91,92)


def test_cumulative_sum(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).cumulative_sum("value", as_="cs")
    rows = sorted(
        [r.cs for r in p.result().filter("host='serverA'").collect()]
    )
    assert rows[0] == 90.0 and rows[-1] == sum(range(90, 100))


def test_change_detect(spark):
    # FIXTURES.md table 5: packets with runs of repeated string values
    vals = ["good", "good", "bad", "bad", "bad", "good", "good"]
    df = spark.createDataFrame(
        [(ts(i), v) for i, v in enumerate(vals)], "time timestamp, value string"
    )
    p = Pipeline.from_df(df).change_detect("value")
    out = [r.value for r in p.result().orderBy("time").collect()]
    assert out == ["good", "bad", "good"]


def test_state_count_and_duration(spark):
    vals = [1.0, 5.0, 6.0, 2.0, 7.0, 8.0, 9.0]
    df = spark.createDataFrame(
        [(ts(i), v) for i, v in enumerate(vals)], "time timestamp, value double"
    )
    p = Pipeline.from_df(df).state_count("value > 4")
    out = [r.state_count for r in p.result().orderBy("time").collect()]
    assert out == [-1, 1, 2, -1, 1, 2, 3]
    p2 = Pipeline.from_df(df).state_duration("value > 4", unit="1s")
    out2 = [r.state_duration for r in p2.result().orderBy("time").collect()]
    assert out2 == [-1.0, 0.0, 1.0, -1.0, 0.0, 1.0, 2.0]


def test_aggregations(cpu):
    base = Pipeline.from_df(cpu, dims=("host",))
    a = {r.host: r for r in base.agg(
        F.count("value").alias("n"),
        F.avg("value").alias("mean"),
        (F.max("value") - F.min("value")).alias("spread"),
    ).result().collect()}
    assert a["serverA"].n == 10
    assert a["serverA"].mean == pytest.approx(94.5)
    assert a["serverA"].spread == pytest.approx(9.0)


def test_percentile_exact(spark):
    # reference formula: idx = floor(n*p/100 + .5), 1-based, no interpolation
    df = spark.createDataFrame(
        [(ts(i), float(v)) for i, v in enumerate([10, 20, 30, 40])],
        "time timestamp, value double",
    )
    p = Pipeline.from_df(df).percentile("value", 50.0, as_="p50")
    assert p.result().collect()[0].p50 == 20.0  # floor(4*0.5+0.5)=2 → 2nd
    p90 = Pipeline.from_df(df).percentile("value", 90.0, as_="p90")
    assert p90.result().collect()[0].p90 == 40.0


def test_first_last_selectors(cpu):
    base = Pipeline.from_df(cpu, dims=("host",))
    f = {r.host: r.first for r in base.first("value", as_="first").result().collect()}
    assert f == {"serverA": 90.0, "serverB": 80.0}
    l = {r.host: r.last for r in base.last("value", as_="last").result().collect()}
    assert l == {"serverA": 99.0, "serverB": 89.0}
    m = base.max_selector("value", as_="mx").result().collect()
    byhost = {r.host: r for r in m}
    assert byhost["serverA"].mx == 99.0 and byhost["serverA"].time == ts(9)


def test_top_bottom(cpu):
    p = Pipeline.from_df(cpu, dims=("host",)).top(2, "value")
    rows = p.result().collect()
    assert len(rows) == 4
    assert {r.value for r in rows if r.host == "serverA"} == {98.0, 99.0}


def test_alert_levels_and_state_changes(spark):
    vals = [1.0, 6.0, 11.0, 11.0, 2.0]
    df = spark.createDataFrame(
        [(ts(i), v) for i, v in enumerate(vals)], "time timestamp, value double"
    )
    p = Pipeline.from_df(df).alert(warn="value > 5", crit="value > 10")
    out = [r.level for r in p.result().orderBy("time").collect()]
    assert out == ["OK", "WARNING", "CRITICAL", "CRITICAL", "OK"]
    p2 = Pipeline.from_df(df).alert(
        warn="value > 5", crit="value > 10", state_changes_only=True
    )
    out2 = [(r.time.second, r.level) for r in p2.result().orderBy("time").collect()]
    assert out2 == [(1, "WARNING"), (2, "CRITICAL"), (4, "OK")]


def test_alert_all_window(spark):
    from pyspark.sql import functions as F
    from kapacitor_spark import Pipeline

    rows = [
        # window 0: all > 90 → CRITICAL; window 1: one low point → OK
        (0, "2024-01-01 00:00:00", "a", 95.0),
        (1, "2024-01-01 00:00:10", "a", 96.0),
        (2, "2024-01-01 00:01:00", "a", 97.0),
        (3, "2024-01-01 00:01:10", "a", 10.0),
    ]
    df = spark.createDataFrame(rows, "id long, t string, host string, value double").withColumn(
        "t", F.to_timestamp("t")
    )
    p = Pipeline.from_df(df, time_col="t", dims=("host",))
    out = p.window_time("1m").alert_all(crit="value > 90").result().orderBy("t").collect()
    assert [r.level for r in out] == ["CRITICAL", "OK"]


def test_alert_inhibit(spark):
    from pyspark.sql import functions as F
    from kapacitor_spark import Pipeline

    mk = lambda rows: spark.createDataFrame(
        rows, "t string, host string, value double"
    ).withColumn("t", F.to_timestamp("t"))
    alerts = Pipeline.from_df(
        mk([("2024-01-01 00:00:05", "a", 99.0), ("2024-01-01 00:05:05", "b", 98.0)]),
        time_col="t", dims=("host",),
    ).alert(crit="value > 90")
    # inhibitor: host a is down (non-OK) in minute 0 → suppress a's alert
    inhibitor = Pipeline.from_df(
        mk([("2024-01-01 00:00:30", "a", 1.0)]), time_col="t", dims=("host",)
    ).alert(crit="value < 5")
    out = alerts.inhibit(inhibitor, on=["host"], tolerance="1m").result().collect()
    assert [r.host for r in out] == ["b"]


def test_engine_confs_pinned(spark):
    """The two r8 engine-wide session confs must stay pinned: the
    codegen compile cache sized above the working set (the stock 100
    entries thrash under many wide plans — re-janino + re-JIT per
    cycle), and constraint propagation off (exponential in commutative
    expression width; hangs/OOMs the driver on 64-term signature
    columns in filters/joins)."""
    assert spark.conf.get("spark.sql.codegen.cache.maxEntries") == "5000"
    assert spark.conf.get("spark.sql.constraintPropagation.enabled") == "false"
