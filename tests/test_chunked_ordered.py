"""Chunked (salted two-phase) ordered transforms for giant single groups:
the no-dims pipeline must produce EXACTLY the single-window answer while
spreading the sort across chunk partitions (reference behavior is
per-group-bounded, /root/reference/window.go:245-358; Spark's no-dims
window is the one place that would otherwise serialize)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kapacitor_spark import Pipeline
from kapacitor_spark.operators.ordered import CONF_KEY, chunks_support_tail


@pytest.fixture()
def force_chunking(spark):
    spark.conf.set(CONF_KEY, "1")
    yield
    spark.conf.unset(CONF_KEY)


def _events(spark, sf_dir):
    df = Pipeline.from_parquet(
        spark, f"{sf_dir}/events.parquet", time_col="ts", dims=(),
        tiebreak=("event_id",),
    )
    return df


def _collect(p):
    return sorted(
        p.result().collect(),
        key=lambda r: tuple(str(v) for v in r),
    )


@pytest.mark.parametrize("op", [
    # exact-decimal cumsum: addition reassociates EXACTLY, so chunked ==
    # single-window bit-for-bit (the scored point_transforms shape; double
    # cumsum is order-sensitive in the last ulp on any engine)
    lambda p: p.eval(vd=F.col("value").cast("decimal(20,4)"))
               .cumulative_sum("vd", as_="cum"),
    lambda p: p.difference("value", as_="diff"),
    lambda p: p.derivative("value", unit="1m", as_="rate"),
    lambda p: p.derivative("value", unit="1m", non_negative=True, as_="rate"),
    lambda p: p.elapsed("1s", as_="el"),
    lambda p: p.moving_average("value", 5, as_="ma"),
    lambda p: p.change_detect("event_type"),
], ids=["cumsum_decimal", "difference", "derivative", "derivative_nonneg",
        "elapsed", "moving_average", "change_detect"])
def test_chunked_equals_single_window(spark, sf_dir, op, force_chunking):
    chunked = _collect(op(_events(spark, sf_dir)))
    spark.conf.unset(CONF_KEY)  # plain path for the oracle side
    plain = _collect(op(_events(spark, sf_dir)))
    spark.conf.set(CONF_KEY, "1")
    assert len(chunked) == len(plain) and len(plain) > 0
    assert chunked == plain


def test_chunked_cumsum_plan_is_multi_task(spark, sf_dir, force_chunking):
    """The scale point: the chunked cumulativeSum plan partitions the sort
    by __chunk (many tasks) instead of a single empty-key window, and the
    offsets side joins as a broadcast."""
    p = _events(spark, sf_dir).cumulative_sum("value", as_="cum")
    plan = p.result()._sc._jvm.PythonSQLUtils.explainString(
        p.result()._jdf.queryExecution(), "formatted"
    )
    assert "hashpartitioning(__chunk" in plan
    assert "BroadcastExchange" in plan
    # the plain no-dims plan, by contrast, windows over an empty key
    spark.conf.unset(CONF_KEY)
    p2 = _events(spark, sf_dir).cumulative_sum("value", as_="cum")
    plan2 = p2.result()._sc._jvm.PythonSQLUtils.explainString(
        p2.result()._jdf.queryExecution(), "formatted"
    )
    spark.conf.set(CONF_KEY, "1")
    assert "hashpartitioning(__chunk" not in plan2


def test_moving_average_thin_chunk_fallback(spark, force_chunking):
    """A trailing window wider than the thinnest chunk can't be fed by
    ghosts — chunks_support_tail detects it and moving_average falls back
    to the exact single-window plan."""
    import datetime as dt

    rows = [
        # chunk layout at 32 buckets: most rows cluster at t0, one straggler
        # far away so some interior chunk holds a single row
        (i, dt.datetime(2024, 1, 1, 0, 0, i), float(i)) for i in range(12)
    ] + [(99, dt.datetime(2024, 3, 1), 99.0), (100, dt.datetime(2024, 6, 1), 1.0)]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, value double")
    assert not chunks_support_tail(df, "ts", tail_rows=9)
    p = Pipeline.from_df(df, time_col="ts", dims=(), tiebreak=("event_id",))
    got = p.moving_average("value", 10, as_="ma").result().collect()
    spark.conf.unset(CONF_KEY)
    want = (
        Pipeline.from_df(df, time_col="ts", dims=(), tiebreak=("event_id",))
        .moving_average("value", 10, as_="ma").result().collect()
    )
    spark.conf.set(CONF_KEY, "1")
    assert sorted(got) == sorted(want) and len(want) == 5


def test_chunked_double_cumsum_close(spark, sf_dir, force_chunking):
    """Double cumsum reassociates across chunks — values agree to float
    tolerance (exactness needs decimal, covered above)."""
    a = {r["event_id"]: r["cum"] for r in
         _events(spark, sf_dir).cumulative_sum("value", as_="cum").result().collect()}
    spark.conf.unset(CONF_KEY)
    b = {r["event_id"]: r["cum"] for r in
         _events(spark, sf_dir).cumulative_sum("value", as_="cum").result().collect()}
    spark.conf.set(CONF_KEY, "1")
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) <= 1e-6 * max(1.0, abs(b[k])) for k in a)


@pytest.mark.parametrize("op", [
    lambda p: p.state_count("value > 50", as_="sc"),
    lambda p: p.state_duration("value > 50", unit="1s", as_="sd"),
], ids=["state_count", "state_duration"])
def test_chunked_streaks_equal_single_window(spark, sf_dir, op, force_chunking):
    """stateCount/stateDuration compose the ghost-lag frame with the
    chunked integer prefix-sum — exact parity with the single window."""
    chunked = _collect(op(_events(spark, sf_dir)))
    spark.conf.unset(CONF_KEY)
    plain = _collect(op(_events(spark, sf_dir)))
    spark.conf.set(CONF_KEY, "1")
    assert len(chunked) == len(plain) and len(plain) > 0
    assert chunked == plain


def test_chunked_all_equal_timestamps_degrades_gracefully(spark, force_chunking):
    """Adversarial: every row shares ONE timestamp → one time bucket →
    one chunk. Correctness must hold (equal times can never split, so the
    plan degrades to the single-window result, not a wrong answer)."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [(i, t0, float(i % 7)) for i in range(300)],
        "event_id long, ts timestamp, value double",
    )
    p = Pipeline.from_df(df, time_col="ts", dims=(), tiebreak=("event_id",))
    got = {r["event_id"]: r["d"] for r in
           p.difference("value", as_="d").result().collect()}
    spark.conf.unset(CONF_KEY)
    want = {r["event_id"]: r["d"] for r in
            Pipeline.from_df(df, time_col="ts", dims=(), tiebreak=("event_id",))
            .difference("value", as_="d").result().collect()}
    spark.conf.set(CONF_KEY, "1")
    assert got == want and len(want) == 299


def test_chunked_random_time_distributions_property(spark, force_chunking):
    """Property sweep: clustered/uniform/tie-heavy random time layouts,
    lag + cumsum + moving_average all equal the single-window plan."""
    import datetime as dt
    import random

    rnd = random.Random(1234)
    t0 = dt.datetime(2024, 1, 1)
    for trial in range(3):
        rows = []
        cursor = 0
        for i in range(400):
            style = rnd.random()
            if style < 0.3:
                pass  # tie: same timestamp as previous
            elif style < 0.8:
                cursor += rnd.randint(1, 50)
            else:
                cursor += rnd.randint(10_000, 500_000)  # cluster gap
            rows.append((i, t0 + dt.timedelta(seconds=cursor), rnd.uniform(-5, 5)))
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, value double"
        )

        def run(op):
            return sorted(
                op(Pipeline.from_df(df, time_col="ts", dims=(),
                                    tiebreak=("event_id",))).result().collect(),
                key=lambda r: r["event_id"],
            )

        for op in (
            lambda p: p.difference("value", as_="d"),
            lambda p: p.moving_average("value", 7, as_="m"),
            lambda p: p.eval(vd=F.col("value").cast("decimal(20,6)"))
                       .cumulative_sum("vd", as_="c"),
        ):
            chunked = run(op)
            spark.conf.unset(CONF_KEY)
            plain = run(op)
            spark.conf.set(CONF_KEY, "1")
            assert chunked == plain, f"trial {trial} diverged"


def test_chunked_sample_n_equals_single_window(spark, sf_dir, force_chunking):
    """sample(N) routes through the chunked global row number — same kept
    rows as the single-window plan."""
    got = sorted(r["event_id"] for r in
                 _events(spark, sf_dir).sample(n=7).result().collect())
    spark.conf.unset(CONF_KEY)
    want = sorted(r["event_id"] for r in
                  _events(spark, sf_dir).sample(n=7).result().collect())
    spark.conf.set(CONF_KEY, "1")
    assert got == want and len(want) > 0
