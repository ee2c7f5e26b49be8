"""Count windows + Holt-Winters (SURVEY §2.4/2.5)."""

import pytest
from pyspark.sql import functions as F

from kapacitor_spark import Pipeline


@pytest.fixture(scope="module")
def series(spark):
    # one group, 12 points 1h apart, values 1..12
    rows = [(i, f"2024-01-01 {i:02d}:00:00", "a", float(i + 1)) for i in range(12)]
    df = spark.createDataFrame(rows, "id long, t string, g string, v double")
    return df.withColumn("t", F.to_timestamp("t"))


def test_window_count_emit_and_frame(series):
    p = Pipeline.from_df(series, time_col="t", dims=("g",), tiebreak=("id",))
    out = (
        p.window_count(3, 2)
        .agg_over(s=F.sum("v"), n=F.count("v"))
        .result()
        .orderBy("t")
        .collect()
    )
    # every 2nd point emits; frame = last 3 points
    assert [r.n for r in out] == [2, 3, 3, 3, 3, 3]
    assert [r.s for r in out] == [1 + 2, 2 + 3 + 4, 4 + 5 + 6, 6 + 7 + 8, 8 + 9 + 10, 10 + 11 + 12]


def test_window_count_fill_period(series):
    p = Pipeline.from_df(series, time_col="t", dims=("g",), tiebreak=("id",))
    out = p.window_count(5, 1, fill_period=True).mean("v", as_="m").result().collect()
    # first emit only after 5 points
    assert len(out) == 8
    assert min(r.m for r in out) == 3.0  # mean(1..5)


def test_window_count_rejects_multi_agg(series):
    p = Pipeline.from_df(series, time_col="t", dims=("g",))
    with pytest.raises(ValueError, match="count/trailing windows"):
        p.window_count(3).agg(F.sum("v").alias("s"))


def test_holt_winters_trend(series):
    # pure linear trend, no season: forecast must continue the line ~13,14,15
    p = Pipeline.from_df(series, time_col="t", dims=("g",))
    out = p.holt_winters("v", h=3, m=0, interval="1h").result().orderBy("t").collect()
    assert len(out) == 3
    vals = [r.holt_winters for r in out]
    assert vals[0] == pytest.approx(13.0, abs=0.5)
    assert vals[2] == pytest.approx(15.0, abs=1.0)
    # forecast times continue the hourly grid
    assert [r.t.hour for r in out] == [12, 13, 14]


def test_holt_winters_seasonal(spark):
    # 4-period season repeated 6x: [10, 20, 30, 20] — forecast repeats it
    pat = [10.0, 20.0, 30.0, 20.0]
    rows = [
        (i, f"2024-01-01 {i:02d}:00:00" if i < 24 else None, "a", pat[i % 4])
        for i in range(24)
    ]
    df = spark.createDataFrame(
        [(i, t, g, v) for i, t, g, v in rows if t], "id long, t string, g string, v double"
    ).withColumn("t", F.to_timestamp("t"))
    p = Pipeline.from_df(df, time_col="t", dims=("g",))
    out = p.holt_winters("v", h=4, m=4, interval="1h").result().orderBy("t").collect()
    vals = [r.holt_winters for r in out]
    assert vals == pytest.approx(pat, rel=0.25)


def test_holt_winters_with_fit(series):
    p = Pipeline.from_df(series, time_col="t", dims=("g",))
    out = p.holt_winters("v", h=2, m=0, interval="1h", include_fit=True).result()
    assert out.count() == 12 + 2
