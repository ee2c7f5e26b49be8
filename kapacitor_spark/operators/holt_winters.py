"""Holt-Winters forecasting (SURVEY §2.5).

Reference surface: ``holtWinters(field, h, m, interval)`` /
``holtWintersWithFit`` (/root/reference/pipeline/influxql.go:555-599) — per
group, fit triple exponential smoothing to the series sampled at
``interval`` and emit ``h`` forecast points (m = season length; m<2 means
no seasonality). The reference delegates to influxdb's implementation;
ours is written from the published Holt-Winters equations (additive trend,
multiplicative seasonality) with parameters chosen by a deterministic
Nelder-Mead minimizing SSE — the same approach the public influxdb engine
documents.

Spark shape: ``applyInPandas`` per group — Arrow-batched, embarrassingly
parallel across groups; each group's series must fit in one task (same
constraint the reference has per group, /root/reference/influxql.go:62).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType, StructField, StructType, TimestampType

from kapacitor_spark.durations import parse_duration


def _fit_sse(params: np.ndarray, y: np.ndarray, m: int) -> float:
    """One smoothing pass; returns sum of squared one-step errors."""
    alpha, beta, gamma = params
    if not (0 <= alpha <= 1 and 0 <= beta <= 1 and 0 <= gamma <= 1):
        return np.inf
    n = len(y)
    if m >= 2:
        season = np.array([y[i] / max(np.mean(y[:m]), 1e-12) for i in range(m)])
        level = float(np.mean(y[:m]))
        trend = (np.mean(y[m : 2 * m]) - np.mean(y[:m])) / m if n >= 2 * m else 0.0
        start = 0
    else:
        season = None
        level, trend = y[0], (y[1] - y[0]) if n > 1 else 0.0
        start = 0
    sse = 0.0
    for i in range(start, n):
        s = season[i % m] if season is not None else 1.0
        pred = (level + trend) * (s if season is not None else 1.0)
        err = y[i] - pred
        sse += err * err
        last_level = level
        if season is not None:
            level = alpha * (y[i] / max(season[i % m], 1e-12)) + (1 - alpha) * (level + trend)
            season[i % m] = gamma * (y[i] / max(level, 1e-12)) + (1 - gamma) * season[i % m]
        else:
            level = alpha * y[i] + (1 - alpha) * (level + trend)
        trend = beta * (level - last_level) + (1 - beta) * trend
    return float(sse)


def _nelder_mead(f, x0: np.ndarray, iters: int = 120) -> np.ndarray:
    """Compact deterministic Nelder-Mead (fixed initial simplex, standard
    reflect/expand/contract/shrink coefficients)."""
    n = len(x0)
    simplex = [x0]
    for i in range(n):
        p = x0.copy()
        p[i] = min(p[i] + 0.25, 1.0)
        simplex.append(p)
    vals = [f(p) for p in simplex]
    for _ in range(iters):
        order = np.argsort(vals)
        simplex = [simplex[i] for i in order]
        vals = [vals[i] for i in order]
        centroid = np.mean(simplex[:-1], axis=0)
        refl = centroid + (centroid - simplex[-1])
        fr = f(refl)
        if fr < vals[0]:
            exp = centroid + 2 * (centroid - simplex[-1])
            fe = f(exp)
            simplex[-1], vals[-1] = (exp, fe) if fe < fr else (refl, fr)
        elif fr < vals[-2]:
            simplex[-1], vals[-1] = refl, fr
        else:
            contr = centroid + 0.5 * (simplex[-1] - centroid)
            fc = f(contr)
            if fc < vals[-1]:
                simplex[-1], vals[-1] = contr, fc
            else:
                simplex = [simplex[0]] + [
                    simplex[0] + 0.5 * (p - simplex[0]) for p in simplex[1:]
                ]
                vals = [vals[0]] + [f(p) for p in simplex[1:]]
    return simplex[int(np.argmin(vals))]


def _forecast(y: np.ndarray, h: int, m: int) -> tuple[np.ndarray, np.ndarray]:
    """Returns (fitted, forecast[h])."""
    params = _nelder_mead(lambda p: _fit_sse(p, y, m), np.array([0.5, 0.1, 0.1]))
    alpha, beta, gamma = params
    n = len(y)
    if m >= 2:
        season = np.array([y[i] / max(np.mean(y[:m]), 1e-12) for i in range(m)])
        level = float(np.mean(y[:m]))
        trend = (np.mean(y[m : 2 * m]) - np.mean(y[:m])) / m if n >= 2 * m else 0.0
    else:
        season = None
        level, trend = y[0], (y[1] - y[0]) if n > 1 else 0.0
    fitted = np.empty(n)
    for i in range(n):
        s = season[i % m] if season is not None else 1.0
        fitted[i] = (level + trend) * (s if season is not None else 1.0)
        last_level = level
        if season is not None:
            level = alpha * (y[i] / max(season[i % m], 1e-12)) + (1 - alpha) * (level + trend)
            season[i % m] = gamma * (y[i] / max(level, 1e-12)) + (1 - gamma) * season[i % m]
        else:
            level = alpha * y[i] + (1 - alpha) * (level + trend)
        trend = beta * (level - last_level) + (1 - beta) * trend
    fc = np.empty(h)
    for k in range(1, h + 1):
        s = season[(n + k - 1) % m] if season is not None else 1.0
        fc[k - 1] = (level + k * trend) * (s if season is not None else 1.0)
    return fitted, fc


def holt_winters(
    df: DataFrame,
    fld: str,
    h: int,
    m: int,
    interval: str | float,
    time_col: str = "time",
    dims: tuple[str, ...] = (),
    include_fit: bool = False,
    as_: str | None = None,
) -> DataFrame:
    """Forecast ``h`` points at ``interval`` spacing per group.

    Output schema: dims + (time, <as_>) — forecast points only, or
    fit+forecast with ``include_fit`` (holtWintersWithFit). The series is
    resampled onto the interval grid by mean (the reference requires the
    input already aggregated at interval; resampling makes this robust to
    irregular input).
    """
    out_name = as_ or f"holt_winters{'_with_fit' if include_fit else ''}"
    step_us = round(parse_duration(interval) * 1_000_000)
    schema = StructType(
        [df.schema[d] for d in dims]
        + [StructField(time_col, TimestampType(), False)]
        + [StructField(out_name, DoubleType(), True)]
    )

    def fc(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(time_col)
        t_us = pdf[time_col].astype("int64") // 1000  # ns -> µs
        bucket = (t_us - t_us % step_us).to_numpy()
        series = pdf.assign(__b=bucket).groupby("__b")[fld].mean()
        y = series.to_numpy(dtype=float)
        if len(y) < max(2, 2 * m if m >= 2 else 2):
            return pd.DataFrame(columns=[*dims, time_col, out_name])
        fitted, fcst = _forecast(y, h, m if m >= 2 else 0)
        last = int(series.index[-1])
        times = [last + (k + 1) * step_us for k in range(h)]
        vals = list(fcst)
        if include_fit:
            times = list(series.index) + times
            vals = list(fitted) + vals
        out = pd.DataFrame({time_col: pd.to_datetime(np.array(times, dtype="int64") * 1000), out_name: vals})
        for d in dims:
            out[d] = pdf[d].iloc[0]
        return out[[*dims, time_col, out_name]]

    gb = df.groupBy(*[F.col(d) for d in dims]) if dims else df.groupBy()
    return gb.applyInPandas(fc, schema=schema)
