"""Ports of the reference's runnable UDF examples to the @udf_node surface
(/root/reference/udf/agent/examples/{mirror,moving_avg,outliers}, exercised
in /root/reference/server/server_test.go). The reference runs these as
child processes speaking protobuf; here each is a factory returning a
@udf_node operator — the Info/Init option handshake becomes the factory's
kwargs, the data plane is Arrow-batched applyInPandas, and the per-group
window state is implicit in the sorted group batch.

All three are vectorized pandas/numpy — no per-row Python loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from kapacitor_spark.udf import udf_node

__all__ = ["mirror_udf", "moving_avg_udf", "outliers_udf", "tukey_outliers"]


def mirror_udf(output_schema: str):
    """examples/mirror: pass every point through unchanged — the protocol
    smoke-test UDF."""

    @udf_node(output_schema)
    def mirror(pdf: pd.DataFrame) -> pd.DataFrame:
        return pdf

    return mirror


def moving_avg_udf(
    output_schema: str, field: str = "value", size: int = 10, as_: str = "avg"
):
    """examples/moving_avg: trailing moving average of ``field`` over the
    last ``size`` points per group; while the window is filling, the
    cumulative average (reference AvgHandler.state.update: iterative
    window update after full, cumulative before). rolling(min_periods=1)
    reproduces both phases exactly."""

    @udf_node(output_schema)
    def moving_avg(pdf: pd.DataFrame, field=field, size=size, as_=as_):
        out = pdf.drop(columns=[field]).copy()
        out[as_] = pdf[field].rolling(size, min_periods=1).mean()
        return out

    return moving_avg


def _ref_median(vals: np.ndarray):
    """The reference's median-index rule (examples/outliers
    OutliersHandler.state.median): for even n it averages elements n/2 and
    n/2+1 (0-indexed) — mirrored verbatim so fences agree."""
    l = len(vals)
    m = l // 2
    if l % 2 == 0:
        left, right = m, min(m + 1, l - 1)
        med = (vals[left] + vals[right]) / 2.0
    else:
        left = right = m
        med = vals[m]
    return left, right, med


def tukey_bounds(vals: np.ndarray, scale: float = 1.5):
    """Tukey fences with the reference's quartile construction
    (examples/outliers bounds(): quartiles are medians of the halves
    split at the median indices). Returns (lower, upper)."""
    s = np.sort(vals)
    ml, mr, _ = _ref_median(s)
    _, _, fq = _ref_median(s[:mr])
    _, _, tq = _ref_median(s[ml + 1:])
    iqr = tq - fq
    return fq - iqr * scale, tq + iqr * scale


def tukey_outliers(vals: np.ndarray, scale: float = 1.5) -> np.ndarray:
    """Boolean mask of values outside the Tukey fences."""
    lower, upper = tukey_bounds(vals, scale)
    return (vals < lower) | (vals > upper)


def outliers_udf(output_schema: str, field: str = "value", scale: float = 1.5):
    """examples/outliers: emit only the points whose ``field`` lies outside
    the Tukey fences of their group/batch (reference semantics: all
    entries below lower or above upper after the median-split quartile
    rule)."""

    @udf_node(output_schema)
    def outliers(pdf: pd.DataFrame, field=field, scale=scale):
        if len(pdf) < 2:
            return pdf.iloc[0:0]
        mask = tukey_outliers(pdf[field].to_numpy(dtype=float), scale)
        return pdf.loc[mask]

    return outliers
