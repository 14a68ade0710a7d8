"""Dense time-series kernel.

A "TimeSeries" in the reference (Java ``structures/TimeSeries.java:35-51``,
Python ``analytics/app/workload/schemes.py:15-33``) is a dense, sorted,
fixed-step grid of ``(timestamp LONG, value DOUBLE nullable)`` observations.
Here it is a schema convention on DataFrames — optionally with extra key
columns (``series_key``) for labeled series maps — plus the transforms in
:mod:`phoebe_spark.timeseries.core` and the aggregates in
:mod:`phoebe_spark.timeseries.aggregates`.
"""

from phoebe_spark.timeseries.core import (
    densify,
    fill_linear,
    merge_overwrite,
    merge_sum,
    rolling_mean_centered,
    slice_inclusive,
    strided_subsample,
    binned_mean,
)
from phoebe_spark.timeseries.aggregates import (
    regression_metrics,
    slope_intercept,
    ts_summary,
)

__all__ = [
    "densify",
    "fill_linear",
    "merge_overwrite",
    "merge_sum",
    "rolling_mean_centered",
    "slice_inclusive",
    "strided_subsample",
    "binned_mean",
    "regression_metrics",
    "slope_intercept",
    "ts_summary",
]
