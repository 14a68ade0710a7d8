"""Null-skipping aggregates, slope/trend, and regression-metric suites.

Reference citations (/root/reference):
- ts_summary         — avg/min/max/sum/count, TimeSeries.java:266-316 &
                       workload/schemes.py:19-21 (count INCLUDES nulls);
                       first/last non-null, TimeSeries.java:256-264
- slope_intercept    — OLS slope per series, analytics/app/common/routes.py:27-47
                       and ClientsManager.java:329-339 (trend / backpressure
                       detection); closed form, no MLlib
- regression_metrics — MAE/MedianAE/MAPE/MSE/RMSE,
                       analytics/app/common/models.py:41-51

Note on A2 (min/max): the Java accumulators init to 0, so an all-positive
series would report min=0 (``TimeSeries.java:281-305``). That is a bug, and
the reference's own Python side uses true min/max (np.amin/np.amax,
``latency/models.py:69-70``) — we deliberately implement true min/max.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TS = "timestamp"
VAL = "value"


def ts_summary(df: DataFrame, keys: Sequence[str] | None = None) -> DataFrame:
    """One row per series: null-skipping avg/min/max/sum, count (including
    null observations, matching ``workload/schemes.py:19-21``), non-null
    count, and first/last non-null values by time (``max_by``/``min_by`` —
    single-pass, no sort)."""
    keys = list(keys or [])
    v, t = F.col(VAL), F.col(TS)
    valid_t = F.when(v.isNotNull(), t)
    aggs = [
        F.avg(v).alias("avg_value"),
        F.min(v).alias("min_value"),
        F.max(v).alias("max_value"),
        F.sum(v).alias("sum_value"),
        F.count(F.lit(1)).alias("count_obs"),
        F.count(v).alias("count_non_null"),
        F.min(t).alias("start_time"),
        F.max(t).alias("end_time"),
        F.max_by(v, valid_t).alias("last_value"),
        F.min_by(v, valid_t).alias("first_value"),
    ]
    return df.groupBy(*keys).agg(*aggs) if keys else df.agg(*aggs)


def slope_intercept(
    df: DataFrame,
    keys: Sequence[str] | None = None,
    x_col: str = TS,
    y_col: str = VAL,
) -> DataFrame:
    """Per-series OLS fit ``y = slope*x + intercept`` as closed-form
    aggregates: ``slope = covar_pop(x, y) / var_pop(x)``,
    ``intercept = avg(y) - slope*avg(x)``. Used by the reference for trend
    detection and extrapolation (``common/routes.py:27-47``,
    ``ClientsManager.java:441-450``). One shuffle, map-side partials."""
    keys = list(keys or [])
    x = F.col(x_col).cast("double")
    y = F.col(y_col)
    base = df.filter(y.isNotNull())
    # try_divide: a single-observation series has var_pop(x) = 0 — its
    # slope is undefined (null), not an ANSI division error
    slope = F.try_divide(F.covar_pop(x, y), F.var_pop(x)).alias("slope")
    aggs = [slope, F.avg(y).alias("_my"), F.avg(x).alias("_mx")]
    g = base.groupBy(*keys).agg(*aggs) if keys else base.agg(*aggs)
    return g.select(
        *keys,
        F.col("slope"),
        (F.col("_my") - F.col("slope") * F.col("_mx")).alias("intercept"),
    )


def regression_metrics(
    df: DataFrame,
    y_true: str,
    y_pred: str,
    keys: Sequence[str] | None = None,
    exact_median: bool = False,
) -> DataFrame:
    """MAE, MedianAE, MAPE, MSE, RMSE between two columns
    (``analytics/app/common/models.py:41-51``). By default MedianAE uses
    ``percentile_approx`` — at 100 TB an exact median forces a per-group
    sort while the approx sketch merges map-side. ``exact_median=True``
    switches to the exact interpolating percentile (used for oracle
    parity checks on small data)."""
    keys = list(keys or [])
    d = F.col(y_true) - F.col(y_pred)
    ad = F.abs(d)
    base = df.filter(F.col(y_true).isNotNull() & F.col(y_pred).isNotNull())
    median = (
        F.percentile(ad, F.lit(0.5))
        if exact_median
        else F.percentile_approx(ad, F.lit(0.5), F.lit(100000))
    )
    aggs = [
        F.avg(ad).alias("mae"),
        median.alias("median_ae"),
        F.avg(F.abs(d / F.col(y_true))).alias("mape"),
        F.avg(d * d).alias("mse"),
        F.sqrt(F.avg(d * d)).alias("rmse"),
    ]
    return base.groupBy(*keys).agg(*aggs) if keys else base.agg(*aggs)
