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


def spearman_xy(df: DataFrame, x: str, y: str, tiebreak: str) -> DataFrame:
    """Spearman rank correlation between two columns of one aligned frame,
    with average ranks for ties (the textbook definition): row_number over
    (value, tiebreak) gives a total order, then the mean row_number per
    distinct value is the tie-averaged rank; Pearson corr of the two rank
    columns is Spearman's rho.

    The two rank windows are unkeyed (global sort) — appropriate for the
    aligned two-series frames this serves (one row per time bucket). For
    a billion-row frame, bucket by coarse value ranges first or accept an
    approximate rho from a sampled frame."""
    from pyspark.sql import Window

    wx = Window.orderBy(F.col(x).asc(), F.col(tiebreak).asc())
    wy = Window.orderBy(F.col(y).asc(), F.col(tiebreak).asc())
    d = df.withColumn("_rnx", F.row_number().over(wx)).withColumn(
        "_rny", F.row_number().over(wy)
    )
    d = d.withColumn("_ax", F.avg("_rnx").over(Window.partitionBy(x))).withColumn(
        "_ay", F.avg("_rny").over(Window.partitionBy(y))
    )
    return d.agg(
        F.corr("_ax", "_ay").alias("spearman"),
        F.count(F.lit(1)).alias("n_obs"),
    )


def theil_sen(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    max_points: int = 120,
) -> DataFrame:
    """Theil-Sen robust slope per ``key``: the median of all pairwise
    slopes (value_b - value_a) / (order_b - order_a). Breakdown point
    ~29% vs OLS's 0 — the trend estimate that shrugs off the outliers
    that bend :func:`slope_intercept`.

    All-pairs is O(n^2), so the series is first strided down to at most
    ~``max_points`` points per key with pure integer math (row_number
    modulo a per-key stride — deterministic, engine-portable, no RNG).
    The pair join is per-key equi-join on the strided frame: at most
    ~max_points^2/2 pairs per key, bounded whatever the series length.
    """
    from pyspark.sql import Window

    w = Window.partitionBy(key).orderBy(order)
    d = (
        df.withColumn("_rn", F.row_number().over(w))
        .withColumn("_n", F.count(F.lit(1)).over(Window.partitionBy(key)))
        .withColumn(
            "_stride", F.greatest(F.lit(1), F.floor(F.col("_n") / max_points))
        )
        .filter(F.col("_rn") % F.col("_stride") == 0)
        .select(key, F.col(order).alias("_t"), F.col(value).alias("_v"))
    )
    a = d.select(key, F.col("_t").alias("ta"), F.col("_v").alias("va"))
    b = d.select(key, F.col("_t").alias("tb"), F.col("_v").alias("vb"))
    pairs = a.join(b, key).filter(F.col("ta") < F.col("tb"))
    slope = (F.col("vb") - F.col("va")) / (F.col("tb") - F.col("ta"))
    return (
        pairs.withColumn("_s", slope)
        .groupBy(key)
        .agg(
            F.expr("percentile(_s, 0.5)").alias("ts_slope"),
            F.count(F.lit(1)).alias("n_pairs"),
        )
    )
