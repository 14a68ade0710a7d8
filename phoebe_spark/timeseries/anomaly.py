"""Drift and anomaly detection over keyed time series.

The reference's monitoring loop watches workload series for regime changes
(backpressure detection ``analytics/app/optimization/` control loop; see
q34) — this module adds the standard statistical detectors a
workload-monitoring engine needs, each expressed as pure window/aggregate
plans so they distribute and stay inside whole-stage codegen:

- :func:`cusum` — one-sided CUSUM drift statistic via its prefix-sum
  closed form (Page 1954). The textbook recursion
  ``s_i = max(0, s_{i-1} + x_i - k)`` looks inherently sequential, but
  with ``p_i = cumsum(x_j - k)`` it collapses to
  ``s_i = p_i - min(0, min_{j<=i} p_j)`` — two cumulative window
  functions, no recursion, no Python.
- :func:`autocorr` — lag-k autocorrelation (ACF) per series via
  ``lag`` + ``corr``.
- :func:`mad_flags` — robust anomaly flags via median absolute
  deviation (Hampel's 3-sigma-equivalent rule, scale factor 1.4826).
- :func:`seasonal_naive_ratio` — MASE-style ratio of seasonal-naive to
  one-step-naive forecast error (Hyndman & Koehler 2006): values near or
  below 1 mean the series has exploitable seasonality at period ``m``.

Scale notes: cusum/autocorr/seasonal shuffle once on the series key and
then run cumulative/lag frames — O(rows) work, state bounded per
partition. ``mad_flags`` uses Spark's exact ``percentile`` aggregate
(buffers each group's values on one task); at 100 TB swap the two medians
for ``approx_percentile`` — the flag rule is threshold-based and tolerant
of quantile-sketch error, the exact form exists so the DuckDB oracle can
reproduce it digit-for-digit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def cusum(
    df: DataFrame,
    key: str,
    order: str,
    value: str,
    k: float,
    h: float,
) -> DataFrame:
    """One-sided (upper) CUSUM per ``key``, ordered by ``order``.

    Returns one row per input row with ``stat`` (the CUSUM statistic) and
    ``alarm`` (stat > h). ``k`` is the reference/slack value — drifts
    smaller than ``k`` per step are absorbed; ``h`` the decision
    threshold.
    """
    w = Window.partitionBy(key).orderBy(order).rowsBetween(Window.unboundedPreceding, 0)
    p = F.sum(F.col(value) - F.lit(float(k))).over(w)
    d = df.withColumn("_p", p).withColumn("_pmin", F.min("_p").over(w))
    stat = F.col("_p") - F.least(F.lit(0.0), F.col("_pmin"))
    return (
        d.withColumn("stat", stat)
        .withColumn("alarm", F.col("stat") > F.lit(float(h)))
        .drop("_p", "_pmin")
    )


def autocorr(df: DataFrame, key: str, order: str, value: str, lag: int) -> DataFrame:
    """Lag-``lag`` sample autocorrelation per ``key``: corr(x_t, x_{t-lag})
    over rows ordered by ``order``. One shuffle on the key; ``corr`` is a
    single-pass co-moment aggregate."""
    w = Window.partitionBy(key).orderBy(order)
    d = df.withColumn("_prev", F.lag(value, lag).over(w)).filter(F.col("_prev").isNotNull())
    return d.groupBy(key).agg(
        F.corr(value, "_prev").alias("acf"),
        F.count(F.lit(1)).alias("n_pairs"),
    )


def mad_flags(
    df: DataFrame,
    key: str,
    value: str,
    n_sigmas: float = 3.0,
    exact: bool = True,
) -> DataFrame:
    """Robust outlier counts per ``key`` via the Hampel MAD rule: a point
    is anomalous when ``|x - median| > n_sigmas * 1.4826 * MAD``.

    Two grouped quantile passes (median, then median of absolute
    deviations) with the tiny per-key result broadcast back. ``exact=True``
    uses Spark's exact ``percentile`` (oracle-reproducible);
    ``exact=False`` uses ``approx_percentile`` for bounded-memory groups at
    scale.
    """
    pf = "percentile({c}, 0.5)" if exact else "approx_percentile({c}, 0.5, 10000)"
    med = df.groupBy(key).agg(F.expr(pf.format(c=value)).alias("med"))
    dev = df.join(F.broadcast(med), key).withColumn(
        "_adev", F.abs(F.col(value) - F.col("med"))
    )
    mad = dev.groupBy(key).agg(F.expr(pf.format(c="_adev")).alias("mad"))
    # Round the threshold ingredients so an independent engine lands on the
    # identical cut line (same contract as the EWM closed-form oracle).
    thr = dev.join(F.broadcast(mad), key).withColumn(
        "_thr",
        F.lit(float(n_sigmas)) * 1.4826 * F.round("mad", 6),
    )
    return thr.groupBy(key).agg(
        F.round(F.first("med"), 6).alias("median"),
        F.round(F.first("mad"), 6).alias("mad"),
        F.sum(
            (F.abs(F.col(value) - F.round("med", 6)) > F.col("_thr")).cast("long")
        ).alias("n_anomalies"),
        F.count(F.lit(1)).alias("n_points"),
    )


def seasonal_naive_ratio(
    df: DataFrame, key: str, order: str, value: str, period: int
) -> DataFrame:
    """MASE-style seasonality diagnostic per ``key``: mean absolute error
    of the seasonal-naive forecast (x_{t-period}) divided by that of the
    one-step naive (x_{t-1}), both restricted to rows where the seasonal
    lag exists so numerator and denominator cover the same points.

    The absolute errors are summed as DECIMAL(18,6) — an exact,
    order-independent sum (the q01 money-sum contract) — so the MAEs are
    bit-identical across partition layouts, retries, and engines; a plain
    double ``avg`` can flip the last rounded digit depending on
    accumulation order."""
    w = Window.partitionBy(key).orderBy(order)
    d = (
        df.withColumn("_l1", F.lag(value, 1).over(w))
        .withColumn("_lm", F.lag(value, period).over(w))
        .filter(F.col("_lm").isNotNull())
    )
    sm = F.sum(F.abs(F.col(value) - F.col("_lm")).cast("decimal(18,6)")).cast("double")
    s1 = F.sum(F.abs(F.col(value) - F.col("_l1")).cast("decimal(18,6)")).cast("double")
    n = F.count(F.lit(1))
    return d.groupBy(key).agg(
        (sm / n).alias("mae_seasonal"),
        (s1 / n).alias("mae_naive"),
        (sm / s1).alias("ratio"),
        n.alias("n_obs"),
    )
