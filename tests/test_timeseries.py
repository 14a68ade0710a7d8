"""Golden-value tests for the time-series kernel, pinned to the reference's
own test expectations (/root/reference/analytics/app/test/api_test.py:38-48
for the merge golden; structures/TimeSeries.java:109-138 for sum-merge)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from phoebe_spark.timeseries.core import asof_join
from phoebe_spark.timeseries import (
    binned_mean,
    densify,
    fill_linear,
    merge_overwrite,
    merge_sum,
    slice_inclusive,
    strided_subsample,
)
from phoebe_spark.timeseries.aggregates import slope_intercept, ts_summary


def _ts(spark, pairs):
    return spark.createDataFrame(
        [(int(t), float(v) if v is not None else None) for t, v in pairs],
        "timestamp LONG, value DOUBLE",
    )


def test_merge_overwrite_golden(spark):
    """The reference's exact-value merge golden: merge({0:1,1:2,2:2,3:3},
    {7:8,8:9,9:9,10:10}) == [1,2,2,3,4.25,5.5,6.75,8,9,9,10] on 0..10
    (api_test.py:38-48 — outer join + overwrite + linear interpolation)."""
    ts1 = _ts(spark, [(0, 1), (1, 2), (2, 2), (3, 3)])
    ts2 = _ts(spark, [(7, 8), (8, 9), (9, 9), (10, 10)])
    out = merge_overwrite(ts1, ts2, assume_bounded=True).orderBy("timestamp").collect()
    assert [r["timestamp"] for r in out] == list(range(11))
    assert [r["value"] for r in out] == [1, 2, 2, 3, 4.25, 5.5, 6.75, 8, 9, 9, 10]


def test_merge_overwrite_recency_wins(spark):
    """Later-ending series overwrites earlier on overlap
    (workload/schemes.py:83-88: series written in ascending end_time)."""
    early = _ts(spark, [(0, 1), (1, 1), (2, 1)])
    late = _ts(spark, [(1, 9), (2, 9), (3, 9)])
    out = {r["timestamp"]: r["value"] for r in merge_overwrite(early, late, assume_bounded=True).collect()}
    assert out == {0: 1.0, 1: 9.0, 2: 9.0, 3: 9.0}


def test_merge_sum_java_semantics(spark):
    """Java merge sums overlapping non-null values; disjoint gaps remain
    null (no interpolation) — TimeSeries.java:109-138."""
    ts1 = _ts(spark, [(0, 1), (1, 2), (2, None)])
    ts2 = _ts(spark, [(1, 10), (2, 20), (4, 40)])
    dense = densify(merge_sum(ts1, ts2), step=1, assume_bounded=True)
    out = {r["timestamp"]: r["value"] for r in dense.collect()}
    assert out == {0: 1.0, 1: 12.0, 2: 20.0, 3: None, 4: 40.0}


def test_fill_linear_interior_and_edges(spark):
    df = _ts(spark, [(0, None), (1, 2.0), (2, None), (3, None), (4, 8.0), (5, None)])
    out = [r["value"] for r in fill_linear(df, assume_bounded=True).orderBy("timestamp").collect()]
    assert out == [2.0, 2.0, 4.0, 6.0, 8.0, 8.0]


def test_slice_inclusive_both_ends(spark):
    """Pandas .loc[start:end] keeps BOTH ends (workload/schemes.py:96-101)."""
    df = _ts(spark, [(i, i) for i in range(10)])
    out = sorted(r["timestamp"] for r in slice_inclusive(df, 3, 6).collect())
    assert out == [3, 4, 5, 6]


def test_strided_subsample_anchors_latest(spark):
    """Backwards stride keeps the newest observation and every rate-th
    before it (TimeSeries.java:185-215)."""
    df = _ts(spark, [(i, i) for i in range(10)])
    out = sorted(r["timestamp"] for r in strided_subsample(df, rate=3, assume_bounded=True).collect())
    assert out == [0, 3, 6, 9]
    limited = sorted(r["timestamp"] for r in strided_subsample(df, rate=3, limit=2, assume_bounded=True).collect())
    assert limited == [6, 9]


def test_densify_fills_gaps_with_null(spark):
    df = _ts(spark, [(0, 1.0), (3, 4.0)])
    out = {r["timestamp"]: r["value"] for r in densify(df, step=1, assume_bounded=True).collect()}
    assert out == {0: 1.0, 1: None, 2: None, 3: 4.0}


def test_binned_mean(spark):
    """subsample() equal-width bins (recoverytime/models.py:33-39)."""
    df = _ts(spark, [(i, float(i)) for i in range(10)])
    out = {r["bin"]: r["value"] for r in binned_mean(df, bin_count=5).collect()}
    assert out == {0: 0.5, 1: 2.5, 2: 4.5, 3: 6.5, 4: 8.5}


def test_ts_summary_counts_include_nulls(spark):
    """count = all observations incl. nulls (workload/schemes.py:19-21);
    aggregates skip nulls; first/last are non-null by time."""
    df = _ts(spark, [(0, None), (1, 2.0), (2, 4.0), (3, None)])
    r = ts_summary(df).collect()[0]
    assert r["count_obs"] == 4 and r["count_non_null"] == 2
    assert r["avg_value"] == 3.0 and r["sum_value"] == 6.0
    assert r["first_value"] == 2.0 and r["last_value"] == 4.0
    assert r["start_time"] == 0 and r["end_time"] == 3


def test_slope_intercept_exact_line(spark):
    df = _ts(spark, [(i, 2.0 * i + 5.0) for i in range(10)])
    r = slope_intercept(df).collect()[0]
    assert r["slope"] == pytest.approx(2.0)
    assert r["intercept"] == pytest.approx(5.0)


def test_unkeyed_global_window_warns(spark):
    """VERDICT r1 #8: unkeyed calls put a single-partition global sort (or
    a one-row grid explode) in the plan — legal only for bounded series, so
    the kernel warns unless `keys` partitions it or `assume_bounded`
    asserts it."""
    import warnings

    from phoebe_spark.timeseries.core import UnkeyedGlobalWindowWarning

    df = _ts(spark, [(0, 1.0), (2, None), (4, 3.0)])
    with pytest.warns(UnkeyedGlobalWindowWarning):
        densify(df, step=1)
    with pytest.warns(UnkeyedGlobalWindowWarning):
        fill_linear(df)
    with pytest.warns(UnkeyedGlobalWindowWarning):
        strided_subsample(df, rate=2)
    with pytest.warns(UnkeyedGlobalWindowWarning):
        merge_overwrite(df, df)
    with pytest.warns(UnkeyedGlobalWindowWarning):
        asof_join(df, df.select("timestamp", F.col("value").alias("rv")), value_cols=["rv"])
    # keyed or explicitly-asserted-bounded calls stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error", UnkeyedGlobalWindowWarning)
        densify(df, step=1, assume_bounded=True)
        fill_linear(df, assume_bounded=True)
        merge_overwrite(df, df, assume_bounded=True)
        densify(df.withColumn("k", F.lit(1)), step=1, keys=["k"])
        fill_linear(df.withColumn("k", F.lit(1)), keys=["k"])
        asof_join(
            df, df.select("timestamp", F.col("value").alias("rv")),
            value_cols=["rv"], assume_bounded=True,
        )
        asof_join(
            df.withColumn("k", F.lit(1)),
            df.select("timestamp", F.col("value").alias("rv")).withColumn("k", F.lit(1)),
            by=["k"], value_cols=["rv"],
        )


def test_asof_join_semantics(spark):
    """Backward as-of: most recent right row at-or-before each left row,
    per key; ties inclusive; no-match rows null; tolerance cuts old rows."""
    from phoebe_spark.timeseries.core import asof_join

    left = spark.createDataFrame(
        [("a", 5, 1.0), ("a", 12, 2.0), ("b", 7, 3.0)],
        "k STRING, timestamp LONG, lv DOUBLE",
    )
    right = spark.createDataFrame(
        [("a", 3, 30.0), ("a", 10, 100.0), ("a", 12, 120.0), ("b", 9, 90.0)],
        "k STRING, timestamp LONG, rv DOUBLE",
    )
    out = {
        (r["k"], r["timestamp"]): r["rv_asof"]
        for r in asof_join(left, right, by=["k"], value_cols=["rv"]).collect()
    }
    assert out == {("a", 5): 30.0, ("a", 12): 120.0, ("b", 7): None}
    # tolerance: at ("a", 12) with tolerance 1, the tie at 12 still matches;
    # at ("a", 5) the match from t=3 is older than 5-1 and is nulled
    tol = {
        (r["k"], r["timestamp"]): r["rv_asof"]
        for r in asof_join(left, right, by=["k"], value_cols=["rv"], tolerance=1).collect()
    }
    assert tol == {("a", 5): None, ("a", 12): 120.0, ("b", 7): None}


def test_savgol_smooth_matches_numpy_kernel(spark):
    """The all-JVM literal-coefficient savgol must match the numpy kernel
    (itself golden-tested against scipy semantics) per series, including
    the polynomial 'interp' edges."""
    import numpy as np

    from phoebe_spark.functions.numeric import savgol_filter
    from phoebe_spark.timeseries.core import savgol_smooth

    rng = np.random.default_rng(3)
    rows = []
    series = {}
    for k in ("a", "b"):
        y = rng.standard_normal(80).cumsum()
        series[k] = y
        rows += [(k, i, float(v)) for i, v in enumerate(y)]
    df = spark.createDataFrame(rows, "k STRING, timestamp LONG, value DOUBLE")
    out = savgol_smooth(df, window=21, polyorder=3, keys=["k"])
    got = {(r["k"], r["timestamp"]): r["smoothed"] for r in out.collect()}
    for k, y in series.items():
        exp = savgol_filter(y, 21, 3)
        for i, e in enumerate(exp):
            assert got[(k, i)] == pytest.approx(e, abs=1e-9), (k, i)


def test_savgol_short_series_python_fallback(spark):
    """Series shorter than `window` must get real reduced-window values
    (the numpy kernel's fallback), not silent NULLs; long series in the
    same frame stay on the JVM path and match the kernel too."""
    import numpy as np

    from phoebe_spark.functions.numeric import savgol_filter
    from phoebe_spark.timeseries.core import savgol_smooth

    rows = [("short", i, float(i * i % 7)) for i in range(9)]
    rows += [("long", i, float((i * 13) % 23)) for i in range(80)]
    df = spark.createDataFrame(rows, "k string, timestamp long, value double")
    out = savgol_smooth(df, window=51, polyorder=3, keys=["k"]).collect()
    got_short = {r["timestamp"]: r["smoothed"] for r in out if r["k"] == "short"}
    got_long = {r["timestamp"]: r["smoothed"] for r in out if r["k"] == "long"}
    assert None not in got_short.values()
    exp_short = savgol_filter(np.array([i * i % 7 for i in range(9)], float), 51, 3)
    for i, e in enumerate(exp_short):
        assert abs(got_short[i] - e) < 1e-9
    exp_long = savgol_filter(np.array([(i * 13) % 23 for i in range(80)], float), 51, 3)
    for i, e in enumerate(exp_long):
        assert abs(got_long[i] - e) < 1e-9
    # the 'null' mode keeps sub-window series NULL (documented contract)
    out2 = savgol_smooth(df, window=51, polyorder=3, keys=["k"], short_series="null").collect()
    assert all(r["smoothed"] is None for r in out2 if r["k"] == "short")
