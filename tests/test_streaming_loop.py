"""End-to-end streaming QoS loop: a live windowed streaming job feeds the
metrics listener, metric rows flow through the timeseries kernel
(slope/summary), and the TWRES baseline issues a scaling decision — the
reference's monitor->analyze->decide loop in streaming mode (SURVEY §2.10 +
§3.3)."""

from __future__ import annotations

import tempfile
import time

import numpy as np
import pytest
from pyspark.sql import functions as F

from phoebe_spark.models.twres import TwresModel
from phoebe_spark.streaming import ProgressMetricsListener, sine_rate_source, windowed_keyed_agg
from phoebe_spark.streaming.jobs import run_to_sink
from phoebe_spark.timeseries.aggregates import slope_intercept, ts_summary


def test_stream_metrics_to_decision(spark):
    listener = ProgressMetricsListener()
    spark.streams.addListener(listener)
    try:
        src = sine_rate_source(spark, rows_per_second=2000, period=120, num_keys=10)
        agg = windowed_keyed_agg(src, window="2 seconds", watermark="4 seconds", aggs={"events": "count"})
        q = run_to_sink(agg, tempfile.mkdtemp(), queryName="qos_loop", trigger_available_now=False)
        deadline = time.time() + 30
        while time.time() < deadline and len(listener.rows) < 12:
            time.sleep(0.5)
        q.stop()
        assert len(listener.rows) >= 12, "no progress events collected"

        metrics = listener.to_df(spark)
        # timeseries kernel over live metrics: summary + trend per series
        summ = {r["series_key"]: r for r in ts_summary(metrics, keys=["series_key"]).collect()}
        assert summ["thrRate"]["avg_value"] >= 0
        trend = {r["series_key"]: r["slope"] for r in slope_intercept(metrics, keys=["series_key"]).collect()}
        assert "thrRate" in trend

        # decision: TWRES on a capacity curve, fed the observed rate
        m = TwresModel()
        m.fit([2, 5, 8, 11, 14, 17, 20, 23], [2000 + 900 * s for s in [2, 5, 8, 11, 14, 17, 20, 23]])
        observed_rate = summ["thrRate"]["avg_value"] or 2000.0

        class _Obs:
            def predict(self, ts, vals, horizon):
                end = int(np.asarray(ts)[-1])
                return np.arange(end + 1, end + 1 + horizon), np.full(horizon, observed_rate)

        t = np.arange(0, 60)
        vals = np.full(60, observed_rate)
        pick = m.predict(_Obs(), t, vals, current_scale_out=4, min_scale_out=2,
                         max_scale_out=24, time_window_interval=30,
                         avg_latency=100.0, max_latency_constraint=2000.0)
        assert 2 <= pick <= 24
    finally:
        spark.streams.removeListener(listener)
