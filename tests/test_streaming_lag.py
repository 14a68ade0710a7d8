"""Consumer-lag / late-data monitoring (VERDICT r1 #6): the listener must
emit the ``records_lag_max`` analog plus watermark-delay and late-drop
series (``ClientsManager.java:50,374-380`` scrapes exactly these from
PromQL), and the streaming backpressure rule — q34's detector fed live
metrics — must flip under a throttled sink."""

from __future__ import annotations

import tempfile
import time

from pyspark.sql import functions as F

from phoebe_spark.streaming import ProgressMetricsListener, detect_backpressure
from phoebe_spark.streaming.jobs import windowed_keyed_agg


def _metrics_df(spark, batches):
    """batches: list of dicts with thrRate/procRate/batchDur/watermarkLagMs."""
    rows = []
    for i, b in enumerate(batches):
        for k, v in b.items():
            rows.append((i, k, float(v)))
    return spark.createDataFrame(rows, "timestamp LONG, series_key STRING, value DOUBLE")


def test_backpressure_rule_synthetic(spark):
    """Deterministic check of the ClientsManager.java:329-339 rule shape:
    full backpressure, partial+rising, partial+flat-lag, and healthy."""
    healthy = _metrics_df(
        spark,
        [{"thrRate": 100, "procRate": 1000, "batchDur": 100 + (i % 2), "watermarkLagMs": 4000 + (i % 3)} for i in range(8)],
    )
    assert detect_backpressure(healthy).collect()[0]["is_bck_pres"] is False

    full = _metrics_df(
        spark,
        [{"thrRate": 1000, "procRate": 400, "batchDur": 2000 - i, "watermarkLagMs": 9000 - i} for i in range(8)],
    )
    r = detect_backpressure(full).collect()[0]
    assert r["bck_pres_per"] == 1.0 and r["is_bck_pres"] is True

    partial_rising = _metrics_df(
        spark,
        [
            {
                "thrRate": 1000,
                "procRate": 1200 if i % 2 else 800,
                "batchDur": 500 + 300 * i,
                "watermarkLagMs": 4000 + 900 * i,
            }
            for i in range(8)
        ],
    )
    r = detect_backpressure(partial_rising).collect()[0]
    assert 0 < r["bck_pres_per"] < 1 and r["is_bck_pres"] is True

    partial_flat = _metrics_df(
        spark,
        [
            {
                "thrRate": 1000,
                "procRate": 1200 if i % 2 else 800,
                "batchDur": 500 + 300 * i,
                "watermarkLagMs": 5000 - 10 * i,
            }
            for i in range(8)
        ],
    )
    assert detect_backpressure(partial_flat).collect()[0]["is_bck_pres"] is False


def test_lag_series_and_backpressure_flip(spark):
    """Live loop: a watermarked windowed agg over a rate source where every
    5th event arrives 120 s late, drained by a sink whose per-batch cost
    grows. The listener must surface watermarkLagMs / stateRows /
    lateDropped / lagMax, late rows must actually be dropped, and the
    backpressure detector must flip."""
    listener = ProgressMetricsListener()
    spark.streams.addListener(listener)
    state = {"batch": 0}

    def throttled(df, batch_id):
        df.count()
        state["batch"] += 1
        time.sleep(min(0.5 * state["batch"], 3.0))

    q = None
    try:
        rate = spark.readStream.format("rate").option("rowsPerSecond", 200).load()
        src = rate.select(
            F.when(
                F.col("value") % 5 == 0,
                F.col("timestamp") - F.expr("INTERVAL 120 SECONDS"),
            )
            .otherwise(F.col("timestamp"))
            .alias("event_time"),
            (F.col("value") % 10).alias("key"),
            F.col("value").cast("double").alias("value"),
        )
        agg = windowed_keyed_agg(
            src, window="2 seconds", watermark="4 seconds", aggs={"events": "count"}
        )
        q = (
            agg.writeStream.outputMode("update")
            .foreachBatch(throttled)
            .option("checkpointLocation", tempfile.mkdtemp())
            .start()
        )
        needed = {"watermarkLagMs", "stateRows", "lateDropped", "lagMax"}
        deadline = time.time() + 60
        while time.time() < deadline:
            keys = {k for _, k, _ in listener.rows}
            dropped = sum(v for _, k, v in listener.rows if k == "lateDropped")
            if needed <= keys and dropped > 0 and state["batch"] >= 7:
                break
            time.sleep(0.5)
        q.stop()

        keys = {k for _, k, _ in listener.rows}
        assert needed <= keys, f"missing series: {needed - keys}"
        assert sum(v for _, k, v in listener.rows if k == "lateDropped") > 0, (
            "watermark dropped no late rows"
        )
        # evaluate over the trailing window past the boot batches, as the
        # reference does (batch 0 carries one-off startup cost that can
        # mask the rising trend over a short run)
        steady = listener.to_df(spark).filter("timestamp >= 2")
        flags = detect_backpressure(steady).collect()[0]
        assert flags["lat_slope"] > 0, flags  # per-batch cost is growing
        assert flags["is_bck_pres"], flags
    finally:
        if q is not None and q.isActive:
            q.stop()
        spark.streams.removeListener(listener)
