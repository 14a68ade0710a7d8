"""Streaming metrics collection — the engine-side replacement for the
reference's Prometheus scrape loop.

The reference polls PromQL for throughput (summed Kafka consumer rate),
p95 latency, consumer lag, and backpressure (/root/reference/src/main/java/
de/tu_berlin/dos/phoebe/managers/ClientsManager.java:341-380). On Spark the
same signals come from StreamingQueryProgress: a listener turns each
micro-batch progress event into a metrics row (timestamp, series_key,
value) compatible with the timeseries kernel and profile store, closing the
loop the Java control FSM implements (execution/phoebe/Graph.java:215-284).
"""

from __future__ import annotations

import json
import math
import threading

from pyspark.sql.streaming import StreamingQueryListener


class ProgressMetricsListener(StreamingQueryListener):
    """Collects per-batch metrics rows ``(timestamp, series_key, value)``.

    series keys mirror the reference's PromQL metric families:
    - ``thrRate``   — inputRowsPerSecond (summed over sources)
    - ``procRate``  — processedRowsPerSecond
    - ``batchDur``  — triggerExecution duration ms (stand-in for the job's
      processing-latency histogram; p95 over a window = A7)
    - ``inputRows`` — numInputRows
    - ``watermarkLagMs`` — batch wall-clock minus event-time watermark (the
      late-data / end-to-end freshness signal)
    - ``stateRows`` / ``lateDropped`` — stateful-operator footprint and rows
      dropped as later than the watermark
    - ``lagMax``    — the ``records_lag_max`` analog
      (``ClientsManager.java:374-380``): Kafka sources report
      offsets-behind-latest in source metrics; absent that, the per-batch
      unprocessed backlog estimated from input vs processed rate
    """

    _TS_FMTS = ("%Y-%m-%dT%H:%M:%S.%fZ", "%Y-%m-%dT%H:%M:%SZ")

    def __init__(self):
        self.rows: list[tuple[int, str, float]] = []
        self._run_of_row: list[str] = []  # parallel to rows: source runId
        self._lock = threading.Lock()

    def onQueryStarted(self, event):
        pass

    @classmethod
    def _parse_ts(cls, s):
        from datetime import datetime

        for fmt in cls._TS_FMTS:
            try:
                return datetime.strptime(s, fmt)
            except (TypeError, ValueError):
                continue
        return None

    def onQueryProgress(self, event):
        p = event.progress
        ts = int(p.batchId)  # batch ordinal; wall-clock available via p.timestamp
        try:
            d = json.loads(p.json)
        except Exception:
            d = {}
        def _finite(v):
            # Spark reports NaN rates on the first trigger; NaN is truthy
            # (so `or 0.0` keeps it) and compares GREATER than any number
            # in Spark SQL, which would mark healthy batches as behind
            try:
                f = float(v if v is not None else 0.0)
            except (TypeError, ValueError):
                return 0.0
            return f if math.isfinite(f) else 0.0

        dur = _finite((d.get("durationMs") or {}).get("triggerExecution", 0.0))
        thr = _finite(p.inputRowsPerSecond)
        proc = _finite(p.processedRowsPerSecond)
        run_id = str(getattr(p, "runId", "") or "")
        rows = [
            (ts, "thrRate", thr),
            (ts, "procRate", proc),
            (ts, "batchDur", dur),
            (ts, "inputRows", float(p.numInputRows or 0.0)),
        ]
        # late-data freshness: wall-clock minus event-time watermark
        wm = self._parse_ts((d.get("eventTime") or {}).get("watermark"))
        bt = self._parse_ts(d.get("timestamp"))
        if wm is not None and bt is not None and wm.year > 1970:  # skip uninitialized watermark
            rows.append((ts, "watermarkLagMs", (bt - wm).total_seconds() * 1000.0))
        # stateful-operator footprint + rows dropped later than the watermark
        ops = d.get("stateOperators") or []
        if ops:
            rows.append((ts, "stateRows", float(sum(o.get("numRowsTotal") or 0 for o in ops))))
            rows.append(
                (ts, "lateDropped", float(sum(o.get("numRowsDroppedByWatermark") or 0 for o in ops)))
            )
        # consumer-lag analog: Kafka's offsets-behind-latest when available,
        # else the backlog this batch accrued (input arrived minus processed)
        lags = []
        for s in d.get("sources") or []:
            m = s.get("metrics") or {}
            for k in ("maxOffsetsBehindLatest", "minOffsetsBehindLatest", "records_lag_max"):
                if k in m:
                    try:
                        lags.append(float(m[k]))
                    except (TypeError, ValueError):
                        pass
        if lags:
            rows.append((ts, "lagMax", max(lags)))
        elif thr > 0 and dur > 0:
            rows.append((ts, "lagMax", max(0.0, (thr - proc) * dur / 1000.0)))
        with self._lock:
            self.rows.extend(rows)
            self._run_of_row.extend([run_id] * len(rows))

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def to_df(self, spark, run_id: str | None = None):
        """Collected series as a (timestamp, series_key, value) frame.

        A session-level listener hears EVERY query on the session; batch
        ordinals from different queries/restarts would collide in the
        pivot, so when more than one runId was recorded this returns only
        the most recent one (pass ``run_id`` to pick another). No
        progress yet -> an EMPTY frame (no fabricated sentinel row)."""
        with self._lock:
            rows = list(self.rows)
            runs = list(self._run_of_row)
        if rows and len(set(runs)) > 1:
            pick = run_id if run_id is not None else runs[-1]
            rows = [r for r, rid in zip(rows, runs) if rid == pick]
        df = spark.createDataFrame(
            rows or [(0, "empty", 0.0)], "timestamp LONG, series_key STRING, value DOUBLE"
        )
        return df if rows else df.limit(0)


def detect_backpressure(
    metrics,
    lat_slope_threshold: float = 0.0,
    lag_slope_threshold: float = 0.0,
):
    """M10 backpressure rule over live listener series — the streaming twin
    of q34's batch detector (``ClientsManager.java:329-339``): full
    backpressure (every batch fell behind), or partial backpressure with
    rising processing latency AND rising consumer lag.

    Input is the listener's ``(timestamp, series_key, value)`` frame; the
    per-batch "fell behind" indicator is ``procRate < thrRate``. Slopes are
    OLS over the batch ordinal (covar/var — one aggregation, no window).
    Returns a 1-row DataFrame: bck_pres_per, lat_slope, lag_slope,
    is_bck_pres."""
    from pyspark.sql import functions as F

    wide = (
        metrics.groupBy("timestamp")
        .pivot("series_key", ["thrRate", "procRate", "batchDur", "watermarkLagMs", "lagMax"])
        .agg(F.first("value"))
    )
    x = F.col("timestamp").cast("double")
    behind = F.when(F.col("procRate") < F.col("thrRate"), 1.0).otherwise(0.0)

    def slope(y):
        # try_divide: fewer than two batches has var 0 - undefined, not an error
        return F.try_divide(F.covar_pop(x, y), F.var_pop(x))

    # lag slope must come from ONE unit, never a per-row coalesce across
    # units: early batches with an uninitialized watermark report lagMax
    # (a row count) while later ones report watermarkLagMs (milliseconds),
    # and mixing them fabricates a slope. Prefer the watermark series when
    # it has enough points to fit; else fall back to the backlog series.
    wm = F.col("watermarkLagMs")
    agg = wide.filter(F.col("thrRate").isNotNull()).agg(
        F.avg(behind).alias("bck_pres_per"),
        slope(F.col("batchDur")).alias("lat_slope"),
        F.when(F.count(wm) >= 2, slope(wm))
        .otherwise(slope(F.col("lagMax")))
        .alias("lag_slope"),
    )
    return agg.select(
        "bck_pres_per",
        "lat_slope",
        "lag_slope",
        (
            (F.col("bck_pres_per") == 1.0)
            | (
                (F.col("bck_pres_per") > 0)
                & (F.col("lat_slope") > lat_slope_threshold)
                & (F.col("lag_slope") > lag_slope_threshold)
            )
        ).alias("is_bck_pres"),
    )
