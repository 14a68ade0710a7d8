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
        dur = float((d.get("durationMs") or {}).get("triggerExecution", 0.0))
        thr = float(p.inputRowsPerSecond or 0.0)
        proc = float(p.processedRowsPerSecond or 0.0)
        rows = [
            (ts, "thrRate", thr),
            (ts, "procRate", proc),
            (ts, "batchDur", dur),
            (ts, "inputRows", float(p.numInputRows or 0.0)),
        ]
        # late-data freshness: wall-clock minus event-time watermark
        wm = self._parse_ts((d.get("eventTime") or {}).get("watermark"))
        bt = self._parse_ts(d.get("timestamp"))
        if wm is not None and bt is not None:
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

    def onQueryTerminated(self, event):
        pass

    def onQueryIdle(self, event):
        pass

    def to_df(self, spark):
        with self._lock:
            rows = list(self.rows)
        return spark.createDataFrame(
            rows or [(0, "empty", 0.0)], "timestamp LONG, series_key STRING, value DOUBLE"
        )
