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
    """

    def __init__(self):
        self.rows: list[tuple[int, str, float]] = []
        self._lock = threading.Lock()

    def onQueryStarted(self, event):
        pass

    def onQueryProgress(self, event):
        p = event.progress
        ts = int(p.batchId)  # batch ordinal; wall-clock available via p.timestamp
        try:
            dur = float(p.durationMs.get("triggerExecution", 0.0))
        except Exception:
            dur = 0.0
        with self._lock:
            self.rows.append((ts, "thrRate", float(p.inputRowsPerSecond or 0.0)))
            self.rows.append((ts, "procRate", float(p.processedRowsPerSecond or 0.0)))
            self.rows.append((ts, "batchDur", dur))
            self.rows.append((ts, "inputRows", float(p.numInputRows or 0.0)))

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
