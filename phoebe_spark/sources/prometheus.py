"""Prometheus range-query source (SURVEY S7).

Reference (/root/reference/src/main/java/de/tu_berlin/dos/phoebe/clients/
prometheus/PrometheusClient.java:56-147): ``queryRange(query, start, end,
step)`` pages requests in 11,000-point chunks (the server's point limit),
coerces NaN values to null (:107, :135), fills a dense fixed-step grid, and
the labeled variant returns one series per matrix label.

Spark shape: the HTTP fetch is driver-side (a metrics server is not a
distributed source); rows land in a DataFrame immediately and densification
runs as the standard grid transform. The fetcher is injectable so tests and
offline replays provide matrix JSON without a live server; production
passes a urllib-based fetcher.
"""

from __future__ import annotations

import json
import math
import urllib.parse
import urllib.request
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from phoebe_spark.timeseries.core import densify

CHUNK_POINTS = 11_000  # PrometheusClient.java:56


def http_fetcher(base_url: str) -> Callable[[str, int, int, int], dict]:
    """Production fetcher: GET {base}/api/v1/query_range."""

    def fetch(query: str, start: int, end: int, step: int) -> dict:
        qs = urllib.parse.urlencode(
            {"query": query, "start": start, "end": end, "step": step}
        )
        with urllib.request.urlopen(f"{base_url}/api/v1/query_range?{qs}") as r:
            return json.load(r)

    return fetch


def _rows_from_matrix(payload: dict, label_keys: tuple[str, ...] = ("pod",)):
    """Matrix JSON -> (series_key, timestamp, value) rows; NaN -> null."""
    out = []
    for series in payload.get("data", {}).get("result", []):
        metric = series.get("metric", {})
        key = next((metric[k] for k in label_keys if k in metric), metric.get("__name__", ""))
        for ts, val in series.get("values", []):
            try:
                v = float(val)
                if math.isnan(v):
                    v = None
            except (TypeError, ValueError):
                v = None
            out.append((str(key), int(float(ts)), v))
    return out


def query_range(
    spark: SparkSession,
    fetch: Callable[[str, int, int, int], dict],
    query: str,
    start: int,
    end: int,
    step: int = 1,
    label_keys: tuple[str, ...] = ("pod",),
    dense: bool = True,
) -> DataFrame:
    """Paged range query -> labeled dense series DataFrame
    ``(series_key STRING, timestamp LONG, value DOUBLE)``.

    Pages in CHUNK_POINTS-sized windows exactly like the reference client;
    each page's rows append to one DataFrame, then the dense grid fills
    missing points with nulls per series."""
    rows: list[tuple[str, int, float | None]] = []
    chunk_span = CHUNK_POINTS * step
    lo = start
    while lo <= end:
        hi = min(lo + chunk_span - step, end)
        rows.extend(_rows_from_matrix(fetch(query, lo, hi, step), label_keys))
        lo = hi + step
    df = spark.createDataFrame(
        rows or [("", 0, None)], "series_key STRING, timestamp LONG, value DOUBLE"
    )
    if not rows:
        return df.limit(0)
    if dense:
        df = densify(df, step=step, keys=["series_key"], start=start, end=end)
    return df
