"""Scalar/columnwise helpers (SURVEY §2.7, C1-C8).

Citations into /root/reference:
- log_clamp      — ``log(max(1, x))``, analytics/app/latency/models.py:56-58
- relative_error — ``abs((a-b)/b)``, clients/analytics/responses/LatencyResponse.java:46-51
- sine_workload  — synthetic generator, analytics/app/prepare_model.py:24-47
- to_epoch_seconds — ms→s coercion, managers/ClientsManager.java:228-235
- nan_to_null    — NaN→null ingest coercion, clients/prometheus/PrometheusClient.java:107
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def log_clamp(col: Column) -> Column:
    """C1: ``log(max(1, x))`` — latency feature transform."""
    return F.log(F.greatest(F.lit(1.0), col))


def relative_error(a: Column, b: Column) -> Column:
    """C2: ``abs((a - b) / b)`` — tolerance comparisons."""
    return F.abs((a - b) / b)


def to_epoch_seconds(col: Column) -> Column:
    """C7: coerce a 13-digit epoch-millis long to epoch seconds via
    ``ceil(ts/1000)``; pass 10-digit epoch-seconds through."""
    return F.when(col > F.lit(9_999_999_999), F.ceil(col / 1000).cast("long")).otherwise(col)


def nan_to_null(col: Column) -> Column:
    """C8: NaN → null (Prometheus ingest coercion)."""
    return F.when(F.isnan(col), F.lit(None)).otherwise(col)


def sine_workload(
    spark: SparkSession,
    n: int,
    amplitude: float = 100_000.0,
    vertical_phase: float = 100_000.0,
    period: int = 7_200,
    noise: float = 0.01,
    seed: int = 42,
    start_ts: int = 0,
) -> DataFrame:
    """C4: deterministic sine workload generator,
    ``abs((A·sin(2π·t/period) + V) · (1 + N(0, noise)))`` — distributed via
    ``spark.range`` (no driver-side array materialization)."""
    t = F.col("id")
    base = amplitude * F.sin(F.lit(2 * math.pi) * (t % period) / period) + vertical_phase
    noisy = F.abs(base * (F.lit(1.0) + F.randn(seed) * noise))
    return spark.range(n).select(
        (t + F.lit(start_ts)).alias("timestamp"),
        noisy.alias("value"),
    )
